package graft

/** Pins the ModelStore commit semantics the artifact families rely on:
  * empty frames are never committed (read() would reject them anyway),
  * a stale/corrupt directory squatting a slot is healed by the next
  * write instead of poisoning the fingerprint forever, a lost race
  * against a VALID artifact keeps the winner, and partitioned
  * (singleFile = false) writes round-trip exactly. */
class ModelStoreSpec extends SparkSpecBase {

  private def freshName = s"msspec_${System.nanoTime()}"

  test("empty frame: write is skipped, slot stays vacant") {
    import spark.implicits._
    val name = freshName
    ModelStore.write(name, Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(!new java.io.File(ModelStore.Root, name).exists,
      "an empty artifact must not be committed")
    assert(ModelStore.read(spark, name, Seq("a", "b")).isEmpty)
  }

  test("corrupt squatter: an unreadable dir is healed by the next write") {
    import spark.implicits._
    val name = freshName
    // a directory read() rejects (no parquet inside) squats the slot
    val fin = new java.io.File(ModelStore.Root, name)
    assert(fin.mkdirs())
    val junk = new java.io.File(fin, "not_parquet.txt")
    val w = new java.io.PrintWriter(junk); w.println("junk"); w.close()
    assert(ModelStore.read(spark, name, Seq("a", "b")).isEmpty,
      "the squatter must read as a miss")
    ModelStore.write(name, Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
    val back = ModelStore.read(spark, name, Seq("a", "b"))
    assert(back.isDefined, "the write must replace the corrupt dir")
    assert(back.get.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L), (3L, 4L)))
    assert(!junk.exists, "the junk file must be gone with the healed dir")
  }

  test("valid incumbent: a second write keeps a readable artifact in place") {
    import spark.implicits._
    val name = freshName
    ModelStore.write(name, Seq((1L, 10L)).toDF("a", "b"))
    val mtime = new java.io.File(ModelStore.Root, name).lastModified()
    // deterministic-computation contract: a rival write carries the SAME
    // rows; the incumbent must survive untouched (rename fails, rival
    // validates it, drops its tmp)
    ModelStore.write(name, Seq((1L, 10L)).toDF("a", "b"))
    assert(new java.io.File(ModelStore.Root, name).lastModified() == mtime,
      "a valid incumbent must not be replaced")
    assert(ModelStore.read(spark, name, Seq("a", "b")).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
    assert(!new java.io.File(ModelStore.Root).listFiles
      .exists(_.getName.startsWith(s"tmp_$name")),
      "the losing tmp dir must be cleaned up")
  }

  test("partitioned write: multiple part files, exact round-trip") {
    import spark.implicits._
    val name = freshName
    val df = (1L to 1000L).map(i => (i, i * 7L)).toDF("a", "b").repartition(4)
    ModelStore.write(name, df, singleFile = false)
    val parts = new java.io.File(ModelStore.Root, name).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts > 1, s"corpus-proportional artifacts must not be one task ($parts)")
    val back = ModelStore.read(spark, name, Seq("a", "b")).get
    assert(back.count() == 1000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("b")).head.getLong(0)
      == (1L to 1000L).map(_ * 7L).sum)
  }
}
