package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared plumbing of the train-once/deploy-many model artifacts (BPE
  * merges, k-means codebooks, NN-Descent edges, the LPA chain, the
  * substring witness list): parquet tables under /tmp/graft_models keyed
  * by a filesystem fingerprint (path + size + mtime) of the corpus file
  * they were derived from. An artifact caches a DETERMINISTIC
  * computation — deployed results must be bit-identical to the fold, and
  * any read anomaly or fingerprint mismatch falls back to the build and
  * rewrites. Writes commit via directory rename; a lost race leaves the
  * winner's equivalent artifact in place. */
object ModelStore {
  val Root = "/tmp/graft_models"

  /** md5 of (dir, per-file name:size:mtime, tag); None if the table file
    * is missing or unreadable — callers then run the fold uncached. */
  def fingerprint(dir: String, table: String, tag: String): Option[String] =
    try {
      val f = new java.io.File(dir, table)
      if (!f.exists) None
      else {
        val files = if (f.isDirectory) f.listFiles.toSeq.sortBy(_.getName) else Seq(f)
        val desc = files.map(x => s"${x.getName}:${x.length}:${x.lastModified}").mkString("|")
        val md = java.security.MessageDigest.getInstance("MD5")
        Some(md.digest(s"$dir|$desc|$tag".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
      }
    } catch { case _: Throwable => None }

  /** Distributed parquet read of an artifact (never a driver collect —
    * artifacts are model-sized, but the read path must scale anyway). */
  def read(spark: SparkSession, name: String, cols: Seq[String]): Option[DataFrame] =
    try {
      val d = new java.io.File(Root, name)
      if (!d.isDirectory) None
      else {
        val df = spark.read.parquet(d.getPath).select(cols.map(col): _*)
        if (df.isEmpty) None else Some(df)
      }
    } catch { case _: Throwable => None }

  def write(name: String, df: DataFrame): Unit =
    try {
      val root = new java.io.File(Root)
      root.mkdirs()
      val tmp = new java.io.File(root, s"tmp_${name}_${System.nanoTime}")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val fin = new java.io.File(root, name)
      if (!tmp.renameTo(fin)) {
        // another writer won the race; its artifact is equivalent — drop ours
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(tmp)
      }
    } catch { case _: Throwable => () }
}
