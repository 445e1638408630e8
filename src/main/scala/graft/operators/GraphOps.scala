package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative min-label propagation — hash-min connected components — shared
  * by raster polygonization (region merge) and near-dup clustering.
  *
  * Each round is ONE shuffle of O(#nodes) label rows plus an equi-join with
  * the edge list; localCheckpoint cuts lineage so round N's plan does not
  * replay rounds 1..N-1. Rounds needed = component graph diameter; the
  * converged labeling (per-component min node id) is independent of
  * iteration order — deterministic, so oracle-checkable against a
  * recursive-CTE transitive closure. For adversarially deep components swap
  * in large-star/small-star pointer doubling (O(log d) rounds); the
  * per-round shape is identical.
  */
object GraphOps {

  /** `nodes`: one row per node with a unique LONG `id`; `edges`: directed
    * (src, dst) pairs — pass both directions for undirected graphs.
    * Returns (id, comp) where comp = min node id reachable. */
  def minLabelComponents(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // convergence check: labels only ever DECREASE, so the label sum is
    // strictly monotone until the fixpoint — comparing sums is one tiny
    // aggregate job per round instead of a labels⋈labels diff join
    // (decimal sum: a long sum of 64-bit ids can silently wrap)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast(DecimalType(38, 0)))).collect()(0).getDecimal(0)
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    val dbg = sys.env.contains("GRAFT_DEBUG_ROUNDS")
    // <= : a graph of diameter EXACTLY maxRounds finishes changing on round
    // maxRounds and needs one extra no-change round to be DETECTED
    while (!converged && rounds <= maxRounds) {
      val msgs = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      rounds += 1
      if (dbg) System.err.println(s"[graphops] round $rounds sum=$s")
    }
    // a silent truncation would return a component split in two and fail
    // only at the (distant) oracle — refuse loudly instead
    if (!converged) throw new IllegalStateException(
      s"minLabelComponents did not converge in $maxRounds rounds " +
        "(component diameter exceeds the cap; raise maxRounds or switch to pointer doubling)")
    labels
  }
}
