package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the clustering
  * step shared by the text near-dup pipeline (Dedup d11) and the embedding
  * near-dup pipeline (Similarity s6): pairwise edges (a,b),(b,c) must
  * collapse into ONE surviving group, which no per-pair policy can see.
  *
  * Each round sends every vertex's current label across its (undirected)
  * edges and keeps the min — all joins/aggregations stay distributed; the
  * only thing that crosses the driver is a one-row convergence aggregate per
  * round. Labels are monotone non-increasing, so an unchanged label SUM is a
  * fixed point. Rounds needed = component diameter; near-dup components are
  * quasi-cliques (diameter 1-2), and the 25-round cap is a safety rail, not
  * a truncation — the loop exits on the fixed point. At 1000-executor scale
  * the same loop runs with star-contraction (large-star/small-star,
  * Kiveris et al.) to force O(log^2 n) rounds on adversarial chains;
  * `localCheckpoint` stands in for the per-round lineage cut either way.
  */
object Components {

  /** edges: two LongType columns (first two), each row one undirected edge.
    * Returns (v, lbl): every vertex appearing in an edge, labeled with the
    * min vertex id reachable from it. Vertices with no edges don't appear
    * (a singleton's "cluster" is itself — join back if needed). */
  def minLabel(edges: DataFrame): DataFrame = {
    val Seq(a, b) = edges.columns.take(2).toSeq.map(col)
    // checkpoint the (possibly expensive) edge derivation ONCE; the
    // undirected doubling is two narrow selects over the checkpointed
    // blocks — not worth its own materialization job
    val e = edges.select(a.as("d1"), b.as("d2")).localCheckpoint()
    val und = e.select(col("d1").as("v"), col("d2").as("u"))
      .union(e.select(col("d2").as("v"), col("d1").as("u")))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("lbl")), lit(0L))).collect()(0).getLong(0)
    var lbl = und.select(col("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint()
    var prevSum = labelSum(lbl)
    var converged = false
    var iter = 0
    while (iter < 25 && !converged) {
      val msgs = und
        .join(lbl.select(col("v").as("u"), col("lbl").as("nl")), "u")
        .select(col("v"), col("nl").as("lbl"))
      lbl = lbl.union(msgs).groupBy("v").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      val s2 = labelSum(lbl)
      converged = s2 == prevSum
      prevSum = s2
      iter += 1
    }
    lbl
  }
}
