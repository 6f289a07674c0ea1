package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label hooking + graph
  * contraction — the clustering step shared by the text near-dup pipeline
  * (Dedup d11) and the embedding near-dup pipeline (Similarity s6):
  * pairwise edges (a,b),(b,c) must collapse into ONE surviving group,
  * which no per-pair policy can see.
  *
  * Each round: (1) HOOK — every super-vertex adopts the min of itself and
  * its neighbors; (2) CONTRACT — edges are rewritten through the hook map
  * and self-loops/duplicates dropped, so the graph SHRINKS every round
  * (label-propagation without contraction needs one round per hop of
  * graph diameter over the FULL edge set — measured 18 rounds on the
  * sf0.1 cosine graph — while the contracted graph collapses
  * near-geometrically on non-adversarial id layouts and the tail rounds
  * run on a vanishing edge set); (3) COMPOSE — the vertex→label map is
  * pushed through the hook map. All joins/aggregations stay distributed;
  * only an is-empty probe on the shrinking edge set crosses the driver
  * per round. `materialize` cuts the per-round lineage AND resets plan
  * statistics (see its doc). The 50-round cap is a safety rail for
  * adversarially ordered chain graphs (which contract by O(1) per
  * round); hitting it throws rather than returning a partial labeling.
  */
object Components {

  /** Materialize a round's state AND break Catalyst stats propagation.
    * `localCheckpoint` alone keeps the origin plan's `sizeInBytes`
    * estimate on the LogicalRDD; in an iterative loop each round's plan
    * joins several previous checkpoints, so the BigInt estimate COMPOUNDS
    * multiplicatively — by round ~15 the "estimate" has millions of
    * digits and the optimizer hangs inside BigInteger multiplication
    * (observed: 31 s/round, then livelock). Re-wrapping the checkpointed
    * RDD in a fresh DataFrame resets the leaf stats every round. */
  private def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** edges: two LongType columns (first two), each row one undirected edge.
    * Returns (v, lbl): every vertex appearing in an edge, labeled with the
    * min vertex id reachable from it. Vertices with no edges don't appear
    * (a singleton's "cluster" is itself — join back if needed). */
  def minLabel(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val Seq(a, b) = edges.columns.take(2).toSeq.map(col)
    // The working state is the near-dup pair graph — orders of magnitude
    // smaller than the corpus the session's shuffle.partitions is sized
    // for, and each round pays per-partition scheduling overhead. Pin a
    // small count for the loop and restore after (the streaming harness
    // pattern; a production job sizes this to its edge volume).
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val e = materialize(edges.select(a.as("d1"), b.as("d2")))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      var g = materialize(e.filter(col("d1") =!= col("d2"))
        .select(least(col("d1"), col("d2")).as("x"),
          greatest(col("d1"), col("d2")).as("y"))
        .distinct())
      // vertex set from e, NOT g: a vertex appearing only in self-loop
      // edges must still be labeled (with itself), per the contract above
      var mapping = materialize(
        e.select(col("d1").as("v")).union(e.select(col("d2").as("v")))
          .distinct().withColumn("lbl", col("v")))
      var iter = 0
      while (g.head(1).nonEmpty) {
        if (iter >= 50)
          throw new IllegalStateException(
            s"connected components did not converge in $iter rounds")
        // hook: min of self and neighbors, per super-vertex still in play
        val nbr = g.select(col("x").as("sv"), col("y").as("nl"))
          .union(g.select(col("y").as("sv"), col("x").as("nl")))
        val m = materialize(nbr.groupBy("sv").agg(min("nl").as("mn"))
          .select(col("sv"), least(col("sv"), col("mn")).as("m")))
        // compose: v -> m(lbl(v)); vertices whose representative already
        // contracted away keep their label (left join + coalesce)
        mapping = materialize(mapping
          .join(m.select(col("sv").as("lbl"), col("m")), Seq("lbl"), "left")
          .select(col("v"), coalesce(col("m"), col("lbl")).as("lbl")))
        // contract: rewrite edges through the hook map, drop self-loops
        g = materialize(g
          .join(m.select(col("sv").as("x"), col("m").as("mx")), "x")
          .join(m.select(col("sv").as("y"), col("m").as("my")), "y")
          .filter(col("mx") =!= col("my"))
          .select(least(col("mx"), col("my")).as("x"),
            greatest(col("mx"), col("my")).as("y"))
          .distinct())
        iter += 1
      }
      mapping
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
