package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VOLUME-PURE embedding fixture (VERDICT r13 item 2): N·factor DISTINCT
  * vectors, so recall@5 is readable at 10×/100× scale. ScaleSmoke's
  * replication re-keys ids but copies vectors verbatim — at 100× every
  * vector has 99 exact twins, the true top-5 is saturated by twins, and
  * the measured recall says nothing about the plane policy (the r13
  * adjudication). Here every replica beyond the first is a deterministic
  * CONVEX BLEND of two base vectors (0.8·v + 0.2·v_partner, partner index
  * `(vec_id + 1 + ((vec_id·31 + i·17) mod (N−1))) mod N` — the offset
  * ranges over 1..N−1 so the partner is NEVER the vector itself (a
  * self-partner blend is the original vector again — the exact-twin
  * failure this fixture exists to avoid, hit at factor 100 where
  * 30·a + 17·i ≡ 0 mod N has solutions), and 17 ⊥ N−1 keeps a vector's
  * replicas on distinct partners), which
  * keeps the fixture on the base corpus's manifold (realistic neighbor
  * structure, not a uniform cube) while guaranteeing distinctness.
  * Queries stay `vec_id < 5` under the `id·factor + i` re-key, exactly
  * like the other scale fixtures.
  *
  * Usage: runMain graft.EmbedFixture [baseSfDir] [factor]
  * Writes /tmp/graft-embvol-<factor>/embeddings.parquet (float vectors,
  * the source schema, so emb()'s cast and the oracle's ::DOUBLE[] see the
  * same representation as the gate corpus).
  */
object EmbedFixture {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/tmp/graft-embvol-$factor"
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val n = emb.count()
    val reps = spark.range(factor.toLong)
      .select(col("id").cast("int").as("i"))
    val partners = emb.select(col("vec_id").as("partner"),
      col("embedding").as("pv"))
    emb.crossJoin(broadcast(reps))
      .withColumn("partner",
        (col("vec_id") + 1 + (col("vec_id") * 31 + col("i") * 17) % (n - 1)) % n)
      .join(broadcast(partners), "partner")
      .select(
        (col("vec_id") * factor + col("i")).as("vec_id"),
        when(col("i") === 0, col("embedding"))
          .otherwise(zip_with(col("embedding"), col("pv"), (a, b) =>
            (a.cast("double") * 0.8 + b.cast("double") * 0.2).cast("float")))
          .as("embedding"),
        (col("label") * factor + col("i")).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val written = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = written.count()
    // distinctness is the fixture's entire point — verify, don't assume
    val distinctVecs = written.select(col("embedding")).distinct().count()
    println(s"""{"metric":"embed_fixture","dir":"$dir","rows":$rows,"distinct_vectors":$distinctVecs}""")
    require(rows == n * factor, s"expected ${n * factor} rows, wrote $rows")
    require(distinctVecs == rows,
      s"fixture is not volume-pure: $distinctVecs distinct of $rows")
    spark.stop()
  }
}
