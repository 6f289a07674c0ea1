package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference engine's only source is a whitespace text file read line-by-line
  * (hw4.cc:62-80); the rebuild generalizes to columnar parquet scans so Catalyst
  * can push filters/projections into the scan (`PushedFilters`/`ReadSchema`).
  * At 100 TB these are partitioned parquet directories; the API is identical.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects; read it as raw nanos and rebuild a microsecond TimestampType.
      // Integer `div` (not `/`) — epoch-nanos exceed double's exact range.
      // The conf is ALSO set at every session builder (Verify/Bench/Main/
      // tests); this set is a safety net for ad-hoc sessions and is
      // idempotent, but a cached plan built before first load could observe
      // the flip — prefer setting it at session construction.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so common-dialect SQL (shared verbatim
    * with the DuckDB oracle) can run via `spark.sql`. Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
