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
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (Spark's vectorized
      // reader rejects it; the legacy conf reads it as raw nano-longs) and as
      // plain no-tz TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize both
      // to session-tz TimestampType by inspecting the scanned dtype — the
      // session tz is pinned to UTC at every builder, so the NTZ→TZ cast
      // preserves the instant exactly as the DuckDB oracle's naive-as-UTC
      // `epoch_ms` does. Integer `div` (not `/`) on the nanos path —
      // epoch-nanos exceed double's exact range.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so common-dialect SQL (shared verbatim
    * with the DuckDB oracle) can run via `spark.sql`. Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
