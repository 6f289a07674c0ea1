package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned parquet sinks: the standard 100 TB table layout.
  *
  * Hive-style directory partitioning (`path/col=value/...`) lets every
  * engine prune whole directories at planning time: a reader filtering on
  * the partition column scans only matching partitions — `PartitionFilters`
  * in the scan, pinned by PartitionPruningSpec. Time-series tables (the
  * `events` shape) partition by date; re-partitioning by the partition
  * column before the write yields one file per partition instead of
  * numShufflePartitions small files per partition (the small-files problem).
  */
object Sinks {

  /** Write `df` Hive-partitioned by `partitionCol`, one file per partition. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** The events table with a derived `event_date` partition column. */
  def eventsByDate(df: DataFrame): DataFrame =
    df.withColumn("event_date", to_date(col("ts")))
}
