package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: the co-located-join technique for 100 TB fact
  * tables (builder brief: "repartition/bucketing for co-located joins").
  *
  * Writing both join sides bucketed (and sorted) by the join key with the
  * same bucket count lets Spark's scan report a compatible output
  * partitioning, so a later sort-merge join needs NO Exchange on either side
  * — the shuffle is paid once at write time and amortized over every
  * subsequent join. This is the batch analog of the reference's
  * per-reducer shuffle files (hw4.cc:444-453), done right: declarative,
  * spillable, and reusable across queries. Verified shuffle-free in
  * BucketedJoinSpec.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
