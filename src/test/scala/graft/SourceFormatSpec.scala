package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format coverage beyond parquet (the reference reads only
  * whitespace text): CSV with an explicit schema, JSON-lines, and ORC
  * round-trip losslessly through the same DataFrame surface. */
class SourceFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def nationKeyed = Tables.load(spark, dir, "nation")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("CSV round-trip with explicit schema is lossless") {
    val out = Files.createTempDirectory("csv-rt").toString
    nationKeyed.write.mode("overwrite")
      .option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val back = spark.read.schema(schema).option("header", "true").csv(out)
    assert(back.schema == schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationKeyed.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON-lines round-trip preserves rows and nested extraction works") {
    val out = Files.createTempDirectory("json-rt").toString
    nationKeyed
      .withColumn("meta", struct(col("n_regionkey").as("region"),
        lit("nation").as("kind")))
      .write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() == nationKeyed.count())
    val extracted = back
      .select(col("n_nationkey").cast("long"), col("meta.region").cast("long"))
      .orderBy("n_nationkey").collect()
    val expected = nationKeyed
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .orderBy("n_nationkey").collect()
    assert(extracted.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      expected.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("ORC round-trip is lossless and pushes filters to the scan") {
    val out = Files.createTempDirectory("orc-rt").toString
    nationKeyed.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nationKeyed.orderBy("n_nationkey").collect().toSeq)
    // the columnar scan must receive the pushed predicate, same as parquet
    val plan = back.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,1)]"),
      s"expected ORC pushdown in:\n$plan")
  }
}
