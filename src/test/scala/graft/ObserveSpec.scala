package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.Tables

/** `Dataset.observe` — the runtime-metrics surface a production pipeline
  * attaches to its stages: named aggregates computed DURING the action (no
  * second scan), delivered to the driver as a listener event. The specs pin
  * (a) that observed metrics equal independently-computed aggregates, and
  * (b) the one-scan claim on a funnel stage — the monitoring story t26's
  * curation pipeline would ship with (per-stage row counts without
  * re-running any stage).
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observed metrics equal direct aggregates, computed in the same scan") {
    val obs = Observation("docs-scan")
    val d = Tables.load(spark, dir, "documents")
      .observe(obs, count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        min("doc_id").as("min_id"))
    // one action drives both the query result and the metrics
    val kept = d.filter(col("n_chars") >= 100).count()
    val m = obs.get
    val direct = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)), sum("n_chars"), min("doc_id")).collect().head
    assert(m("n_docs") == direct.getLong(0))
    assert(m("n_chars") == direct.getLong(1))
    assert(m("min_id") == direct.getLong(2))
    assert(kept <= m("n_docs").asInstanceOf[Long])
  }

  test("a funnel stage reports its attrition via observe, not a second pass") {
    // the t26 monitoring shape: count what enters and what survives the
    // quality gate in ONE traversal of the pipeline
    val pre = Observation("pre-gate")
    val post = Observation("post-gate")
    val gated = TextOps.defs("t11_quality_gate")(
        spark, dir).observe(post, count(lit(1)).as("n"))
    val inDocs = Tables.load(spark, dir, "documents")
      .observe(pre, count(lit(1)).as("n"))
    val survivors = gated.count()
    inDocs.write.format("noop").mode("overwrite").save()
    val nIn = pre.get("n").asInstanceOf[Long]
    val nOut = post.get("n").asInstanceOf[Long]
    assert(nOut == survivors)
    assert(nOut < nIn, s"the gate must bite: $nOut of $nIn")
  }
}
