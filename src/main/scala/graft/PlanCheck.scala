package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape diagnostic: run named queries against a data dir and print
  * one line per query summarizing the EXECUTED plan's join strategies and
  * scan count — the quick way to confirm "dimensions still broadcast at
  * the 100× ScaleSmoke volume" (VERDICT r9 item 3) without pasting whole
  * plans. AQE finalizes join strategies at runtime, so the query is forced
  * (noop write) before the plan is read.
  *
  * Usage: runMain graft.PlanCheck <dataDir> <q1,q2,...>
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanCheck <dataDir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // Execute this Dataset's OWN QueryExecution so its
      // AdaptiveSparkPlanExec is FINALIZED before the plan is read —
      // otherwise the printout is the static plan and misses every
      // runtime join demotion/promotion (code-review r10 finding). Note
      // a write plans a separate QueryExecution, and even Dataset.foreach
      // routes through the separate rddQueryExecution — only qe.toRdd
      // executes the plan object we then print.
      val qe = df.queryExecution
      qe.toRdd.count(): Unit
      // the finalized adaptive toString appends an "== Initial Plan =="
      // section — count only the final plan above it
      val p = qe.executedPlan.toString.split("== Initial Plan ==").head
      def n(token: String) = token.r.findAllIn(p).size
      // count shuffle exchanges separately from broadcasts — a plain
      // "Exchange" token also matches inside "BroadcastExchange"
      val shuffles = n("Exchange hashpartitioning") +
        n("Exchange rangepartitioning") + n("Exchange SinglePartition")
      println(s"PLANCHECK $name broadcastHash=${n("BroadcastHashJoin")}" +
        s" sortMerge=${n("SortMergeJoin")} shuffledHash=${n("ShuffledHashJoin")}" +
        s" nestedLoop=${n("NestedLoop")} cartesian=${n("CartesianProduct")}" +
        s" scans=${n("Scan parquet")} shuffleExchanges=$shuffles" +
        s" broadcastExchanges=${n("BroadcastExchange")}" +
        s" adaptive=${p.contains("AdaptiveSparkPlan")}" +
        s" finalPlan=${p.contains("isFinalPlan=true")}")
    }
    spark.stop()
  }
}
