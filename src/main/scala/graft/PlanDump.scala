package graft

/** Measurement tool (guide §1): dump `.explain("formatted")` for named
  * queries to files, so plan claims (Exchange counts, join strategies,
  * PushedFilters) are checkable offline without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...]
  * With no query list, dumps every declared query. Streaming-harness
  * queries (x*) execute their stream on construction via runToCompletion,
  * so the dumped plan there is the plan of the SINK READ-BACK — the
  * per-microbatch plan is not reachable from a batch explain; those are
  * still dumped (cheaply labeled) for completeness.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    val only = args.lift(2).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
