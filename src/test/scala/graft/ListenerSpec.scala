package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.SparkListenerApplicationEnd
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.WordCountJob
import graft.listen.Hw4EventLogListener

/** Validates the event-log CSV grammar against hw4.cc:84-203 (SURVEY.md §5
  * item 5): schema per event, Start_Job first, Finish_Job last, dispatch
  * precedes completion per (kind, taskid). */
class ListenerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runWithListener(): Seq[String] = {
    val in = Files.createTempFile("lst-in", ".txt")
    Files.writeString(in, "alpha beta alpha gamma beta alpha")
    val out = Files.createTempDirectory("lst-out")
    val cfg = WordCountJob.Config("lsttest", 2, 0, in.toString, 2, "none",
      out.toString)
    val listener = new Hw4EventLogListener(cfg, 4)
    spark.sparkContext.addSparkListener(listener)
    try {
      WordCountJob.run(spark, cfg)
      // listener bus is async (and private[spark]); wait for the log to settle
      val log = Paths.get("lsttest-log.out")
      var last = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val size = if (Files.exists(log)) Files.size(log) else -1L
        if (size == last) stable += 1 else { stable = 0; last = size }
      }
      // the test session outlives the job; deliver application-end directly
      listener.onApplicationEnd(SparkListenerApplicationEnd(System.currentTimeMillis()))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      listener.close()
    }
    val log = Paths.get("lsttest-log.out")
    val lines = Files.readAllLines(log).asScala.toSeq
    Files.deleteIfExists(log)
    lines
  }

  test("log follows the hw4 CSV grammar") {
    val lines = runWithListener()
    assert(lines.nonEmpty)

    val events = lines.map(_.split(",", -1))
    // every line: unix-seconds timestamp then a known event name
    val names = Set("Start_Job", "Dispatch_MapTask", "Complete_MapTask",
      "Dispatch_ReduceTask", "Complete_ReduceTask", "Finish_Job")
    events.foreach { e =>
      assert(e(0).forall(_.isDigit), s"bad timestamp: ${e.mkString(",")}")
      assert(names.contains(e(1)), s"unknown event: ${e.mkString(",")}")
    }

    // Start_Job exactly once, first; Finish_Job exactly once, last
    assert(events.head(1) == "Start_Job")
    assert(events.last(1) == "Finish_Job")
    assert(events.count(_(1) == "Start_Job") == 1)
    assert(events.count(_(1) == "Finish_Job") == 1)

    // Start_Job carries the full 9-field config (hw4.cc:84):
    // job,node,ncpus,R,delay,input,chunk,locality,outdir
    assert(events.head.length == 11, events.head.mkString(","))

    // map and reduce phases both present; each Complete has a prior Dispatch
    assert(events.exists(_(1) == "Complete_MapTask"))
    assert(events.exists(_(1) == "Complete_ReduceTask"))
    Seq("MapTask", "ReduceTask").foreach { kind =>
      val dispatched = scala.collection.mutable.Set[String]()
      events.foreach { e =>
        if (e(1) == s"Dispatch_$kind") dispatched += e(2)
        if (e(1) == s"Complete_$kind")
          assert(dispatched.contains(e(2)), s"complete before dispatch: ${e.mkString(",")}")
      }
    }

    // timestamps are non-decreasing
    val ts = events.map(_(0).toLong)
    assert(ts == ts.sorted)
  }
}
