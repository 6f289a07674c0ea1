package graft.model

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Parser for the reference's locality-config file: `chunkid nodeid` pairs,
  * one per line (hw4.cc:88-96; SURVEY.md §2.1 #2).
  *
  * In the reference this drives the jobtracker's locality-first greedy
  * dispatch; in Spark, task placement belongs to the scheduler
  * (`TaskSetManager` locality levels + `spark.locality.wait`), so the parsed
  * table is contract/log parity only — [[foldNode]] reproduces the
  * reference's node-id folding (hw4.cc:94: `node_id % (nodes-1) + 1`) for
  * byte-identical Start_Job/Dispatch log experiments.
  */
object LocalityConfig {

  final case class Entry(chunkId: Int, nodeId: Int)

  /** hw4.cc:94 — fold arbitrary config node ids onto worker ranks 1..P-1. */
  def foldNode(nodeId: Int, numNodes: Int): Int =
    if (numNodes <= 1) 0 else nodeId % (numNodes - 1) + 1

  /** Parse `chunkid nodeid` lines; blank lines skipped, malformed rejected. */
  def parse(path: Path): Seq[Entry] =
    Files.readAllLines(path).asScala.toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map { l =>
        l.split("\\s+") match {
          case Array(c, n) => Entry(c.toInt, n.toInt)
          case _ => throw new IllegalArgumentException(s"bad locality line: '$l'")
        }
      }

  /** chunkid → folded worker rank, as the reference jobtracker sees it. */
  def asFoldedMap(path: Path, numNodes: Int): Map[Int, Int] =
    parse(path).map(e => e.chunkId -> foldNode(e.nodeId, numNodes)).toMap
}
