package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ShingleHash32

/** The fused native shingle-hash expressions (OPTIMIZATION r18) must be
  * bit-identical to the composed Column spelling they replaced —
  * `array_sort(array_distinct(transform(shinglesOf(split(text," ")), md5_hash32)))`
  * for the set form, the un-distinct transform for the raw form, and the
  * 16 `array_min(transform(hv, affine))` columns for the signatures. The
  * composed spelling is also what the DuckDB oracle mirrors, so parity
  * here is parity with the correctness gate. */
class ShingleHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the edge-case zoo: empty, whitespace-only, <3 tokens, consecutive /
  // leading / trailing spaces (empty tokens), duplicate shingles, unicode
  // multibyte, a null, and a long repetitive doc
  private val texts: Seq[String] = Seq(
    "", " ", "  ", "a", "a b", "a b c", "a b c d",
    " a b c ", "a  b c", "a b  c d", "a b a b a b",
    "x x x x x x x", "héllo wörld däta stream", "日本 語 テスト です",
    null, ("tok " * 200).trim, "a b c d e f g h i j k l m n o p")

  private def df = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def legacySet = array_sort(array_distinct(
    graft.operators.Dedup.hvOf(
      graft.operators.Dedup.shinglesOf(split(col("text"), " ")))))

  private def legacyRaw = graft.operators.Dedup.hvOf(
    graft.operators.Dedup.shinglesOf(split(col("text"), " ")))

  test("fused set form == composed spelling on the edge-case zoo") {
    val rows = df.select(col("doc_id"),
        ShingleHash32.set(col("text")).as("fused"), legacySet.as("legacy"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("fused raw form == composed spelling, order and multiplicity kept") {
    val rows = df.select(col("doc_id"),
        ShingleHash32.raw(col("text")).as("fused"), legacyRaw.as("legacy"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("AffineMinSigs == 16 array_min(transform(...)) incl. null/empty") {
    val hv = ShingleHash32.raw(col("text"))
    val legacySigs = (0 until 16).map { j =>
      array_min(transform(hv,
        h => (lit(ShingleHash32.hashA(j)) * h + lit(ShingleHash32.hashB(j)))
          % lit(ShingleHash32.P))).as(s"l$j")
    }
    val fusedSigs = (0 until 16).map(j =>
      element_at(ShingleHash32.sigs(hv), j + 1).as(s"f$j"))
    val rows = df.select(col("doc_id") +: (legacySigs ++ fusedSigs): _*).collect()
    rows.foreach { r =>
      (0 until 16).foreach { j =>
        val l = if (r.isNullAt(1 + j)) null else r.getLong(1 + j)
        val f = if (r.isNullAt(17 + j)) null else r.getLong(17 + j)
        assert(l == f, s"doc ${r.getLong(0)} sig $j")
      }
    }
  }

  test("fused set == composed spelling on the sf0.001 corpus") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bad = docs.select(
        ShingleHash32.set(col("text")).as("fused"), legacySet.as("legacy"))
      .filter(col("fused") =!= col("legacy"))
      .count()
    assert(bad == 0L)
  }
}
