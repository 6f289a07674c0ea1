package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.WordCountJob

/** Property-based tests over the WordCount core (SURVEY.md §5 item 3).
  * Uses scalacheck generators with pinned seeds (no scalatestplus bridge in
  * the offline dependency set), so failures are reproducible. */
class WordCountPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val wordGen: Gen[String] = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(40, wordGen)

  private def sample(seed: Long): List[String] =
    corpusGen.pureApply(Gen.Parameters.default, Seed(seed))

  private def countsOf(words: List[String]): Map[String, Long] = {
    import java.nio.file.Files
    val f = Files.createTempFile("wc-prop", ".txt")
    Files.writeString(f, words.mkString(" "))
    val rows = WordCountJob.counts(spark, f.toString).collect()
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("sum of counts equals token count; counts >= 1; keys = distinct words") {
    (1L to 5L).foreach { seed =>
      val words = sample(seed)
      val m = countsOf(words)
      assert(m.values.sum == words.size.toLong, s"seed=$seed")
      assert(m.values.forall(_ >= 1L), s"seed=$seed")
      assert(m.keySet == words.toSet, s"seed=$seed")
    }
  }

  test("counts match a plain-Scala groupBy oracle across random corpora") {
    (6L to 10L).foreach { seed =>
      val words = sample(seed)
      val expected = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(countsOf(words) == expected, s"seed=$seed")
    }
  }
}
