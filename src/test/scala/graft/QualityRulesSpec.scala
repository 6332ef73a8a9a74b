package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.QualityRules

/** Pins each Gopher rule's integer cross-multiplication on hand-built
  * documents (the oracle-gated `quality_gopher` covers the fixture). */
class QualityRulesSpec extends AnyFunSuite {
  import TestSession._

  private def run(text: String) = {
    import spark.implicits._
    QualityRules.gopherRules(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
  }

  test("all rules pass on a 30-word stopword-bearing doc at the mean-len floor") {
    val r = run(Seq.fill(15)("the and").mkString(" ")) // 30 words, 90 chars
    assert(r.getAs[Long]("n_words") === 30L)
    assert(r.getAs[Long]("sum_word_chars") === 90L) // mean exactly 3.0
    assert(r.getAs[Long]("n_stop_hits") === 2L)
    assert(r.getAs[Int]("passes") === 1)
  }

  test("short doc fails word count, mean-len floor and stopwords") {
    val r = run("xy zz") // 2 words, 4 chars: mean 2 < 3 floor
    assert(r.getAs[Int]("ok_word_count") === 0)
    assert(r.getAs[Int]("ok_stopwords") === 0)
    assert(r.getAs[Int]("ok_mean_len") === 0)
    assert(r.getAs[Int]("ok_alpha") === 1)
    assert(r.getAs[Int]("passes") === 0)
  }

  test("symbol-heavy doc fails the symbol and alpha ratios") {
    val r = run((Seq.fill(30)("###") ++ Seq("the", "and")).mkString(" "))
    assert(r.getAs[Long]("n_symbol_words") === 30L)
    assert(r.getAs[Int]("ok_symbol") === 0) // 300 > 32
    assert(r.getAs[Int]("ok_alpha") === 0)  // 20 < 256/10
    assert(r.getAs[Int]("ok_mean_len") === 1) // 96 == 32*3 boundary
    assert(r.getAs[Int]("passes") === 0)
  }

  test("overlong mean word length fails only ok_mean_len") {
    val r = run((Seq.fill(30)("abcdefghijkl") ++ Seq("the", "and")).mkString(" "))
    assert(r.getAs[Long]("sum_word_chars") === 366L) // 32*10 = 320 < 366
    assert(r.getAs[Int]("ok_mean_len") === 0)
    assert(r.getAs[Int]("ok_word_count") === 1)
    assert(r.getAs[Int]("ok_alpha") === 1)
    assert(r.getAs[Int]("ok_stopwords") === 1)
    assert(r.getAs[Int]("passes") === 0)
  }
}
