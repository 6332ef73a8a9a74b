package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
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

  test("symbol inventory: hash, both ellipsis forms and every bullet glyph count") {
    // one symbol word per inventory class in an otherwise-passing doc
    Seq("#tag", "wait...", "so…", "•item", "‣item", "▪item").foreach { sym =>
      val r = run((Seq.fill(28)("the and") :+ sym :+ "plain").flatMap(_.split(" "))
        .mkString(" "))
      assert(r.getAs[Long]("n_symbol_words") === 1L, s"inventory member $sym")
    }
    // plain words with dots/dashes are NOT symbol words (two dots ≠ ellipsis)
    val clean = run((Seq.fill(15)("the and") :+ "a.. b-c d.e").flatMap(_.split(" "))
      .mkString(" "))
    assert(clean.getAs[Long]("n_symbol_words") === 0L)
    // ratio: 4 symbol words in 36 fails (40 > 36), 3 in 36 passes (30 <= 36)
    val fourIn36 = run((Seq.fill(16)("the and") ++ Seq.fill(4)("#x")).mkString(" "))
    assert(fourIn36.getAs[Long]("n_words") === 36L)
    assert(fourIn36.getAs[Int]("ok_symbol") === 0)
    val threeIn36 = run((Seq.fill(16)("the and") ++ Seq.fill(3)("#x") :+ "ok").mkString(" "))
    assert(threeIn36.getAs[Int]("ok_symbol") === 1)
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

  test("corpusReport aggregates equal the per-doc verdict replay; NULL lang coalesces") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pass = Seq.fill(15)("the and").mkString(" ") // passes all rules
    val fail = "too short"
    val docs = Seq(
      (1L, "a", "en", pass), (2L, "a", "en", pass), (3L, "a", "de", fail),
      (4L, "b", null.asInstanceOf[String], pass), (5L, "b", "fr", fail))
      .toDF("doc_id", "source", "lang", "text")
    val got = graft.llmops.CorpusStats.corpusReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Long]("sum_tokens") === 62L)       // 30 + 30 + 2
    assert(a.getAs[Double]("mean_tokens") === 20.67)  // floor(62/3·100+0.5)/100
    assert(a.getAs[Long]("n_quality_pass") === 2L)
    assert(a.getAs[Long]("pass_bp") === 6666L)        // 2·10000 div 3
    assert(a.getAs[String]("top_lang") === "en" &&
      a.getAs[Long]("top_lang_docs") === 2L)
    val b = got("b")
    // NULL lang groups as '?'; 1-vs-1 tie breaks to the smaller label
    assert(b.getAs[Long]("n_docs") === 2L && b.getAs[Long]("n_quality_pass") === 1L)
    assert(b.getAs[String]("top_lang") === "?")
    // carryCols leaves the oracle-gated per-doc schema untouched
    assert(QualityRules.gopherRules(docs.select(col("doc_id"), col("text")))
      .columns.head === "doc_id")
  }

  test("corpusReport is one corpus pass and no join: windows over the source×lang roll-up") {
    val fixture = graft.core.Tables.load(spark, TestSession.sf, "documents")
    val report = graft.llmops.CorpusStats.corpusReport(fixture)
    report.collect() // materialize so AQE prints the final plan
    val plan = report.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1,
      s"corpusReport must scan the corpus exactly once:\n${plan.take(2000)}")
    assert(!plan.contains("Join"),
      s"totals and dominant language must share windows, not join:\n${plan.take(2000)}")
  }

  test("blocklistFilter: exact-token hits only, basis points, NULL pins clean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "slow dup slow fine"), // 3 of 4 banned
      (2L, "all clean words here"),
      (3L, "slower duplicate"), // substrings must NOT match
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.llmops.QualityRules.blocklistFilter(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((4L, 3L, 7500L, true)))
    assert(got(2L) === ((4L, 0L, 0L, false)))
    assert(got(3L) === ((2L, 0L, 0L, false)))
    assert(got(4L) === ((1L, 0L, 0L, false)))
  }

  test("corpusReport partials merge by addition to exactly the one-shot report") {
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      val src = s"s${i % 3}"
      val lang = if (i % 4 == 0) "de" else "en"
      (i, src, lang, ("the of and to in is " * 12).trim + s" tail$i")
    }.toDF("doc_id", "source", "lang", "text")
    val oneShot = graft.llmops.CorpusStats.corpusReport(docs)
      .collect().map(_.toSeq).toSet
    // three disjoint slices, partials merged in a different order
    val parts = Seq(0, 1, 2).map(k =>
      graft.llmops.CorpusStats.corpusReportPartial(docs.filter(col("doc_id") % 3 === k)))
    val merged = graft.llmops.CorpusStats.corpusReportFinalize(
      parts(2).unionByName(parts(0)).unionByName(parts(1)))
      .collect().map(_.toSeq).toSet
    assert(merged === oneShot)
    assert(oneShot.nonEmpty)
  }
}
