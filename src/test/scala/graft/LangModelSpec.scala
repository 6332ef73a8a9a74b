package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.LangModel

/** Pins the add-one bigram LM algebra on a corpus small enough to count
  * by hand, plus the exclusion contracts (the oracle-gated `lm_fluency`
  * covers the fixture end to end). */
class LangModelSpec extends AnyFunSuite {
  import TestSession._

  test("bigramFluency: hand-counted smoothed probabilities, exact integers") {
    import spark.implicits._
    // corpus: "a b" ×2, "a b c" — vocab {a,b,c} V=3
    // bigram counts: (a,b)=3, (b,c)=1; context counts: a=3, b=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = LangModel.bigramFluency(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_p_micros"),
          r.getAs[Long]("min_p_micros"), r.getAs[Long]("avg_p_micros")))
      .toMap
    // p(b|a) = (3+1)/(3+3) = 2/3 -> 666666; p(c|b) = (1+1)/(1+3) = 1/2
    assert(got(1L) === ((1L, 666666L, 666666L, 666666L)))
    assert(got(2L) === ((1L, 666666L, 666666L, 666666L)))
    // doc 3: bigrams (a,b) and (b,c): 666666 + 500000 = 1166666, avg 583333
    assert(got(3L) === ((2L, 1166666L, 500000L, 583333L)))
  }

  test("bigramFluency: repeated bigram multiplicity rides k, not extra rows") {
    import spark.implicits._
    // "x y x y" has bigrams (x,y)×2 and (y,x)×1 — n_bigrams=3
    val docs = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val row = LangModel.bigramFluency(docs).collect().head
    assert(row.getAs[Long]("n_bigrams") === 3L)
    // c(x,y)=2, c(x)=2; c(y,x)=1, c(y)=1; V=2
    // p(y|x) = 3/4 -> 750000 (×2), p(x|y) = 2/3 -> 666666
    assert(row.getAs[Long]("sum_p_micros") === 2 * 750000L + 666666L)
    assert(row.getAs[Long]("min_p_micros") === 666666L)
  }

  test("train once, score many: stored model tables serve two scoring runs without retraining") {
    import spark.implicits._
    val wh = new graft.core.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_lm_wh").toString)
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    // ONE training pass, persisted as warehouse tables
    LangModel.saveModel(wh, "models", "lm", LangModel.trainBigramModel(corpus))
    val stored = LangModel.loadModel(wh, "models", "lm")
    // run 1: full corpus from the stored model == the self-trained form
    val full = LangModel.scoreWithModel(corpus, stored).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sum_p_micros")).toMap
    val self = LangModel.bigramFluency(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sum_p_micros")).toMap
    assert(full === self)
    // run 2: a 1-doc slice still scores with FULL-corpus counts — proof the
    // model came from the store, not from retraining on the slice (self-
    // training on just doc 3 would give p(b|a)=(1+1)/(1+3)=500000, not 666666)
    val slice = LangModel.scoreWithModel(
      corpus.filter($"doc_id" === 3L), stored).collect()
    assert(slice.map(_.getAs[Long]("doc_id")).toSet === Set(3L))
    assert(slice.head.getAs[Long]("min_p_micros") === 500000L)
    assert(slice.head.getAs[Long]("sum_p_micros") === 1166666L)
    // and the scoring PLAN contains no aggregate over the corpus text —
    // its leaves are the stored parquet fragments plus the doc slice
    val plan = LangModel.scoreWithModel(corpus, stored)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("countDistinct"), "scoring plan retrains vocab:\n" + plan)
  }

  test("bigramFluency: NULLs and sub-2-token docs are excluded, but their absence changes nothing else") {
    import spark.implicits._
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "a b"),
      (java.lang.Long.valueOf(2L), "single"),   // no transition
      (java.lang.Long.valueOf(3L), null),        // NULL text
      (null.asInstanceOf[java.lang.Long], "a b") // NULL id
    ).toDF("doc_id", "text")
    val got = LangModel.bigramFluency(docs).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
    // vocab still counts the single-token doc's word: V = {a,b,single} = 3
    // c(a,b)=1, c(a)=1 -> p = 2/4 = 500000
    assert(got.head.getAs[Long]("sum_p_micros") === 500000L)
  }

  test("trigramBackoffScores: each backoff level hand-computed, vocabulary floor is 0") {
    import spark.implicits._
    // train "a b c a b c": c123(abc)=2, c23(bc)=2, c2(b)=2, c3(c)=2, N=4
    val train = Seq((100L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"), // seen trigram: 1e6*2 div 2 = 1000000
      (2L, "x b c"), // bigram backoff: (4 * (1e6*2 div 2)) div 10 = 400000
      (3L, "x y c"), // unigram backoff: (16 * (1e6*2 div 4)) div 100 = 80000
      (4L, "x y z")) // never-seen vocab: 0
      .toDF("doc_id", "text")
    val got = graft.llmops.LangModel.trigramBackoffScores(score, train)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((1L, 1000000L, 0L)))
    assert(got(2L) === ((1L, 400000L, 1L)))
    assert(got(3L) === ((1L, 80000L, 1L)))
    assert(got(4L) === ((1L, 0L, 1L)))
  }

  test("perplexityBuckets: per-language terciles, ordered and equal-population at mod=1") {
    import spark.implicits._
    // per lang: 6 docs spanning distinct fluency levels — doc i mixes i
    // copies of the corpus-common bigram run with unique gibberish, so
    // avg transition probability strictly increases with i
    val docs = (for {
      lang <- Seq("en", "de")
      i <- 1 to 6
    } yield {
      val id = (if (lang == "en") 0L else 100L) + i
      val common = Seq.fill(i * 3)("a a b").mkString(" ")
      val junk = (1 to (7 - i) * 2).map(j => s"z${lang}${i}x$j").mkString(" ")
      (id, lang, s"$common $junk")
    }).toDF("doc_id", "lang", "text")
    val got = graft.llmops.LangModel.perplexityBuckets(docs, sampleMod = 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.length === 12)
    for (lang <- Seq("en", "de")) {
      val rows = got.filter(_._2 == lang)
      val byBucket = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      // ceil-rank terciles over 6 distinct scores: exactly 2/2/2
      assert(byBucket.keySet === Set("tail", "middle", "head"))
      assert(byBucket.values.forall(_.length === 2), rows.mkString(", "))
      // ordering: every tail score < every middle score < every head score
      assert(byBucket("tail").max < byBucket("middle").min)
      assert(byBucket("middle").max < byBucket("head").min)
    }
    // rerun-deterministic (hash gate + exact integer scores)
    val again = graft.llmops.LangModel.perplexityBuckets(docs, sampleMod = 1)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(again === got.map(r => (r._1, r._4)).toSet)
  }
}
