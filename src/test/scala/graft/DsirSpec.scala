package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Dsir

/** Pins the DSIR micro-unit ratio algebra on hand-computed corpora (the
  * oracle-gated `dsir_weights` covers the fixture end to end). */
class DsirSpec extends AnyFunSuite {
  import TestSession._

  private def score(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    Dsir.dsirWeights(rows.toDF("doc_id", "lang", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_feats"), r.getAs[Long]("score_micros"))).toMap
  }

  test("hand-computed smoothed ratios; scoring ignores the doc's own lang") {
    // Both docs say "x x x": features u:x ×3 and b:'x x' ×2 each.
    // Nr=10, Nt=5; u:x has cr=6, ct=3; b:x x has cr=4, ct=2.
    // w(u:x)  = (4·(10+4096)·1e6) div (7·(5+4096)) = 572125
    // w(b:xx) = (3·(10+4096)·1e6) div (5·(5+4096)) = 600731
    // score   = 3·572125 + 2·600731 = 2917837 for BOTH docs — the model
    // is corpus-level, a doc's own lang never enters its own score.
    val got = score(Seq((1L, "en", "x x x"), (2L, "de", "x x x")))
    assert(got(1L) === ((5L, 2917837L)))
    assert(got(2L) === ((5L, 2917837L)))
  }

  test("target-only features outscore raw-only features") {
    val got = score(Seq((1L, "en", "aa aa aa"), (2L, "de", "bb bb bb")))
    assert(got(1L)._2 > got(2L)._2)
  }

  test("NULL lang is non-target but still scored; empty target survives") {
    val got = score(Seq((1L, null, "cc cc"), (2L, null, "cc cc")))
    // nt = 0: weights are the uniform-smoothing floor, still defined
    assert(got(1L) === got(2L))
    assert(got(1L)._1 === 3L)
  }

  test("overflow guard fails loudly at the domain bound instead of wrapping") {
    import spark.implicits._
    val docs = Seq((1L, "en", "x x x")).toDF("doc_id", "lang", "text")
    // micro near Long.MaxValue drives safeCap div (Nr+B) to 0 — the same
    // (ct+1) > cap condition a 10^12-token corpus would hit at micro=1e6
    val e = intercept[Exception] {
      Dsir.dsirWeights(docs, "en", micro = Long.MaxValue / 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("DSIR integer-ratio overflow")),
      s"expected the pointed overflow error, got: ${msgs(e).mkString(" | ")}")
    // the default micro scale on the same corpus is untouched
    assert(Dsir.dsirWeights(docs, "en").collect().nonEmpty)
  }

  test("dsirResample keeps target-like docs at a higher rate; acceptance = min(1, w·base)") {
    import spark.implicits._
    // target slice speaks pure "aa", off-target pure "zz": docs of each
    // kind get sharply different mean weights, so the kept-rate gap is
    // structural, not sampling noise
    val docs = ((1L to 200L).map(i => (i, "en", "aa aa aa aa")) ++
      (1000L to 1200L).map(i => (i, "de", "zz zz zz zz")))
      .toDF("doc_id", "lang", "text")
    val kept = Dsir.dsirResample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(kept.nonEmpty)
    // replay the acceptance arithmetic from the oracle-gated weights
    val w = Dsir.dsirWeights(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("score_micros") / r.getAs[Long]("n_feats"))).toMap
    val md = graft.llmops.Kernels.newMd5()
    val expected = w.flatMap { case (id, wm) =>
      val acc = math.min(1000000L, wm * Dsir.SampleBasePer1M / 1000000L)
      val draw = java.lang.Math.floorMod(
        graft.llmops.Kernels.md5Long(md, s"dsir:$id"), 1000000L)
      if (draw < acc) Some((id, wm, acc)) else None
    }.toSet
    assert(kept.toSet === expected)
    // proportionality: the target-like population keeps a strictly
    // higher fraction than the off-target one
    val tgtRate = kept.count(_._1 < 1000L).toDouble / 200.0
    val offRate = kept.count(_._1 >= 1000L).toDouble / 201.0
    assert(tgtRate > offRate + 0.2, s"target $tgtRate vs off $offRate")
    // the cap binds: no acceptance above 1e6
    assert(kept.forall(_._3 <= 1000000L))
  }
}
