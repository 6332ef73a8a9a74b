package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Tables, Warehouse}
import graft.llmops.{AnnIndex, ProductQuant, Similarity}

/** Persisted ANN index artifacts: the serving paths must return EXACTLY
  * what their self-contained (oracle-gated) twins return — so artifact
  * serving is transitively pinned to the DuckDB oracles — and their
  * plans must contain no corpus signature/encode kernel (the whole point
  * of materializing the index). */
class AnnIndexSpec extends AnyFunSuite {
  import TestSession._

  private val isQuery = expr("vec_id < 10")
  private val isCent = expr("vec_id % 29 = 3")
  private def emb = Tables.load(spark, sf, "embeddings")
  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("ann_idx").toString)

  private def typedVecs(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
        size(col("embedding")) === Similarity.Dim)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("lshTopKFrom over a warehouse signature table equals the oracle-gated lshTopK") {
    val wh = freshWh()
    AnnIndex.saveLshIndex(wh, "idx", "sigs", emb)
    val sigs = wh.read("idx", "sigs")
    val served = AnnIndex.lshTopKFrom(emb, sigs, isQuery)
    assert(rows(served) === rows(Similarity.lshTopK(emb, isQuery)))
    // plan shape: the query batch's signatures are a local relation, the
    // artifact is scanned instead of re-signing the corpus — embeddings
    // parquet appears ONCE (candidate vector fetch), the signature
    // kernel's corpus pass not at all
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE repeats scans in the initial plan
    assert(plan.contains("LocalTableScan"), plan.take(1500))
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected artifact + one vector fetch, got $scans scans:\n${plan.take(1500)}")
  }

  test("lshMultiProbeTopKFrom serves multi-probe results from the UNCHANGED signature artifact") {
    val wh = freshWh()
    AnnIndex.saveLshIndex(wh, "idx", "sigs", emb)
    val sigs = wh.read("idx", "sigs")
    val served = AnnIndex.lshMultiProbeTopKFrom(emb, sigs, isQuery)
    // served ≡ in-pass multi-probe, over the same artifact base LSH uses:
    // the recall lift is pure query-side probing, zero index maintenance
    assert(rows(served) === rows(Similarity.lshMultiProbeTopK(emb, isQuery)))
    // multi-probe candidates are a superset, so every query still serves
    assert(served.select("query_id").distinct().count() ===
      AnnIndex.lshTopKFrom(emb, sigs, isQuery).select("query_id").distinct().count())
  }

  test("pqTopKFromCodes over a warehouse codes table equals pqTopK; ADC plan reads no embedding") {
    val wh = freshWh()
    import spark.implicits._
    val cbSrc = typedVecs(emb).filter(isCent)
      .as[(Long, Array[Double])].collect()
    val cb = ProductQuant.buildCodebook(cbSrc)
    AnnIndex.savePqCodes(wh, "idx", "codes", emb, cb)
    val codes = wh.read("idx", "codes")
    val served = AnnIndex.pqTopKFromCodes(emb, codes, cb, isQuery)
    assert(rows(served) === rows(ProductQuant.pqTopK(emb, isQuery, isCent)))
    // the ADC scan reads ONLY the codes artifact: exactly one file scan,
    // and it is not the embeddings fixture (queries were pre-collected)
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE repeats scans in the initial plan
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"ADC plan must scan only the codes table:\n${plan.take(1500)}")
    assert(!plan.contains("embeddings.parquet"),
      s"ADC plan touched raw embeddings:\n${plan.take(1500)}")
  }

  test("append-only maintenance: build(A) + append(B) serves identically to a full rebuild") {
    val wh = freshWh()
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    AnnIndex.saveLshIndex(wh, "idx", "sigs", a)
    AnnIndex.appendLshIndex(wh, "idx", "sigs", b)
    val served = AnnIndex.lshTopKFrom(emb, wh.read("idx", "sigs"), isQuery)
    assert(rows(served) === rows(Similarity.lshTopK(emb, isQuery)))
  }

  test("append-only PQ codes: build(A) + append(B) against one frozen codebook ≡ full rebuild") {
    val wh = freshWh()
    import spark.implicits._
    val cbSrc = typedVecs(emb).filter(isCent)
      .as[(Long, Array[Double])].collect()
    val cb = ProductQuant.buildCodebook(cbSrc)
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    AnnIndex.savePqCodes(wh, "idx", "codes", a, cb)
    AnnIndex.appendPqCodes(wh, "idx", "codes", b, cb)
    val served = AnnIndex.pqTopKFromCodes(emb, wh.read("idx", "codes"), cb, isQuery)
    assert(rows(served) === rows(ProductQuant.pqTopK(emb, isQuery, isCent)))
  }

  test("append-only IVF members: build(A) + append(B) against one frozen quantizer ≡ rebuild") {
    import graft.llmops.Dedup
    val wh = freshWh()
    val centroids = Similarity.trainIvfCentroids(emb, isCent, iterations = 0)
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    AnnIndex.saveIvfMembers(wh, "idx", "cells", a, centroids)
    AnnIndex.appendIvfMembers(wh, "idx", "cells", b, centroids)
    val appended = wh.read("idx", "cells")
    val rebuilt = Dedup.cellAssignments(emb, centroids)
    assert(rows(AnnIndex.ivfTopKFrom(emb, appended, centroids, isQuery)) ===
      rows(AnnIndex.ivfTopKFrom(emb, rebuilt, centroids, isQuery)))
  }

  test("ivfTopKFrom over the shared (vec_id, cell_id) artifact equals ivfTopK") {
    import graft.llmops.Dedup
    val wh = freshWh()
    // iterations=0 reproduces the init sample, so the artifact serving
    // path is comparable 1:1 with the oracle-gated sampled ivfTopK
    val centroids = Similarity.trainIvfCentroids(emb, isCent, iterations = 0)
    wh.overwrite("idx", "cells", Dedup.cellAssignments(emb, centroids))
    val assign = wh.read("idx", "cells")
    val served = AnnIndex.ivfTopKFrom(emb, assign, centroids, isQuery)
    assert(rows(served) === rows(Similarity.ivfTopK(emb, isQuery, isCent)))
    // the assignment kernel never runs at query time: the plan scans the
    // artifact (cell-filtered) plus one vector fetch
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"expected artifact + one vector fetch, got $scans:\n${plan.take(1500)}")
    // and the SAME artifact table drives SemDeDup — search and dedup
    // literally share the quantizer output
    val dedup = Dedup.semanticDedupFrom(emb, assign)
    assert(dedup.count() === assign.count())
  }

  test("codes artifact is 8 small ints per vector — the 64x IO cut is real") {
    val cb = ProductQuant.buildCodebook(
      { import spark.implicits._
        typedVecs(emb).filter(isCent).as[(Long, Array[Double])].collect() })
    val codes = AnnIndex.buildPqCodes(emb, cb)
    val r = codes.head()
    assert(r.getSeq[Int](1).length === ProductQuant.M)
    assert(codes.count() === typedVecs(emb).count())
    val all = codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(all.getInt(0) >= 0 && all.getInt(1) < ProductQuant.Codes)
  }

  test("DEFAULT path ivfpqTopKFrom: artifact serving == self-contained residual IVF-ADC; plan reads codes, not embeddings, pre-rerank") {
    val wh = freshWh()
    val cents = Similarity.collectCentroids(
      Similarity.trainIvfCentroids(emb, isCent, iterations = 2))
    val cb = ProductQuant.residualCodebook(emb, cents,
      expr("vec_id % 29 = 7 AND vec_id >= 10"))
    AnnIndex.saveIvfPqIndex(wh, "idx", "ivfpq", emb, cents, cb)
    val index = wh.read("idx", "ivfpq")
    val served = AnnIndex.ivfpqTopKFrom(emb, index, cents, cb, isQuery,
      nprobe = ProductQuant.IvfPqNProbe)
    val self = ProductQuant.ivfpqResidualTopKWith(emb, isQuery, cents, cb,
      nprobe = ProductQuant.IvfPqNProbe)
    assert(rows(served) === rows(self),
      "artifact serving must equal the self-contained kernel exactly")
    assert(served.select("query_id").distinct().count() > 0)
  }

  test("DEFAULT path index maintenance: build(A) + append(B) serves EXACTLY like a full rebuild") {
    val wh = freshWh()
    val cents = Similarity.collectCentroids(
      Similarity.trainIvfCentroids(emb, isCent, iterations = 2))
    val cb = ProductQuant.residualCodebook(emb, cents,
      expr("vec_id % 29 = 7 AND vec_id >= 10"))
    val a = emb.filter(col("vec_id") % 3 =!= 0)
    val b = emb.filter(col("vec_id") % 3 === 0)
    AnnIndex.saveIvfPqIndex(wh, "idx", "inc", a, cents, cb)
    AnnIndex.appendIvfPqIndex(wh, "idx", "inc", b, cents, cb)
    AnnIndex.saveIvfPqIndex(wh, "idx", "full", emb, cents, cb)
    val viaInc = AnnIndex.ivfpqTopKFrom(emb, wh.read("idx", "inc"),
      cents, cb, isQuery)
    val viaFull = AnnIndex.ivfpqTopKFrom(emb, wh.read("idx", "full"),
      cents, cb, isQuery)
    assert(rows(viaInc) === rows(viaFull))
  }

  test("adaptive grid sizing: m(n) = round(sqrt(n)/c); bench-SF values pinned bit-for-bit") {
    assert(Similarity.adaptiveGridModulus(2000) === 29L) // sampled grid at sf0.1 — the historical 69-cell layout
    assert(Similarity.adaptiveGridModulus(500) === 15L)  // sampled grid at the driver fixtures
    assert(Similarity.adaptiveGridModulus(2000,
      ProductQuant.IvfPqTrainedCellsPerSqrtN) === 7L)    // trained grid at sf0.1 — the r12 286-cell quantizer
    assert(ProductQuant.trainedInitSql(2000) === "vec_id % 7 = 3")
    // cells ∝ √n: each corpus decade grows members-per-cell (and cells) ~√10×
    assert(Similarity.adaptiveGridModulus(20000) === 92L)
    assert(Similarity.adaptiveGridModulus(200000) === 290L)
    assert(Similarity.adaptiveCentroidSqlFor(2) === "vec_id % 2 = 1") // residue stays valid at tiny m
  }

  test("trainAdaptiveQuantizers sizes the grid from the corpus and serves via the standard artifact path") {
    val (cents, cb) = AnnIndex.trainAdaptiveQuantizers(emb, iterations = 2)
    val n = typedVecs(emb).count()
    val expectCells = typedVecs(emb)
      .filter(expr(ProductQuant.trainedInitSql(n))).count()
    assert(cents.length.toLong === expectCells,
      s"one init row per cell: got ${cents.length}, expected $expectCells")
    val wh = freshWh()
    AnnIndex.saveIvfPqIndex(wh, "idx", "ad", emb, cents, cb)
    val served = AnnIndex.ivfpqTopKFrom(emb, wh.read("idx", "ad"), cents, cb, isQuery)
    val self = ProductQuant.ivfpqResidualTopKWith(emb, isQuery, cents, cb,
      nprobe = ProductQuant.IvfPqTrainedNProbe)
    assert(rows(served) === rows(self))
  }

  test("retrainAdvice: fresh index is quiet; corpus growth trips SIZE; distribution shift trips DRIFT") {
    val (cents, _) = AnnIndex.trainAdaptiveQuantizers(emb, iterations = 3)
    val fresh = AnnIndex.retrainAdvice(emb, cents)
    assert(!fresh.retrain, fresh.toString)
    // 9x corpus, same distribution (shifted ids): the cells ∝ √n target
    // triples while member means stay put — SIZE fires alone
    val grown = (0 until 9).map(r => typedVecs(emb)
        .select((col("vec_id") + lit(r * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
    val g = AnnIndex.retrainAdvice(grown, cents)
    assert(g.sizeRetrain && !g.driftRetrain && g.retrain, g.toString)
    // negated corpus: every vector re-assigns to its most-OPPOSITE cell,
    // so member means anti-correlate with the trained centroids — DRIFT
    val neg = typedVecs(emb).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val d = AnnIndex.retrainAdvice(neg, cents)
    assert(d.driftRetrain && !d.sizeRetrain, d.toString)
  }

  test("quantizers round-trip through the warehouse") {
    val (cents, cb) = AnnIndex.trainAdaptiveQuantizers(emb, iterations = 2)
    val wh = freshWh()
    AnnIndex.saveQuantizers(wh, "idx", "quant", cents, cb)
    val (c2, cb2) = AnnIndex.loadQuantizers(wh, "idx", "quant")
    assert(c2.map(_._1).toSeq === cents.map(_._1).toSeq)
    assert(c2.map(_._2.toSeq).toSeq === cents.map(_._2.toSeq).toSeq)
    assert(cb2.length === cb.length)
    assert(cb2.map(_.map(_._1.toSeq).toSeq).toSeq
      === cb.map(_.map(_._1.toSeq).toSeq).toSeq)
  }

  test("nightly sweep: registered index reports retrain advice; failures isolate per table") {
    val wh = freshWh()
    // the corpus lives in the same warehouse so the sweep can re-read it
    wh.overwrite("idx", "corpus", typedVecs(emb))
    val (cents, cb) = AnnIndex.trainAdaptiveQuantizers(emb, iterations = 2)
    AnnIndex.saveIvfPqIndexRegistered(wh, "idx", "annidx", "quant",
      "idx", "corpus", emb, cents, cb)
    // fresh: the sweep reports the index healthy, other tables silent
    val fresh = wh.maintainDataset("idx",
      indexAdvisor = Some(AnnIndex.advisor(wh)))
    val idxRow = fresh.find(_.table == "annidx").get
    assert(idxRow.indexAdvice.exists(_.startsWith("ok")), idxRow.toString)
    assert(fresh.find(_.table == "corpus").get.indexAdvice.isEmpty)
    // grow the corpus 9x (same distribution): the next sweep trips SIZE
    val grown = (0 until 9).map(r => typedVecs(emb)
        .select((col("vec_id") + lit(r * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_.unionByName(_))
    wh.overwrite("idx", "corpus", grown)
    val after = wh.maintainDataset("idx",
      indexAdvisor = Some(AnnIndex.advisor(wh)))
    val adv = after.find(_.table == "annidx").get.indexAdvice
    assert(adv.exists(_.contains("retrain(size)")), adv.toString)
    // per-table failure isolation: a corrupt registry marker fails ONLY
    // its own table's advice, never the sweep
    wh.overwrite("idx", "broken", typedVecs(emb).limit(5))
    wh.setMeta("idx", "broken", wh.meta("idx", "broken").copy(description =
      Some("graft-ann-index corpus=idx.missing quantizers=idx.alsomissing")))
    val mixed = wh.maintainDataset("idx",
      indexAdvisor = Some(AnnIndex.advisor(wh)))
    assert(mixed.find(_.table == "broken").get.indexAdvice
      .exists(_.startsWith("advice failed")), mixed.toString)
    assert(mixed.find(_.table == "annidx").get.indexAdvice.isDefined)
    // standalone sweep form skips the broken registration quietly
    val swept = AnnIndex.sweepRetrainAdvice(wh, "idx")
    assert(swept.map(_._1) === Seq("annidx"))
    assert(swept.head._2.sizeRetrain)
  }
}
