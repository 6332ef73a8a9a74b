package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.{Kernels, Similarity}

/** IVF k-means trainer invariants (the trained path is deliberately not
  * oracle-gated — iterative + shuffle-order FP means no bit-stable SQL
  * replica — so the spec carries the correctness burden):
  * k stays constant, the spherical-k-means objective does not degrade,
  * and the served top-k contract holds against trained centroids. */
class SimilaritySpec extends AnyFunSuite {
  import TestSession._

  private val isInit = expr("vec_id % 29 = 3")
  private def emb = Tables.load(spark, sf, "embeddings")

  private def corpus(): Array[(Long, Array[Double])] =
    emb.select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def centsOf(df: org.apache.spark.sql.DataFrame): Array[(Long, Array[Double], Double)] =
    df.select(col("cid"), col("centroid")).collect()
      .map(r => {
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, Kernels.norm(v))
      }).sortBy(_._1)

  /** Mean cosine of every vector to its assigned centroid. */
  private def objective(cents: Array[(Long, Array[Double], Double)]): Double = {
    val docs = corpus()
    val byId = cents.map(c => c._1 -> c).toMap
    docs.map { case (_, v) =>
      val nrm = Kernels.norm(v)
      val cid = Kernels.assignCentroid(v, nrm, cents)
      val c = byId(cid)
      Kernels.dot(v, c._2) / (nrm * c._3)
    }.sum / docs.length
  }

  test("k-means keeps k constant and does not degrade the cosine objective") {
    val init = Similarity.trainIvfCentroids(emb, isInit, iterations = 0)
    val trained = Similarity.trainIvfCentroids(emb, isInit, iterations = 5)
    val initCents = centsOf(init)
    val trainedCents = centsOf(trained)
    assert(trainedCents.length === initCents.length)
    assert(trainedCents.map(_._1).toSeq === initCents.map(_._1).toSeq) // stable cids
    val before = objective(initCents)
    val after = objective(trainedCents)
    assert(after >= before - 1e-9, s"objective degraded: $before -> $after")
    assert(after > before + 1e-4, s"training never moved the centroids: $before -> $after")
  }

  test("served top-k against trained centroids honors the rank contract") {
    val trained = Similarity.trainIvfCentroids(emb, isInit, iterations = 3)
    val topk = Similarity.ivfTopKTrained(emb, expr("vec_id < 10"), trained)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.values.foreach { rs =>
      val ranks = rs.map(_.getInt(2)).sorted.toSeq
      assert(ranks === (1 to rs.length)) // dense ranks from 1
      assert(rs.length <= Similarity.TopK)
      // scores are sorted by rank (desc), neighbor != query
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _ => true
      })
      assert(rs.forall(r => r.getLong(1) != r.getLong(0)))
    }
  }

  test("IVF recall rises monotonically with nprobe and reaches 1.0 at nlist") {
    // recall@k vs the brute-force ground truth: probing more cells can
    // only grow each query's candidate set, so recall is non-decreasing
    // in nprobe, and probing EVERY cell is exhaustive search — the knob's
    // at-scale contract (recall cliff control) verified on the fixture
    val isQuery = expr("vec_id < 10")
    val isCent = expr("vec_id % 29 = 3")
    val nlist = emb.filter(isCent).count().toInt
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = resultSet(Similarity.bruteForceTopK(emb, isQuery))
    val recalls = Seq(1, 2, 4, nlist).map { p =>
      val got = resultSet(Similarity.ivfTopK(emb, isQuery, isCent, nprobe = p))
      (got & truth).size.toDouble / truth.size
    }
    recalls.sliding(2).foreach {
      case Seq(lo, hi) => assert(hi >= lo, s"recall fell: $recalls")
      case _ =>
    }
    assert(recalls.head > 0.0 && recalls.head < 1.0,
      s"nprobe=1 should be a real (lossy) probe on this fixture: $recalls")
    assert(recalls.last === 1.0, s"probing all $nlist cells must be exact: $recalls")
  }

  test("rankEval: precision/RR algebra on hand-built rankings") {
    import spark.implicits._
    def frame(rows: (Long, Long, Long)*) =
      rows.toDF("query_id", "neighbor_id", "rank")
    val exact = frame((1L, 100L, 1L), (1L, 101L, 2L), (2L, 200L, 1L), (2L, 201L, 2L))
    // q1: both relevant, first at rank 1 -> precision 10000, rr 1e6
    // q2: one relevant buried at rank 2 -> precision 5000, rr 5e5
    val approx = frame((1L, 100L, 1L), (1L, 101L, 2L),
      (2L, 999L, 1L), (2L, 200L, 2L))
    val got = graft.llmops.Similarity.rankEval(exact, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((2L, 10000L, 1000000L)),
      2L -> ((1L, 5000L, 500000L))))
    // nothing relevant surfaced: rr is 0, never a crash or null
    val miss = graft.llmops.Similarity.rankEval(exact,
      frame((1L, 998L, 1L), (1L, 999L, 2L))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(miss.toSeq === Seq((0L, 0L, 0L)))
  }

  test("annRecall side-channel: recall floors and candidate-cost honesty") {
    val got = graft.llmops.RecallReport.annRecall(spark, sf).toMap
    assert(got.keySet === Set("lsh", "lsh_multiprobe", "ivf_nprobe2",
      "ivf_nprobe4", "ivf_nprobe16", "ivf_trained_nprobe16", "pq_sampled",
      "pq_trained", "ivfpq", "ivfpq_trained"))
    val n = emb.count().toDouble
    got.foreach { case (k, s) =>
      assert(s.recall >= 0.0 && s.recall <= 1.0, s"$k recall ${s.recall} out of range")
      assert(s.candsPerQuery >= 0.0 && s.candsPerQuery <= n - 1,
        s"$k cands_per_query ${s.candsPerQuery} out of [0, ${n - 1}]")
    }
    // widening the probe set can only add candidates
    assert(got("ivf_nprobe4").recall >= got("ivf_nprobe2").recall,
      s"nprobe recall fell: $got")
    assert(got("ivf_nprobe16").recall >= got("ivf_nprobe4").recall,
      s"nprobe recall fell: $got")
    // RECALL FLOORS — the r10 verdict's "ANN serving weak" regression
    // gates. The fixture, planes, and sampled quantizers are fully
    // deterministic, so sampled-path recalls are exact constants
    // (measured r11: lsh 0.73, ivf16 0.97, ivfpq 0.70 at this SF);
    // trained paths go through shuffle-order FP means, so their floors
    // keep a wider margin. A parameter change that collapses retrieval
    // (the r10 single-signature LSH measured 0.03) fails here loudly.
    assert(got("lsh").recall >= 0.6, s"multi-band LSH recall collapsed: $got")
    // multi-probe candidates are a SUPERSET of the base buckets, so its
    // recall dominates by construction; the floor pins the measured gain
    assert(got("lsh_multiprobe").recall >= got("lsh").recall,
      s"multi-probe recall fell below base LSH: $got")
    assert(got("lsh_multiprobe").recall >= 0.7,
      s"multi-probe LSH recall collapsed: $got")
    assert(got("ivf_nprobe16").recall >= 0.9, s"serve-width IVF recall fell: $got")
    assert(got("ivf_trained_nprobe16").recall >= 0.8,
      s"trained IVF recall fell: $got")
    assert(got("ivfpq").recall >= 0.55, s"IVF-ADC+rerank recall fell: $got")
    // residual encoding + the fine 7-residue coarse grid (r12): measured
    // 0.71@11% at sf0.1; this fixture probes a larger corpus fraction so
    // the floor sits well under the measured value while still far above
    // the pre-residual 0.50
    assert(got("ivfpq_trained").recall >= 0.65, s"trained IVF-ADC recall fell: $got")
    // COST HONESTY — recall may never be bought with a hidden full scan:
    // every pruning index must score strictly fewer candidates than
    // brute force (pure PQ is exempt by design: it compresses, scans all)
    Seq("lsh", "lsh_multiprobe", "ivf_nprobe16", "ivf_trained_nprobe16",
      "ivfpq", "ivfpq_trained")
      .foreach { k =>
        assert(got(k).candsPerQuery < n - 1,
          s"$k scored the whole corpus (${got(k).candsPerQuery} of ${n - 1})")
      }
  }

  test("knnGraph: per-node edge contract holds and banded recall tracks exact kNN") {
    val g = Similarity.knnGraph(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(g.nonEmpty)
    g.groupBy(_._1).foreach { case (src, edges) =>
      assert(edges.forall(_._2 != src), s"self-edge at $src")
      assert(edges.map(_._3).sorted.toSeq === (1 to edges.length),
        s"ranks not dense at $src")
      assert(edges.length <= Similarity.GraphK)
      val byRank = edges.sortBy(_._3)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"cos not descending at $src")
    }
    // recall vs the exact kNN graph, computed driver-side on the fixture
    val vecs = corpus().map { case (id, v) => (id, v, Kernels.norm(v)) }
    val exact = vecs.flatMap { case (a, va, na) =>
      vecs.filter(_._1 != a)
        .map { case (b, vb, nb) => (b, Kernels.dot(va, vb) / (na * nb)) }
        .sortBy { case (b, c) => (-c, b) }
        .take(Similarity.GraphK)
        .map { case (b, _) => (a, b) }
    }.toSet
    val got = g.map(e => (e._1, e._2)).toSet
    val recall = (got & exact).size.toDouble / exact.size
    // deterministic (fixed planes + fixture): the multi-band scheme must
    // hold graph recall near the serving path's level
    assert(recall >= 0.6, s"kNN-graph recall collapsed: $recall")
  }

  test("knnGraph restricted to the query set equals lshTopK — one banding, two operators") {
    // the graph's per-source edges and the serving path's per-query
    // results use the same bands, candidates, scoring, and tie-breaks,
    // so the graph sliced to the serving queries must match row for row
    val k = Similarity.GraphK
    val graph = Similarity.knnGraph(emb, k).filter(col("src_id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val served = Similarity.lshTopK(emb, expr("vec_id < 10"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(graph === served)
    assert(graph.nonEmpty)
  }

  test("knnClassify: vote matches the driver replay; the label rides the scan (no join)") {
    val isQuery = expr("vec_id < 10")
    val got = Similarity.knnClassify(emb, isQuery)
    // the label is carried on the corpus kernel row — a label-attach join
    // would shuffle the corpus, so the plan must contain NO join at all
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan.take(2000))
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === (0L until 10L).toSet)
    // driver-side replay with the same kernels: banded candidates →
    // top-k by (cos desc, id) → majority vote (votes desc, label)
    val bands = Similarity.simBandPlanes
      .map(_.map(_.map(_.toDouble).toArray).toArray).toArray
    def sigs(v: Array[Double]): Array[Long] =
      Array.tabulate(bands.length)(b => Kernels.lshSignature(v, bands(b)))
    val all = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"), col("label").cast("long"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val queries = all.filter(_._1 < 10)
    val labeled = all.filter(t => t._1 >= 10 && t._3.isDefined)
    val expected = queries.flatMap { case (qid, qv, _) =>
      val qn = Kernels.norm(qv)
      val qs = sigs(qv)
      val topk = labeled.filter { case (_, v, _) =>
          val s = sigs(v); s.indices.exists(i => s(i) == qs(i))
        }
        .map { case (id, v, lab) =>
          (id, Kernels.dot(qv, v) / (qn * Kernels.norm(v)), lab.get)
        }
        .sortBy { case (id, cos, _) => (-cos, id) }
        .take(Similarity.TopK)
      if (topk.isEmpty) None
      else {
        val (lab, n) = topk.groupBy(_._3).map { case (l, g) => (l, g.length) }
          .toSeq.sortBy { case (l, c) => (-c, l) }.head
        Some((qid, lab, n.toLong))
      }
    }.toSet
    assert(rows.toSet === expected)
  }

  test("mmrTopK skips the near-duplicate of an already-selected result") {
    import spark.implicits._
    val dim = Similarity.Dim
    def vec(axis: Int, eps: Double = 0.0): Seq[Float] = {
      val v = Array.fill(dim)(0.01f) // small common floor keeps cosines finite
      v(axis) = 1.0f
      if (eps != 0.0) v((axis + 1) % dim) = eps.toFloat
      v.toSeq
    }
    // query 0 ~ axis 0; candidates: 10 and 11 near-identical on axis 0
    // (both highly relevant), 12 on axis 1, 13 on axis 2.
    val df = Seq(
      0L -> vec(0),
      10L -> vec(0, 0.02), 11L -> vec(0, 0.03),
      12L -> vec(1), 13L -> vec(2))
      .map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(df, col("vec_id") === 0, k = 3, cands = 4)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    // pick 1: the most relevant (10 or 11); pick 2 must NOT be its
    // near-copy - MMR spends it on a different axis
    assert(Set(10L, 11L).contains(got(1)))
    assert(!Set(10L, 11L).contains(got(2)),
      s"pick 2 must diversify away from the near-duplicate: $got")
    // plain brute-force top-2 DOES take both near-copies - the contrast
    val bf = Similarity.bruteForceTopK(df, col("vec_id") === 0, 2)
      .collect().map(_.getLong(1)).toSet
    assert(bf === Set(10L, 11L))
    // all picks distinct, ranks 1..k
    assert(got.keySet === Set(1, 2, 3) && got.values.toSet.size === 3)
  }

  test("randomProject: exact integer components; JL distances track originals") {
    import spark.implicits._
    // hand case: micro-units of (0.5, -1.25, 2.0, ...) against known signs
    val v = Array.tabulate(Similarity.Dim)(i => (i % 5 - 2) * 0.25f)
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val got = Similarity.randomProject(df).head()
    val micro = v.map(x => math.round(x.toDouble * 1e6))
    (0 until Similarity.ProjDims).foreach { j =>
      val want = micro.zip(Similarity.projSigns(j)).map { case (c, s) => c * s }.sum
      assert(got.getLong(j + 1) === want, s"component $j")
    }
    // ragged vectors are excluded like NULLs (zip_with would null-pad)
    val ragged = Seq((9L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.randomProject(df.union(ragged)).count() === 1)
    // JL sanity on random vectors: projected squared distances (scaled
    // back) stay within 3x of the originals for k=16 — loose, but a
    // broken sign matrix or unit mismatch fails it immediately
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)))
    val proj = Similarity.randomProject(vecs.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) ->
        (1 until Similarity.ProjDims + 1).map(r.getLong).toArray).toMap
    val orig = vecs.toMap.map { case (id, xs) => id -> xs.map(_.toDouble).toArray }
    val ratios = for {
      a <- vecs.indices; b <- vecs.indices if a < b
    } yield {
      val d0 = orig(a.toLong).zip(orig(b.toLong)).map { case (x, y) =>
        (x - y) * (x - y) }.sum
      // E[|P(x-y)|^2] = Dim-free k·|x-y|^2 for ±1 rows; scale by 1/k
      val d1 = proj(a.toLong).zip(proj(b.toLong)).map { case (x, y) =>
        val d = (x - y) / 1e6; d * d }.sum / Similarity.ProjDims
      d1 / d0
    }
    // k=16 distortion tails are chi-square-wide per pair; the sharp
    // invariant is the MEDIAN ratio ~1 (unit or sign-matrix bugs shift
    // it wholesale), with a loose per-pair envelope against blowups
    val median = ratios.sorted.apply(ratios.length / 2)
    assert(median > 0.7 && median < 1.4, s"JL median ratio off: $median")
    assert(ratios.forall(r => r > 1.0 / 6 && r < 6.0),
      s"JL distortion out of band: min=${ratios.min} max=${ratios.max}")
  }

  test("oversized broadcast-side collect fails with the driver cap named") {
    // a non-selective isQuery must not OOM the driver silently — the cap
    // guard raises with the actual problem before transferring a corpus
    // vectors must be Dim-sized: ragged rows are contract-excluded upstream
    val big = spark.range(Similarity.MaxDriverRows + 1)
      .select(col("id").as("vec_id"),
        array((1 to Similarity.Dim).map(i => lit(i.toDouble)): _*).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(big, lit(true))
    }
    assert(ex.getMessage.contains("driver cap"))
    assert(ex.getMessage.contains("query set"))
  }

  test("labelCentroids: orthogonal label clusters sit at cos 0.7071 to the 45-degree global") {
    import spark.implicits._
    val d = Similarity.Dim
    def axis(i: Int): Seq[Float] =
      Seq.tabulate(d)(j => if (j == i) 1.0f else 0.0f)
    val emb2 = Seq(
      (1L, axis(0), 1), (2L, axis(0), 1),
      (3L, axis(1), 2), (4L, axis(1), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(emb2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1) === ((2L, 0.7071)))
    assert(got(2) === ((2L, 0.7071)))
  }

  test("hardNegatives is exactly the rank band below the positive top-k, disjoint from it") {
    val pos = Similarity.lshTopK(emb, isInit.isNotNull && expr("vec_id < 10"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = Similarity.hardNegatives(emb, expr("vec_id < 10"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(neg.nonEmpty)
    // band bounds: ranks (TopK, 2*TopK]
    assert(neg.forall(n => n._3 > Similarity.TopK && n._3 <= 2 * Similarity.TopK))
    // negatives never overlap the positive set for the same query
    assert(neg.forall(n => !pos.contains((n._1, n._2))))
  }

  test("matryoshka zero-padding ranks by prefix cosine exactly") {
    import spark.implicits._
    val d = Similarity.Dim
    val pd = Similarity.MatryoshkaDims
    // query q: prefix = e0; n1 close in PREFIX but far in the tail;
    // n2 far in prefix. Full-width ranking puts n2 first (tail agrees);
    // prefix ranking must put n1 first.
    def v(prefix0: Double, prefix1: Double, tail: Double): Seq[Float] =
      (Seq(prefix0, prefix1) ++ Seq.fill(pd - 2)(0.0) ++
        Seq.fill(d - pd)(tail)).map(_.toFloat)
    val emb3 = Seq(
      (0L, v(1.0, 0.0, 1.0)), // the query (vec_id < 10 = isQuery)
      (20L, v(0.9, 0.1, -1.0)), // prefix-close, tail-opposed
      (30L, v(0.1, 0.9, 1.0))) // prefix-far, tail-aligned
      .toDF("vec_id", "embedding")
    val padded = emb3.withColumn("embedding",
      expr(s"concat(slice(embedding, 1, $pd), " +
        s"array_repeat(CAST(0.0 AS FLOAT), ${d - pd}))"))
    def top1(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df, expr("vec_id < 10"), k = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top1(emb3)(0L) === 30L) // full width: tail dominates
    assert(top1(padded)(0L) === 20L) // prefix only: n1 wins
  }

  test("recallVsExact: identical lists score 10000 bp, disjoint 0, partial exact") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L), (1L, 98L),
      (2L, 30L), (2L, 31L)).toDF("query_id", "neighbor_id")
    val got = Similarity.recallVsExact(exact, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((2L, 5000L))) // 2 of 4
    assert(got(2L) === ((0L, 0L)))
    val self = Similarity.recallVsExact(exact, exact).collect()
      .map(r => r.getLong(2)).toSet
    assert(self === Set(10000L))
  }

  test("prototypeRanks: per-cell cosine rank, id tie-break, prune flag; trained form agrees") {
    import spark.implicits._
    val d = Similarity.Dim
    def axis(i: Int) = { val v = new Array[Double](d); v(i) = 1.0; v }
    def planar(deg: Double) = {
      val v = new Array[Double](d)
      v(0) = math.cos(math.toRadians(deg)); v(1) = math.sin(math.toRadians(deg))
      v
    }
    val cents = Array((100L, axis(0), 1.0), (200L, axis(1), 1.0))
    // cell 100: ids 1..4 at increasing angle from e0 (cos strictly desc);
    // cell 200: ids 21, 22 IDENTICAL (tie -> smaller id ranks first)
    val rows = Seq(
      1L -> planar(5), 2L -> planar(10), 3L -> planar(20), 4L -> planar(30),
      21L -> planar(80), 22L -> planar(80))
    val emb = rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Similarity.prototypeRanks(emb, cents, pruneK = 1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((100L, 1L, false))) // most prototypical: pruned
    assert(got(2L) === ((100L, 2L, true)))
    assert(got(3L) === ((100L, 3L, true)))
    assert(got(4L) === ((100L, 4L, true)))
    assert(got(21L) === ((200L, 1L, false))) // tie broken by vec_id
    assert(got(22L) === ((200L, 2L, true)))
    // trained-artifact form reads a (cid, centroid) table, same output
    val centTable = Seq((100L, axis(0).toSeq), (200L, axis(1).toSeq))
      .toDF("cid", "centroid")
    val trained = Similarity.prototypeRanksTrained(emb, centTable, pruneK = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(trained === got)
  }

  test("bitext mining: margin demands a DISTINGUISHED match; hubs with two close targets are rejected") {
    import spark.implicits._
    // synthetic embedding space (dim 64): target A along e0, target B at
    // ~cos 0.9 to A, target C along e1 (orthogonal to both-ish).
    // src 100 (lang de) sits on A exactly -> best=A cos 1.0, second=B
    // cos ~0.9 -> margin ~0.1 = 1000 e4-units: ACCEPTED.
    // src 101 (lang fr) sits exactly BETWEEN A and B -> two near-equal
    // candidates, margin ~0: REJECTED by the margin even though the
    // cosine floor passes.
    // src 102 (lang zh) sits on C -> cos to A/B ~0: REJECTED by floor.
    def vec(parts: (Int, Double)*): Array[Float] = {
      val v = Array.fill(graft.llmops.Similarity.Dim)(0.001f)
      parts.foreach { case (i, x) => v(i) = x.toFloat }
      v
    }
    val a = vec(0 -> 1.0)
    val b = vec(0 -> 0.9, 2 -> 0.436) // cos(a,b) ~ 0.9
    val cVec = vec(1 -> 1.0)
    val mid = vec(0 -> 0.95, 2 -> 0.218)
    val emb = Seq(
      (1L, a.toSeq, 0), (2L, b.toSeq, 0), (3L, cVec.toSeq, 0),
      (100L, a.toSeq, 0), (101L, mid.toSeq, 0), (102L, cVec.map(-_).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"),
      (100L, "de"), (101L, "fr"), (102L, "zh"))
      .toDF("doc_id", "lang")
    val got = graft.llmops.Bitext.mineBitext(docs, emb,
        minCosE4 = 5000L, minMarginE4 = 500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((100L, "de", 1L)),
      s"only the distinguished match may mine: $got")
    // with the margin relaxed, the ambiguous src mines too (to its
    // deterministically tie-broken best)
    val loose = graft.llmops.Bitext.mineBitext(docs, emb,
        minCosE4 = 5000L, minMarginE4 = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(loose === Set(100L, 101L), s"got $loose")
  }
}
