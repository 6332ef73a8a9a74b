package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Unit-level checks for the dedup clustering fixpoint and the
  * deterministic sampler (the oracle-gated queries cover the fixture
  * end to end; these pin the algebra on hand-built graphs). */
class LlmopsSpec extends AnyFunSuite {
  import TestSession._

  test("containment catches subset duplication that Jaccard misses, asymmetrically") {
    import spark.implicits._
    // doc 1 = 6 tokens quoted verbatim inside doc 2's 40-token body
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 34).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, s"$filler $quote")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, threshold = 0.5, dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every shingle of the short doc appears in the long one...
    assert(cont((1L, 2L)) === 1.0)
    // ...but not vice versa (long doc is mostly filler)
    assert(!cont.contains((2L, 1L)))
    // and Jaccard never flags the pair at the same threshold
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.5, dfCap = 1000)
    assert(jac.count() === 0)
  }

  test("ppjoinPairs equals brute-force exact Jaccard on random near-dup corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val vocab = (0 until 50).map(i => s"tok$i")
    // 40 base docs plus mutated near-dups (token swaps at varying rates)
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(50))).mkString(" "))
    }
    val mutated = base.take(20).map { case (id, text) =>
      val toks = text.split(" ")
      val k = rnd.nextInt(4) // 0-3 token replacements
      val mut = toks.indices.foldLeft(toks.clone()) { (acc, j) =>
        if (rnd.nextInt(toks.length) < k) acc.updated(j, vocab(rnd.nextInt(50)))
        else acc
      }
      (id + 1000L, mut.mkString(" "))
    }
    val docs = (base ++ mutated).toDF("doc_id", "text")
    val got = Dedup.ppjoinPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver-side brute force over the same shingling kernel
    val md = graft.llmops.Kernels.newMd5()
    val sets = (base ++ mutated).map { case (id, text) =>
      id -> graft.llmops.Kernels.distinctShingleHashes(md, text).toSet
    }.filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.5
    } yield (ia, ib) -> math.round(j * 10000).toDouble / 10000).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, k) }
    assert(want.nonEmpty, "fixture produced no near-dup pairs — regen seeds")
  }

  test("incrementalSimhashDedup finds exactly the cross-batch pairs the full join would") {
    import spark.implicits._
    // near-dup families built by light token edits; family members span
    // the old/new split so cross-batch pairs must surface
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0L until 40L).map { id =>
      val txt = if (id % 4 == 0) base
      else if (id % 4 == 1) base.replace("tok7", "tokX") // near dup of base
      else (1 to 30).map(i => s"u${id}_$i").mkString(" ") // unique
      (id, txt)
    }.toDF("doc_id", "text")
    val oldD = docs.filter(col("doc_id") % 5 =!= 0)
    val newD = docs.filter(col("doc_id") % 5 === 0)
    val got = Dedup.incrementalSimhashDedup(oldD, newD)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the plain all-pairs simhash join restricted to the split
    val all = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = all.flatMap { case (a, b) =>
      Seq((a, b), (b, a)).collect {
        case (n, o) if n % 5 == 0 && o % 5 != 0 => (n, o)
      }
    }
    assert(truth.nonEmpty, "fixture must contain cross-batch near-dups")
    assert(got === truth) // Bloom prefilter admits FPs, never drops a pair
  }

  test("passageDuplicates finds shared spans with per-doc occurrence counts") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // exactly one window
    val docs = Seq(
      (1L, s"$boiler intro text one two three four five six"),
      (2L, s"preface words alpha beta gamma delta epsilon zeta $boiler"),
      (3L, s"$boiler and again $boiler"), // twice in one doc
      (4L, "totally unrelated content with eight plus tokens here now")
    ).toDF("doc_id", "text")
    val got = Dedup.passageDuplicates(docs, spanTokens = 8, minDocs = 2).collect()
    // the boilerplate span: 3 docs, 4 occurrences, first seen in doc 1
    val b = got.filter(_.getLong(3) == 1L)
    assert(b.length >= 1)
    val top = got.maxBy(_.getLong(2))
    assert(top.getLong(1) === 3L && top.getLong(2) === 4L && top.getLong(3) === 1L)
    // no span from the unrelated doc appears
    assert(got.forall(_.getLong(3) != 4L))
  }

  test("withSplit is stable under append and respects the cut percentages") {
    import spark.implicits._
    import graft.llmops.Mix
    val a = (0L until 2000L).toDF("doc_id")
    val b = (0L until 3000L).toDF("doc_id") // superset: appended docs
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Mix.withSplit(df).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
    val ma = m(a)
    val mb = m(b)
    assert(ma.forall { case (id, s) => mb(id) == s }) // append never reassigns
    val frac = mb.values.groupBy(identity).view.mapValues(_.size / 3000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, frac.toString)
    assert(math.abs(frac("val") - 0.05) < 0.02, frac.toString)
    assert(math.abs(frac("test") - 0.05) < 0.02, frac.toString)
    // degenerate cuts stay total
    assert(Mix.withSplit(a, trainPct = 100, valPct = 0)
      .filter(col("split") =!= "train").count() === 0)
  }

  test("BPE-ish counting exceeds whitespace counting on gluey text") {
    import spark.implicits._
    import graft.llmops.TextAnalysis
    val docs = Seq(
      (1L, "plain words only here"),                  // 4 = 4 words
      (2L, "price: $12.50, ok?"),                     // punct/digits split off
      (3L, "a  b")                                    // double space: extra token
    ).toDF("doc_id", "text")
    val got = TextAnalysis.withBpeTokens(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 2: "price" ":" " $" "12" "." "50" "," " ok" "?" = 9 pieces, 3 words
    assert(got === Seq((1L, 4L, 4L), (2L, 9L, 3L), (3L, 3L, 3L)))
  }

  test("ngramDiversity separates templated from diverse sources") {
    import spark.implicits._
    import graft.llmops.CorpusStats
    val template = (1 to 20).map(i => s"t$i").mkString(" ")
    val docs = ((1L to 5L).map(i => (i, "boiler", template)) ++
      (6L to 10L).map(i => (i, "fresh", (1 to 20).map(j => s"d${i}_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.ngramDiversity(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val (bd, bs, bdist, bdiv) = got("boiler")
    assert(bd === 5L && bs === 5L * 18 && bdist === 18L && bdiv === 0.2)
    val (fd, fs, fdist, fdiv) = got("fresh")
    assert(fd === 5L && fdiv === 1.0 && fdist === fs)
  }

  test("substringOverlapPairs equals brute-force LCS on seeded block-shuffled docs") {
    import spark.implicits._
    // docs are random sequences of shared phrase blocks, so real >=8-token
    // overlaps arise; the reference is the token-level longest-common-
    // substring DP — the ground truth the diagonal-run merge must match
    val rnd = new scala.util.Random(7)
    val blocks: IndexedSeq[IndexedSeq[String]] = (0 until 6).map { b =>
      (0 until (8 + rnd.nextInt(5))).map(i => s"b${b}_$i")
    }
    val docTokens: Map[Long, Array[String]] = (1L to 6L).map { id =>
      id -> (0 until 4).flatMap(_ => blocks(rnd.nextInt(blocks.length))).toArray
    }.toMap
    def lcs(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    val expected = (for {
      a <- 1L to 6L; b <- (a + 1) to 6L
      l = lcs(docTokens(a), docTokens(b)) if l >= 8
    } yield (a, b) -> l.toLong).toMap
    val docs = docTokens.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(docs, minOverlapTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty, "fixture produced no overlapping pairs")
    assert(got === expected)
  }

  test("contaminationSpans: pasted benchmark answer found with exact span; ratio test misses it") {
    import spark.implicits._
    def words(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val answer = words("ans", 15) // verbatim 15-token benchmark answer
    val bench = Seq((100L, (words("q", 5) ++ answer).mkString(" ")))
      .toDF("doc_id", "text")
    // corpus doc 1: the answer pasted inside 300 tokens of other text —
    // a small FRACTION of its shingles, but an exact >=13-token run
    val doc1 = (words("body", 150) ++ answer ++ words("tail", 150)).mkString(" ")
    // corpus doc 2: shares only an 8-token fragment (= one shingle, span
    // 8 < 13) -> not flagged
    val doc2 = (words("other", 40) ++ words("ans", 8)).mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2), (100L, bench.head.getString(1)))
      .toDF("doc_id", "text")
    val got = graft.llmops.Decontaminate.contaminationSpans(docs, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 flagged with the exact span; doc 2 below threshold; the
    // benchmark doc itself (same id both sides) excluded as a self-pair
    assert(got === Map((1L, 100L) -> 15L))
    // contrast: the shingle-RATIO score stays under the 20% flag line for
    // doc 1 (8 of ~308 shingles) — the span test exists for exactly this
    val ratio = graft.llmops.Decontaminate.contaminationScores(docs, bench)
      .filter(col("doc_id") === 1L).head()
    assert(!ratio.getAs[Boolean]("contaminated"),
      s"ratio test unexpectedly flagged doc 1: $ratio")
  }

  test("contaminationSpans: corpus-side occ cap drops boilerplate shingles before the join") {
    import spark.implicits._
    def words(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val answer = words("ans", 15)
    val bench = Seq((100L, answer.mkString(" "))).toDF("doc_id", "text")
    // the answer pasted into FOUR corpus docs: every answer shingle has
    // corpus frequency 4
    val docs = (1L to 4L).map(i =>
      (i, (words(s"body$i", 30) ++ answer ++ words(s"tail$i", 30)).mkString(" ")))
      .toDF("doc_id", "text")
    val wide = graft.llmops.Decontaminate.contaminationSpans(docs, bench, occCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wide === (1L to 4L).map(i => (i, 100L) -> 15L).toMap)
    // occCap=3 < frequency 4: the boilerplate shingles are pruned before
    // pair generation — the skew-bound trade documented on the operator
    val capped = graft.llmops.Decontaminate.contaminationSpans(docs, bench, occCap = 3)
    assert(capped.count() === 0)
  }

  test("contaminationSpans: benchmark side is one capped collect, never re-scanned") {
    // the broadcast side must come from the pre-collected rows (a
    // LocalTableScan), so the executed plan reads parquet only for the
    // corpus: the shingle pass + the occ-cap aggregate = 2 file scans,
    // and an oversized benchmark fails with the cap named (the capped
    // `limit(cap+1)` collect — not an executor OOM, not a count job)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val df = graft.llmops.Decontaminate.contaminationSpans(docs, bench)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"bench side not served from the collected rows:\n${plan.take(1500)}")
    assert("FileScan parquet".r.findAllIn(plan).size <= 2,
      s"benchmark re-scanned from parquet:\n${plan.take(1500)}")
    val ex = intercept[IllegalArgumentException] {
      graft.llmops.Decontaminate.contaminationSpans(docs, bench, maxBenchShingles = 5)
    }
    assert(ex.getMessage.contains("too large to broadcast"))
  }

  test("embeddingContamination: pure map-side scan; replay matches; bench never self-flags") {
    import graft.llmops.{Decontaminate, Dedup, Kernels, Similarity}
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val isBench = expr("vec_id % 37 = 5")
    val got = Decontaminate.embeddingContamination(emb, isBench)
    // the whole operator is one broadcast + one narrow kernel pass: the
    // executed plan must contain NO join and NO exchange of any kind
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan.take(2000))
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "threshold should flag some corpus vectors at this fixture")
    assert(rows.forall(_._3 >= Decontaminate.EmbedContaminationThreshold))
    assert(rows.forall(_._1 % 37 != 5), "a benchmark vector flagged itself")
    // driver replay with the same bands/kernels: any-band collision →
    // exact max-cos (ties to smaller bench id) → threshold
    val bands = Dedup.embedBandPlanes
      .map(_.map(_.map(_.toDouble).toArray).toArray).toArray
    def sigs(v: Array[Double]): Array[Long] =
      Array.tabulate(bands.length)(b => Kernels.lshSignature(v, bands(b)))
    val all = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val bench = all.filter(_._1 % 37 == 5)
      .map { case (id, v) => (id, v, Kernels.norm(v), sigs(v)) }
    val expected = all.filter(_._1 % 37 != 5).flatMap { case (id, v) =>
      val nrm = Kernels.norm(v)
      val s = sigs(v)
      val hits = bench.filter { case (_, _, _, bs) =>
        bs.indices.exists(i => bs(i) == s(i))
      }.map { case (bid, bv, bn, _) => (bid, Kernels.dot(bv, v) / (bn * nrm)) }
      if (hits.isEmpty) None
      else {
        val (bid, cos) = hits.minBy { case (b, c) => (-c, b) }
        if (cos >= Decontaminate.EmbedContaminationThreshold)
          Some((id, bid, Kernels.floorRound4(cos)))
        else None
      }
    }.toSet
    assert(rows.toSet === expected)
  }

  test("substringOverlapPairs: exact shared runs measured; scattered shingles below threshold ignored") {
    import spark.implicits._
    def words(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val shared = words("common", 25) // exact 25-token run
    // docs 1 and 2 embed the same 25-token run inside different contexts
    val d1 = (words("alpha", 10) ++ shared ++ words("omega", 7)).mkString(" ")
    val d2 = (words("beta", 4) ++ shared ++ words("gamma", 12)).mkString(" ")
    // doc 3 shares every individual token of d1's prefix REORDERED — high
    // set overlap, but no aligned run of >= 20 tokens
    val d3 = (words("alpha", 10).reverse ++ words("delta", 30)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the run is measured EXACTLY: 25 shared tokens
    assert(got === Map((1L, 2L) -> 25L))
  }

  test("semanticDedup: smaller-id cell-mate above threshold prunes; cross-cell near-dups survive") {
    import spark.implicits._
    val dim = graft.llmops.Similarity.Dim
    def vec(axis: Int, scale: Float): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == axis) scale else 0.0f)
    // cells anchored at axis-0 (centroid id 1) and axis-1 (centroid id 3);
    // cosine is scale-invariant, so 2·e0 duplicates e0 exactly
    val emb = Seq(
      1L -> vec(0, 1.0f),            // centroid, cell 1, kept
      2L -> vec(0, 2.0f),            // cos 1 with id 1, same cell → dropped
      3L -> vec(1, 1.0f),            // centroid, cell 3, kept
      5L -> vec(1, 3.0f),            // cos 1 with id 3, same cell → dropped
      // 0.8·e0 + 0.6·e1: lands in cell 1 (cos 0.8 > 0.6), but cos 0.8
      // with its cell-mates is below the 0.85 threshold → kept
      4L -> Seq.tabulate(dim)(i =>
        if (i == 0) 0.8f else if (i == 1) 0.6f else 0.0f)
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(emb, expr("vec_id IN (1, 3)"), threshold = 0.85)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 4L -> ((1L, true)),
      3L -> ((3L, true)), 5L -> ((3L, false))))
  }

  test("semanticDedup: a degenerate hot cell fails loudly before any quadratic work") {
    // one centroid = every vector quantizes to one cell (the
    // dead-embedding pathology); the MaxCellRows guard must name the
    // cell and its population instead of grinding O(n^2)
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val oneCent = graft.llmops.Similarity.trainIvfCentroids(
      emb, expr("vec_id = 3"), iterations = 0)
    val assign = Dedup.cellAssignments(emb, oneCent)
    val n = emb.filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
      size(col("embedding")) === graft.llmops.Similarity.Dim).count()
    val ex = intercept[IllegalArgumentException] {
      Dedup.semanticDedupFrom(emb, assign, maxCellRows = n - 1)
    }
    assert(ex.getMessage.contains("cell 3"))
    assert(ex.getMessage.contains(s"holds $n vectors"))
    // at the default cap the same single-cell layout is merely slow at
    // fixture scale — it must run, not trip (cap is for corpus scale)
    assert(Dedup.semanticDedupFrom(emb, assign).count() === n)
  }

  test("semanticDedup plan materializes the assignment kernel once") {
    // the self-contained form checkpoints (vec_id, cell_id): the final
    // plan must scan the checkpointed rows (ExistingRDD) and read the
    // embeddings parquet at most twice (the norm-attach join sides,
    // usually deduped by ReuseExchange) — NOT once per assignment
    // consumer as in r10, where the assignment kernel re-ran 3x and each
    // run re-scanned the corpus
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val out = Dedup.semanticDedup(emb, expr("vec_id % 29 = 3"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"assignment checkpoint missing:\n$plan")
    val parquetScans = "FileScan parquet".r.findAllIn(plan).size
    assert(parquetScans <= 2,
      s"embeddings parquet scanned $parquetScans times — assignment kernel re-running?\n$plan")
  }

  test("semanticDedup and IVF serving share one trained quantizer artifact") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val S = graft.llmops.Similarity
    val trained = S.trainIvfCentroids(emb, expr("vec_id % 29 = 3"), iterations = 2)
    val cids = trained.select("cid").collect().map(_.getLong(0)).toSet
    val got = Dedup.semanticDedupTrained(emb, trained)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length === emb.filter(col("vec_id").isNotNull &&
      col("embedding").isNotNull && size(col("embedding")) === S.Dim).count())
    assert(got.map(_._2).toSet.subsetOf(cids),
      "dedup cells must be the trained quantizer's cells")
    // the smallest-id member of every cell has no smaller cell-mate, so
    // it can never be pruned — a wrong-direction comparison fails here
    got.groupBy(_._2).foreach { case (cell, members) =>
      val anchor = members.minBy(_._1)
      assert(anchor._3, s"cell $cell pruned its smallest-id member $anchor")
    }
    // and the cells agree with IVF's assignment kernel on the same table
    val assign = Dedup.cellAssignments(emb, trained)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, cell, _) =>
      assert(assign(id) === cell, s"vec $id: dedup cell $cell != IVF cell ${assign(id)}")
    }
  }

  test("keepBestDuplicate: provenance beats length beats id; singletons dropped") {
    import spark.implicits._
    val docs = Seq(
      // cluster {1,2,3}: 3 is longest but web; 2 is curated → 2 wins
      (1L, "curated", 100L), (2L, "curated", 120L), (3L, "web", 500L),
      // cluster {10,11}: both web → longer (11) wins
      (10L, "web", 80L), (11L, "web", 90L),
      // cluster {20,21}: same source, same length → smaller id wins
      (20L, "web", 70L), (21L, "web", 70L),
      // singleton 30: no pair → must not appear
      (30L, "curated", 999L)).toDF("doc_id", "source", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val prio = when(col("source") === "curated", lit(0)).otherwise(lit(1))
    val got = Dedup.keepBestDuplicate(docs, pairs, prio).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, "curated", 3L),
      (10L, 11L, "web", 2L),
      (20L, 20L, "web", 2L)))
    // the artifact-consuming form over a persisted clusters table agrees
    val viaArtifact = Dedup.keepBestFromClusters(
        Dedup.duplicateClusters(docs, pairs), docs, prio).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(viaArtifact.sortBy(_._1).toSeq === got.toSeq)
  }

  test("duplicateClusters labels every chain with its minimum id") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (transitive through 2), pair 4-5, singleton 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // keep-list = cluster representatives
    assert(got.collect { case (d, c) if d == c => d }.toSet === Set(1L, 4L, 6L))
  }

  test("duplicateClusters closes a 100-node chain in O(log n) star rounds, not diameter") {
    import spark.implicits._
    // the pathological case for label propagation: a 100-link transitive
    // chain needs ~100 diameter-bounded rounds; large-star/small-star
    // roughly halves distance-to-root per round, so it must close in
    // <= 7 (≈ log2 100) plus the fixpoint-detection round
    val n = 100L
    val docs = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (res, rounds) = Dedup.duplicateClustersCounted(docs, pairs)
    val labels = res.select(col("cluster_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(labels === Seq(1L)) // one component, labeled by the minimum
    assert(rounds <= 8, s"chain took $rounds star rounds")
  }

  test("duplicateClusters equals union-find on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(30)
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
      // reference: plain union-find with path compression
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (1L to n.toLong)
        .map(i => i -> find(i.toInt).toLong).toMap
      // min-id canonicalization: union-find roots ARE the component minima
      // here because union always hangs the larger root under the smaller
      val docs = (1L to n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.duplicateClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial (n=$n, ${edges.length} edges)")
    }
  }

  test("duplicateClusters: mixed clique + long tail converges to one component") {
    import spark.implicits._
    // lollipop: clique {1..5} star-collapses immediately; the 20-node
    // tail hanging off node 5 exercises the rewiring across rounds.
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val tail = (5L until 25L).map(i => (i, i + 1))
    val docs = (1L to 25L).toDF("doc_id")
    val pairs = (clique ++ tail).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(docs, pairs)
      .select(col("cluster_id")).distinct().collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("curate gates language, quality, and exact duplicates in one pass") {
    import spark.implicits._
    val en = "the quick brown fox and the lazy dog of the house with many more " +
      "words to be sure the quality score clears the floor for this document " +
      "because it has enough tokens and stopwords in it to count as english text"
    val docs = Seq(
      (1L, en),                        // keeper
      (2L, en),                        // exact duplicate of 1 → dropped
      (3L, "uno dos tres quatro"),     // not English → dropped
      // classifies en (stopword hits) but scores 0.458 < 0.5:
      // 2 tokens (0.008) + uniq 0.5 (0.15) + stopwords (0.3)
      (4L, "the the")                  // quality floor → dropped
    ).toDF("doc_id", "text")
    val kept = graft.llmops.Curate.curate(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L))
  }

  test("stratifiedSample is deterministic and honors per-stratum thresholds") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "s")
    def run() = Dedup.stratifiedSample(docs, col("s"),
      Map("a" -> 0, "b" -> 5000), defaultPer10k = 10000)
      .collect().map(_.getLong(0)).toSet
    val first = run()
    assert(run() === first) // no RNG state: same rows every time
    assert(!first.exists(_ % 2 == 0)) // threshold 0 drops the whole stratum
    val bCount = first.size
    assert(bCount > 150 && bCount < 350, s"~half of 500 expected, got $bCount")
  }

  test("repetition signals: duplicate fractions and top-2gram share") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),  // degenerate repetition
      (2L, "x y z"),    // all distinct
      (3L, "q"),        // single token: 3gram/2gram signals are 0
      (4L, "u v")       // one 2-gram → its share is 1.0, no 3-grams
    ).toDF("doc_id", "text")
    val got = graft.llmops.TextAnalysis.withRepetition(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((4, 0.75, 0.5, 1.0))) // 1 uniq of 4; 1 of 2 trigrams; "a a" 3/3
    assert(got(2L) === ((3, 0.0, 0.0, 0.5)))  // distinct; winner 2-gram is 1 of 2
    assert(got(3L) === ((1, 0.0, 0.0, 0.0)))
    assert(got(4L) === ((2, 0.0, 0.0, 1.0)))
  }

  test("contamination scores: full copy 1.0, partial overlap, disjoint 0.0") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // exact benchmark copy
      (2L, "a quick brown fox sits down"), // shares 'quick brown fox' only
      (3L, "completely different words here"),
      (4L, "too short")                    // <3 tokens: no shingles, excluded
    ).toDF("doc_id", "text")
    val got = graft.llmops.Decontaminate.contaminationScores(docs, bench)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_overlap"), r.getAs[Double]("contamination"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // doc 4 has no shingles
    assert(got(1L) === ((3L, 1.0, true)))
    assert(got(2L) === ((1L, 0.25, true))) // 1 of 4 shingles, >= 0.2 flags
    assert(got(3L) === ((0L, 0.0, false))) // zero-overlap docs still report
    // oversized benchmark fails with the problem named, not an executor OOM
    val err = intercept[IllegalArgumentException] {
      graft.llmops.Decontaminate.contaminationScores(docs, bench, maxBenchShingles = 2)
    }
    assert(err.getMessage.contains("too large to broadcast"), err.getMessage)
  }

  test("packSequences: spans are contiguous, exhaustive, and bucket-invariant") {
    import spark.implicits._
    // words counts 3,5,2,7,1 → offsets 0,3,8,10,17; budget 4 cuts at 4,8,12,16
    val docs = Seq(
      (10L, "a b c"), (11L, "a b c d e"), (12L, "a b"),
      (13L, "a b c d e f g"), (14L, "a")).toDF("doc_id", "text")
    def run(bucketSize: Long) =
      graft.llmops.Pack.packSequences(docs, seqTokens = 4, bucketSize = bucketSize)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val got = run(bucketSize = 2) // forces multiple buckets → two-phase path
    assert(got === Seq(
      (10L, 3L, 0L, 0L, 0L),   // tokens 0-2 in seq 0
      (11L, 5L, 3L, 0L, 1L),   // 3-7 straddles seqs 0,1
      (12L, 2L, 8L, 2L, 2L),
      (13L, 7L, 10L, 2L, 4L),  // 10-16 spans seqs 2,3,4
      (14L, 1L, 17L, 4L, 4L)))
    // same answer whether the prefix sum uses 1 bucket or 3
    assert(run(bucketSize = 1000000) === got)
  }

  test("batchBuckets: full batches except bucket tails; padding algebra; bucket bounds hold") {
    import graft.llmops.Pack
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val got = Pack.batchBuckets(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val bounds = Pack.BatchBucketBounds.map(b => s"b$b" -> b).toMap
    got.groupBy(_._1).foreach { case (bucket, batches) =>
      // batch ids dense from 0; only the LAST batch may be short
      val byId = batches.sortBy(_._2)
      assert(byId.map(_._2).toSeq === (0L until byId.length.toLong))
      byId.init.foreach { b => assert(b._3 === Pack.BatchSize.toLong, s"$bucket: $b") }
      assert(byId.last._3 <= Pack.BatchSize.toLong && byId.last._3 >= 1L)
      batches.foreach { case (_, _, n, mx, sm, pad) =>
        assert(pad === n * mx - sm && pad >= 0L)
        // max respects the bucket's upper bound
        bounds.get(bucket).foreach(ub => assert(mx <= ub, s"$bucket holds a $mx-token doc"))
      }
    }
    // the unbounded tail bucket exists on this fixture (lengths reach 99)
    assert(got.exists(_._1 == "binf"))
    // deterministic under repartitioning (positions come from the hash order)
    val re = Pack.batchBuckets(docs.repartition(11)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(re.toSet === got.toSet)
  }

  test("hybridTopK: RRF rewards both-arm hits; exact integer micro scores") {
    import spark.implicits._
    val d = graft.llmops.Similarity.Dim
    def vec(i: Int, scale: Double = 1.0, j: Int = -1, sj: Double = 0.0) = {
      val v = new Array[Float](d)
      v(i) = scale.toFloat; if (j >= 0) v(j) = sj.toFloat
      v.toSeq
    }
    val qText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, qText), // the query (doc_id < 10)
      (20L, qText), // lexical twin (r_lex 1), orthogonal vector
      (30L, "one two three four five six seven eight"), // semantic twin only
      (40L, "alpha beta gamma delta x1 x2 x3 x4")) // middling in both
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, vec(0)), (20L, vec(1)),
      (30L, vec(0)), // cos 1 -> r_sem 1
      (40L, vec(0, 0.7, 2, 0.714))) // cos ~0.7 -> r_sem 2
      .toDF("vec_id", "embedding")
    val got = graft.llmops.Rank.hybridTopK(docs, emb,
      col("doc_id") < 10, expr("vec_id < 10"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // RRF micro contributions: r1=16393, r2=16129, r3=15873
    assert(got(20L) === ((1L, 16393L + 15873L))) // lex 1 + sem 3
    assert(got(40L) === ((2L, 16129L + 16129L))) // both arms mid
    assert(got(30L) === ((3L, 16393L)))          // sem-only arm
  }

  test("bm25TopK ranks tf-heavy short docs first and excludes term-free docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat w1 w2 w3 w4 w5 w6 w7"),
      (3L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val got = graft.llmops.Rank.bm25TopK(docs, Seq("cat", "dog"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // ranked; term-free doc 3 absent
    assert(got(0)._3 === 2L && got(1)._3 === 1L) // distinct query terms hit
    assert(got(0)._2 > got(1)._2)
  }

  test("rm3TopK expands with feedback terms and recalls docs pass-1 misses") {
    import spark.implicits._
    // "cat" is the query. Feedback docs (1,2) both carry "whisker" —
    // the relevance model must mine it (df_fb=2, not a stopword) —
    // while "filler"/"pad" appear in over half the corpus and are
    // screened out. Doc 4 has NO query term, only "whisker": plain BM25
    // can never return it; RM3 must.
    val docs = Seq(
      (1L, "cat whisker filler pad"),
      (2L, "cat whisker filler pad"),
      (3L, "cat filler pad x1 x2 x3"),
      (4L, "whisker y1 y2 y3"),
      (5L, "filler pad z1 z2"),
      (6L, "filler pad z3 z4")).toDF("doc_id", "text")
    val plain = graft.llmops.Rank.bm25TopK(docs, Seq("cat"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(4L))
    val rm3 = graft.llmops.Rank.rm3TopK(docs, Seq("cat"), 10, fbDocs = 3,
      expTerms = 2).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rm3.contains(4L), "expansion must recall the whisker-only doc")
    // docs holding query term + expansion hit 2 distinct terms
    assert(rm3(1L) === 2L && rm3(4L) === 1L)
    // the stopword screen held: docs with only filler/pad stay absent
    assert(!rm3.contains(5L) && !rm3.contains(6L))
  }

  test("collocations: Dice in exact basis points, min-count gate, deterministic rank") {
    import spark.implicits._
    // "data base" co-occurs 3x; c(data)=4, c(base)=3 → dice_bp =
    // 2*3*10000 // 7 = 8571. "a b" occurs twice → below minCount 3.
    val docs = Seq(
      (1L, "data base a b"),
      (2L, "data base a b"),
      (3L, "data base"),
      (4L, "data x")).toDF("doc_id", "text")
    val got = graft.llmops.CorpusStats.collocations(docs, minCount = 3, k = 10)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(6)))
    assert(got.toSeq === Seq(("data", "base", 3L, 8571L)))
  }

  test("bm25 length normalization: same tf in a longer doc scores lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat " + (1 to 4).map(i => s"w$i").mkString(" ")),
      (2L, "cat " + (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.llmops.Rank.bm25TopK(docs, Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) > got(2L))
  }

  test("collapseTokenRuns keeps one token per consecutive run, leaves period-2 loops alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the cat sat sat"),
      (2L, "no runs at all here"),
      (3L, "the cat the cat"), // period-2 loop: NOT collapsed (detection territory)
      (4L, "x"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.llmops.Clean.collapseTokenRuns(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("the cat sat", 6L, 3L)))
    assert(got(2L) === (("no runs at all here", 5L, 0L)))
    assert(got(3L) === (("the cat the cat", 4L, 0L)))
    assert(got(4L) === (("x", 1L, 0L)))
    assert(got(5L) === (("", 1L, 0L))) // NULL pins to one empty token
  }

  test("dedupReport: per-source dup counts over a hand-built cross-source cluster graph") {
    import spark.implicits._
    // cluster {1,2,3} spans sources A,B; cluster {10,11} inside B;
    // 20, 21 are singletons (A and C)
    val docs = Seq(
      (1L, "A"), (2L, "A"), (3L, "B"), (10L, "B"), (11L, "B"),
      (20L, "A"), (21L, "C")).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupReport(docs, pairs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") === ((3L, 2L, 1L, 6666L))) // docs 1,2,20; dups 1,2
    assert(got("B") === ((3L, 3L, 2L, 10000L))) // 3 in cl-1, 10+11 in cl-10
    assert(got("C") === ((1L, 0L, 0L, 0L)))
  }

  test("removeBoilerplateBlocks strikes >=minDf blocks, keeps order, empties full-boilerplate docs") {
    import spark.implicits._
    // "b1 b2 b3 b4" appears in 3 docs (boilerplate at minDf=3);
    // "c1 c2 c3 c4" in only 2 (kept). Blocks are aligned 4-token windows.
    val bp = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"$bp u1 u2 u3 u4"), // boilerplate head + unique tail
      (2L, s"v1 v2 v3 v4 $bp"), // unique head + boilerplate tail
      (3L, bp), // entirely boilerplate -> cleaned to ""
      (4L, "c1 c2 c3 c4 w1 w2"), // df=2 block stays
      (5L, "c1 c2 c3 c4"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.llmops.Clean.removeBoilerplateBlocks(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("u1 u2 u3 u4", 2L, 1L)))
    assert(got(2L) === (("v1 v2 v3 v4", 2L, 1L)))
    assert(got(3L) === (("", 1L, 1L))) // row survives with empty text
    assert(got(4L) === (("c1 c2 c3 c4 w1 w2", 2L, 0L)))
    assert(got(5L) === (("c1 c2 c3 c4", 1L, 0L)))
    assert(got(6L) === (("", 1L, 0L))) // NULL text = one empty block, df 1
  }

  test("removeBoilerplateBlocks cleaning pass is join-free and shuffle-free") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, s"a b c d t$i")).toDF("doc_id", "text")
    val plan = graft.llmops.Clean.removeBoilerplateBlocks(docs)
      .queryExecution.executedPlan.toString
    // the drop set is a broadcast VARIABLE probed inside the kernel — the
    // returned plan must be scan -> kernel with no join/exchange anywhere
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("cleanDocs strips tags, collapses whitespace, case-folds, pins empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, " <b>Hello</b>\n\tWorld  "),
      (2L, "<br>"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.llmops.Clean.cleanDocs(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("hello world", 11L, 2L)))
    assert(got(2L) === (("", 0L, 0L))) // tag-only text empties, words = 0
    assert(got(3L) === (("", 0L, 0L))) // NULL text pinned to the empty doc
  }

  test("epochShuffle: contiguous per-shard positions, epochs permute differently") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def run(epoch: Int) = graft.llmops.Mix.epochShuffle(docs, epoch, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val rows = run(1)
    assert(rows.length === 200 && rows.map(_._1).distinct.length === 200)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // positions within each shard are exactly 1..n — a true partition of
    // a permutation, no gaps a data loader would trip on
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted === (1 to g.length).toSeq)
    }
    assert(run(1) === rows) // rerun-deterministic
    assert(run(2).sorted !== rows.sorted) // the epoch salt re-permutes
  }

  test("WithinOneEdit kernel ≡ levenshtein <= 1 on random string pairs (the oracle contract)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(17)
    // alphabet includes SUPPLEMENTARY code points (2 UTF-16 chars each):
    // Spark's levenshtein and DuckDB count code points, so the kernel
    // must too — an emoji is ONE edit unit, not two
    val alphabet: Array[String] = Array("a", "b", "c", "X", "#", "0",
      new String(Character.toChars(0x1F600)),  // 😀
      new String(Character.toChars(0x1D11E)))  // 𝄞
    def randStr(): String =
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // reference DP over CODE POINTS (matches UTF8String.levenshteinDistance)
    def lev(as: String, bs: String): Int = {
      val a = as.codePoints().toArray
      val b = bs.codePoints().toArray
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // random pairs PLUS near-pairs (mutations of a base) so the true
    // boundary (distance exactly 1 vs 2) is exercised densely
    // mutations act on CODE POINTS (never splitting a surrogate pair:
    // a split pair round-trips through UTF-8 as '?' and would desync
    // the kernel's input from the reference DP's)
    def mutate(x: String): String = {
      if (x.isEmpty) return "a"
      val cps = x.codePoints().toArray.toBuffer
      val i = rnd.nextInt(cps.length)
      rnd.nextInt(3) match {
        case 0 => cps(i) = 'Q'
        case 1 => cps.remove(i)
        case _ => cps.insert(i, 0x1F680) // 🚀 — insert a supplementary cp
      }
      cps.map(cp => new String(Character.toChars(cp))).mkString
    }
    val gClef = new String(Character.toChars(0x1D11E))
    val smile = new String(Character.toChars(0x1F600))
    val cases = Seq.fill(400)((randStr(), randStr())) ++
      Seq.fill(400) {
        val s = randStr()
        (s, (0 until rnd.nextInt(3)).foldLeft(s)((x, _) => mutate(x)))
      } ++ Seq(
        // explicit non-BMP boundary cases: each supplementary char is
        // ONE code point = one edit unit
        (smile, "a"),               // substitution: dist 1, NOT 2
        (smile, ""),                // single deletion
        ("ab", "a" + gClef + "b"),  // insertion of a supplementary cp
        (smile + gClef, smile + smile), // one substitution among emoji
        (smile + "x" + gClef, smile + "y" + gClef),
        (smile + gClef, gClef + smile)) // transposition = dist 2 -> false
    cases.foreach { case (a, b) =>
      val got = graft.functions.WithinOneEdit.within1(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got === (lev(a, b) <= 1), s"'$a' vs '$b': lev=${lev(a, b)}")
      // and the builtin agrees with the reference DP (contract anchor)
      assert(UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))
        === lev(a, b), s"builtin disagrees on '$a' vs '$b'")
    }
  }

  test("editDistancePairs: substitution/insertion/deletion all block correctly; distance-2 excluded") {
    import spark.implicits._
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),  // substitution -> dist 1
      (3L, "kitte"),                   // deletion of 1's last char -> dist 1
      (4L, "kittens"),                 // insertion on 1 -> dist 1
      (5L, "mittens"),                 // dist 1 from 2 and 4
      (6L, "sitting"))                 // dist >= 2 from everything
      .toDF("id", "nm")
    val got = graft.llmops.Dedup.editDistancePairs(rows, "id", "nm")
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 5L, 1L), (4L, 5L, 1L)),
      s"got $got")
  }
}
