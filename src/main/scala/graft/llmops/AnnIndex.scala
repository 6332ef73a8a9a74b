package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Warehouse

/** Persisted ANN index artifacts — the production form of the "computed
  * once per corpus snapshot" claims the serving scaladocs make.
  *
  * The self-contained `sim_topk_*` paths recompute corpus-side
  * signatures/codes per query batch, which is the right shape for an
  * oracle-gated query but the wrong shape for a serving deployment: at
  * 100 TB the corpus kernels (32×6 hyperplane projections, M×Codes PQ
  * encode) are a pure function of an immutable snapshot and should run
  * ONCE, at ingest — exactly like [[LangModel.saveModel]]'s c12/c1/v
  * tables. This object materializes them as warehouse tables:
  *
  *  - LSH: `(vec_id, band, sig)` — 32 longs/vector; a query batch pays
  *    only a broadcast equi-join against its own band signatures.
  *  - PQ: `(vec_id, codes)` — M one-byte codes/vector (64× less IO than
  *    the raw floats); ADC scoring reads ONLY this table, never an
  *    embedding.
  *
  * Both serving paths are kernel-identical to their self-contained
  * twins ([[Similarity.lshTopK]], [[ProductQuant.pqTopK]]) — AnnIndexSpec
  * pins exact result equality AND plan shape (no corpus signature/encode
  * kernel in any serving plan; the LSH plan fetches raw vectors once,
  * the ADC plan fetches none). */
object AnnIndex {

  // ------------------------------------------------------------ LSH index

  /** The (vec_id, band, sig) artifact — one narrow kernel pass over the
    * corpus with [[Similarity.simBandPlanes]] (the serving planes, so the
    * artifact and any self-contained run can never disagree on buckets). */
  def buildLshSignatures(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bands = Similarity.simBandSigns
    Similarity.typedVecs(emb).as[(Long, Array[Double])].mapPartitions { it =>
      it.flatMap { case (id, v) =>
        Iterator.tabulate(bands.length)(b => (id, b, Kernels.lshSignature(v, bands(b))))
      }
    }.toDF("vec_id", "band", "sig")
  }

  def saveLshIndex(wh: Warehouse, dataset: String, table: String,
                   emb: DataFrame): Unit =
    wh.overwrite(dataset, table, buildLshSignatures(emb))

  /** Multi-band LSH top-k served from a materialized signature table:
    * the query batch's own band signatures land as a broadcast-joined
    * local relation, candidates come off the ARTIFACT (the corpus is
    * never re-signed), and raw vectors are fetched once, for scoring
    * only. Results are exactly [[Similarity.lshTopK]]'s. */
  def lshTopKFrom(emb: DataFrame, sigs: DataFrame, isQuery: Column,
                  k: Int = Similarity.TopK): DataFrame = {
    import emb.sparkSession.implicits._
    val bands = Similarity.simBandSigns
    val queries: Array[(Long, Array[Double], Double)] =
      Similarity.collectCapped(
        Similarity.typedVecs(emb).filter(isQuery).as[(Long, Array[Double])],
        "ANN query set")
        .map { case (id, v) => (id, v, Kernels.norm(v)) }
    val probeRows = queries.toIndexedSeq.flatMap { case (qid, v, _) =>
      val sig = Array.tabulate(bands.length)(b => Kernels.lshSignature(v, bands(b)))
      sig.indices.map(b => (qid, b, sig(b)))
    }
    servedFromSigs(emb, sigs, queries, probeRows, k)
  }

  /** Multi-probe serving from the SAME persisted signature artifact:
    * only the QUERY-side probe rows change — base band signatures plus
    * the [[Similarity.MultiProbeBudget]] margin-ranked flipped buckets
    * ([[Similarity.multiProbeSigs]]) — so the multi-probe recall lift
    * composes with the standing index at zero index-maintenance cost
    * (the corpus is never re-signed, the artifact schema is untouched).
    * Results are exactly [[Similarity.lshMultiProbeTopK]]'s. */
  def lshMultiProbeTopKFrom(emb: DataFrame, sigs: DataFrame, isQuery: Column,
                            k: Int = Similarity.TopK,
                            budget: Int = Similarity.MultiProbeBudget): DataFrame = {
    import emb.sparkSession.implicits._
    val queries: Array[(Long, Array[Double], Double)] =
      Similarity.collectCapped(
        Similarity.typedVecs(emb).filter(isQuery).as[(Long, Array[Double])],
        "ANN query set")
        .map { case (id, v) => (id, v, Kernels.norm(v)) }
    val probeRows = queries.toIndexedSeq.flatMap { case (qid, v, _) =>
      Similarity.multiProbeSigs(v, budget).toIndexedSeq.zipWithIndex.flatMap {
        case (ps, b) => ps.toIndexedSeq.map(s => (qid, b, s))
      }
    }
    servedFromSigs(emb, sigs, queries, probeRows, k)
  }

  /** Shared artifact-serving tail: candidates off the signature table
    * against broadcast query probe rows, raw vectors fetched once for
    * exact scoring, per-query top-k rank. */
  private def servedFromSigs(emb: DataFrame, sigs: DataFrame,
                             queries: Array[(Long, Array[Double], Double)],
                             probeRows: Seq[(Long, Int, Long)],
                             k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qSigs = spark.createDataset(probeRows.toIndexedSeq)
      .toDF("query_id", "band", "sig")
    val cand = sigs.join(broadcast(qSigs), Seq("band", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val qMap = queries.map { case (id, v, n) => id -> (v, n) }.toMap
    val bcQ = spark.sparkContext.broadcast(qMap)
    val scored = cand
      .join(Similarity.typedVecs(emb), Seq("vec_id"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.map { case (vid, qid, v) =>
          val (qv, qn) = qs(qid)
          (qid, vid, Kernels.dot(qv, v) / (qn * Kernels.norm(v)))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Hashing.stableRound(col("cos"), 4).as("cos"))
  }

  /** Append-only index maintenance: sign ONLY the new snapshot's vectors
    * and append their rows — the standing index never recomputes (the
    * [[Dedup.incrementalSimhashDedup]] contract applied to serving).
    * AnnIndexSpec proves build(A) + append(B) serves identically to a
    * full rebuild over A∪B. */
  def appendLshIndex(wh: Warehouse, dataset: String, table: String,
                     newEmb: DataFrame): Unit =
    wh.append(dataset, table, buildLshSignatures(newEmb))

  // ------------------------------------------------------------ IVF lists

  /** IVF top-k served from a materialized (vec_id, cell_id) assignment
    * table ([[Dedup.cellAssignments]] — the same artifact SemDeDup
    * scores from, so search and dedup literally share one table). The
    * probe set's member lists come off the ARTIFACT via a cell filter
    * (at scale: partition the table by cell_id and this is partition
    * pruning); the corpus assignment kernel never runs at query time;
    * raw vectors are fetched once, for member scoring only. Results are
    * exactly [[Similarity.ivfTopK]]'s for the same centroid set. */
  def ivfTopKFrom(emb: DataFrame, assign: DataFrame, centroids: DataFrame,
                  isQuery: Column, k: Int = Similarity.TopK,
                  nprobe: Int = Similarity.NProbe): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Similarity.collectCentroids(centroids)
    require(cents.nonEmpty, "IVF needs at least one centroid")
    val queries: Array[(Long, Array[Double], Double, Array[Long])] =
      Similarity.collectCapped(
        Similarity.typedVecs(emb).filter(isQuery).as[(Long, Array[Double])],
        "ANN query set")
        .map { case (id, v) =>
          val nrm = Kernels.norm(v)
          val probes = cents
            .map { case (cid, cv, cn) => (Kernels.dot(v, cv) / (nrm * cn), cid) }
            .sortBy { case (cos, cid) => (-cos, cid) }
            .take(nprobe).map(_._2)
          (id, v, nrm, probes)
        }
    val probedCells = queries.flatMap(_._4).distinct.map(java.lang.Long.valueOf)
    val bcQ = spark.sparkContext.broadcast(queries)
    val members = assign
      .select(col("vec_id").cast("long"), col("cell_id").cast("long"))
      .filter(col("cell_id").isin(probedCells.toIndexedSeq: _*))
    val scored = members
      .join(Similarity.typedVecs(emb), Seq("vec_id"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (vid, cell, v) =>
          val nrm = Kernels.norm(v)
          qs.iterator
            .filter { case (qid, _, _, probes) => qid != vid && probes.contains(cell) }
            .map { case (qid, qv, qn, _) => (qid, vid, Kernels.dot(qv, v) / (qn * nrm)) }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Hashing.stableRound(col("cos"), 4).as("cos"))
  }

  /** Persist the (vec_id, cell_id) member table — the one artifact IVF
    * serving ([[ivfTopKFrom]]) and SemDeDup scoring share. */
  def saveIvfMembers(wh: Warehouse, dataset: String, table: String,
                     emb: DataFrame, centroids: DataFrame): Unit =
    wh.overwrite(dataset, table, Dedup.cellAssignments(emb, centroids))

  /** Append-only IVF maintenance: new vectors assign against the SAME
    * frozen quantizer and append — build(A)+append(B) ≡ rebuild(A∪B)
    * because assignment is per-vector (no corpus state), completing the
    * append story for all three index families (LSH signatures, PQ
    * codes, IVF member lists). Retrain the quantizer only when drift
    * diagnostics ([[Similarity.labelCentroids]]) say the cells no longer
    * fit — that's a rebuild, not maintenance. */
  def appendIvfMembers(wh: Warehouse, dataset: String, table: String,
                       newEmb: DataFrame, centroids: DataFrame): Unit =
    wh.append(dataset, table, Dedup.cellAssignments(newEmb, centroids))

  // ------------------------------------------------------------- PQ codes

  /** The (vec_id, codes) artifact — [[ProductQuant.encode]] per vector
    * against an explicit codebook, one narrow kernel pass. 8 bytes of
    * payload per vector replace 512 of raw floats. */
  def buildPqCodes(emb: DataFrame,
                   cb: Array[Array[(Array[Double], Double)]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcCb = spark.sparkContext.broadcast(cb)
    Similarity.typedVecs(emb).as[(Long, Array[Double])].mapPartitions { it =>
      val codebook = bcCb.value
      it.map { case (id, v) => (id, ProductQuant.encode(v, codebook).toSeq) }
    }.toDF("vec_id", "codes")
  }

  def savePqCodes(wh: Warehouse, dataset: String, table: String,
                  emb: DataFrame,
                  cb: Array[Array[(Array[Double], Double)]]): Unit =
    wh.overwrite(dataset, table, buildPqCodes(emb, cb))

  /** Append-only codes maintenance — [[appendLshIndex]]'s contract for
    * the PQ artifact: encode ONLY the new snapshot's vectors against the
    * SAME frozen codebook and append their rows; the standing codes
    * never recompute. (The codebook must be the one the table was built
    * with — re-training it would silently mix quantizers in one table;
    * that migration is a rebuild, not an append.) AnnIndexSpec proves
    * build(A) + append(B) serves identically to a full rebuild. */
  def appendPqCodes(wh: Warehouse, dataset: String, table: String,
                    newEmb: DataFrame,
                    cb: Array[Array[(Array[Double], Double)]]): Unit =
    wh.append(dataset, table, buildPqCodes(newEmb, cb))

  /** ADC top-k served from a materialized codes table: per-query LUTs
    * broadcast, the scan reads ONLY (vec_id, codes) — no embedding is
    * touched for the corpus side at all. Results are exactly
    * [[ProductQuant.pqTopK]]'s for the same codebook. */
  def pqTopKFromCodes(emb: DataFrame, codes: DataFrame,
                      cb: Array[Array[(Array[Double], Double)]],
                      isQuery: Column,
                      k: Int = Similarity.TopK): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries: Array[(Long, Array[Array[Double]])] =
      Similarity.collectCapped(
        Similarity.typedVecs(emb).filter(isQuery).as[(Long, Array[Double])],
        "PQ query set")
        .map { case (qid, qv) => (qid, ProductQuant.queryLut(qv, cb)) }
    val bcQ = spark.sparkContext.broadcast(queries)
    val scored = codes
      .select(col("vec_id").cast("long"), col("codes").cast("array<int>"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (id, cs) =>
          qs.iterator.filter(_._1 != id).map { case (qid, lut) =>
            var adist = 0.0
            var m = 0
            while (m < cs.length) { adist += lut(m)(cs(m)); m += 1 }
            (qid, id, adist)
          }
        }
      }.toDF("query_id", "neighbor_id", "adist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Hashing.stableRound(col("adist"), 4).as("adist"))
  }

  // --------------------------------- DEFAULT serving path: residual IVF-ADC

  /** The (vec_id, cell, codes) artifact behind [[ivfpqTopKFrom]] — each
    * member's coarse cell plus its residual PQ codes (`x − centroid(cell)`
    * encoded against residual-space codebooks). M bytes + one long per
    * vector: the corpus-side state of the DEFAULT serving path, built
    * once per snapshot at ingest. */
  def buildIvfPqIndex(emb: DataFrame,
                      cents: Array[(Long, Array[Double], Double)],
                      cb: Array[Array[(Array[Double], Double)]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "IVF-PQ index needs at least one centroid")
    val bcC = spark.sparkContext.broadcast(cents)
    val bcCb = spark.sparkContext.broadcast(cb)
    Similarity.typedVecs(emb).as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value
      val cOf = cs.map(c => c._1 -> c._2).toMap
      val codebook = bcCb.value
      it.map { case (id, v) =>
        val cell = Kernels.assignCentroid(v, Kernels.norm(v), cs)
        (id, cell, ProductQuant.encode(ProductQuant.sub(v, cOf(cell)), codebook).toSeq)
      }
    }.toDF("vec_id", "cell", "codes")
  }

  def saveIvfPqIndex(wh: Warehouse, dataset: String, table: String,
                     emb: DataFrame,
                     cents: Array[(Long, Array[Double], Double)],
                     cb: Array[Array[(Array[Double], Double)]]): Unit =
    wh.overwrite(dataset, table, buildIvfPqIndex(emb, cents, cb))

  /** Append-only maintenance under FROZEN quantizers — the
    * [[appendPqCodes]] contract: new vectors assign + encode against the
    * coarse centroids and residual codebooks the table was built with. */
  def appendIvfPqIndex(wh: Warehouse, dataset: String, table: String,
                       newEmb: DataFrame,
                       cents: Array[(Long, Array[Double], Double)],
                       cb: Array[Array[(Array[Double], Double)]]): Unit =
    wh.append(dataset, table, buildIvfPqIndex(newEmb, cents, cb))

  /** THE DEFAULT ANN SERVING PATH — trained residual IVF-ADC off the
    * persisted [[buildIvfPqIndex]] artifact, the dominant point of the
    * measured r12 recall/cost frontier (0.71 recall at 11% candidate
    * cost with the fine-grid trained quantizers vs 0.68@23% for plain
    * trained IVF and 0.85@40% for LSH — see `ann_recall` in
    * bench_summary.json, where this path is marked `default`). Use the
    * others when their trade fits better (LSH family: higher recall,
    * ~4× candidate cost; `pq_*`: compression-only baselines that scan
    * everything).
    *
    * Shape: the query batch broadcasts its probe list + per-probe
    * residual LUTs; the scan reads ONLY the (vec_id, cell, codes)
    * artifact rows in probed cells (M-byte codes, never an embedding);
    * exact re-rank fetches raw vectors for the top-`shortlist` ADC
    * candidates per query only. Results are exactly
    * [[ProductQuant.ivfpqResidualTopKWith]]'s for the same quantizers
    * (AnnIndexSpec pins equality). */
  def ivfpqTopKFrom(emb: DataFrame, index: DataFrame,
                    cents: Array[(Long, Array[Double], Double)],
                    cb: Array[Array[(Array[Double], Double)]],
                    isQuery: Column,
                    k: Int = Similarity.TopK,
                    nprobe: Int = ProductQuant.IvfPqTrainedNProbe,
                    shortlist: Int = ProductQuant.ShortlistR): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "IVF-PQ serving needs at least one centroid")
    val centOf = cents.map(c => c._1 -> c._2).toMap
    val queries: Array[(Long, Array[Long], Array[Array[Array[Double]]])] =
      Similarity.collectCapped(
        Similarity.typedVecs(emb).filter(isQuery).as[(Long, Array[Double])],
        "ANN query set")
        .map { case (qid, qv) =>
          val nrm = Kernels.norm(qv)
          val probes = cents
            .map { case (cid, cv, cn) => (Kernels.dot(qv, cv) / (nrm * cn), cid) }
            .sortBy { case (cos, cid) => (-cos, cid) }
            .take(nprobe).map(_._2)
          (qid, probes, probes.map(cid =>
            ProductQuant.queryLut(ProductQuant.sub(qv, centOf(cid)), cb)))
        }
    val bcQ = spark.sparkContext.broadcast(queries)
    val probedCells = queries.flatMap(_._2).distinct.toSeq
    val scored = index
      .filter(col("cell").isin(probedCells: _*)) // cell-pruned artifact scan
      .select(col("vec_id").cast("long"), col("cell").cast("long"),
        col("codes").cast("array<int>"))
      .as[(Long, Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.flatMap { case (id, cell, codes) =>
          qs.iterator.flatMap { case (qid, probes, luts) =>
            val j = probes.indexOf(cell)
            if (qid == id || j < 0) Iterator.empty
            else {
              val lut = luts(j)
              var adist = 0.0
              var m = 0
              while (m < codes.length) { adist += lut(m)(codes(m)); m += 1 }
              Iterator.single((qid, id, adist))
            }
          }
        }
      }.toDF("query_id", "neighbor_id", "adist")
    ProductQuant.ivfpqRerank(emb, scored, isQuery, k, shortlist)
  }

  // ------------------------- corpus-adaptive training & retrain trigger

  /** Train the DEFAULT serving path's quantizers at the corpus-adaptive
    * grid (cells ∝ √n — [[ProductQuant.trainedInitSql]]): coarse k-means
    * first, then residual-space PQ codebooks, the IVFADC training order.
    * Returns the (cents, cb) pair [[buildIvfPqIndex]] /
    * [[ivfpqTopKFrom]] take. This is the function that closes the
    * fixed-grid scaling gap: per-query candidates stay ∝ √n instead of
    * ∝ n as the corpus grows (measured in SCALE.md's round-16 sweep). */
  def trainAdaptiveQuantizers(emb: DataFrame, iterations: Int = 5)
      : (Array[(Long, Array[Double], Double)],
         Array[Array[(Array[Double], Double)]]) = {
    val n = Similarity.typedVecs(emb).count()
    val init = expr(ProductQuant.trainedInitSql(n))
    val cents = Similarity.collectCentroids(
      Similarity.trainIvfCentroids(emb, init, iterations))
    (cents, ProductQuant.trainPqCodebooksResidual(emb, cents,
      expr(ProductQuant.isCbResidualSrcSql), iterations))
  }

  /** Verdict of [[retrainAdvice]] — the two production reasons to re-run
    * [[trainAdaptiveQuantizers]] over a standing index, measured. */
  final case class RetrainAdvice(
      corpusN: Long, trainedCells: Int, targetCells: Long,
      meanCellDriftCos: Double, minCellDriftCos: Double,
      sizeRetrain: Boolean, driftRetrain: Boolean) {
    def retrain: Boolean = sizeRetrain || driftRetrain
  }

  /** Retrain trigger for a standing IVF(-PQ) quantizer, from the CURRENT
    * corpus:
    *
    *  - SIZE: the corpus grew (or shrank) past the point where the
    *    trained grid is > `sizeBand`× off the cells ∝ √n target — the
    *    per-query candidate contract has drifted ≥ sizeBand× and the
    *    grid should be re-sized.
    *  - DRIFT: cell members moved away from their trained centroids
    *    (new crawl slice, distribution shift): the count-weighted mean
    *    cosine between each cell's CURRENT member centroid and its
    *    trained centroid falls below `driftFloor`. This is
    *    [[Similarity.labelCentroids]]'s diagnostic keyed by trained cell
    *    instead of label, under the same integer micro-unit discipline
    *    (sums are partition-stable; cosine is scale-free, so the member
    *    SUM stands in for the mean exactly).
    *
    * Cost shape: one narrow assignment pass over the corpus plus one
    * (cell, dim)-grain map-side-combined aggregate (cells·Dim rows out);
    * the collect is one row per trained cell — driver-sized by the same
    * bound as the centroid artifact itself. */
  def retrainAdvice(emb: DataFrame,
                    cents: Array[(Long, Array[Double], Double)],
                    driftFloor: Double = 0.9,
                    sizeBand: Double = 2.0): RetrainAdvice = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "retrain advice needs a trained centroid set")
    val n = Similarity.typedVecs(emb).count()
    val m = Similarity.adaptiveGridModulus(n,
      ProductQuant.IvfPqTrainedCellsPerSqrtN)
    val targetCells = math.max(1L, n / math.max(1L, m))
    val bc = spark.sparkContext.broadcast(cents)
    val micro = Similarity.CentroidMicro
    val perCell = Similarity.typedVecs(emb).as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.flatMap { case (_, v) =>
          val cell = Kernels.assignCentroid(v, Kernels.norm(v), cs)
          v.iterator.zipWithIndex.map { case (x, i) =>
            (cell, i, math.floor(x * micro).toLong)
          }
        }
      }.toDF("cell", "pos", "q")
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("_n"), sum(col("q")).cast("long").as("s"))
      .groupBy(col("cell"))
      .agg(max(when(col("pos") === 0, col("_n"))).cast("long").as("n_vecs"),
        expr("transform(array_sort(collect_list(struct(pos, s))), r -> r.s)")
          .as("vec"))
      .collect()
    val centOf = cents.map(c => c._1 -> c._2).toMap
    var wSum = 0.0
    var w = 0L
    var minCos = 1.0
    perCell.foreach { r =>
      val nv = r.getLong(1)
      val vec = r.getSeq[Long](2).toArray.map(_.toDouble)
      val c = centOf(r.getLong(0))
      val cos = Kernels.dot(vec, c) / (Kernels.norm(vec) * Kernels.norm(c))
      wSum += cos * nv
      w += nv
      if (cos < minCos) minCos = cos
    }
    val mean = if (w == 0) 1.0 else wSum / w
    RetrainAdvice(n, cents.length, targetCells, mean, minCos,
      sizeRetrain = targetCells > sizeBand * cents.length ||
        cents.length > sizeBand * targetCells,
      driftRetrain = mean < driftFloor)
  }

  // ------------------- registry + nightly-sweep wiring (r16 item 5)

  /** Persist the trained quantizers (coarse centroids + residual PQ
    * codebooks) as an ordinary warehouse table — the missing piece
    * between "an index artifact exists" and "the nightly sweep can
    * judge it": [[retrainAdvice]] needs the TRAINED centroids, and a
    * session restart must not lose them. Row shape: kind='cent' rows
    * carry (cell, vec, norm); kind='cb' rows carry (sub, code, vec,
    * norm). */
  def saveQuantizers(wh: Warehouse, dataset: String, table: String,
                     cents: Array[(Long, Array[Double], Double)],
                     cb: Array[Array[(Array[Double], Double)]]): Unit = {
    val spark = wh.spark
    import spark.implicits._
    val centRows = cents.toSeq.map { case (cell, vec, nrm) =>
      ("cent", cell, -1, -1, vec.toSeq, nrm)
    }
    val cbRows = cb.toSeq.zipWithIndex.flatMap { case (codes, m) =>
      codes.toSeq.zipWithIndex.map { case ((vec, nrm), j) =>
        ("cb", -1L, m, j, vec.toSeq, nrm)
      }
    }
    wh.overwrite(dataset, table, (centRows ++ cbRows)
      .toDF("kind", "cell", "sub", "code", "vec", "nrm"))
  }

  def loadQuantizers(wh: Warehouse, dataset: String, table: String)
      : (Array[(Long, Array[Double], Double)],
         Array[Array[(Array[Double], Double)]]) = {
    val rows = wh.read(dataset, table).collect()
    val cents = rows.filter(_.getString(0) == "cent")
      .map(r => (r.getLong(1), r.getSeq[Double](4).toArray, r.getDouble(5)))
      .sortBy(_._1)
    val cb = rows.filter(_.getString(0) == "cb")
      .map(r => (r.getInt(2), r.getInt(3),
        (r.getSeq[Double](4).toArray, r.getDouble(5))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
    (cents, cb)
  }

  /** Machine-readable registry marker carried in the INDEX table's own
    * description metadata (descriptions persist, copy and restore with
    * the table — no side catalog to drift): names the corpus and
    * quantizer tables the index was built from, so a maintenance sweep
    * can discover every index in a dataset and judge it. */
  private def marker(corpus: String, quantizers: String): String =
    s"graft-ann-index corpus=$corpus quantizers=$quantizers"

  private val MarkerRe =
    """graft-ann-index corpus=([^\s]+) quantizers=([^\s]+)""".r.unanchored

  /** Build + persist the DEFAULT serving path's full artifact set:
    * quantizers, (vec_id, cell, codes) index, and the registry marker
    * tying them to the corpus — the ingest-time call that makes the
    * index visible to [[sweepRetrainAdvice]]. */
  def saveIvfPqIndexRegistered(wh: Warehouse, dataset: String,
                               indexTable: String, quantTable: String,
                               corpusDataset: String, corpusTable: String,
                               emb: DataFrame,
                               cents: Array[(Long, Array[Double], Double)],
                               cb: Array[Array[(Array[Double], Double)]]): Unit = {
    saveQuantizers(wh, dataset, quantTable, cents, cb)
    saveIvfPqIndex(wh, dataset, indexTable, emb, cents, cb)
    val m = wh.meta(dataset, indexTable)
    wh.setMeta(dataset, indexTable, m.copy(description =
      Some(marker(s"$corpusDataset.$corpusTable", s"$dataset.$quantTable"))))
  }

  /** [[retrainAdvice]] for one REGISTERED index table: None when the
    * table carries no registry marker (not an index). The corpus is
    * read at its CURRENT snapshot — exactly what the advice exists to
    * compare against the trained state. */
  def retrainAdviceFor(wh: Warehouse, dataset: String, table: String)
      : Option[RetrainAdvice] =
    wh.meta(dataset, table).description.collect {
      case MarkerRe(corpus, quant) =>
        val Array(cd, ct) = corpus.split('.')
        val Array(qd, qt) = quant.split('.')
        val (cents, _) = loadQuantizers(wh, qd, qt)
        retrainAdvice(wh.read(cd, ct), cents)
    }

  /** The advisor hook [[graft.core.Warehouse.maintainDataset]] takes:
    * per table, a one-line verdict for registered index tables, None
    * for everything else. Failures are the CALLER's to isolate (the
    * sweep wraps each table). */
  def advisor(wh: Warehouse): (String, String) => Option[String] =
    (dataset, table) => retrainAdviceFor(wh, dataset, table).map { a =>
      if (a.retrain)
        (if (a.sizeRetrain)
          s"retrain(size): corpus=${a.corpusN} cells=${a.trainedCells} " +
            s"target=${a.targetCells}"
        else "") +
          (if (a.driftRetrain)
            s"${if (a.sizeRetrain) "; " else ""}retrain(drift): " +
              f"meanCos=${a.meanCellDriftCos}%.3f minCos=${a.minCellDriftCos}%.3f"
          else "")
      else f"ok: corpus=${a.corpusN} cells=${a.trainedCells} " +
        f"meanCos=${a.meanCellDriftCos}%.3f"
    }

  /** Nightly sweep over a dataset's REGISTERED indexes only — the
    * standalone form of passing [[advisor]] into `maintainDataset`. */
  def sweepRetrainAdvice(wh: Warehouse, dataset: String)
      : Seq[(String, RetrainAdvice)] =
    wh.listTables(dataset).flatMap(t =>
      try retrainAdviceFor(wh, dataset, t).map(t -> _)
      catch { case _: Exception => None })
}
