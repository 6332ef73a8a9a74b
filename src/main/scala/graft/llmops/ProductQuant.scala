package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the third scale path next to
  * sign-LSH and IVF, and the one that compresses the corpus itself:
  * each Dim=64 vector is encoded as M=8 one-byte codes (8 bytes replace
  * 512), and queries score candidates by table lookup (ADC — asymmetric
  * distance computation) instead of touching raw floats.
  *
  * The codebook is a deterministic sample of corpus vectors (the
  * smallest-id `Codes` rows matching the IVF centroid predicate), each
  * sliced into M contiguous SubDim-wide subvectors — standing in for
  * offline-k-means-per-subspace exactly as the IVF coarse quantizer
  * does, which keeps the operator oracle-checkable.
  *
  * Encoding assigns subvector m to its nearest codebook entry by
  * squared L2 `(x·x + c·c) − 2·(x·c)` — three left-to-right dot products
  * in the same order as the oracle's `list_dot_product` calls, so codes
  * are bit-identical across engines (strict `<` over ascending code ids
  * matches the oracle's `ORDER BY d, code` tie-break). A query builds
  * its M×Codes lookup table once; a candidate's approximate distance is
  * the fixed-order sum `(((L0+L1)+L2)+…)+L7`, mirrored by the oracle's
  * left-associated pivot sum — bit-identical again, so even RANKS match.
  *
  * CROSS-ENGINE CONTRACT: the bit-identical claim assumes DuckDB's
  * `list_dot_product` accumulates strictly left-to-right, which holds
  * for the scalar implementation the oracle currently runs. A DuckDB
  * upgrade to SIMD/pairwise summation would flip near-tie code
  * assignments and surface as an opaque `sim_topk_pq` hash mismatch —
  * if that happens, suspect summation order FIRST (the near-tie spec in
  * ProductQuantSpec pins the kernel side of the contract).
  *
  * Shape at 100 TB:
  *  - the codebook (M·Codes·SubDim doubles — 4 KB here) and the query
  *    LUTs (M·Codes doubles per query) broadcast; both collects ride the
  *    [[Similarity.collectCapped]] driver guard;
  *  - encode + score is ONE narrow kernel pass over the corpus — no
  *    shuffle, no raw-vector movement; in a production deployment the
  *    codes column (8 bytes/vector) is materialized once per corpus
  *    snapshot and scoring reads ONLY it (64× less IO than raw floats);
  *  - the final top-k is a per-query window over corpus-sized scored
  *    pairs, the same shape Catalyst executes as partial top-k; work per
  *    query is O(M·Codes) LUT build + O(n·M) lookup adds, no O(n·Dim)
  *    float math. */
object ProductQuant {

  /** M subspaces × SubDim dims = [[Similarity.Dim]]; Codes entries per
    * subspace codebook (one byte addresses up to 256). */
  val M = 8
  val SubDim = 8
  val Codes = 16

  /** Σ_{i<len} a(off+i)·b(i), left-to-right — `list_dot_product` of the
    * corresponding slices without copying. */
  private[graft] def dotAt(a: Array[Double], off: Int, b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < b.length) { acc += a(off + i) * b(i); i += 1 }
    acc
  }

  /** Per-subspace codebook: entry (m)(k) is the m-th slice of the k-th
    * smallest-id source row, paired with its self-dot. */
  private[graft] def buildCodebook(src: Array[(Long, Array[Double])])
      : Array[Array[(Array[Double], Double)]] = {
    val rows = src.sortBy(_._1).take(Codes)
    require(rows.nonEmpty, "PQ codebook predicate selected no rows")
    Array.tabulate(M) { m =>
      rows.map { case (_, v) =>
        val c = java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim)
        (c, dotAt(c, 0, c))
      }
    }
  }

  /** PQ codes for one vector: argmin_k of the subspace squared L2,
    * first minimum (smallest code) on ties. */
  private[graft] def encode(v: Array[Double],
                     cb: Array[Array[(Array[Double], Double)]]): Array[Int] = {
    val codes = new Array[Int](M)
    var m = 0
    while (m < M) {
      val off = m * SubDim
      val xx = {
        var acc = 0.0
        var i = 0
        while (i < SubDim) { val x = v(off + i); acc += x * x; i += 1 }
        acc
      }
      val entries = cb(m)
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < entries.length) {
        val (c, cc) = entries(k)
        val d = (xx + cc) - 2 * dotAt(v, off, c)
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      codes(m) = best
      m += 1
    }
    codes
  }

  /** Lloyd's k-means per subspace — the textbook PQ codebook trainer
    * (Jégou et al. §II.C), run as ONE distributed pass per iteration for
    * all M subspaces at once:
    *
    *  1. broadcast the current codebook (M·Codes·SubDim doubles — KBs),
    *  2. a narrow `mapPartitions` kernel runs the SAME [[encode]] used at
    *     query time (squared-L2, smallest-code tie-break), emitting one
    *     (m, code, subvector) row per subspace per vector — training and
    *     serving can never disagree on cell boundaries,
    *  3. per-(m, code) means via one declarative groupBy with an `avg`
    *     per dimension (codegen'd, map-side partial) — the only shuffle,
    *     M·Codes output rows collected to update the broadcast.
    *
    * Cells that lose all members keep their previous entry (codebook
    * size stays constant). Initialization is [[buildCodebook]]'s
    * deterministic smallest-id sample, so iterations = 0 reproduces the
    * oracle codebook exactly.
    *
    * Not oracle-gated (same contract as [[Similarity.trainIvfCentroids]]):
    * `avg` over shuffled doubles is not bit-stable across partitionings;
    * ProductQuantSpec gates the invariants instead — quantization error
    * non-increasing, recall@k over the sampled codebook. */
  def trainPqCodebooks(emb: DataFrame, isInit: Column, iterations: Int = 5)
      : Array[Array[(Array[Double], Double)]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = Similarity.typedVecs(emb)
    var cb = buildCodebook(
      Similarity.collectCapped(e.filter(isInit).as[(Long, Array[Double])],
        "PQ codebook source"))
    var it = 0
    while (it < iterations) {
      val bc = spark.sparkContext.broadcast(cb)
      val assigned = e.as[(Long, Array[Double])].mapPartitions { rows =>
        val codebook = bc.value
        rows.flatMap { case (_, v) =>
          val codes = encode(v, codebook)
          Iterator.tabulate(M) { m =>
            (m, codes(m),
              java.util.Arrays.copyOfRange(v, m * SubDim, (m + 1) * SubDim).toSeq)
          }
        }
      }.toDF("m", "code", "sv")
      val avgCols = (0 until SubDim).map(i => avg(col("sv").getItem(i)).as(s"c$i"))
      val means: Map[(Int, Int), Array[Double]] = assigned
        .groupBy(col("m"), col("code"))
        .agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          Array.tabulate(SubDim)(i => r.getDouble(i + 2)))
        .toMap
      cb = Array.tabulate(M) { m =>
        cb(m).zipWithIndex.map { case ((prev, prevCc), kIdx) =>
          val c = means.getOrElse((m, kIdx), prev) // empty cell keeps its entry
          (c, dotAt(c, 0, c))
        }
      }
      bc.unpersist()
      it += 1
    }
    cb
  }

  /** Element-wise difference — residual vectors (Jégou §V: IVFADC
    * encodes x − q₁(x), not x). Each component is ONE IEEE subtraction,
    * order-free, so the oracle's `list_zip`/`list_transform` mirror is
    * bit-identical by construction. */
  private[graft] def sub(a: Array[Double], b: Array[Double]): Array[Double] = {
    val r = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { r(i) = a(i) - b(i); i += 1 }
    r
  }

  /** Per-query ADC lookup table: entry (m)(k) is the squared L2 between
    * the query's m-th subvector and codebook entry k — the same three
    * left-to-right dot products as [[encode]], shared by every ADC
    * serving path (in-pass, composed IVF, and the persisted-codes form). */
  private[llmops] def queryLut(qv: Array[Double],
                               cb: Array[Array[(Array[Double], Double)]])
      : Array[Array[Double]] =
    Array.tabulate(M) { m =>
      val off = m * SubDim
      val qq = {
        var acc = 0.0
        var i = 0
        while (i < SubDim) { val x = qv(off + i); acc += x * x; i += 1 }
        acc
      }
      cb(m).map { case (c, cc) => (qq + cc) - 2 * dotAt(qv, off, c) }
    }

  /** ADC top-k against a trained (or any explicit) codebook — the serving
    * side of [[trainPqCodebooks]]. */
  def pqTopKTrained(emb: DataFrame, isQuery: Column,
                    cb: Array[Array[(Array[Double], Double)]],
                    k: Int = Similarity.TopK): DataFrame =
    pqTopKWith(emb, isQuery, cb, k)

  /** ADC top-k: encode the corpus, broadcast per-query LUTs, rank
    * candidates by the fixed-order lookup sum (ascending — it is a
    * distance), ties to the smaller neighbor id. Identity pairs are
    * excluded. Output: (query_id, neighbor_id, rank, adist). */
  def pqTopK(emb: DataFrame, isQuery: Column, isCodebook: Column,
             k: Int = Similarity.TopK): DataFrame = {
    val e = Similarity.typedVecs(emb)
    import emb.sparkSession.implicits._
    val cb = buildCodebook(
      Similarity.collectCapped(e.filter(isCodebook).as[(Long, Array[Double])],
        "PQ codebook source"))
    pqTopKWith(emb, isQuery, cb, k)
  }

  private def pqTopKWith(emb: DataFrame, isQuery: Column,
                         cb: Array[Array[(Array[Double], Double)]],
                         k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = Similarity.typedVecs(emb)
    val queries: Array[(Long, Array[Array[Double]])] =
      Similarity.collectCapped(e.filter(isQuery).as[(Long, Array[Double])],
        "PQ query set")
        .map { case (qid, qv) => (qid, queryLut(qv, cb)) }
    val bcCb = spark.sparkContext.broadcast(cb)
    val bcQ = spark.sparkContext.broadcast(queries)
    val scored = e.as[(Long, Array[Double])].mapPartitions { it =>
      val codebook = bcCb.value
      val qs = bcQ.value
      it.flatMap { case (id, v) =>
        val codes = encode(v, codebook)
        qs.iterator.filter(_._1 != id).map { case (qid, lut) =>
          var adist = 0.0
          var m = 0
          while (m < M) { adist += lut(m)(codes(m)); m += 1 }
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

  // --------------------------------------------------- IVF-ADC composed

  /** Probe width and ADC-shortlist size for [[ivfpqTopK]]. nprobe=8 of
    * ~69 cells scans ~11% of the corpus; the top-[[ShortlistR]] ADC
    * survivors (per query) are the only rows whose RAW vectors are ever
    * touched again. */
  val IvfPqNProbe = 8
  val ShortlistR = 100

  /** Trained-serving coarse config: a FINER coarse quantizer probed
    * wider at the SAME candidate budget. The sampled path's 8-of-69
    * probe admits only ~40% of true neighbors before ADC even runs —
    * the probe, not quantization fidelity, is the recall ceiling (the
    * round-12 residual-encoding measurement: +0.01 recall). Halving the
    * cell size and widening nprobe keeps candidates ≈ nprobe·n/nlist
    * roughly constant while the finer partition tracks the query's true
    * neighborhood better — the standard nlist/nprobe trade (Jégou §V).
    * Measured sweep at the bench SF (trained, exact-probe ceiling):
    * 69 cells/8 probes 0.51@233, 154/24 0.65@314, 286/32 0.75@221 —
    * the finest grid dominates at equal budget.
    *
    * The trained grid SIZES ITSELF from the corpus (cells ∝ √n — the
    * same [[Similarity.adaptiveGridModulus]] rule as the sampled grid,
    * at the serving density the sweep chose: 286 cells at n = 2000 ⇒
    * c = 6.39, i.e. m(2000) = 7 exactly, so the bench-SF quantizer — and
    * the 0.71-recall `ann_recall` side-channel entry — is bit-for-bit
    * the round-12 one). nprobe stays FIXED as the grid grows: per-query
    * candidates ≈ nprobe·√n/c grow as √n (0.5/decade), and a finer grid
    * probed at constant width tracks the query's true neighborhood at
    * least as well per candidate (the sweep's own trend). */
  val IvfPqTrainedCellsPerSqrtN = 6.39
  val IvfPqTrainedNProbe = 32

  /** Corpus-adaptive k-means init predicate for the trained serving
    * grid ([[Similarity.trainIvfCentroids]] init = one row per cell). */
  def trainedInitSql(n: Long): String =
    Similarity.adaptiveCentroidSqlFor(
      Similarity.adaptiveGridModulus(n, IvfPqTrainedCellsPerSqrtN))

  /** IVF-ADC with exact re-rank — the standard 100 TB ANN serving
    * architecture (Jégou et al. §V: coarse quantizer + PQ residual scan),
    * composed from the two halves this file and [[Similarity]] already
    * serve separately:
    *
    *  1. COARSE PROBE: the query is assigned its `nprobe` nearest IVF
    *     cells (broadcast centroid artifact — same probe machinery and
    *     tie-breaks as [[Similarity.ivfTopK]]).
    *  2. ADC SCAN: only members of probed cells are scored, by LUT
    *     lookup over their PQ codes — one narrow kernel pass that reads
    *     codes (8 bytes/vector in a production codes column), never raw
    *     floats; candidates per query drop to ~nprobe·n/nlist.
    *  3. EXACT RE-RANK: the top-`shortlist` ADC survivors per query
    *     re-attach their raw vectors (an equi-join touching
    *     queries×shortlist rows, NOT the corpus) and rank by exact
    *     cosine — repairing ADC's quantization-ordering errors, which is
    *     what lifts recall over the pure-PQ path (measured: 0.39 vs
    *     pq_trained 0.18 at the bench SF, at ~11% candidate cost).
    *
    * Every stage is deterministic (sampled centroids + codebook, fixed
    * fold orders, id tie-breaks), so the composition is oracle-gated
    * end to end — `sim_topk_ivfpq` hash-matches DuckDB.
    * Output: (query_id, neighbor_id, rank, cos). */
  def ivfpqTopK(emb: DataFrame, isQuery: Column, isCentroid: Column,
                k: Int = Similarity.TopK, nprobe: Int = IvfPqNProbe,
                shortlist: Int = ShortlistR): DataFrame = {
    val e = Similarity.typedVecs(emb)
    import emb.sparkSession.implicits._
    val cents = Similarity.sampledCentroids(emb, isCentroid)
    val cb = buildCodebook(cents.map { case (id, v, _) => (id, v) })
    ivfpqTopKWith(emb, isQuery, cents, cb, k, nprobe, shortlist)
  }

  /** [[ivfpqTopK]] over explicit centroid/codebook artifacts — the
    * trained-quantizer serving path ([[Similarity.trainIvfCentroids]] +
    * [[trainPqCodebooks]] outputs plug in directly). */
  def ivfpqTopKWith(emb: DataFrame, isQuery: Column,
                    cents: Array[(Long, Array[Double], Double)],
                    cb: Array[Array[(Array[Double], Double)]],
                    k: Int = Similarity.TopK, nprobe: Int = IvfPqNProbe,
                    shortlist: Int = ShortlistR): DataFrame =
    ivfpqRerank(emb, ivfpqAdc(emb, isQuery, cents, cb, nprobe), isQuery,
      k, shortlist)

  /** Shortlist + exact re-rank over a prebuilt ADC frame — split out so
    * [[RecallReport]] can score recall and candidate cost from ONE
    * cached ADC pass instead of running the scan twice. */
  private[llmops] def ivfpqRerank(emb: DataFrame, adc: DataFrame,
                                  isQuery: Column, k: Int,
                                  shortlist: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    val short = adc.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: raw vectors touched for the shortlist ONLY — an
    // equi-join on neighbor_id over queries×shortlist rows; the query
    // vectors ride the (already capped) broadcast
    val e = Similarity.typedVecs(emb)
    val queries: Map[Long, (Array[Double], Double)] =
      Similarity.collectCapped(e.filter(isQuery).as[(Long, Array[Double])],
          "ANN query set")
        .map { case (id, v) => id -> (v, Kernels.norm(v)) }.toMap
    val bcQ = spark.sparkContext.broadcast(queries)
    val scored = short
      .join(e.toDF("neighbor_id", "nv"), Seq("neighbor_id"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.map { case (nid, qid, nv) =>
          val (qv, qn) = qs(qid)
          (qid, nid, Kernels.dot(qv, nv) / (qn * Kernels.norm(nv)))
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        Hashing.stableRound(col("cos"), 4).as("cos"))
  }

  /** ADC scoring over probed-cell members only (pre-shortlist) — exposed
    * so [[RecallReport]] can count candidate work next to recall. */
  private[llmops] def ivfpqAdc(emb: DataFrame, isQuery: Column,
                               cents: Array[(Long, Array[Double], Double)],
                               cb: Array[Array[(Array[Double], Double)]],
                               nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "IVF-PQ needs at least one centroid")
    val e = Similarity.typedVecs(emb)
    val queries: Array[(Long, Array[Long], Array[Array[Double]])] =
      Similarity.collectCapped(e.filter(isQuery).as[(Long, Array[Double])],
          "ANN query set")
        .map { case (qid, qv) =>
          val nrm = Kernels.norm(qv)
          val probes = cents
            .map { case (cid, cv, cn) => (Kernels.dot(qv, cv) / (nrm * cn), cid) }
            .sortBy { case (cos, cid) => (-cos, cid) }
            .take(nprobe).map(_._2)
          (qid, probes, queryLut(qv, cb))
        }
    val bcC = spark.sparkContext.broadcast(cents)
    val bcCb = spark.sparkContext.broadcast(cb)
    val bcQ = spark.sparkContext.broadcast(queries)
    e.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value
      val codebook = bcCb.value
      val qs = bcQ.value
      it.flatMap { case (id, v) =>
        val cid = Kernels.assignCentroid(v, Kernels.norm(v), cs)
        val codes = encode(v, codebook)
        qs.iterator
          .filter { case (qid, probes, _) => qid != id && probes.contains(cid) }
          .map { case (qid, _, lut) =>
            var adist = 0.0
            var m = 0
            while (m < M) { adist += lut(m)(codes(m)); m += 1 }
            (qid, id, adist)
          }
      }
    }.toDF("query_id", "neighbor_id", "adist")
  }

  // ------------------------------------- residual encoding (true IVFADC)

  /** Codebook-source predicate for the residual path: deterministic,
    * disjoint from the query set (`vec_id < 10`) and offset from the
    * centroid residue class — the residuals of CENTROID rows are ~0
    * (a centroid minus itself), which would train a degenerate codebook. */
  private[llmops] val isCbResidualSrcSql = "vec_id % 29 = 7 AND vec_id >= 10"

  /** Residual codebook: the smallest-id [[Codes]] rows matching `isSrc`,
    * each encoded as its RESIDUAL against its assigned coarse centroid —
    * the quantizer trains in the space it will quantize. */
  def residualCodebook(emb: DataFrame, cents: Array[(Long, Array[Double], Double)],
                       isSrc: Column): Array[Array[(Array[Double], Double)]] = {
    import emb.sparkSession.implicits._
    val e = Similarity.typedVecs(emb)
    val centOf = cents.map(c => c._1 -> c._2).toMap
    val src = Similarity.collectCapped(
        e.filter(isSrc).as[(Long, Array[Double])], "residual-PQ codebook source")
      .sortBy(_._1).take(Codes)
      .map { case (id, v) =>
        (id, sub(v, centOf(Kernels.assignCentroid(v, Kernels.norm(v), cents))))
      }
    buildCodebook(src)
  }

  /** Residual-encoded IVF-ADC (the canonical IVFADC of Jégou et al.
    * 2011 §V): a member of cell c encodes `x − centroid(c)` and a query
    * probing cell c scores with the LUT of `q − centroid(c)` — distances
    * approximate ‖(q−c) − (x−c)‖ = ‖q − x‖ directly, where raw-vector
    * PQ under IVF wastes its code budget re-describing the cell offset
    * every member of the cell shares. Same scan shape and candidate
    * cost as [[ivfpqAdc]]; the LUT is per-(query, probed cell) instead
    * of per-query (nprobe× more driver-side LUT work, corpus work
    * unchanged). */
  private[llmops] def ivfpqResidualAdc(emb: DataFrame, isQuery: Column,
                                       cents: Array[(Long, Array[Double], Double)],
                                       cb: Array[Array[(Array[Double], Double)]],
                                       nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "IVF-PQ needs at least one centroid")
    val e = Similarity.typedVecs(emb)
    val centOf = cents.map(c => c._1 -> c._2).toMap
    // per query: probed cell ids aligned with the residual LUT of each
    val queries: Array[(Long, Array[Long], Array[Array[Array[Double]]])] =
      Similarity.collectCapped(e.filter(isQuery).as[(Long, Array[Double])],
          "ANN query set")
        .map { case (qid, qv) =>
          val nrm = Kernels.norm(qv)
          val probes = cents
            .map { case (cid, cv, cn) => (Kernels.dot(qv, cv) / (nrm * cn), cid) }
            .sortBy { case (cos, cid) => (-cos, cid) }
            .take(nprobe).map(_._2)
          (qid, probes, probes.map(cid => queryLut(sub(qv, centOf(cid)), cb)))
        }
    val bcC = spark.sparkContext.broadcast(cents)
    val bcCb = spark.sparkContext.broadcast(cb)
    val bcQ = spark.sparkContext.broadcast(queries)
    e.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value
      val codebook = bcCb.value
      val cOf = cs.map(c => c._1 -> c._2).toMap
      val qs = bcQ.value
      it.flatMap { case (id, v) =>
        val cid = Kernels.assignCentroid(v, Kernels.norm(v), cs)
        val codes = encode(sub(v, cOf(cid)), codebook)
        qs.iterator.flatMap { case (qid, probes, luts) =>
          val j = probes.indexOf(cid)
          if (qid == id || j < 0) Iterator.empty
          else {
            val lut = luts(j)
            var adist = 0.0
            var m = 0
            while (m < M) { adist += lut(m)(codes(m)); m += 1 }
            Iterator.single((qid, id, adist))
          }
        }
      }
    }.toDF("query_id", "neighbor_id", "adist")
  }

  /** Residual IVF-ADC with exact re-rank over explicit artifacts. */
  def ivfpqResidualTopKWith(emb: DataFrame, isQuery: Column,
                            cents: Array[(Long, Array[Double], Double)],
                            cb: Array[Array[(Array[Double], Double)]],
                            k: Int = Similarity.TopK, nprobe: Int = IvfPqNProbe,
                            shortlist: Int = ShortlistR): DataFrame =
    ivfpqRerank(emb, ivfpqResidualAdc(emb, isQuery, cents, cb, nprobe), isQuery,
      k, shortlist)

  /** Residual IVF-ADC with sampled quantizers — the oracle-gated form. */
  def ivfpqResidualTopK(emb: DataFrame, isQuery: Column, isCentroid: Column,
                        isCbSrc: Column,
                        k: Int = Similarity.TopK, nprobe: Int = IvfPqNProbe,
                        shortlist: Int = ShortlistR): DataFrame = {
    val cents = Similarity.sampledCentroids(emb, isCentroid)
    ivfpqResidualTopKWith(emb, isQuery, cents,
      residualCodebook(emb, cents, isCbSrc), k, nprobe, shortlist)
  }

  /** Lloyd's per-subspace k-means in RESIDUAL space — the trainer for
    * the residual path: every subvector sample is `x − centroid(x)`
    * under the FIXED coarse quantizer `cents` (train coarse first, then
    * residual codebooks, exactly the IVFADC training order). Same loop,
    * convergence, and empty-cell policy as [[trainPqCodebooks]]. */
  def trainPqCodebooksResidual(emb: DataFrame,
                               cents: Array[(Long, Array[Double], Double)],
                               isInit: Column, iterations: Int = 5)
      : Array[Array[(Array[Double], Double)]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = Similarity.typedVecs(emb)
    var cb = residualCodebook(emb, cents, isInit)
    val bcC = spark.sparkContext.broadcast(cents)
    var it = 0
    while (it < iterations) {
      val bc = spark.sparkContext.broadcast(cb)
      val assigned = e.as[(Long, Array[Double])].mapPartitions { rows =>
        val codebook = bc.value
        val cs = bcC.value
        val cOf = cs.map(c => c._1 -> c._2).toMap
        rows.flatMap { case (_, v) =>
          val r = sub(v, cOf(Kernels.assignCentroid(v, Kernels.norm(v), cs)))
          val codes = encode(r, codebook)
          Iterator.tabulate(M) { m =>
            (m, codes(m),
              java.util.Arrays.copyOfRange(r, m * SubDim, (m + 1) * SubDim).toSeq)
          }
        }
      }.toDF("m", "code", "sv")
      val avgCols = (0 until SubDim).map(i => avg(col("sv").getItem(i)).as(s"c$i"))
      val means: Map[(Int, Int), Array[Double]] = assigned
        .groupBy(col("m"), col("code"))
        .agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          Array.tabulate(SubDim)(i => r.getDouble(i + 2)))
        .toMap
      cb = Array.tabulate(M) { m =>
        cb(m).zipWithIndex.map { case ((prev, _), kIdx) =>
          val c = means.getOrElse((m, kIdx), prev)
          (c, dotAt(c, 0, c))
        }
      }
      bc.unpersist()
      it += 1
    }
    bcC.unpersist()
    cb
  }

  // ------------------------------------------------------------ queries

  def qPqTopK(spark: SparkSession, dir: String): DataFrame =
    pqTopK(Tables.load(spark, dir, "embeddings"),
      expr(Similarity.isQuerySql), expr(Similarity.isCentroidSql))

  /** Same codebook/encode/LUT trees in DuckDB: slices via `list_slice`
    * (1-based inclusive), assignment tie-break via `ORDER BY d, code`,
    * and the ADC sum left-associated through an 8-column pivot so the
    * double addition order matches the kernel loop exactly. */
  val qPqTopKSql: String = {
    val adcSum = (1 until M).foldLeft("d0")((acc, m) => s"($acc + d$m)")
    val pivots = (0 until M).map(m =>
      s"max(CASE WHEN l.m = $m THEN l.dq END) AS d$m").mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE ${Similarity.vecFilterSql}),
       |ms AS (SELECT unnest(generate_series(0, ${M - 1})) AS m),
       |cbsrc AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
       |  FROM (SELECT vec_id, v FROM e WHERE ${Similarity.isCentroidSql}
       |        ORDER BY vec_id LIMIT $Codes)),
       |cb AS MATERIALIZED (
       |  SELECT m, code,
       |         list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim) AS cv,
       |         list_dot_product(list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim),
       |                          list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim)) AS cc
       |  FROM cbsrc CROSS JOIN ms),
       |enc AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT x.vec_id, c.m, c.code,
       |           row_number() OVER (PARTITION BY x.vec_id, c.m ORDER BY
       |             (list_dot_product(list_slice(x.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim),
       |                               list_slice(x.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim)) + c.cc)
       |             - 2 * list_dot_product(list_slice(x.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim), c.cv),
       |             c.code) AS rnk
       |    FROM e x CROSS JOIN cb c)
       |  WHERE rnk = 1),
       |lut AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, c.m, c.code,
       |         (list_dot_product(list_slice(q.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim),
       |                           list_slice(q.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim)) + c.cc)
       |         - 2 * list_dot_product(list_slice(q.v, c.m * $SubDim + 1, (c.m + 1) * $SubDim), c.cv) AS dq
       |  FROM e q CROSS JOIN cb c WHERE q.${Similarity.isQuerySql}),
       |adc AS (
       |  SELECT l.query_id, x.vec_id AS neighbor_id,
       |         $pivots
       |  FROM enc x JOIN lut l ON l.m = x.m AND l.code = x.code
       |  GROUP BY l.query_id, x.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adist FROM adc
       |  WHERE neighbor_id <> query_id)
       |SELECT query_id, neighbor_id, rank,
       |       ${Hashing.stableRoundSql("adist", 4)} AS adist
       |FROM (SELECT query_id, neighbor_id, adist,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY adist, neighbor_id) AS rank
       |      FROM scored)
       |WHERE rank <= ${Similarity.TopK}""".stripMargin
  }

  def qIvfPqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    // adaptive coarse grid (cells ∝ √n — see Similarity.IvfCellsPerSqrtN);
    // the codebook source explicitly excludes the centroid class: a
    // centroid's residual is ~0 and would train a degenerate code (at
    // the bench SF the legacy residue classes were disjoint by
    // construction — the exclusion preserves that hygiene at any m)
    val cent = Similarity.adaptiveCentroidCol(e)
    ivfpqResidualTopK(e, expr(Similarity.isQuerySql), cent,
      expr(isCbResidualSrcSql) && !cent)
  }

  /** The composed RESIDUAL pipeline in DuckDB: IVF assign/probe CTEs
    * (the `sim_topk_ivf` fragments), residual vectors via
    * `list_zip`/`list_transform` (element-wise subtraction — one IEEE op
    * per component, order-free, so bit-identical to the kernel's `sub`),
    * PQ encode/LUT CTEs over RESIDUAL slices with the LUT keyed per
    * (query, probed cell), ADC restricted to probed-cell members, an
    * `ORDER BY adist, neighbor_id` shortlist cut, then the exact-cosine
    * re-rank — each double op in the same order as the kernels, so the
    * three-stage composition hash-matches end to end. */
  val qIvfPqTopKSql: String = {
    val adcSum = (1 until M).foldLeft("d0")((acc, m) => s"($acc + d$m)")
    val pivots = (0 until M).map(m =>
      s"max(CASE WHEN l.m = $m THEN l.dq END) AS d$m").mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE ${Similarity.vecFilterSql}),
       |${Similarity.gridCteSql},
       |n AS MATERIALIZED (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |         WHERE ${Similarity.adaptiveCentroidCondSql()}),
       |assign AS MATERIALIZED (
       |  SELECT n.vec_id, cid,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY list_dot_product(v, cv) / (nrm * cnrm) DESC, cid) AS crnk
       |  FROM n CROSS JOIN cent),
       |member AS (SELECT vec_id, cid FROM assign WHERE crnk = 1),
       |probe AS (SELECT vec_id, cid FROM assign
       |          WHERE crnk <= $IvfPqNProbe AND (${Similarity.isQuerySql})),
       |resid AS MATERIALIZED (
       |  SELECT mm.vec_id, mm.cid,
       |         list_transform(list_zip(x.v, c.cv), z -> z[1] - z[2]) AS rv
       |  FROM member mm
       |  JOIN e x ON x.vec_id = mm.vec_id
       |  JOIN cent c ON c.cid = mm.cid),
       |ms AS (SELECT unnest(generate_series(0, ${M - 1})) AS m),
       |cbsrc AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, rv AS v
       |  FROM (SELECT r.vec_id, r.rv FROM resid r
       |        WHERE r.$isCbResidualSrcSql
       |          AND NOT (${Similarity.adaptiveCentroidCondSql("r.")})
       |        ORDER BY r.vec_id LIMIT $Codes)),
       |cb AS MATERIALIZED (
       |  SELECT m, code,
       |         list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim) AS cv,
       |         list_dot_product(list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim),
       |                          list_slice(v, m * $SubDim + 1, (m + 1) * $SubDim)) AS cc
       |  FROM cbsrc CROSS JOIN ms),
       |enc AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT x.vec_id, c.m, c.code,
       |           row_number() OVER (PARTITION BY x.vec_id, c.m ORDER BY
       |             (list_dot_product(list_slice(x.rv, c.m * $SubDim + 1, (c.m + 1) * $SubDim),
       |                               list_slice(x.rv, c.m * $SubDim + 1, (c.m + 1) * $SubDim)) + c.cc)
       |             - 2 * list_dot_product(list_slice(x.rv, c.m * $SubDim + 1, (c.m + 1) * $SubDim), c.cv),
       |             c.code) AS rnk
       |    FROM resid x CROSS JOIN cb c)
       |  WHERE rnk = 1),
       |qres AS MATERIALIZED (
       |  SELECT p.vec_id AS query_id, p.cid,
       |         list_transform(list_zip(q.v, c.cv), z -> z[1] - z[2]) AS qrv
       |  FROM probe p
       |  JOIN e q ON q.vec_id = p.vec_id
       |  JOIN cent c ON c.cid = p.cid),
       |lut AS MATERIALIZED (
       |  SELECT qr.query_id, qr.cid, c.m, c.code,
       |         (list_dot_product(list_slice(qr.qrv, c.m * $SubDim + 1, (c.m + 1) * $SubDim),
       |                           list_slice(qr.qrv, c.m * $SubDim + 1, (c.m + 1) * $SubDim)) + c.cc)
       |         - 2 * list_dot_product(list_slice(qr.qrv, c.m * $SubDim + 1, (c.m + 1) * $SubDim), c.cv) AS dq
       |  FROM qres qr CROSS JOIN cb c),
       |adc AS (
       |  SELECT p.vec_id AS query_id, mm.vec_id AS neighbor_id,
       |         $pivots
       |  FROM probe p
       |  JOIN member mm ON mm.cid = p.cid
       |  JOIN enc x ON x.vec_id = mm.vec_id
       |  JOIN lut l ON l.query_id = p.vec_id AND l.cid = p.cid
       |            AND l.m = x.m AND l.code = x.code
       |  WHERE mm.vec_id <> p.vec_id
       |  GROUP BY p.vec_id, mm.vec_id),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY $adcSum, neighbor_id) AS srnk
       |    FROM adc)
       |  WHERE srnk <= $ShortlistR),
       |scored AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM short s
       |  JOIN n q ON q.vec_id = s.query_id
       |  JOIN n c ON c.vec_id = s.neighbor_id)
       |SELECT query_id, neighbor_id, rank,
       |       ${Hashing.stableRoundSql("cos", 4)} AS cos
       |FROM (SELECT query_id, neighbor_id, cos,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY cos DESC, neighbor_id) AS rank
       |      FROM scored)
       |WHERE rank <= ${Similarity.TopK}""".stripMargin
  }

  // ------------------------------------------- scalar quantization (SQ8)

  /** Per-dimension (mn, mx) range table — the SQ8 "codebook": one
    * map-side-combined aggregate over exploded components, `Dim` rows
    * out whatever the corpus size. Train once per corpus snapshot. */
  def trainScalarQuant(emb: DataFrame): DataFrame =
    Similarity.typedVecs(emb)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Int8 scalar quantization (the FAISS SQ8 memory path): affine-map
    * every component to 0..255 against the per-dim range —
    * `code = floor((x−mn)·255/(mx−mn) + 0.5)` — cutting vector memory
    * 4× vs float32 with bounded reconstruction error, the first lever
    * pulled when a 100 TB corpus's raw vectors outgrow executor memory
    * (PQ compresses further; SQ8 keeps per-dim fidelity). Degenerate
    * dims (mx = mn) pin to code 0 on both engines — no 0/0 NaN/NULL
    * divergence.
    *
    * Per-vector output pins the full encoding without hashing arrays:
    * the code sum/min/max and the max reconstruction error in integer
    * micro-units, every double op in the same left-associated order as
    * the oracle SQL. Encode is ONE narrow kernel pass against the
    * broadcast range table — no explode, no shuffle; output
    * partitioning mirrors input. */
  def scalarQuantizeInt8(emb: DataFrame, ranges: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val r = ranges.select(col("pos").cast("int"), col("mn"), col("mx"))
      .collect().map(row => (row.getInt(0), row.getDouble(1), row.getDouble(2)))
      .sortBy(_._1)
    require(r.length == Similarity.Dim,
      s"scalar-quant range table has ${r.length} dims, expected " +
        s"${Similarity.Dim} — trained on a different schema?")
    require(r.map(_._1).toSeq == r.indices,
      "scalar-quant range table positions are not contiguous from 0")
    val mn = r.map(_._2)
    val mx = r.map(_._3)
    val bc = spark.sparkContext.broadcast((mn, mx))
    Similarity.typedVecs(emb).as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (lo, hi) = bc.value
        it.map { case (id, v) =>
          var sum = 0L
          var cmin = Long.MaxValue
          var cmax = Long.MinValue
          var maxErr = 0.0
          var i = 0
          while (i < v.length) {
            val (c, e) =
              if (hi(i) == lo(i)) (0L, 0.0)
              else {
                // clamp AFTER the affine map: a later batch encoded
                // against a stored range table can fall outside the
                // trained [mn, mx] — saturating is the int8 contract
                // (identity for in-range data, so the self-trained
                // oracle is unchanged)
                val code = math.min(255.0, math.max(0.0,
                  math.floor((v(i) - lo(i)) * 255.0 / (hi(i) - lo(i)) + 0.5)))
                val err = math.abs(lo(i) + (code * (hi(i) - lo(i))) / 255.0 - v(i))
                (code.toLong, err)
              }
            sum += c
            if (c < cmin) cmin = c
            if (c > cmax) cmax = c
            if (e > maxErr) maxErr = e
            i += 1
          }
          (id, sum, cmin, cmax, math.floor(maxErr * 1000000.0 + 0.5).toLong)
        }
      }.toDF("vec_id", "sum_codes", "min_code", "max_code", "err_e6")
  }

  def qScalarQuant(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    scalarQuantizeInt8(e, trainScalarQuant(e))
  }

  /** Identical affine/round/reconstruction op order per component, then
    * the per-vector integer roll-up. */
  val qScalarQuantSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |           WHERE ${Similarity.vecFilterSql}),
       |comp AS MATERIALIZED (
       |  SELECT vec_id, i.i AS pos, v[i.i] AS x
       |  FROM e CROSS JOIN
       |       (SELECT unnest(generate_series(1, ${Similarity.Dim})) AS i) i),
       |st AS MATERIALIZED (
       |  SELECT pos, min(x) AS mn, max(x) AS mx FROM comp GROUP BY 1),
       |q AS (
       |  SELECT vec_id, x, mn, mx,
       |         CASE WHEN mx = mn THEN 0.0
       |              ELSE least(255.0, greatest(0.0,
       |                     floor((x - mn) * 255.0 / (mx - mn) + 0.5)))
       |         END AS code
       |  FROM comp JOIN st USING (pos)),
       |w AS (
       |  SELECT vec_id, code,
       |         CASE WHEN mx = mn THEN 0.0
       |              ELSE abs(mn + (code * (mx - mn)) / 255.0 - x) END AS err
       |  FROM q)
       |SELECT vec_id, CAST(sum(code) AS BIGINT) AS sum_codes,
       |       CAST(min(code) AS BIGINT) AS min_code,
       |       CAST(max(code) AS BIGINT) AS max_code,
       |       CAST(floor(max(err) * 1000000.0 + 0.5) AS BIGINT) AS err_e6
       |FROM w GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_pq" -> (qPqTopK _),
    "sim_topk_ivfpq" -> (qIvfPqTopK _),
    "embed_quantize_int8" -> (qScalarQuant _))

  val oracleSql: Map[String, String] = Map(
    "sim_topk_pq" -> qPqTopKSql,
    "sim_topk_ivfpq" -> qIvfPqTopKSql,
    "embed_quantize_int8" -> qScalarQuantSql)
}
