package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.queries.DeclaredQueries

/** Physical-plan quality gates: the properties that decide whether these
  * plans survive a 100× scale-up — metadata-sized join sides must
  * broadcast (no shuffle of the big side), selective filters must reach
  * the Parquet scan as pushed filters, and narrow per-row operators must
  * not shuffle at all. Asserted against the executed plan text so a
  * regression in plan shape fails CI, not just the benchmark.
  */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def planOf(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q1: metadata-sized right side joins as broadcast, not shuffle") {
    val plan = planOf(DeclaredQueries.q1Infoschema(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q2: orphan anti-join broadcasts the manifest side") {
    val plan = planOf(DeclaredQueries.q2Orphans(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(800))
  }

  test("q5: date-window predicate is pushed to the parquet scan") {
    val plan = planOf(DeclaredQueries.q5DateWindow(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(1200))
    // pruned read: only the three referenced columns are scanned
    assert(plan.contains("l_shipdate") && !plan.contains("l_orderkey"),
      plan.take(1200))
  }

  test("q5: column pruning reaches the scan (ReadSchema is minimal)") {
    val plan = DeclaredQueries.q5DateWindow(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"))
  }

  test("text kernels run as a single narrow stage (no exchange)") {
    val plan = planOf(graft.llmops.TextAnalysis.qTextStats(spark, sf))
    assert(!plan.contains("Exchange"), plan.take(800))
    val rep = planOf(graft.llmops.TextAnalysis.qRepetition(spark, sf))
    assert(!rep.contains("Exchange"), rep.take(800))
  }

  test("brute-force similarity broadcasts queries: no join operator, one window shuffle") {
    val full = planOf(graft.llmops.Similarity.qBruteForce(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // corpus never shuffles for scoring — the only exchange feeds the
    // per-query top-k window rank
    assert(!plan.contains("Join"), plan.take(1200))
    assert("hashpartitioning".r.findAllIn(plan).size === 1, plan.take(1200))
  }

  test("ivfpq re-rank fetches raw vectors via broadcast of the shortlist — corpus never sort-merges") {
    val full = planOf(graft.llmops.ProductQuant.qIvfPqTopK(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // the ADC stage is a broadcast-kernel pass (no join operator); the
    // only join in the whole pipeline re-attaches raw vectors to the
    // queries x shortlist rows, whose tiny side must broadcast — a
    // sort-merge there would shuffle the corpus for a point lookup
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }

  test("minhash LSH candidates come from an equi-join, never a cartesian") {
    val full = planOf(graft.llmops.Dedup.queries("dedup_minhash")(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("embedding dedup candidates come from a signature equi-join; no corpus collect") {
    val full = planOf(graft.llmops.Dedup.queries("dedup_embed")(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // candidates shuffle on the signature key, not the full pair space
    assert(plan.contains("Join"), plan.take(1200))
  }

  test("embedding dedup banding keeps recall >= 0.85 vs the exact pair set") {
    // Exact ground truth via an all-pairs join — TEST-ONLY; the shipped
    // operator never enumerates the pair space. Guards against a band
    // parameterization that silently collapses recall (a single AND-of-6
    // signature measured 0.07 here).
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val n = emb.withColumn("nrm", sqrt(aggregate(
      zip_with(col("v"), col("v"), (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)))
    val cosExpr = aggregate(zip_with(col("va"), col("vb"), (a, b) => a * b),
      lit(0.0d), (acc, x) => acc + x) / (col("na") * col("nb"))
    val exact = n.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
      .crossJoin(n.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")))
      .filter(col("vec_a") < col("vec_b"))
      .filter(cosExpr >= graft.llmops.Dedup.CosineThreshold)
      .select("vec_a", "vec_b")
    val banded = graft.llmops.Dedup.queries("dedup_embed")(spark, sf)
      .select("vec_a", "vec_b")
    val nExact = exact.count()
    val caught = exact.join(banded, Seq("vec_a", "vec_b"), "left_semi").count()
    assert(nExact > 0, "fixture has no pairs above threshold — gate is vacuous")
    assert(caught.toDouble / nExact >= 0.85,
      s"banded recall ${caught.toDouble / nExact} ($caught/$nExact)")
  }

  test("data-test relationships anti-join broadcasts; no cartesian anywhere") {
    val full = planOf(graft.materialize.DataTests.relationships(
      graft.core.Tables.load(spark, sf, "orders"), "o_custkey",
      graft.core.Tables.load(spark, sf, "customer"), "c_custkey"))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // parent side is dimension-sized: broadcast, not sort-merge
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("curate gating is join-free: shuffles only for dedup, semi-join, summary") {
    val full = planOf(graft.llmops.Curate.queries("pipeline_curate")(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    // exactly one join survives: the keeper semi-join (gating signals
    // ride the kernel output row — no stats/lang reunification join)
    assert("(?i)join".r.findAllIn(plan).size <= 2, plan.take(1600))
    assert(plan.contains("LeftSemi"), plan.take(1600))
  }

  test("as-of join plans as union + window — no join operator at all") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "v")).toDF("k", "rts", "v")
    val df = graft.operators.AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
    val plan = planOf(df).split("== Initial Plan ==").head
    // the whole point of the union+window pattern: the match is computed
    // by a Window over the unioned sides, never a (theta) join
    assert(plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("range join candidates come from an equi-join on (key, bin), never nested-loop") {
    val full = planOf(graft.operators.RangeJoin.qRangeWindow(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("exact dedup is one hash-aggregate shuffle with partial aggregation") {
    val full = planOf(graft.llmops.Dedup.queries("dedup_exact")(spark, sf))
    // partial (map-side) agg before the exchange, final after — one shuffle
    // (assert on the AQE final plan; toString appends the initial plan too)
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("partial_min") && plan.contains("partial_count"), plan.take(1200))
    assert("hashpartitioning".r.findAllIn(plan).size === 1, plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("decontamination probes the benchmark via broadcast; corpus never shuffles for it") {
    val full = planOf(graft.llmops.Decontaminate.qDecontaminate(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    // the only exchange is the per-doc overlap count (plus the broadcast)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
    assert("hashpartitioning".r.findAllIn(plan).size <= 2, plan.take(1200))
  }

  test("sequence packing never funnels through a single-task global window") {
    val full = planOf(graft.llmops.Pack.qPack(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // the global-orderBy-window trap plans as Exchange SinglePartition;
    // the two-phase scan must not
    assert(!plan.contains("SinglePartition"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200)) // offsets join
  }

  test("CMS build aggregates with map-side combine; probe joins broadcast") {
    val full = planOf(graft.operators.Sketch.qCms(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("partial_count"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1200))
  }

  test("bloom semi-join probes inside codegen and verifies via broadcast — fact never sort-merges") {
    val full = planOf(graft.operators.BloomJoin.qBloomJoin(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // the codegen'd probe sits in a Filter on the fact scan side
    assert(plan.contains("BloomMightContain") || plan.contains("bloommightcontain"),
      plan.take(1500))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("exact quantiles run on the value histogram, never row_number over raw rows") {
    val full = planOf(graft.operators.Quantiles.qQuantiles(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // histogram first: partial_count proves the map-side combine reached
    // the raw rows before any window ran
    assert(plan.contains("partial_count"), plan.take(1500))
    assert(!plan.contains("row_number"), plan.take(1500))
  }

  test("quota sampling broadcasts the stratum counts; no sort-merge join") {
    val full = planOf(graft.llmops.Mix.qCapped(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    // the rank window runs AFTER the hash prefilter (survivors only)
    assert(plan.contains("row_number"), plan.take(1500))
  }

  test("corpus-frequency stats split the token join: hot head broadcasts") {
    val full = planOf(graft.llmops.CorpusStats.qCorpusFreq(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500)) // head join
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500)) // head pick
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("bucketed join + aggregate runs with zero exchanges (co-located layout)") {
    val full = planOf(graft.operators.Bucketing.qBucketedJoin(spark, sf))
    val plan = full.split("== Initial Plan ==").head
    // the entire join + groupBy pipeline rides the write-time bucketing:
    // no shuffle anywhere — the property that turns a recurring 100 TB
    // join from shuffle-per-run into shuffle-once-at-load
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // bucket pruning metadata reached the scan
    assert(plan.contains("Bucketed: true"), plan.take(2000))
  }

  test("text_clean is a zero-exchange narrow kernel") {
    val plan = planOf(graft.llmops.Clean.qClean(spark, sf))
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("rank_bm25: no sort-merge join, top-k never global-sorts") {
    val plan = planOf(graft.llmops.Rank.qBm25(spark, sf))
    // df + corpus scalars broadcast back; the fact side never sort-merges
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // per-partition heaps + driver merge of k rows, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q30_rolling shuffles exactly once: the key-partitioned window") {
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // exchanges in the final section only
    val plan = planOf(graft.operators.RollingWindow.qRolling(spark, sf))
      .split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
  }

  test("epoch_shuffle shuffles exactly once: the shard-ranked window") {
    val plan = planOf(graft.llmops.Mix.qEpochShuffle(spark, sf))
      .split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, plan.take(1500))
  }

  test("q31_pivot is one aggregate pass — no distinct-values discovery job") {
    val plan = planOf(graft.operators.Reshape.qPivot(spark, sf))
      .split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("q32_json_props extracts inside the scan projection — one shuffle total") {
    val plan = planOf(graft.operators.JsonCols.qJsonProps(spark, sf))
      .split("== Initial Plan ==").head
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, plan.take(1500))
  }

  test("q33_sessions: per-session rollup rides the window's key partitioning") {
    val plan = planOf(graft.operators.Sessionize.qSessions(spark, sf))
      .split("== Initial Plan ==").head
    // hashpartitioning(user_id) satisfies groupBy(user_id, session_seq):
    // the window shuffle is the ONLY one
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, plan.take(1500))
    assert(plan.contains("Window"), plan.take(1500))
  }

  test("q34_funnel: chained step flags stack on one window shuffle, no self-join") {
    val plan = planOf(graft.operators.Funnel.qFunnel(spark, sf))
      .split("== Initial Plan ==").head
    // exchange 1: the (single) window shuffle all step flags share;
    // exchange 2: the multi-countDistinct expand — its input is already
    // user-count-sized, not event-sized
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 2, plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500)) // no per-step self-join
  }

  test("q37_concurrency: sweep joins broadcast only — no sort-merge, no cartesian") {
    // materialize=false: the eager one-row checkpoint would truncate
    // the plan this test inspects
    val plan = planOf(graft.operators.Concurrency.maxConcurrency(
      graft.operators.Sessionize.qSessions(spark, sf),
      "start_us", "end_us", materialize = false))
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q38_bins: the binning pass itself is a zero-exchange projection") {
    val plan = planOf(graft.operators.Quantiles.qBins(spark, sf))
    // the boundary job ran eagerly (bounded sample); what executes per
    // row afterwards is scan → literal comparison chain
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("q41_pit_join: the scd2 lookup is carry-based — no join operator at all") {
    val plan = planOf(graft.queries.EngineQueries.q41PitJoin(spark, sf))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("q36_unpivot is a map-side Expand — zero exchanges") {
    val plan = planOf(graft.operators.Unpivot.qUnpivot(spark, sf))
    assert(plan.contains("Expand"), plan.take(1200))
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("incremental dedup probes inside codegen and broadcasts candidates — old corpus never sort-merges") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.load(spark, sf, "documents")
    // materialize=false: the eager checkpoint would truncate the plan
    // this test inspects
    val full = planOf(graft.llmops.Dedup.incrementalSimhashDedup(
      docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
      materialize = false))
    val plan = full.split("== Initial Plan ==").head
    // the new batch is pre-pruned by the codegen'd Bloom probe...
    assert(plan.contains("BloomMightContain") || plan.contains("bloommightcontain"),
      plan.take(1500))
    // ...and the surviving candidates broadcast back to the old bands
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("narrow token operators have no exchange: BPE counting; split assignment is scan -> agg") {
    val bpe = planOf(graft.llmops.TextAnalysis.qBpeTokens(spark, sf))
    assert(!bpe.contains("Exchange"), bpe.take(800))
    // split_assign: the assignment itself is narrow — the only exchange
    // feeds the per-(source, split) summary aggregate
    val split = planOf(graft.llmops.Mix.qSplit(spark, sf))
      .split("== Initial Plan ==").head
    assert(split.contains("partial_count"), split.take(1200)) // map-side combine
    assert(!split.contains("SortMergeJoin") && !split.contains("Join"),
      split.take(1200))
  }

  test("passage mining groups by span hash with map-side partial aggregation") {
    val full = planOf(graft.llmops.Dedup.passageDuplicates(
      graft.core.Tables.load(spark, sf, "documents")))
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("partial_count"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500)) // the aggregate IS the index
  }

  test("pagerank iterations: equi-join + map-side-combined sum, no cartesian") {
    val plan = planOf(graft.operators.PageRank.qPageRank(spark, sf))
    // per-iteration contribution sum must partial-aggregate before the
    // by-dst shuffle; candidate generation is equi-join only (the single
    // 1-row crossJoin for |V| is a broadcast, not a cartesian blowup)
    assert(plan.contains("partial_sum"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("cdc apply compacts via partial aggregation, never a per-key sort window") {
    val plan = planOf(graft.operators.Cdc.qCdcApply(spark, sf))
    // argmax as max(struct(...)): the shuffle carries one candidate per
    // key per partition; a row_number window would sort every change row
    assert(plan.contains("partial_max"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("semantic dedup: cell-mate pairs come from an equi-join on cell_id, never a cartesian") {
    val plan = planOf(SparkEntry.queries("dedup_semantic")(spark, sf))
    // centroids ride a driver broadcast into the narrow assignment
    // kernel; the only join operators are the cell_id equi-join and the
    // keep-list left join — an all-pairs plan would surface as a
    // cartesian / nested-loop join here
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(plan.contains("cell_id"), plan.take(1500))
  }

  test("substring overlap: candidates from the shingle-hash equi-join; run merge on one window") {
    val plan = planOf(graft.llmops.Dedup.substringOverlapPairs(
      graft.core.Tables.load(spark, sf, "documents")))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // the diagonal run merge is a window over (doc_a, doc_b, diag) —
    // bounded groups — not a global sort
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("SinglePartition"), plan.take(1500))
  }

  test("salted join: shuffled hash on (key, salt), never broadcast or sort-merge") {
    val plan = planOf(graft.operators.SaltedJoin.qSaltedJoin(spark, sf))
    // the whole point: the join partitions on (key, salt), spreading a
    // hot key over nSalts shuffle partitions
    assert(plan.contains("ShuffledHashJoin"), plan.take(1500))
    assert(plan.contains("_salt"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    // a broadcast of the replicated dim would mean salting wasn't needed
    assert(!plan.contains("BroadcastHashJoin"), plan.take(1500))
  }
}
