package graft.plans

/** Curated PlanLint exemptions for the engine's own query inventory.
  *
  * [[PlanLint]] findings are cardinality-blind REVIEW flags: a window
  * with no partition key looks identical whether it orders a corpus or
  * a catalog-sized rollup. A handful of shipped operators deliberately
  * run a flagged shape over a frame that is PROVABLY bounded by
  * something much smaller than the data (a metric's integer domain, the
  * source catalog, a fixed band count) — for those, the shape is the
  * design, not a defect, and the boundedness argument lives in each
  * operator's scaladoc.
  *
  * This registry makes that judgment EXPLICIT and auditable:
  *  - [[graft.Bench]] subtracts these rules per query and reports what
  *    it subtracted in a separate `lint_exempt` field — an exemption is
  *    never silent;
  *  - PlanLintSpec asserts every entry still FIRES (a stale exemption
  *    for a shape the plan no longer contains fails the suite — the
  *    registry cannot rot into a blanket mute) and that no query carries
  *    findings beyond its exempt set.
  *
  * Adding an entry requires the same two artifacts as these: a
  * boundedness argument in the operator's scaladoc and the `why` here. */
object LintExemptions {

  /** query name -> rule -> one-line boundedness argument. */
  val exemptions: Map[String, Map[String, String]] = Map(
    // stats_ks formerly exempted SINGLE_PARTITION_FUNNEL (pooled-ECDF
    // window over the |domain|-rollup) and NESTED_LOOP_JOIN (grid ×
    // broadcast sizes) — both still true of the interior plan, but
    // ksDrift now re-stages its |groups|-row result eagerly to release
    // the staged rollup (the per-call checkpoint leak fix), so the
    // plan the lint sees is the checkpoint scan; the boundedness
    // arguments live on in Stats.ksDrift's scaladoc.
    "skew_report" -> Map(
      "SINGLE_PARTITION_FUNNEL" ->
        "quantile window orders the count-HISTOGRAM (|distinct per-key counts| rows), not keys or rows"),
    "mix_temperature" -> Map(
      "SINGLE_PARTITION_FUNNEL" ->
        "per-source budget window runs over the source catalog (|sources| rows)"),
    "interleave_sources" -> Map(
      "SINGLE_PARTITION_FUNNEL" ->
        "source-index window runs over DISTINCT sources (catalog-sized); corpus positions come from the bucketed prefix sum"),
    "order_curriculum" -> Map(
      "SINGLE_PARTITION_FUNNEL" ->
        "same catalog-sized source-index window as interleave_sources; corpus order is pure arithmetic"),
    // lm_ppl_buckets exemption RETIRED (r18): the score-once restructure
    // stages the score table, so the tercile attach is a broadcast hash
    // join in the final plan — no NESTED_LOOP_JOIN remains to exempt.
    "q4_suffix_match" -> Map(
      "NESTED_LOOP_JOIN" ->
        "the reference's suffix theta join (J6, cleanup.py) over metadata-sized catalog tables; banding would change its semantics"))

  /** Split `found` into (exempt, residual) for one query. */
  def partition(query: String, found: Seq[String]): (Seq[String], Seq[String]) = {
    val ex = exemptions.getOrElse(query, Map.empty)
    found.partition(ex.contains)
  }
}
