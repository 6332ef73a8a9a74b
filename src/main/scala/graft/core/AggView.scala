package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views — the warehouse
  * answer to "this dashboard groupBy re-scans 100 TB every morning".
  *
  * A view is itself a normal [[Warehouse]] table (snapshot-logged, so MV
  * states are time-travelable like any other table) holding MERGE-READY
  * partials of a groupBy over a source table: `count`/`sum` partials add,
  * `min`/`max` partials combine — so a refresh never needs the source
  * rows it already folded in. The view's config sidecar records the
  * source-log version the content reflects.
  *
  * [[refresh]] asks [[Warehouse.appendedBetween]] for the span since the
  * last refresh:
  *  - append-only span → aggregate ONLY the delta fragments and fold the
  *    partial into the current view content (`incremental` mode). Refresh
  *    cost is O(new data) + O(|view|), never O(source table) — at 100 TB
  *    with a daily 100 GB append, the morning refresh reads 100 GB.
  *  - anything rewrote/removed/masked pre-existing fragments (overwrite,
  *    delete, compact, merge, a MoR vector swap) → the state+delta
  *    identity is gone; rebuild from the full source (`full` mode),
  *    loudly reported in the [[RefreshResult]] so a scheduler can alarm
  *    on unexpected rebuilds.
  *
  * Supported partials: `count` (merge: sum), `sum` (merge: sum), `min`,
  * `max` (merge: themselves). AVG is `sum/count` at read time — storing
  * it would not merge. The identity `incremental ≡ full rebuild` is
  * spec-gated, including across deletes and compactions, and the
  * `q70_aggview` oracle drives append→refresh→MoR-delete→refresh end to
  * end against DuckDB.
  */
object AggView {

  /** One aggregate column of the view: `out` = column name in the view,
    * `func` ∈ count|sum|min|max, `srcCol` = source column (ignored for
    * count). */
  final case class AggSpec(out: String, func: String, srcCol: String = "") {
    require(Set("count", "sum", "min", "max")(func),
      s"unsupported agg func '$func' (count|sum|min|max)")
  }

  final case class Config(srcDataset: String, srcTable: String,
                          groupCols: Seq[String], aggs: Seq[AggSpec],
                          refreshedVersion: Int)

  /** `mode` ∈ incremental|incremental_retract|full|noop; versions are
    * the source-log span the refresh folded in. */
  final case class RefreshResult(mode: String, fromVersion: Int,
                                 toVersion: Int)

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- aggregates

  /** The base aggregate: raw source rows → partials. */
  private def baseAgg(df: DataFrame, cfg: Config): DataFrame =
    df.groupBy(cfg.groupCols.map(col): _*)
      .agg(aggCol(cfg.aggs.head), cfg.aggs.tail.map(aggCol): _*)

  private def aggCol(a: AggSpec): Column = (a.func match {
    case "count" => count(lit(1))
    case "sum"   => sum(col(a.srcCol))
    case "min"   => min(col(a.srcCol))
    case "max"   => max(col(a.srcCol))
  }).as(a.out)

  /** The merge aggregate: partials → partials (counts and sums add;
    * min/max combine as themselves). */
  private def mergeAgg(partials: DataFrame, cfg: Config): DataFrame =
    partials.groupBy(cfg.groupCols.map(col): _*)
      .agg(mergeCol(cfg.aggs.head), cfg.aggs.tail.map(mergeCol): _*)

  private def mergeCol(a: AggSpec): Column = (a.func match {
    case "count" | "sum" => sum(col(a.out))
    case "min"           => min(col(a.out))
    case "max"           => max(col(a.out))
  }).as(a.out)

  // ---------------------------------------------------------------- config

  private def configPath(wh: Warehouse, dataset: String, view: String) =
    Paths.get(wh.root).resolve(dataset).resolve(view).resolve("_aggview.json")

  private def writeConfig(wh: Warehouse, dataset: String, view: String,
                          cfg: Config): Unit = {
    val root = mapper.createObjectNode()
    root.put("srcDataset", cfg.srcDataset)
    root.put("srcTable", cfg.srcTable)
    val g = root.putArray("groupCols"); cfg.groupCols.foreach(g.add)
    val as = root.putArray("aggs")
    cfg.aggs.foreach { a =>
      val n = as.addObject()
      n.put("out", a.out); n.put("func", a.func); n.put("srcCol", a.srcCol)
    }
    root.put("refreshedVersion", cfg.refreshedVersion)
    val p = configPath(wh, dataset, view)
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
  }

  /** The view's persisted definition + refresh watermark. */
  def config(wh: Warehouse, dataset: String, view: String): Config = {
    val p = configPath(wh, dataset, view)
    require(Files.isRegularFile(p), s"$dataset.$view is not an agg view")
    val root = mapper.readTree(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    Config(
      root.get("srcDataset").asText(), root.get("srcTable").asText(),
      root.get("groupCols").elements().asScala.map(_.asText()).toSeq,
      root.get("aggs").elements().asScala.map(n => AggSpec(
        n.get("out").asText(), n.get("func").asText(),
        n.get("srcCol").asText())).toSeq,
      root.get("refreshedVersion").asInt())
  }

  // ------------------------------------------------------------ operations

  /** Build the view from the source's CURRENT version and persist its
    * definition. The view lands as a normal warehouse table. */
  def create(wh: Warehouse, dataset: String, view: String,
             srcDataset: String, srcTable: String,
             groupCols: Seq[String], aggs: Seq[AggSpec]): Unit = {
    require(groupCols.nonEmpty && aggs.nonEmpty,
      "agg view needs group columns and aggregates")
    require(aggs.map(_.out).distinct.size == aggs.size,
      "duplicate output column in agg specs")
    val srcV = wh.log(srcDataset, srcTable).latest
      .filter(!_.isDrop)
      .getOrElse(throw new IllegalArgumentException(
        s"no such table: $srcDataset.$srcTable")).version
    val cfg = Config(srcDataset, srcTable, groupCols, aggs, srcV)
    wh.overwrite(dataset, view, baseAgg(wh.read(srcDataset, srcTable), cfg))
    writeConfig(wh, dataset, view, cfg)
  }

  /** Bring the view up to the source's current version. Incremental when
    * the span since the last refresh is append-only; full rebuild (and
    * says so) otherwise. Folding order: existing partials union delta
    * partials, re-merged — a group present in both phases merges, a new
    * group appears, an untouched group passes through. */
  def refresh(wh: Warehouse, dataset: String, view: String): RefreshResult = {
    val cfg = config(wh, dataset, view)
    val cur = wh.log(cfg.srcDataset, cfg.srcTable).latest
      .filter(!_.isDrop)
      .getOrElse(throw new IllegalArgumentException(
        s"source ${cfg.srcDataset}.${cfg.srcTable} is gone")).version
    if (cur == cfg.refreshedVersion)
      return RefreshResult("noop", cfg.refreshedVersion, cur)
    // a watermark whose manifest was vacuumed past retention can't be
    // diffed — degrade to the documented full rebuild instead of
    // throwing forever (the view would otherwise be unrefreshable)
    val watermarkLive =
      wh.log(cfg.srcDataset, cfg.srcTable).version(cfg.refreshedVersion).isDefined
    val span =
      if (watermarkLive)
        wh.appendedBetween(cfg.srcDataset, cfg.srcTable, cfg.refreshedVersion, cur)
      else None
    val result = span match {
      case Some(delta) =>
        val merged = mergeAgg(
          wh.read(dataset, view).unionByName(baseAgg(delta, cfg)), cfg)
        // The overwrite's write job reads the CURRENT view version's
        // fragment files, which stay on disk until vacuum — the new
        // fragment lands beside them, never over them.
        wh.overwrite(dataset, view, merged)
        RefreshResult("incremental", cfg.refreshedVersion, cur)
      case None =>
        retractRefresh(wh, dataset, view, cfg, cur) match {
          case Some(r) => r
          case None =>
            wh.overwrite(dataset, view,
              baseAgg(wh.read(cfg.srcDataset, cfg.srcTable), cfg))
            RefreshResult("full", cfg.refreshedVersion, cur)
        }
    }
    writeConfig(wh, dataset, view, cfg.copy(refreshedVersion = cur))
    result
  }

  /** Non-append spans for RETRACTABLE views (every aggregate count|sum):
    * fold the CDC feed instead of rebuilding — inserted fragments
    * contribute positive partials, removed/masked rows negative ones,
    * and groups whose count retracts to zero drop out. Cost is
    * O(changed fragments): a CoW delete folds only the rewritten
    * fragments, a MoR delete only the newly-masked rows, and even a
    * compaction nets to zero exactly. min/max cannot retract (a deleted
    * extremum needs a rescan), so views carrying them decline (None →
    * full rebuild).
    *
    * Exactness note: count retraction is exact; sum retraction replays
    * each removed value with flipped sign, so integer sums are exact and
    * float sums agree to reassociation (the same tolerance every
    * unordered float sum in the engine carries). */
  private def retractRefresh(wh: Warehouse, dataset: String, view: String,
                             cfg: Config, cur: Int): Option[RefreshResult] = {
    if (!cfg.aggs.forall(a => a.func == "count" || a.func == "sum")) return None
    val countCol = cfg.aggs.find(_.func == "count").map(_.out)
    scala.util.Try {
      val feed = wh.changesBetween(cfg.srcDataset, cfg.srcTable,
        cfg.refreshedVersion, cur)
      val inserts = baseAgg(feed.filter(col("_change_type") === "insert")
        .drop("_change_type"), cfg)
      val negated = baseAgg(feed.filter(col("_change_type") === "delete")
        .drop("_change_type"), cfg)
        .select(cfg.groupCols.map(col) ++
          cfg.aggs.map(a => (-col(a.out)).as(a.out)): _*)
      val merged = mergeAgg(
        wh.read(dataset, view).unionByName(inserts).unionByName(negated), cfg)
      // a fully-retracted group must disappear, not linger as a zero row;
      // without a count column zero-groups are undetectable — require one
      val cleaned = countCol match {
        case Some(n) => merged.filter(col(n) > 0)
        case None => throw new IllegalStateException(
          "retraction needs a count aggregate to drop emptied groups")
      }
      wh.overwrite(dataset, view, cleaned)
      RefreshResult("incremental_retract", cfg.refreshedVersion, cur)
    }.toOption
  }
}
