package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan linter — the 100 TB pre-flight check as a first-class
  * operator: walk a query's executed plan and report the shapes that are
  * harmless at test scale but melt down at three orders of magnitude
  * more data. The same antipatterns PlanSpec string-gates per query are
  * exposed here as a reusable structural check any pipeline can run
  * before submitting a plan to a large cluster (and CI can run over its
  * whole query inventory).
  *
  * Detected (each finding carries the offending operator's nodeName):
  *  - `CARTESIAN_PRODUCT` — CartesianProduct joins scale as |L|·|R|;
  *    almost always a missing join key.
  *  - `NESTED_LOOP_JOIN` — BroadcastNestedLoopJoin whose build side is
  *    not provably tiny: per-row scans of the broadcast, usually a
  *    theta join that should be banded/binned. Scalar sides (a global
  *    aggregate or driver-local rows) are exempt — that is the
  *    legitimate scalar-attach pattern (`crossJoin(broadcast(scalar))`).
  *  - `SINGLE_PARTITION_FUNNEL` — an `Exchange SinglePartition` feeding
  *    a sort or window within a couple of operators: the whole input
  *    serializes through one task (the `row_number() OVER (ORDER BY)`
  *    trap).
  *  - `UNPUSHED_SOURCE_FILTER` — a Filter sitting DIRECTLY on a file
  *    scan that advertises no pushed filters: predicate pushdown was
  *    lost (expression not convertible, or a cast blocks it).
  *  - `WIDE_SCAN` — a file scan reading 20+ columns: column pruning
  *    lost (SELECT * reaching the source).
  *
  * Heuristics, deliberately conservative: a finding is a REVIEW flag,
  * not a failure — [[lint]] returns findings and callers decide (a
  * window over a key KNOWN to be low-cardinality-but-bounded may accept
  * its funnel; the linter cannot know cardinalities). Driver cost is a
  * plan-tree walk; nothing executes. */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  /** Lint a frame's executed (pre-AQE-final) physical plan. */
  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(df.queryExecution.executedPlan)

  def lintPlan(root: SparkPlan): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]

    // a build side that is provably small: global aggregate (1 row) or
    // driver-local rows anywhere at its root chain
    def isScalarSide(p: SparkPlan): Boolean =
      p.nodeName.contains("LocalTableScan") ||
        (p.nodeName.contains("Aggregate") && p.toString.contains("keys=[]")) ||
        (p.children.length == 1 && isScalarSide(p.children.head))

    // look through codegen/columnar/AQE transition wrappers
    def throughTransitions(p: SparkPlan): SparkPlan = p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        throughTransitions(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter =>
        throughTransitions(i.child)
      case c: org.apache.spark.sql.execution.ColumnarToRowExec =>
        throughTransitions(c.child)
      case _ => p
    }

    def singlePartitionNear(p: SparkPlan, depth: Int): Boolean =
      p match {
        case e: ShuffleExchangeExec => e.outputPartitioning.numPartitions == 1
        case _ if depth > 0 =>
          p.children.exists(c => singlePartitionNear(c, depth - 1))
        case _ => false
      }

    def walk(p: SparkPlan): Unit = {
      val name = p.nodeName

      if (name.contains("CartesianProduct"))
        out += Finding("CARTESIAN_PRODUCT", name,
          "joins scale as |L|*|R| — add a join key or band/bin the condition")

      if (name.contains("BroadcastNestedLoopJoin") &&
          !p.children.exists(isScalarSide))
        out += Finding("NESTED_LOOP_JOIN", name,
          "per-row scans of a non-scalar broadcast side — band/bin the " +
            "theta join; scalar attaches are the exempt legitimate form")

      // SortAggregate is NOT a sort: a final global SortAggregate above a
      // SinglePartition exchange is the normal two-phase global-aggregate
      // combine (one partial row per upstream partition crosses the
      // exchange — map-side combine already did the data-volume work)
      if ((name.contains("Sort") || name.contains("Window")) &&
          !name.contains("Aggregate") &&
          p.children.exists(c => singlePartitionNear(c, 3)))
        out += Finding("SINGLE_PARTITION_FUNNEL", name,
          "the whole input serializes through one task — range-partition " +
            "a global sort, or window over a bucketed key")

      p match {
        case f: org.apache.spark.sql.execution.FilterExec =>
          throughTransitions(f.child) match {
            case scan: org.apache.spark.sql.execution.FileSourceScanExec
                if scan.metadata.get("PushedFilters").exists(v =>
                  v == "[]" || v.isEmpty) =>
              out += Finding("UNPUSHED_SOURCE_FILTER", scan.nodeName,
                "filter directly over a scan with no pushed predicates — " +
                  "check for casts/expressions blocking pushdown")
            case _ => ()
          }
        case scan: org.apache.spark.sql.execution.FileSourceScanExec
            if scan.output.length >= 20 =>
          out += Finding("WIDE_SCAN", scan.nodeName,
            s"scan reads ${scan.output.length} columns — column pruning " +
              "lost (SELECT * reaching the source)?")
        case _ => ()
      }
      // AQE wrappers hold the actual plan out of `children` — walk in
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          // the CURRENT physical plan (exchanges inserted; = initial plan
          // pre-execution, re-optimized stages once running)
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ =>
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
      }
    }

    walk(root)
    out.result().distinct
  }
}
