package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{LintExemptions, PlanLint}

/** The plan linter must flag each antipattern on a constructed offending
  * plan AND stay quiet on the legitimate twin — false positives would
  * train users to ignore it. */
class PlanLintSpec extends AnyFunSuite {
  import TestSession._

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  test("cartesian product flagged; keyed join clean") {
    import spark.implicits._
    val a = (1 to 50).map(i => (i, s"a$i")).toDF("id", "va")
    val b = (1 to 50).map(i => (i, s"b$i")).toDF("id", "vb")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(rules(a.crossJoin(b.withColumnRenamed("id", "id2")))
        .contains("CARTESIAN_PRODUCT"))
      assert(!rules(a.join(b, Seq("id"))).contains("CARTESIAN_PRODUCT"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("non-scalar broadcast nested loop flagged; scalar attach exempt") {
    // distributed sides (range, not driver-local rows) so the broadcast
    // side is not the exempt LocalTableScan form
    val facts = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    val dims = spark.range(30).select(col("id").as("did"))
    val theta = facts.crossJoin(broadcast(dims))
    assert(rules(theta).contains("NESTED_LOOP_JOIN"))
    // the legitimate scalar-attach: crossJoin(broadcast(global agg))
    val scalar = facts.crossJoin(broadcast(facts.agg(sum("v").as("tot"))))
    assert(!rules(scalar).contains("NESTED_LOOP_JOIN"))
  }

  test("single-partition window funnel flagged; bucketed window clean") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val funnel = df.withColumn("rn",
      row_number().over(Window.orderBy("id")))
    assert(rules(funnel).contains("SINGLE_PARTITION_FUNNEL"))
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("id")))
    assert(!rules(keyed).contains("SINGLE_PARTITION_FUNNEL"))
  }

  test("unpushed source filter flagged; pushable predicate clean") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    // coalesce blocks null-intolerance inference: nothing pushes
    val unpushed = docs.filter(expr("length(coalesce(text, '')) > 3"))
    assert(rules(unpushed).contains("UNPUSHED_SOURCE_FILTER"),
      PlanLint.lint(unpushed).toString)
    val pushed = docs.filter(col("doc_id") > 5)
    assert(!rules(pushed).contains("UNPUSHED_SOURCE_FILTER"))
  }

  test("wide scan flagged; pruned projection clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lint_wide").toString
    val wide = (1 to 25).foldLeft((1 to 10).toDF("c0")) {
      case (d, i) => d.withColumn(s"c$i", col("c0") * i)
    }
    wide.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(rules(back.filter(col("c1") > 0)).contains("WIDE_SCAN"))
    assert(!rules(back.select("c0", "c1")).contains("WIDE_SCAN"))
  }

  test("the engine's own curated plans lint clean") {
    // a representative cross-section of shipped operators must produce
    // zero findings — the linter validates the engine's own discipline.
    // (Eager-building queries — prefix sums, broadcast-set collects —
    // stay out of this LAZY sweep; their plan gates live in their own
    // specs.)
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val events = graft.core.Tables.load(spark, sf, "events")
    val clean = Seq(
      graft.llmops.TextAnalysis.withTextStats(docs),
      graft.llmops.QualityRules.blocklistFilter(docs),
      graft.llmops.CorpusStats.corpusReport(docs),
      graft.llmops.Clean.cleanDocs(docs),
      graft.llmops.Mix.withSplit(docs),
      graft.operators.RollingWindow.resampleLocf(
        events, "user_id", "ts", "value", "event_id"),
      graft.operators.Sessionize.sessionize(events, "user_id", "ts", "event_id"),
      graft.llmops.Dedup.simhashPairs(docs))
    clean.foreach { df =>
      assert(PlanLint.lint(df) === Seq.empty, df.queryExecution.logical.nodeName)
    }
  }

  test("round-11 fourth-session operators lint clean") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val events = graft.core.Tables.load(spark, sf, "events")
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    // ksDrift deliberately runs on rollup-sized frames: the groups×points
    // grid is a broadcast nested-loop by construction and the pooled
    // ECDF is an unpartitioned window over the domain-sized frame — both
    // documented small-frame exceptions. Pin EXACTLY that finding set so
    // a corpus-scale funnel could never hide behind the exemption.
    val ksFindings = PlanLint.lint(
      graft.operators.Stats.ksDrift(docs, "source", col("n_chars")))
    assert(ksFindings.map(_.rule).toSet.subsetOf(
      Set("NESTED_LOOP_JOIN", "SINGLE_PARTITION_FUNNEL")),
      s"ksDrift may only carry its documented small-frame trades: $ksFindings")
    val clean = Seq(
      graft.operators.Stats.wilsonRates(events, "event_type", col("value") > 20),
      graft.llmops.Redact.kAnonymityAudit(
        graft.core.Tables.load(spark, sf, "customer"),
        Seq(col("c_mktsegment"), col("c_nationkey")), 5),
      graft.operators.LabelProp.labelPropagation(
        li.select(col("l_suppkey").as("src"), col("l_partkey").as("dst"),
          lit(1L).as("w"))))
    clean.foreach { df =>
      assert(PlanLint.lint(df) === Seq.empty, df.queryExecution.logical.nodeName)
    }
  }

  test("every LintExemptions entry is NECESSARY (fires) and SUFFICIENT (no residual findings)") {
    // A stale exemption (plan no longer carries the shape) must fail —
    // the registry cannot rot into a blanket mute. A query growing a
    // finding BEYOND its exempt set must fail too — a corpus-scale
    // funnel can never hide behind a catalog-window exemption.
    for ((name, rules) <- LintExemptions.exemptions) {
      val fn = graft.SparkEntry.queries(name)
      val found = PlanLint.lint(fn(spark, sf)).map(_.rule).distinct
      val (exempt, residual) = LintExemptions.partition(name, found)
      assert(residual.isEmpty,
        s"$name has non-exempt findings $residual — fix the plan or argue boundedness in the registry")
      assert(rules.keySet.subsetOf(exempt.toSet),
        s"$name exempts ${rules.keySet} but only ${exempt.toSet} fire — remove the stale entries")
    }
  }
}
