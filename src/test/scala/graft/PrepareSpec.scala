package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llmops.{Mix, Pack, Redact}

/** Unit checks for the corpus-preparation operators (PII redaction,
  * token-window chunking, weighted mixture sampling) on hand-built rows;
  * the oracle-gated queries cover the fixture end to end. */
class PrepareSpec extends AnyFunSuite {
  import TestSession._

  test("redactPii scrubs emails, IPs, and phones with typed tags") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob@corp.io and 10.1.2.3 then call 555-123-4567 done"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.org one ip 192.168.0.1")).toDF("doc_id", "t")
    val got = Redact.redactPii(df, "t")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) === ((1L, 1L, 1L,
      "mail <EMAIL> and <IP> then call <PHONE> done")))
    assert(got(2L) === ((0L, 0L, 0L, "no pii here at all")))
    assert(got(3L) === ((2L, 1L, 0L,
      "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("redactPii never double-counts a dotted quad inside an email domain") {
    import spark.implicits._
    val df = Seq(
      // domain carries a dotted quad but ends alpha → it IS an email, and
      // the email pass consumes the quad before the IP pass runs
      (1L, "ping x@10.1.2.3.corp.io now"),
      // all-numeric "domain" has no alpha TLD → not an email, IS an IP
      (2L, "ping x@10.1.2.3 now")).toDF("doc_id", "t")
    val got = Redact.redactPii(df, "t")
      .select("doc_id", "n_emails", "n_ips").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((1L, 0L)))
    assert(got(2L) === ((0L, 1L)))
  }

  test("chunkDocs tiles every token with stride-spaced overlapping windows") {
    import spark.implicits._
    val df = Seq((7L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Pack.chunkDocs(df, chunkTokens = 4, stride = 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // starts 0,3,6,9; last window is the 1-token remainder
    assert(got.toSeq === Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L),
      (3L, 9L, 1L)))
  }

  test("chunkDocs emits one chunk for a doc shorter than the window") {
    import spark.implicits._
    val df = Seq((1L, "only three words")).toDF("doc_id", "text")
    val got = Pack.chunkDocs(df, chunkTokens = 64, stride = 48).collect()
    assert(got.length === 1 && got.head.getLong(3) === 3L)
  }

  test("weightedMix: 0 bp drops all, 10000 bp keeps all, unknown source drops") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, if (i <= 20) "a" else if (i <= 40) "b" else "zzz"))
      .toDF("doc_id", "source")
    val kept = Mix.weightedMix(df, Seq("a" -> 0, "b" -> 10000))
      .select("source").collect().map(_.getString(0))
    assert(!kept.contains("a") && !kept.contains("zzz"))
    assert(kept.count(_ == "b") === 20)
  }

  test("weightedMix is deterministic and rate-proportional") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, "s")).toDF("doc_id", "source")
    val k1 = Mix.weightedMix(df, Seq("s" -> 2500)).count()
    val k2 = Mix.weightedMix(df, Seq("s" -> 2500)).count()
    assert(k1 === k2)                  // same rows every run
    assert(k1 > 350 && k1 < 650, s"25% of 2000 should land near 500, got $k1")
  }

  test("capPerStratum equals the brute-force N-smallest-hash selection") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"s${i % 7}")).toDF("doc_id", "source")
    val got = Mix.capPerStratum(df, "source", "doc_id", 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val h = graft.llmops.Hashing.md5Long(
      concat(col("source"), lit(":"), col("doc_id").cast("string")))
    val w = Window.partitionBy("source").orderBy(h, col("doc_id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 12)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.size === 7 * 12)
  }

  test("capPerStratum excludes NULL keys instead of letting them vanish or skew counts") {
    import spark.implicits._
    val df = (Seq((Some(1L), Some("a")), (Some(2L), Some("a")),
      (None, Some("a")), (Some(3L), None)))
      .toDF("doc_id", "source")
    val got = Mix.capPerStratum(df, "source", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // null id and null stratum rows are excluded; the rest all fit the cap
    assert(got === Set(1L, 2L))
  }

  test("capPerStratum keeps whole strata smaller than the cap") {
    import spark.implicits._
    val df = ((1L to 3L).map(i => (i, "tiny")) ++ (1L to 200L).map(i => (i + 10L, "big")))
      .toDF("doc_id", "source")
    val got = Mix.capPerStratum(df, "source", "doc_id", 50)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("tiny" -> 3L, "big" -> 50L))
  }

  test("weightedMix rejects out-of-range thresholds") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Mix.weightedMix(df, Seq("a" -> 10001))
    }
  }

  test("tokenBudgetSample equals the driver-side greedy prefix exactly") {
    // ground truth: collect (source, doc_id, tokens, hash), replay the
    // greedy prefix per source with the same kernel hash and tie-break —
    // the bucketed two-phase sum must reproduce it row for row
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val md = graft.llmops.Kernels.newMd5()
    val all = docs.filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        (r.getString(1), graft.llmops.Kernels.md5Long(md, id.toString), id,
          graft.llmops.Kernels.splitSpace(r.getString(2)).length.toLong)
      }
    val budgets = Map("src0" -> 1200L).withDefaultValue(400L)
    val expected = all.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy { case (_, h, id, _) => (h, id) }.toSeq.flatMap {
        case (_, _, id, n) =>
          val before = cum
          cum += n
          if (before < budgets(src)) Some((id, src, n, cum)) else None
      }
    }.toSet
    val got = Mix.tokenBudgetSample(docs, Map("src0" -> 1200L), 400L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("tokenBudgetSample: greedy prefix honors the budget; no per-source sort funnel") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val out = Mix.tokenBudgetSample(docs, Map("src0" -> 1200L), 400L)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per source: every kept doc starts under the budget, the straddling
    // doc may finish over it, and everything before the cut is kept in
    // hash order (greedy prefix, no holes)
    rows.groupBy(_._2).foreach { case (src, docsOf) =>
      val budget = if (src == "src0") 1200L else 400L
      docsOf.foreach { case (_, _, n, cum) =>
        assert(cum - n < budget, s"$src kept a doc starting at $cum >= $budget")
      }
      val maxCum = docsOf.map(_._4).max
      assert(maxCum >= budget || docsOf.map(_._3).sum == maxCum,
        s"$src stopped early at $maxCum < $budget")
    }
    // every source with documents contributes at least one doc
    val allSources = docs.select("source").distinct().collect()
      .map(_.getString(0)).toSet
    assert(rows.map(_._2).toSet === allSources)
    // deterministic under repartitioning (the hash order IS the shuffle)
    val re = Mix.tokenBudgetSample(docs.repartition(13), Map("src0" -> 1200L), 400L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(re.toSet === rows.toSet)
    // plan: the prefix sum windows partition by (source, bucket) — never
    // a whole source in one task (the hot-key funnel)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("_bucket"), plan.take(1500))
    assert(!plan.contains("SinglePartition"), plan.take(1500))
  }

  test("temperatureTokenSample: integer-pinned sqrt budgets match the replay; rebalance is sublinear") {
    import spark.implicits._
    val ten = Seq.fill(10)("w").mkString(" ") // 10 tokens per doc
    // three sources with 1× / 4× / 16× token mass
    val docs = ((1 to 10).map(i => (i.toLong, "a", ten)) ++
      (1 to 40).map(i => (100L + i, "b", ten)) ++
      (1 to 160).map(i => (1000L + i, "c", ten)))
      .toDF("doc_id", "source", "text")
    val out = Mix.temperatureTokenSample(docs, totalBudget = 700L)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val budgets = rows.map(r => r._2 -> r._5).toMap
    // replay the exact algebra: w = floor(sqrt(tokens)·1000) as a Long,
    // Σw in integers, budget = max(1, floor(B · w/Σw))
    val t = Map("a" -> 100L, "b" -> 400L, "c" -> 1600L)
    val w = t.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1000.0).toLong }
    val wsum = w.values.sum
    val want = w.map { case (s, wv) =>
      s -> math.max(1L, math.floor(700.0 * (wv.toDouble / wsum.toDouble)).toLong)
    }
    assert(budgets === want)
    // α = 1/2 is the point: c holds 16× a's tokens but gets only ~4× its
    // budget (sqrt compression), where proportional sampling would give 16×
    assert(want("c") >= 3 * want("a") && want("c") <= 5 * want("a"),
      s"sqrt rebalance broken: $want")
    // greedy prefix honors each source's computed budget
    rows.foreach { case (_, src, n, cum, b) =>
      assert(cum - n < b, s"$src kept a doc starting at ${cum - n} >= $b")
    }
    // deterministic under repartitioning
    val re = Mix.temperatureTokenSample(docs.repartition(7), 700L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.toSet === rows.toSet)
    // budgets ride ONE consumer chain: the fixture-backed plan reads
    // parquet at most twice (weights side + prefix-sum side) — the
    // agg+crossJoin shape this replaced split into three
    val fx = Mix.temperatureTokenSample(
      graft.core.Tables.load(spark, sf, "documents"), 700L)
    val plan = fx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(plan).size <= 2, plan.take(2000))
  }

  test("interleaveSources: injective round-robin order; no global sort in the plan") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val out = Mix.interleaveSources(docs)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // total order: global_ord is injective
    assert(rows.map(_._4).distinct.length === rows.length)
    // round-robin: any nSources consecutive positions hold at most one
    // doc per source
    val nSources = rows.map(_._2).distinct.length
    rows.groupBy(_._4 / nSources).foreach { case (round, g) =>
      assert(g.map(_._2).distinct.length === g.length,
        s"round $round repeats a source: ${g.map(_._2).toSeq}")
    }
    // the arithmetic: global_ord = (ord-1)·n + sidx with sidx the dense
    // alphabetical source index
    val sidx = rows.map(_._2).distinct.sorted.zipWithIndex.toMap
    rows.foreach { case (_, src, ord, g) =>
      assert(g === (ord - 1) * nSources + sidx(src))
    }
    // plan: per-(source, bucket) windows only — no single-partition
    // corpus window (the sources index window runs over DISTINCT
    // sources, whose Exchange is catalog-sized; assert the corpus-side
    // window partitions by the hash bucket)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("_bucket"), plan.take(1500))
    // the source index prunes to an id+source scan of the raw docs
    // (never text, never a second execution of the prefix-sum pipeline)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      plan.take(2000))
  }

  test("leakFreeSplit: every near-dup cluster lands whole on one side of the cut") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain clusters {1..5}, {10,11}, everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val rows = Mix.leakFreeSplit(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 200)
    // cluster members co-assign — the leakage guarantee
    rows.groupBy(_._2).foreach { case (cid, g) =>
      assert(g.map(_._3).distinct.length === 1,
        s"cluster $cid straddles the split: ${g.toSeq}")
    }
    // singleton assignment matches plain withSplit on the same key space
    val splits = rows.map(_._3).distinct.sorted
    assert(splits.contains("train") && splits.length >= 2)
    // deterministic
    assert(Mix.leakFreeSplit(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet ===
      rows.map(r => (r._1, r._3)).toSet)
  }

  test("curriculumOrder: clean tier first, round-robin within tier, injective positions") {
    import spark.implicits._
    // clean docs pass every Gopher rule (30 words, stopword-bearing);
    // junk docs fail the word-count floor
    val clean = Seq.fill(15)("the and").mkString(" ") // 30 words, mean len 3.0
    val junk = "zz yy xx"
    val docs = (for {
      src <- Seq("sA", "sB"); i <- 1 to 4
    } yield {
      val id = (if (src == "sA") 0L else 100L) + i
      (id, src, if (i <= 2) clean else junk)
    }).toDF("doc_id", "source", "text")
    val rows = Mix.curriculumOrder(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(4)))
    assert(rows.length === 8)
    // tier 0 = Gopher-clean docs (i <= 2 of each source)
    assert(rows.filter(_._3 == 0).map(_._1).toSet === Set(1L, 2L, 101L, 102L))
    // within each tier, positions injective and round-robin by source
    for (tier <- Seq(0, 1)) {
      val t = rows.filter(_._3 == tier)
      assert(t.map(_._4).distinct.length === t.length)
      t.groupBy(_._4 / 2).foreach { case (round, g) =>
        assert(g.map(_._2).distinct.length === g.length,
          s"tier $tier round $round repeats a source")
      }
    }
    // no global sort: corpus-side windows partition by the hash bucket;
    // the only unkeyed window is the catalog-sized source index
    val plan = Mix.curriculumOrder(docs).queryExecution.executedPlan
      .toString.split("== Initial Plan ==").head
    assert(plan.contains("_bucket"), plan.take(1500))
    assert(!plan.contains("rangepartitioning"), plan.take(1500))
  }

  test("temperatureTokenSample: a vanishing source keeps one doc (floor would zero it)") {
    import spark.implicits._
    val hundred = Seq.fill(100)("w").mkString(" ")
    val docs = ((1 to 1000).map(i => (i.toLong, "huge", hundred)) :+
      ((9999L, "tiny", "x"))).toDF("doc_id", "source", "text")
    val out = Mix.temperatureTokenSample(docs, totalBudget = 300L)
    val bySrc = out.collect().map(r => (r.getString(1), r.getLong(4)))
      .groupBy(_._1).map { case (s, g) => s -> ((g.length, g.head._2)) }
    // tiny's floor budget is 0 (w=1000 of wsum≈317k, 300·w/Σw < 1) →
    // greatest(1, ·) keeps its single doc
    assert(bySrc("tiny") === ((1, 1L)))
    assert(bySrc.contains("huge"))
  }
}
