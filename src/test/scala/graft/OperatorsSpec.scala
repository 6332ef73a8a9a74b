package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{RangeJoin, Sketch}

/** Range-join binning and KMV sketch semantics on hand-built frames. */
class OperatorsSpec extends AnyFunSuite {
  import TestSession._

  test("pointInInterval: inclusive bounds, bin crossings, no duplicate matches") {
    import spark.implicits._
    val points = Seq((1L, 0L, "at_lo"), (1L, 25L, "mid"), (1L, 30L, "at_hi"),
      (1L, 31L, "past_hi"), (2L, 25L, "other_key")).toDF("k", "pt", "tag")
    // interval [0, 30] spans 4 bins at width 10; [100, 105] matches nothing
    val intervals = Seq((1L, 0L, 30L, "w1"), (1L, 100L, 105L, "w2"))
      .toDF("k", "lo", "hi", "win")
    val got = RangeJoin.pointInInterval(points, intervals,
      keys = Seq("k"), ptCol = "pt", loCol = "lo", hiCol = "hi", binWidth = 10L)
      .select("tag", "win").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sorted === Seq(("at_hi", "w1"), ("at_lo", "w1"), ("mid", "w1")))
    // exactly one row per matching pair even though w1 spans several bins
    assert(got.length === got.distinct.length)
  }

  test("overlapping intervals each match; binning never drops a boundary point") {
    import spark.implicits._
    val points = Seq((1L, 10L)).toDF("k", "pt")
    val intervals = Seq((1L, 5L, 10L, "ends_on_pt"), (1L, 10L, 15L, "starts_on_pt"))
      .toDF("k", "lo", "hi", "win")
    val wins = RangeJoin.pointInInterval(points, intervals,
      Seq("k"), "pt", "lo", "hi", binWidth = 7L)
      .select("win").collect().map(_.getString(0)).sorted.toSeq
    assert(wins === Seq("ends_on_pt", "starts_on_pt"))
  }

  test("range join rejects colliding column names and runaway intervals") {
    import spark.implicits._
    val pts = Seq((1L, 5L, "x")).toDF("k", "pt", "shared")
    val ivs = Seq((1L, 0L, 10L, "y")).toDF("k", "lo", "hi", "shared")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, Seq("k"), "pt", "lo", "hi", 10L)
    }
    assert(ex.getMessage.contains("shared"))
    // an open-ended sentinel interval fails with the actual problem named
    val sentinel = Seq((1L, 0L, Long.MaxValue)).toDF("k", "lo", "hi")
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts.drop("shared"), sentinel,
        Seq("k"), "pt", "lo", "hi", binWidth = 10L, maxBinsPerInterval = 100L)
        .collect()
    }
    assert(err.getMessage.contains("bins"), err.getMessage)
  }

  test("KMV sketch ignores NULLs (count-distinct semantics, portable state)") {
    import spark.implicits._
    val withNulls = (Seq.fill(3)(None) ++ (1 to 100).map(i => Some(i.toString)))
      .toDF("v")
    val row = Sketch.kmvDistinct(withNulls, "v", k = 256).head()
    assert(row.getAs[Long]("n_hashes") === 100L) // NULLs not counted
    assert(row.getAs[Double]("estimate") === 100.0)
  }

  test("binned range join equals the brute-force theta join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val points = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextLong() % 1000L, i.toLong)).toDF("k", "pt", "pid")
    val intervals = (1 to 120).map { i =>
      val lo = rnd.nextLong() % 1000L
      (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(300).toLong, i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "pt", "lo", "hi", binWidth = width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = points.join(intervals, Seq("k"))
        .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned === brute, s"divergence at binWidth=$width")
    }
  }

  test("as-of join equals the brute-force per-row argmax on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "ts", "lid")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong)).toDF("k", "rts", "rid")
    val rows = graft.operators.AsOfJoin.backward(left, right,
      Seq("k"), "ts", "rts", payload = Seq("rid")).collect()
    assert(rows.length === 300) // exactly one output row per left row
    val got = rows.map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = left.collect().map { l =>
      val (k, ts, lid) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val cands = rights.filter(r => r._1 == k && r._2 <= ts)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3)) // latest ts, tie: max rid
    }.toMap
    assert(got === want)
  }

  test("KMV sketch: exact below k, within 10% above k, deterministic") {
    import spark.implicits._
    val small = (1 to 100).map(_.toString).toDF("v")
    val exactRow = Sketch.kmvDistinct(small, "v", k = 256).head()
    assert(exactRow.getAs[Long]("n_hashes") === 100L)
    assert(exactRow.getAs[Double]("estimate") === 100.0)
    val big = (1 to 20000).map(i => (i % 5000).toString).toDF("v") // 5000 distinct
    val est = Sketch.kmvDistinct(big, "v", k = 256).head().getAs[Double]("estimate")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est vs 5000")
    // bit-deterministic across partitionings
    val est2 = Sketch.kmvDistinct(big.repartition(13), "v", k = 256)
      .head().getAs[Double]("estimate")
    assert(est2 === est)
  }

  test("CMS never underestimates; exact when wide; counters merge by addition") {
    import spark.implicits._
    // zipf-ish: key k appears ~200/k times — heavy keys + a long tail
    val rows = (1 to 50).flatMap(k => Seq.fill(200 / k)(k.toString)).toDF("v")
    val exact = rows.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = exact.keys.toSeq.toDF("v")
    def estimates(width: Int) = {
      val sk = Sketch.cmsBuild(rows, "v", width, depth = 4)
      Sketch.cmsEstimate(sk, keys, "v", width, depth = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val narrow = estimates(width = 16) // 50 keys in 16 buckets: collisions certain
    exact.foreach { case (k, n) =>
      assert(narrow(k) >= n, s"CMS underestimated $k: ${narrow(k)} < $n")
    }
    assert(narrow.exists { case (k, e) => e > exact(k) }, "expected collisions at w=16")
    assert(estimates(width = 4096) === exact) // wide enough → exact
    // mergeability: sketch(a ++ b) = sketch(a) + sketch(b) counter-wise
    val (ha, hb) = (rows.filter(length(col("v")) === 1), rows.filter(length(col("v")) > 1))
    val whole = Sketch.cmsBuild(rows, "v", 16, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (Sketch.cmsBuild(ha, "v", 16, 4).collect() ++
      Sketch.cmsBuild(hb, "v", 16, 4).collect())
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(merged === whole)
  }

  test("bloom semi-join equals the plain semi-join on random data (no false negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val fact = (1 to 3000).map(_ => (rnd.nextInt(500).toLong, rnd.nextInt(100)))
      .toDF("key", "payload")
    val dimKeys = (1 to 60).map(_ => rnd.nextInt(500).toLong).distinct
    val dim = dimKeys.toDF("dkey")
    val got = graft.operators.BloomJoin
      .bloomSemiJoin(fact, "key", dim, "dkey", mBits = 1 << 12, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val want = fact.join(dim, fact("key") === dim("dkey"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("bloom probe prunes: a tiny filter discards most non-matching rows map-side") {
    import spark.implicits._
    val dim = (1L to 16L).toDF("dkey")
    val bits = graft.operators.BloomJoin.buildBits(dim, "dkey", 1 << 12, 4)
    val keys = (1L to 5000L)
    val pass = keys.count(k =>
      graft.operators.BloomJoin.contains(bits, 1 << 12, 4, k.toString))
    // all 16 members pass (no false negatives)…
    assert((1L to 16L).forall(k =>
      graft.operators.BloomJoin.contains(bits, 1 << 12, 4, k.toString)))
    // …and false positives stay rare: 16 members + a small FP tail
    assert(pass < 100, s"$pass of 5000 passed a 16-key bloom")
  }

  test("bloom semi-join rejects bad sizing") {
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      graft.operators.BloomJoin.bloomSemiJoin(df, "k", df, "k", mBits = 100)
    }
    intercept[IllegalArgumentException] {
      graft.operators.BloomJoin.bloomSemiJoin(df, "k", df, "k", k = 9)
    }
  }

  test("groupQuantiles picks exact percentile_disc elements (integer rank math)") {
    import spark.implicits._
    // group a: values 1..10 → p50 = ceil(0.5*10)=5th = 5.0, p90 = 9th,
    // p99 = ceil(9.9)=10th; group b: single value
    val df = ((1 to 10).map(i => ("a", i.toDouble)) :+ (("b", 42.0)))
      .toDF("g", "v")
    val got = graft.operators.Quantiles.groupQuantiles(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") === ((5.0, 9.0, 10.0)))
    assert(got("b") === ((42.0, 42.0, 42.0)))
  }

  test("groupQuantiles handles duplicate values through the histogram path") {
    import spark.implicits._
    // 8×1.0 then 2×9.0: p50 lands inside the duplicate run, p90 at its edge
    val df = ((1 to 8).map(_ => ("g", 1.0)) ++ Seq(("g", 9.0), ("g", 9.0)))
      .toDF("g", "v")
    val got = graft.operators.Quantiles.groupQuantiles(df, "g", "v").head()
    assert((got.getDouble(1), got.getDouble(2), got.getDouble(3)) ===
      ((1.0, 9.0, 9.0)))
  }

  test("HLL estimate lands within raw-estimator error of the true count") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("k")
    val r = graft.operators.Sketch.hllDistinct(df, "k").head()
    val est = r.getDouble(1)
    // sigma = 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(est - 5000.0) / 5000.0 < 0.26, s"est $est vs 5000")
    // repeatable bit for bit (no RNG, no order sensitivity)
    val r2 = graft.operators.Sketch.hllDistinct(df, "k").head()
    assert(r2.getDouble(1) === est && r2.getLong(0) === r.getLong(0))
  }

  test("HLL ignores NULLs and duplicate values (distinct semantics)") {
    import spark.implicits._
    val base = (1L to 800L).map(Option(_)).toDF("k")
    val noisy = ((1L to 800L) ++ (1L to 800L)).map(Option(_))
      .toDF("k").union(Seq(Option.empty[Long]).toDF("k"))
    val a = graft.operators.Sketch.hllDistinct(base, "k").head().getDouble(1)
    val b = graft.operators.Sketch.hllDistinct(noisy, "k").head().getDouble(1)
    assert(a === b)
  }

  test("topKPerGroup ranks by count with deterministic key tiebreak") {
    import spark.implicits._
    val df = Seq.fill(3)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(1)(("g1", "c")) ++ Seq.fill(2)(("g2", "z"))
    val got = graft.llmops.CorpusStats
      .topKPerGroup(df.toDF("g", "k"), "g", "k", 2)
      .select("g", "k", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).sorted
    // a and b tie at 3 in g1 → a wins rank 1 by key order; c is cut
    assert(got.toSeq === Seq(("g1", "a", 1), ("g1", "b", 2), ("g2", "z", 1)))
  }

  test("keyDistribution reports cardinality, totals, and count quantiles") {
    import spark.implicits._
    // 3 keys: counts 1, 4, 5 → n_keys=3, n_rows=10, max=5, p50=4, p99=5
    val df = (Seq.fill(1)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(5)(3L))
      .toDF("k")
    val r = graft.operators.Quantiles.keyDistribution(df, "k").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 10L, 5L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((4L, 5L, 5L)))
  }

  test("distinctiveKeywords picks each doc's rarest tokens by document frequency") {
    import spark.implicits._
    val docs = Seq((1L, "the cat axolotl"), (2L, "the cat"), (3L, "the"))
      .toDF("doc_id", "text")
    // df: the=3, cat=2, axolotl=1
    val got = graft.llmops.CorpusStats
      .distinctiveKeywords(docs, k = 2, headVocab = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set((1L, 1, "axolotl"), (1L, 2, "cat"),
      (2L, 1, "cat"), (2L, 2, "the"), (3L, 1, "the")))
  }

  test("corpus-frequency skew split equals the plain-join semantics") {
    import spark.implicits._
    val docs = Seq((1L, "the the cat"), (2L, "the dog"), (3L, "cat axolotl"))
      .toDF("doc_id", "text")
    // headVocab=1 forces a genuine split: "the" broadcasts, rest shuffle
    val got = graft.llmops.CorpusStats.corpusFreqStats(docs, headVocab = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // freqs: the=3, cat=2, dog=1, axolotl=1 (outputs stable-rounded to 4)
    val r4 = graft.llmops.Kernels.floorRound4 _
    assert(got(1L) === ((3L, r4((3 + 3 + 2) / 3.0), r4(1 / 3.0)))) // rare: cat
    assert(got(2L) === ((2L, (3 + 1) / 2.0, 0.5)))                 // rare: dog
    assert(got(3L) === ((2L, (2 + 1) / 2.0, 1.0)))                 // both rare
  }

  test("resampleLocf: contiguous spine, gaps carry the last observation, same-day argmax") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, 7L, ts("2024-05-01 09:00:00"), Some(10.0)),
      (2L, 7L, ts("2024-05-01 18:00:00"), Some(11.0)), // later same day wins
      (3L, 7L, ts("2024-05-03 12:00:00"), Some(30.0)), // gap on 05-02
      (4L, 7L, ts("2024-05-05 08:00:00"), Some(50.0)), // gap on 05-04
      (5L, 8L, ts("2024-05-02 00:00:00"), Some(99.0)), // single-day key
      (6L, 8L, ts("2024-05-03 07:00:00"), None)) // events, but value NULL
      .toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.RollingWindow
      .resampleLocf(events, "user_id", "ts", "value", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got((7L, "2024-05-01")) === ((11.0, false))) // argmax of the day
    assert(got((7L, "2024-05-02")) === ((11.0, true)))  // gap: carried
    assert(got((7L, "2024-05-03")) === ((30.0, false)))
    assert(got((7L, "2024-05-04")) === ((30.0, true)))
    assert(got((7L, "2024-05-05")) === ((50.0, false)))
    assert(got((8L, "2024-05-02")) === ((99.0, false)))
    // a day with events whose value is NULL: NOT a gap (data arrived),
    // the fill still carries the previous non-null value
    assert(got((8L, "2024-05-03")) === ((99.0, false)))
    assert(got.size === 7) // spines span each key's own range only
  }

  test("rollingByKey: trailing-hour frame is (t-1h, t], ties see each other") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 1800L, 2.0), (3L, 1L, 3599L, 3.0),
      (4L, 1L, 3600L, 4.0), (5L, 1L, 7300L, 5.0),
      (6L, 2L, 100L, 1.5), (7L, 2L, 100L, 2.5))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
    val got = graft.operators.RollingWindow
      .rollingByKey(df, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((1L, 100L)))
    assert(got(2L) === ((2L, 300L)))
    assert(got(3L) === ((3L, 600L)))
    // exactly one hour later: the t=0 event has aged out of (0, 3600]
    assert(got(4L) === ((3L, 900L)))
    assert(got(5L) === ((1L, 500L)))
    // RANGE frames include peers: simultaneous events count each other
    assert(got(6L) === ((2L, 400L)) && got(7L) === ((2L, 400L)))
  }

  test("sessionize partitions random event streams exactly (vs brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val events = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(5000).toLong))
    val df = events.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val gap = 300L
    val got = graft.operators.Sessionize
      .sessionize(df, "user_id", "ts", "event_id", gapMicros = gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute force: sort per user by (ts, id), split where the gap is
    // REACHED (>=, matching the streaming session_window boundary)
    val want = events.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.map(e => (e._3, e._1)).sorted
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc, e) =>
          if (e._1 - acc.head.head._1 >= gap) List(e) :: acc
          else (e :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, (i + 1).toLong) ->
          ((s.length.toLong, s.map(_._1).min, s.map(_._1).max))
      }
    }.toMap
    assert(got === want)
    // every event lands in exactly one session
    assert(got.values.map(_._1).sum === 400L)
  }

  test("funnel counts are monotone and match brute force on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val types = Seq("signup", "click", "purchase", "view")
    val events = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong,
        types(rnd.nextInt(types.size))))
    val df = events.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val steps = Seq("signup", "click", "purchase")
    val r = graft.operators.Funnel
      .funnel(df, "user_id", "ts", "event_id", "event_type", steps).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(got._1 >= got._2 && got._2 >= got._3) // a funnel narrows
    // brute force: per user, scan (ts, id)-sorted events carrying flags
    val want = events.groupBy(_._2).values.map { es =>
      val sorted = es.sortBy(e => (e._3, e._1)).map(_._4)
      val reached = Array.fill(steps.size)(false)
      for (t <- sorted; k <- steps.indices.reverse)
        if (t == steps(k) && (k == 0 || reached(k - 1))) reached(k) = true
      reached
    }.toSeq
    val wantCounts = steps.indices.map(k => want.count(_(k)).toLong)
    assert(got === ((wantCounts(0), wantCounts(1), wantCounts(2))))
  }

  test("pivotCounts: explicit value list, absent cells are 0, off-list values drop") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (2L, "zzz"))
      .toDF("k", "v")
    val got = graft.operators.Reshape.pivotCounts(df, "k", "v", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 1L, 0L)))
    assert(got(2L) === ((0L, 1L, 0L))) // "zzz" is outside the declared domain
    intercept[IllegalArgumentException] {
      graft.operators.Reshape.pivotCounts(df, "k", "v", Seq("a", "a"))
    }
  }

  test("jsonLong: typed extraction, NULL on absent field or malformed payload") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 42}"""), (2L, """{"other": 1}"""),
      (3L, "not json at all"), (4L, null.asInstanceOf[String]))
      .toDF("id", "props")
    val got = df.select(col("id"),
      graft.operators.JsonCols.jsonLong(col("props"), "k").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(42L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("grouped HLL tracks per-group exact counts and registers roll up by max") {
    import spark.implicits._
    // two groups with different cardinalities, both in the raw
    // estimator's valid regime (n ≳ 2.5·m = 640 for m = 256 — below
    // that the standard correction is linear counting, which needs a
    // cross-engine ln() and is out of the oracle-stable contract)
    val rows = (1 to 5000).map(i => ("big", i.toLong)) ++
      (1 to 1000).map(i => ("small", i.toLong))
    val df = rows.toDF("g", "x")
    val est = graft.operators.Sketch.hllDistinctBy(df, "g", "x")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(est("big") - 5000) / 5000.0 < 0.2) // ~3σ at 1.04/√256
    assert(math.abs(est("small") - 1000) / 1000.0 < 0.2)
    // mergeability: per-half register tables max-merged == whole-input table
    val m = graft.operators.Sketch.HllBuckets
    def regs(d: org.apache.spark.sql.DataFrame) = {
      val h1 = graft.llmops.Hashing.md5Long(col("x").cast("string"))
      d.select(col("g"), h1.as("h1"))
        .select(col("g"), (col("h1") % m).as("bucket"),
          expr(s"h1 div $m").as("v"))
        .select(col("g"), col("bucket"),
          when(col("v") === 0, 53).otherwise(lit(53) - length(bin(col("v"))))
            .as("rho"))
        .groupBy("g", "bucket").agg(max("rho").as("mj"))
    }
    val half1 = regs(rows.take(1000).toDF("g", "x"))
    val half2 = regs(rows.drop(1000).toDF("g", "x"))
    val merged = half1.unionByName(half2)
      .groupBy("g", "bucket").agg(max("mj").as("mj"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val whole = regs(df)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(merged === whole)
  }

  test("sessionize: gap splits sessions, ties share one, seq is 1-based per key") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 0L), (2L, 1L, 500L), (3L, 1L, 2000L),   // gap 1000 splits
      (4L, 2L, 100L), (5L, 2L, 100L))                  // same instant
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = graft.operators.Sessionize
      .sessionize(df, "user_id", "ts", "event_id", gapMicros = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      (1L, 1L) -> ((2L, 0L, 500L)),    // events 1,2
      (1L, 2L) -> ((1L, 2000L, 2000L)),
      (2L, 1L) -> ((2L, 100L, 100L)))) // simultaneous events: one session
  }

  test("funnel: strict order, same-instant resolved by id, monotone counts") {
    import spark.implicits._
    val df = Seq(
      // u1 completes in order; u2 clicks BEFORE signing up; u3 skips click;
      // u4 signs up and clicks at the same instant (id orders them)
      (1L, 1L, 1L, "signup"), (2L, 1L, 2L, "click"), (3L, 1L, 3L, "purchase"),
      (4L, 2L, 1L, "click"), (5L, 2L, 2L, "signup"), (6L, 2L, 3L, "purchase"),
      (7L, 3L, 1L, "signup"), (8L, 3L, 2L, "purchase"),
      (9L, 4L, 1L, "signup"), (10L, 4L, 1L, "click"))
      .toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = graft.operators.Funnel.funnel(df, "user_id", "ts", "event_id",
      "event_type", Seq("signup", "click", "purchase")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 1L)))
    // u2's purchase does NOT count: its click preceded its signup
    // u4's click counts: same instant, higher event_id ⇒ ordered after
  }

  test("zScore standardizes within groups and drops singletons") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 10.0), (5L, "b", 20.0),
      (6L, "solo", 99.0), // n = 1: no sample variance, dropped
      (7L, "const", 5.0), (8L, "const", 5.0)) // zero variance: 0/0, dropped
      .toDF("event_id", "event_type", "value")
    val got = graft.llmops.Normalize.zScore(df, "event_type", "value", "event_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(got(2L) === 0.0) // the mean of group a
    assert(got(1L) === -1.0 && got(3L) === 1.0) // ±1 sample std (std=100c)
    assert(got(4L) === -0.7071 && got(5L) === 0.7071) // ±1/√2
  }

  test("rollingByKey equals the brute-force trailing window on random streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val events = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(2000).toLong,
        (rnd.nextInt(10000) + 1) / 100.0))
    val df = events.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val w = 500L
    val got = graft.operators.RollingWindow
      .rollingByKey(df, "user_id", "ts", "value", windowMicros = w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val want = events.map { e =>
      val peers = events.filter(p => p._2 == e._2 &&
        p._3 > e._3 - w && p._3 <= e._3)
      e._1 -> ((peers.length.toLong,
        peers.map(p => math.round(p._4 * 100)).sum))
    }.toMap
    assert(got === want)
  }

  test("windowed funnel: hops expire, bound is per-hop not from origin") {
    import spark.implicits._
    val df = Seq(
      // u1: click 2 ticks after signup (in window), purchase 2 after
      // click (in window, though 4 from signup — the bound is per hop)
      (1L, 1L, 0L, "signup"), (2L, 1L, 2L, "click"), (3L, 1L, 4L, "purchase"),
      // u2: click 5 ticks after signup — hop expired
      (4L, 2L, 0L, "signup"), (5L, 2L, 5L, "click"),
      // u3: a LATER signup refreshes the carry; click within window of it
      (6L, 3L, 0L, "signup"), (7L, 3L, 10L, "signup"), (8L, 3L, 12L, "click"))
      .toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = graft.operators.Funnel.funnel(df, "user_id", "ts", "event_id",
      "event_type", Seq("signup", "click", "purchase"),
      windowMicros = Some(3L)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 1L)))
  }

  test("retentionCohorts counts distinct active users per cohort/day offset") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 23:00:00"), // same day
      (1L, "2024-01-02 01:00:00"), (1L, "2024-01-04 09:00:00"),
      (2L, "2024-01-01 12:00:00"),
      (3L, "2024-01-02 08:00:00"), (3L, "2024-01-03 08:00:00"))
      .toDF("user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val got = graft.operators.Retention.retentionCohorts(df, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 3) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("bucketedRunningSum equals the single-partition prefix sum on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(100).toLong - 50))
    for (width <- Seq(1L, 7L, 64L, 10000L)) {
      val df = rows.toDF("ord", "v")
        .withColumn("bucket", expr(s"ord div $width"))
      val got = graft.operators.PrefixSum
        .bucketedRunningSum(df, "bucket", "ord", "v", "cum")
        .select("ord", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = rows.toDF("ord", "v")
        .withColumn("cum", sum(col("v")).over(Window.orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === exact, s"width $width")
    }
  }

  test("cmsJoinSize never under-estimates and is tight at proper width") {
    import spark.implicits._
    val a = (1 to 1000).map(i => i.toLong % 100).toDF("k")  // 100 keys × 10
    val b = (1 to 2000).map(i => i.toLong % 200).toDF("k")  // 200 keys × 10
    // true size: the 100 shared keys contribute 10·10 each = 10000
    val est = graft.operators.Sketch.cmsJoinSize(a, "k", b, "k")
      .head().getLong(0)
    assert(est >= 10000L) // inner product ≥ true join size, always
    assert(est <= 10100L) // cross-term noise ≈ 1000·2000/2^20 ≈ 2 per depth
    // disjoint inputs: any depth with zero grid overlap clamps to 0 —
    // the provably-empty join must not report its collision noise
    val c = (1 to 100).map(i => 1000000L + i).toDF("k")
    val e = (1 to 100).map(i => 2000000L + i).toDF("k")
    assert(graft.operators.Sketch.cmsJoinSize(c, "k", e, "k")
      .head().getLong(0) === 0L)
  }

  test("streaming HLL state drains to exactly the batch sketch (order-free registers)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shll_spec")
    val out = s"$dir/out"
    graft.streaming.StreamingIncremental.runHllDistinct(
      spark, s"$sf/events.parquet", s"$dir/ckpt", Some(4)) { b =>
      b.write.mode("append").parquet(out)
    }
    val streamedRows = spark.read.parquet(out).collect()
    val streamed = streamedRows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // one emitted row per group: if the drain ever split into multiple
    // micro-batches, stale intermediate emissions would hide in the map
    assert(streamedRows.length === streamed.size,
      s"duplicate per-group emissions: ${streamedRows.length} rows")
    val batch = graft.operators.Sketch.hllDistinctBy(
      graft.core.Tables.load(spark, sf, "events"), "event_type", "user_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(streamed === batch) // bit-identical estimates, not approximately
  }

  test("streaming decontamination gate drains to exactly the batch twin; bench artifact freed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdc_spec")
    val out = s"$dir/out"
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val bench = docs.filter(pmod(graft.llmops.Hashing.md5Long(
      col("doc_id").cast("string")), lit(20)) === 0)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    graft.streaming.StreamingIncremental.runDecontaminateGate(
      spark, s"$sf/documents.parquet", bench, s"$dir/ckpt", Some(4)) { b =>
      b.write.mode("append").parquet(out)
    }
    // the once-checkpointed benchmark shingle set must not outlive the run
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
      "benchmark shingle checkpoint leaked past the stream's scope")
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_shingles", "n_overlap", "contamination", "contaminated")
      .collect().map(_.toSeq).toSet
    val batch = graft.llmops.Decontaminate.contaminationScores(docs, bench)
      .select("doc_id", "n_shingles", "n_overlap", "contamination", "contaminated")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming near-dup gate drains to exactly the batch twin; band index freed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snd_spec")
    val out = s"$dir/out"
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val standing = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    graft.streaming.StreamingIncremental.runNearDupGate(
      spark, s"$sf/documents.parquet", standing, s"$dir/ckpt", Some(4),
      incomingFilter = col("doc_id") % 5 === 0) { b =>
      b.write.mode("append").parquet(out)
    }
    // the stream-scoped corpus band persist must not outlive the run
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore,
      "corpus band index persist leaked past the stream's scope")
    val streamed = spark.read.parquet(out)
      .select("new_id", "old_id", "hamming")
      .collect().map(_.toSeq).toSet
    val batch = graft.llmops.Dedup.incrementalSimhashDedup(standing, incoming)
      .select("new_id", "old_id", "hamming")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join: matches batch join + watermark-gated null emission") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sslj_spec")
    val out = s"$dir/out"
    graft.streaming.StreamingIncremental.runClickViewJoin(
      spark, s"$sf/events.parquet", s"$dir/ckpt", "1 HOUR", Some(4),
      joinType = "leftOuter") { b =>
      b.write.mode("append").parquet(out)
    }
    val streamed = spark.read.parquet(out)
      .select("user_id", "click_id", "click_ts", "view_id", "view_ts")
      .collect().map(_.toSeq).toSet
    // batch twin of the continuous contract: LEFT interval join, null rows
    // only for clicks the final watermark (min of both streams' max-1h)
    // has already released from state
    val ev = graft.core.Tables.load(spark, sf, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val wm = math.min(
      v.agg(max(unix_micros(col("view_ts")))).head().getLong(0),
      c.agg(max(unix_micros(col("click_ts")))).head().getLong(0)) - 3600000000L
    val batch = c.join(v,
        expr("c_user = v_user AND view_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"),
        "leftOuter")
      .filter(col("view_id").isNotNull || unix_micros(col("click_ts")) < wm)
      .select(col("c_user").as("user_id"), col("click_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    // the null-emission path must actually be exercised by the fixture
    assert(streamed.exists(_(3) == null), "no watermark-expired null rows")
  }

  test("globalRowNumber: contiguous 1..n ids equal the window row_number, no single-partition funnel") {
    import spark.implicits._
    // shuffled unique keys across several partitions
    val keys = scala.util.Random.shuffle((1L to 5000L).toList)
    val df = spark.sparkContext.parallelize(keys, 8).toDF("k")
    val got = graft.operators.GlobalRank
      .globalRowNumber(df, Seq("k"), numPartitions = 7)
    val rows = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total order on unique keys: id IS the rank, whatever the range
    // sampler picked as boundaries
    assert(rows.size === 5000)
    (1L to 5000L).foreach(k => assert(rows(k) === k, s"key $k"))
    // the plan must not collapse to a single partition: every Exchange is
    // range/hash, never SinglePartition (the thing this operator exists
    // to avoid)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition funnel:\n$plan")
  }

  test("stream-stream FULL OUTER interval join: both null-emission sides match the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssfj_spec")
    val out = s"$dir/out"
    graft.streaming.StreamingIncremental.runClickViewJoin(
      spark, s"$sf/events.parquet", s"$dir/ckpt", "1 HOUR", Some(4),
      joinType = "fullOuter") { b =>
      b.write.mode("append").parquet(out)
    }
    val streamed = spark.read.parquet(out)
      .select("user_id", "click_id", "click_ts", "view_id", "view_ts")
      .collect().map(_.toSeq).toSet
    val ev = graft.core.Tables.load(spark, sf, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val wm = math.min(
      v.agg(max(unix_micros(col("view_ts")))).head().getLong(0),
      c.agg(max(unix_micros(col("click_ts")))).head().getLong(0)) - 3600000000L
    val batch = c.join(v,
        expr("c_user = v_user AND view_ts BETWEEN click_ts - INTERVAL 1 HOUR AND click_ts"),
        "fullOuter")
      // matched pairs always emit; unmatched sides only once the global
      // watermark releases them (clicks: click_ts; views: view_ts + 1h)
      .filter((col("click_id").isNotNull && col("view_id").isNotNull) ||
        (col("view_id").isNull && unix_micros(col("click_ts")) < wm) ||
        (col("click_id").isNull && unix_micros(col("view_ts")) + 3600000000L < wm))
      .select(coalesce(col("c_user"), col("v_user")).as("user_id"),
        col("click_id"), col("click_ts"), col("view_id"), col("view_ts"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.exists(_(3) == null), "no watermark-expired null-view rows")
    assert(streamed.exists(_(1) == null), "no watermark-expired null-click rows")
  }

  test("maxConcurrency: closed intervals, bucket stitching, earliest peak wins") {
    import spark.implicits._
    // peak of 3 first reached at t=10 ([0,10] still open, [10,20] opens);
    // a second peak of 3 at t=55 must NOT displace the earlier instant
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L), (30L, 40L),
      (50L, 60L), (50L, 60L), (55L, 65L)).toDF("lo", "hi")
    // bucketMicros = 7 forces endpoints across many buckets → the
    // two-phase offsets must stitch exactly
    val r = graft.operators.Concurrency
      .maxConcurrency(iv, "lo", "hi", bucketMicros = 7L).head()
    assert((r.getLong(0), r.getLong(1)) === ((3L, 10L)))
    // single-bucket degenerate case agrees
    val r1 = graft.operators.Concurrency
      .maxConcurrency(iv, "lo", "hi", bucketMicros = 1000000L).head()
    assert((r1.getLong(0), r1.getLong(1)) === ((3L, 10L)))
  }

  test("equiDepthBins: exact boundaries at mod=1, lower-bin ties, NULL passthrough") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, Option(i.toDouble))) :+
      (101L, None: Option[Double])).toDF("id", "v")
    val got = graft.operators.Quantiles
      .equiDepthBins(df, "v", nBins = 4, idCols = Seq("id"), sampleMod = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    // percentile_disc boundaries: 25, 50, 75; ties bin LOW
    assert(got(25L) === Some(0) && got(26L) === Some(1))
    assert(got(50L) === Some(1) && got(51L) === Some(2))
    assert(got(75L) === Some(2) && got(76L) === Some(3))
    assert(got(1L) === Some(0) && got(100L) === Some(3))
    assert(got(101L) === None)
  }

  test("melt fans each row to one (measure, value) row per measure, nulls kept") {
    import spark.implicits._
    val df = Seq((1L, 2.0, Option(3.0)), (2L, 4.0, None: Option[Double]))
      .toDF("id", "a", "b")
    val got = graft.operators.Unpivot.melt(df, Seq("id"), Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      (1L, "a", Some(2.0)), (1L, "b", Some(3.0)),
      (2L, "a", Some(4.0)), (2L, "b", None)))
  }

  test("hash-sampled quantiles land near the exact ones on a uniform domain") {
    import spark.implicits._
    val df = (0 until 10000).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "v")
    val s = graft.operators.Quantiles
      .sampledGroupQuantiles(df, "g", "v", idCols = Seq("id"), mod = 8)
      .head()
    // ~1250 samples: rank se ≈ 1.4%, so 10% of the value range is >5σ
    assert(math.abs(s.getDouble(1) - 5000.0) < 1000.0, s)  // p50
    assert(math.abs(s.getDouble(2) - 9000.0) < 1000.0, s)  // p90
    assert(math.abs(s.getDouble(3) - 9900.0) < 500.0, s)   // p99
    // determinism: the sample is the hash gate, not an RNG draw
    val again = graft.operators.Quantiles
      .sampledGroupQuantiles(df, "g", "v", Seq("id"), 8).head()
    assert(again.getDouble(1) === s.getDouble(1))
  }

  test("kmvIntersect: exact under k, estimate near truth over k") {
    import spark.implicits._
    // |A| = 30, |B| = 25, |A ∩ B| = 15: well under k -> every output exact
    val a = (0 until 30).map(i => Tuple1(s"v$i")).toDF("x")
    val b = (15 until 40).map(i => Tuple1(s"v$i")).toDF("x")
    val ex = Sketch.kmvIntersect(a, col("x"), b, col("x"), k = 256).head()
    assert(ex.getLong(0) === 40L)       // union hashes seen
    assert(ex.getLong(1) === 15L)       // intersection members
    assert(ex.getDouble(2) === 40.0)    // est_union exact
    assert(ex.getDouble(3) === 15.0)    // est_intersect exact
    // sketch path: 2000 ∪ 2000 with 1000 shared, k = 256
    val bigA = (0 until 2000).map(i => Tuple1(s"a$i")).toDF("x")
    val bigB = (1000 until 3000).map(i => Tuple1(s"a$i")).toDF("x")
    val s2 = Sketch.kmvIntersect(bigA, col("x"), bigB, col("x"), k = 256).head()
    assert(s2.getLong(0) === 256L)
    // true union 3000, true intersection 1000; k=256 gives ~6% rank se
    assert(math.abs(s2.getDouble(2) - 3000.0) < 600.0, s2)
    assert(math.abs(s2.getDouble(3) - 1000.0) < 400.0, s2)
    // NULLs don't participate on either side
    val withNull = a.union(Seq(Tuple1(null.asInstanceOf[String])).toDF("x"))
    val n = Sketch.kmvIntersect(withNull, col("x"), b, col("x"), k = 256).head()
    assert(n.getLong(0) === 40L && n.getLong(1) === 15L)
  }

  test("linearCredit conserves exactly 10000 bp per conversion, remainder to newest") {
    import spark.implicits._
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-05-01 $h%02d:$m%02d:00")
    val touches = Seq(
      (1L, 10L, ts(10, 0)), (1L, 11L, ts(10, 5)), (1L, 12L, ts(10, 9)),
      (2L, 20L, ts(10, 1)),   // 1 touch
      (3L, 30L, ts(10, 50)),  // AFTER the conversion -> excluded
      (3L, 31L, ts(9, 55)))   // exactly hi - window: inclusive boundary
      .toDF("user_id", "event_id", "ts")
    val convs = Seq((1L, 100L, ts(10, 10)), (2L, 200L, ts(10, 10)),
      (3L, 300L, ts(10, 10)),
      (4L, 400L, ts(10, 10))) // user 4: zero touches -> absent
      .toDF("user_id", "event_id", "ts")
    val got = graft.operators.Attribution.linearCredit(
      touches, convs, "user_id", "ts", "event_id",
      windowMicros = 15L * 60 * 1000000, binWidthMicros = 5L * 60 * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byConv = got.groupBy(_._1)
    // 400 absent (zero touches emit nothing); 300 present only via the
    // boundary touch 31 — touch 30 postdates the conversion.
    assert(byConv.keySet === Set(100L, 200L, 300L))
    // every conversion's credit sums to exactly 10000
    byConv.foreach { case (c, rows) =>
      assert(rows.map(_._3).sum === 10000L, s"conversion $c") }
    // 3-way split: newest touch (id 12) takes 3334
    val three = got.filter(_._1 == 100L).map(t => t._2 -> t._3).toMap
    assert(three === Map(10L -> 3333L, 11L -> 3333L, 12L -> 3334L))
    assert(got.filter(_._1 == 200L).map(_._3).toSeq === Seq(10000L))
    // boundary touch (pt == hi - window) is in-window and takes all credit
    assert(got.filter(_._1 == 300L).map(t => t._2 -> t._3).toSeq ===
      Seq(31L -> 10000L))
  }

  test("creditModels: every model conserves 10000 bp; decay weights quantize") {
    import spark.implicits._
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-05-01 $h%02d:$m%02d:00")
    val touches = Seq(
      (1L, 10L, ts(10, 0)), (1L, 11L, ts(10, 5)), (1L, 12L, ts(10, 9)),
      (2L, 20L, ts(10, 1)),
      (3L, 31L, ts(9, 55)))
      .toDF("user_id", "event_id", "ts")
    val convs = Seq((1L, 100L, ts(10, 10)), (2L, 200L, ts(10, 10)),
      (3L, 300L, ts(10, 10))).toDF("user_id", "event_id", "ts")
    val got = graft.operators.Attribution.creditModels(
      touches, convs, "user_id", "ts", "event_id",
      windowMicros = 15L * 60 * 1000000, binWidthMicros = 5L * 60 * 1000000,
      halfLifeMicros = 5L * 60 * 1000000) // maxSteps = 3
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val byConv = got.groupBy(_._1)
    assert(byConv.keySet === Set(100L, 200L, 300L))
    // conservation, per model, per conversion
    byConv.foreach { case (c, rows) =>
      assert(rows.map(_._3).sum === 10000L, s"linear $c")
      assert(rows.map(_._4).sum === 10000L, s"first $c")
      assert(rows.map(_._5).sum === 10000L, s"last $c")
      assert(rows.map(_._6).sum === 10000L, s"ushape $c")
      assert(rows.map(_._7).sum === 10000L, s"decay $c")
    }
    val three = got.filter(_._1 == 100L)
      .map(t => t._2 -> (t._3, t._4, t._5, t._6, t._7)).toMap
    // (linear, first, last, ushape, decay); touch 10 oldest, 12 newest
    assert(three(10L) === ((3333L, 10000L, 0L, 4000L, 1428L)))  // w=2, 10000*2 div 14
    assert(three(11L) === ((3333L, 0L, 0L, 2000L, 2857L)))      // w=4, middle
    assert(three(12L) === ((3334L, 0L, 10000L, 4000L, 5715L)))  // w=8 + remainder 1
    // single-touch conversions: every model gives the lone touch 10000
    Seq(200L, 300L).foreach { c =>
      val r = got.filter(_._1 == c)
      assert(r.length === 1 && r.head.productIterator.drop(2).forall(_ == 10000L), s"conv $c")
    }
  }

  test("creditModels rejects maxSteps > 45 (10000*2^steps would overflow a long)") {
    import spark.implicits._
    val t = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    val day = 86400L * 1000000L
    // 46 half-lives in the window: guarded, even though this 1-row frame
    // would not overflow — the bound is on the API contract, not the data
    val e = intercept[IllegalArgumentException] {
      graft.operators.Attribution.creditModels(t, t, "user_id", "ts",
        "event_id", windowMicros = 46 * day, binWidthMicros = day,
        halfLifeMicros = day)
    }
    assert(e.getMessage.contains("[1, 45]"))
    // 45 is accepted (plan construction succeeds)
    graft.operators.Attribution.creditModels(t, t, "user_id", "ts",
      "event_id", windowMicros = 45 * day, binWidthMicros = day,
      halfLifeMicros = day)
  }

  test("native Md5Long60 equals the composed conv(substr(md5)) bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val strs = Seq("", " ", "a", "Ω≈ç√∫", "0" * 1000) ++
      (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = strs.toDF("s")
    val got = df.select(
      graft.llmops.Hashing.md5Long(col("s")).as("lo"),
      graft.llmops.Hashing.md5LongHi(col("s")).as("hi"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("lo_ref"),
      conv(substring(md5(col("s")), 16, 15), 16, 10).cast("long").as("hi_ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(2))
      assert(r.getLong(1) === r.getLong(3))
    }
    // NULL propagates
    val n = Seq(null.asInstanceOf[String]).toDF("s")
      .select(graft.llmops.Hashing.md5Long(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("hllSlidingDistinct equals the direct sketch of each window's rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // 20 days of activity, user ids drawn so windows genuinely differ
    val rows = (0 until 2000).map { _ =>
      val day = rnd.nextInt(20)
      (java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"),
        (rnd.nextInt(300) + day * 37).toLong)
    }
    val df = rows.toDF("ts", "user_id")
    val got = Sketch.hllSlidingDistinct(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference: run the plain (non-sliding) estimator on each window's rows
    val epoch = java.time.LocalDate.of(1970, 1, 1)
    rows.map(_._1).distinct.foreach { ts =>
      val d = java.time.LocalDateTime.ofInstant(
        ts.toInstant, java.time.ZoneOffset.UTC).toLocalDate
      val dayNum = java.time.temporal.ChronoUnit.DAYS.between(epoch, d)
      val windowRows = rows.filter { case (t, _) =>
        val td = java.time.temporal.ChronoUnit.DAYS.between(epoch,
          java.time.LocalDateTime.ofInstant(t.toInstant,
            java.time.ZoneOffset.UTC).toLocalDate)
        td >= dayNum - 6 && td <= dayNum
      }
      val direct = Sketch.hllDistinct(windowRows.toDF("ts", "user_id"), "user_id")
        .head()
      assert(got(dayNum) === ((direct.getLong(0), direct.getDouble(1))),
        s"day $dayNum")
    }
  }

  test("cdcApply: latest version wins, delete tombstones drop the key") {
    import spark.implicits._
    val log = Seq(
      // key 1: I then U -> survives with v2 payload
      (1L, 10L, "I", "a"), (1L, 20L, "U", "b"),
      // key 2: latest is D -> gone
      (2L, 10L, "I", "x"), (2L, 30L, "D", "y"),
      // key 3: D then a LATER re-insert -> back alive
      (3L, 10L, "D", "p"), (3L, 40L, "I", "q"),
      // key 4: NULL version row ignored; survivor from the valid row
      (4L, 5L, "I", "ok"))
      .toDF("k", "v", "op", "payload")
      .union(Seq((4L, null.asInstanceOf[java.lang.Long], "U", "bad"))
        .toDF("k", "v", "op", "payload"))
    val got = graft.operators.Cdc
      .cdcApply(log, Seq("k"), Seq("v"), "op", Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 20L, "b"), (3L, 40L, "q"), (4L, 5L, "ok")))
  }

  test("cdcApply: rejects version/payload name overlap; versionViolations finds ties") {
    import spark.implicits._
    val log = Seq((1L, 10L, "I", "a")).toDF("k", "v", "op", "payload")
    // a column in BOTH versionCols and payloadCols would emit duplicate
    // last_v output columns — rejected eagerly, not silently
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Cdc.cdcApply(log, Seq("k"), Seq("v"), "op", Seq("v"))
    }
    assert(ex.getMessage.contains("distinct names"))
    // total-order checker: duplicate (key, version) flagged, unique not
    val dup = Seq((1L, 10L, "I", "a"), (1L, 10L, "U", "b"), (1L, 20L, "U", "c"),
      (2L, 10L, "I", "x"))
      .toDF("k", "v", "op", "payload")
    val bad = graft.operators.Cdc.versionViolations(dup, Seq("k"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bad.toSeq === Seq((1L, 10L, 2L)))
  }

  test("intervalOverlap: touching endpoints match, disjoint don't, pairs unique") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L, "a1"), (1L, 200L, 300L, "a2"),
      (2L, 0L, 100L, "other_key"))
      .toDF("k", "a_lo", "a_hi", "a_tag")
    val b = Seq(
      (1L, 100L, 150L, "touches_a1"),   // shares exactly t=100 with a1
      (1L, 301L, 400L, "past_a2"),      // disjoint
      (1L, 50L, 250L, "spans_both"),    // overlaps a1 AND a2, many bins
      (2L, 90L, 95L, "k2_inside"))
      .toDF("k", "b_lo", "b_hi", "b_tag")
    val got = graft.operators.RangeJoin.intervalOverlap(
      a, b, keys = Seq("k"), aLo = "a_lo", aHi = "a_hi",
      bLo = "b_lo", bHi = "b_hi", binWidth = 30L)
      .select("a_tag", "b_tag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sorted === Seq(("a1", "spans_both"), ("a1", "touches_a1"),
      ("a2", "spans_both"), ("other_key", "k2_inside")))
    // the first-overlap-bin rule yields each pair exactly once
    assert(got.length === got.distinct.length)
  }

  test("ewmaByKey: exact power-of-two weighting, heads normalize over present lags") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, 1.0),
      (1L, "2024-01-01 00:00:02", 2L, 2.0),
      (1L, "2024-01-01 00:00:03", 3L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = graft.operators.RollingWindow
      .ewmaByKey(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    // cents 100/200/400; weights 128,64,32,... over PRESENT lags only:
    // t1: 100·128/128 = 100
    // t2: (200·128 + 100·64) / (128+64) = 32000/192 = 166
    // t3: (400·128 + 200·64 + 100·32) / (128+64+32) = 67200/224 = 300
    assert(got === Map(1L -> 100L, 2L -> 166L, 3L -> 300L))
  }

  test("ewmaByKey: negative values floor-divide (engine-pinned semantics)") {
    import spark.implicits._
    // A lone observation of -1.115: cents = round(-111.5) = -111 (Spark
    // HALF_UP on negative rounds away from zero → -112? No: round(-111.5)
    // is HALF_UP = -112 in Spark and banker's in DuckDB; avoid the .5
    // boundary entirely) — use -1.11 → -111 cents. Head row: num = -111·128,
    // den = 128 → exactly -111. Second row mixes signs so the division
    // truncation-vs-floor difference is observable:
    // t2: num = 50·128 + (-111)·64 = 6400 - 7104 = -704; den = 192;
    // floor(-704/192) = floor(-3.666) = -4 (truncation would give -3).
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, -1.11),
      (1L, "2024-01-01 00:00:02", 2L, 0.50))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = graft.operators.RollingWindow
      .ewmaByKey(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(got === Map(1L -> -111L, 2L -> -4L))
  }

  test("twapByKey: negative cents floor-divide") {
    import spark.implicits._
    // -1.11 held 3s then 0.50 (terminal, dropped): vxd = -111·3e6,
    // dur = 3e6 → exactly -111. Mixed: -1.11 for 1s, 0.50 for 2s, end:
    // vxd = -111e6 + 100e6·... use values where floor ≠ trunc:
    // k2: c=-1 cent (value -0.01) 2s then c=1 (0.01) 1s then end:
    // vxd = -2e6·1 + 1e6·1 → per-us: (-0.01·2s + 0.01·1s)… compute below.
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, -0.01),
      (1L, "2024-01-01 00:00:02", 2L, 0.01),
      (1L, "2024-01-01 00:00:03", 3L, 9.99))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = graft.operators.RollingWindow
      .twapByKey(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    // vxd = (-1)·2e6 + 1·1e6 = -1e6; dur_us = 3e6;
    // floor(-1e6/3e6) = -1 (truncation would give 0)
    assert(got === ((3000000L, -1L)))
  }

  test("transitionMatrix: hand-computed chain, per-key isolation, deterministic tie-break") {
    import spark.implicits._
    // user 1: A A B; user 2: B A — transitions: A→A, A→B (user 1), B→A
    // (user 2); no cross-user pair. Equal timestamps order by event_id.
    val t0 = "2024-01-01 00:00:0"
    val df = Seq(
      (1L, s"${t0}1", 1L, "A"), (1L, s"${t0}1", 2L, "A"), (1L, s"${t0}3", 3L, "B"),
      (2L, s"${t0}4", 4L, "B"), (2L, s"${t0}5", 5L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = graft.operators.Transitions
      .transitionMatrix(df, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("A", "A") -> ((1L, 2L, 5000L)),
      ("A", "B") -> ((1L, 2L, 5000L)),
      ("B", "A") -> ((1L, 1L, 10000L))))
  }

  test("associationRules: hand-computed support/confidence/lift; asymmetric confidence; threshold filters") {
    import spark.implicits._
    // 4 baskets: {1,2} {1,2} {1,3} {4}. Pair (1,2) in 2 baskets;
    // (1,3) only once -> filtered at minPairCount=2.
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 4L), (10L, 1L) /* dup row: must distinct */)
      .toDF("basket", "item")
    val got = graft.operators.AssocRules.associationRules(b, minPairCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 1L)))
    // n=4 baskets, c_1=3, c_2=2, c_12=2:
    // support = 2*1e4/4 = 5000 both ways;
    // conf(1->2) = 2e4/3 = 6666 (trunc); conf(2->1) = 2e4/2 = 10000;
    // lift = 2*4*1e4/(3*2) = 13333 both ways (> 1e4: associated)
    assert(got((1L, 2L)) === ((2L, 3L, 2L, 5000L, 6666L, 13333L)))
    assert(got((2L, 1L)) === ((2L, 2L, 3L, 5000L, 10000L, 13333L)))
  }

  test("profile: exact per-column stats, native min/max ordering, all-null column honest") {
    import spark.implicits._
    val df = Seq(
      (9, Some("b"), Option.empty[String]),
      (10, Some("a"), Option.empty[String]),
      (10, Option.empty[String], Option.empty[String]))
      .toDF("n", "s", "dead")
    val got = graft.operators.Profile.profile(df, Seq("n", "s", "dead"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    // native ordering: min(n)=9 even though "10" < "9" as strings
    assert(got("n") === ((3L, 0L, 2L, Some("9"), Some("10"))))
    // nulls excluded from distinct and bounds
    assert(got("s") === ((3L, 1L, 2L, Some("a"), Some("b"))))
    // all-null column: zero distinct, NULL bounds — never a crash or ""
    assert(got("dead") === ((3L, 3L, 0L, None, None)))
  }

  test("personalizedPageRank: mass concentrates near the seed; disconnected components score zero") {
    import spark.implicits._
    // two components: seed-side path 1-2-3, far side 10-11 (undirected)
    def und(pairs: (Long, Long)*): Seq[(Long, Long)] =
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = und((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = graft.operators.PageRank
      .personalizedPageRank(edges, col("node") === 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L))
    // the whole seed component carries mass (the seed's degree-1
    // neighbor legitimately out-ranks the seed — 85% of the seed's mass
    // pushes to it every round while it splits both ways); the one-hop
    // neighbor dominates the two-hop node; the other component gets
    // NOTHING — the property uniform PageRank cannot express
    assert(got(1L) > 0L && got(2L) > got(3L) && got(3L) > 0L,
      s"mass must reach the seed component and decay with distance: $got")
    assert(got(10L) === 0L && got(11L) === 0L,
      s"disconnected component must carry zero mass: $got")
  }

  test("triangleCounts: K4 plus a pendant — exact counts, coefficients, one-orientation-per-triangle") {
    import spark.implicits._
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in 3 of them,
    // degree 3 → coefficient 2·3/(3·2) = 1.0 = 10000 bp. Pendant node 5
    // (edge 4-5) joins no triangle and must be ABSENT, but it raises
    // node 4's degree to 4 → 4's coefficient = 2·3/(4·3) = 5000 bp.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 1L) /* reverse duplicate: must canonicalize */)
      .toDF("src", "dst")
    val got = graft.operators.Triangles.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> ((3L, 3L, 10000L)),
      2L -> ((3L, 3L, 10000L)),
      3L -> ((3L, 3L, 10000L)),
      4L -> ((4L, 3L, 5000L))))
    // total incidences / 3 = triangle count: 4 triangles in K4
    assert(got.values.map(_._2).sum === 12L)
  }

  test("modularity: hand-computed two-clique graph; bad partitions go NEGATIVE with exact floor division") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4, w=1
    // everywhere, mirrored. t = 2W = 14 (7 undirected edges).
    def undirected(pairs: (Long, Long)*): Seq[(Long, Long, Long)] =
      pairs.flatMap { case (a, b) => Seq((a, b, 1L), (b, a, 1L)) }
    val edges = undirected((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst", "w")
    // natural communities: {1,2,3} and {4,5,6}
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val gm = graft.operators.Modularity.modularity(edges, good)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // per community: in_w2 = 6 (3 intra edges, both directions),
    // deg_w = 7 (two degree-2 nodes + one degree-3 node); Q·t² =
    // 2·(6·14 − 49) = 70; q_bp = 70·10⁴ div 196 = 3571
    assert(gm === Map(
      1L -> ((3L, 6L, 7L, 3571L)),
      4L -> ((3L, 6L, 7L, 3571L))))
    // adversarial split {1,4},{2,5},{3,6}: zero intra weight,
    // Q·t² = −(4²+4²+6²)·... deg: {1,4}: 2+3? no — deg(1)=2,deg(4)=3 →
    // 5; {2,5}: 2+2=4; {3,6}: 3+2=5. Σ −(25+16+25) = −66;
    // q_bp = floor(−660000/196) = −3368 (truncation would give −3367)
    val bad = Seq((1L, 1L), (4L, 1L), (2L, 2L), (5L, 2L),
      (3L, 3L), (6L, 3L)).toDF("node", "label")
    val qb = graft.operators.Modularity.modularity(edges, bad)
      .select("q_bp").distinct().collect().map(_.getLong(0)).toSeq
    assert(qb === Seq(-3368L),
      s"negative modularity must FLOOR, not truncate: $qb")
  }

  test("cusumChangePoint: a step shift is located at the step; ties break to the earliest day") {
    import spark.implicits._
    // series a: 10,10,10,30,30 (n=5, S=90): dev = 5c−90 =
    // −40,−40,−40,60,60; cusum = −40,−80,−120,−60,0 → max |·| at day 3
    val daily = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 10L),
      ("a", "2024-01-03", 10L), ("a", "2024-01-04", 30L),
      ("a", "2024-01-05", 30L),
      // series b: flat 7,7 → cusum 0,0 → tie at |0|, earliest day wins
      ("b", "2024-01-01", 7L), ("b", "2024-01-02", 7L))
      .toDF("k", "day", "c").withColumn("day", col("day").cast("date"))
    val got = graft.operators.ChangePoint.cusumChangePoint(daily, "k")
      .collect().map(r => r.getString(0) ->
        ((r.getDate(1).toString, r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "a" -> (("2024-01-03", 120L, 5L)),
      "b" -> (("2024-01-01", 0L, 2L))))
  }

  test("triangleCounts: node ids beyond the 2^32 pack domain rank correctly (dense-rank fallback)") {
    import spark.implicits._
    // the r12 VERDICT hole: with 64-bit hashed ids the packed rank
    // degree·2³² + node collides across (degree, node) pairs and the
    // total order silently breaks. Build a random graph, count with
    // small ids, then remap every id into the >= 2^32 domain (order- and
    // degree-preserving injection, including a NEGATIVE id — both out of
    // pack domain) and require IDENTICAL triangles per node.
    val rnd = new scala.util.Random(41)
    val base = (for (a <- 1L to 24L; b <- (a + 1) to 24L
                     if rnd.nextInt(100) < 30) yield (a, b)).toSeq
    val small = graft.operators.Triangles.triangleCounts(base.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def up(x: Long): Long = if (x == 1L) -3L else (1L << 33) + x * 7L
    val big = graft.operators.Triangles.triangleCounts(
        base.map { case (a, b) => (up(a), up(b)) }.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(small.nonEmpty, "fixture must actually contain triangles")
    assert(big === small.map { case (k, v) => up(k) -> v },
      "large-domain ids must produce identical triangles via the dense-rank fallback")
  }

  test("triangleCounts: hub-and-spoke star has NO triangles; a single chord makes exactly one") {
    import spark.implicits._
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    assert(graft.operators.Triangles.triangleCounts(star).count() === 0)
    val chord = star.unionByName(Seq((1L, 2L)).toDF("src", "dst"))
    val got = graft.operators.Triangles.triangleCounts(chord).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("labelPropagation: two cliques joined by one weak edge settle into two communities") {
    import spark.implicits._
    // cliques {1,2,3} and {10,11,12} (internal weight 2), one weight-1
    // bridge 3-10: LPA must keep the communities separate, labels = the
    // min node of each clique (tie-break label ASC everywhere)
    def undirected(pairs: (Long, Long, Long)*): Seq[(Long, Long, Long)] =
      pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val edges = undirected(
      (1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L),
      (10L, 11L, 2L), (10L, 12L, 2L), (11L, 12L, 2L),
      (3L, 10L, 1L)).toDF("src", "dst", "w")
    val got = graft.operators.LabelProp.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(10L, 11L, 12L).map(got)
    assert(left.size === 1 && right.size === 1, s"one label per clique: $got")
    assert(left.head !== right.head, "the weak bridge must not merge communities")
  }

  test("labelPropagation round 1: each node adopts its weight-argmax neighbor label") {
    import spark.implicits._
    // star: center 5 sees labels {1(w=3), 2(w=1)} → adopts 1; leaves see
    // only {5} → adopt 5. One synchronous round, exact.
    val edges = Seq((5L, 1L, 3L), (1L, 5L, 3L), (5L, 2L, 1L), (2L, 5L, 1L))
      .toDF("src", "dst", "w")
    val got = graft.operators.LabelProp.labelPropagation(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(5L -> 1L, 1L -> 5L, 2L -> 5L))
  }

  test("pageRank: exact integer ranks on a path graph, symmetry, mass bound") {
    import spark.implicits._
    val S = graft.operators.PageRank.Scale
    // undirected path a-b-c as node ids 1-2-3, both directions fed
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r1 = graft.operators.PageRank.pageRank(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-computed: r0 = S/3; base = (15*r0) div 100
    val r0 = S / 3
    val base = 15 * r0 / 100
    val leaf = base + 85 * (r0 / 2) / 100      // one contribution from b
    val hub = base + 85 * (r0 + r0) / 100      // both endpoints send r0/1
    assert(r1 === Map(1L -> leaf, 2L -> hub, 3L -> leaf))
    // three rounds: symmetric leaves stay identical, hub stays on top,
    // truncation only ever LOSES mass (sum <= S)
    val r3 = graft.operators.PageRank.pageRank(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(1L) === r3(3L))
    assert(r3(2L) > r3(1L))
    assert(r3.values.sum <= S)
    // star: the hub out-ranks every leaf
    val star = (2L to 6L).flatMap(l => Seq((1L, l), (l, 1L))).toDF("src", "dst")
    val sr = graft.operators.PageRank.pageRank(star, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((2L to 6L).forall(l => sr(1L) > sr(l)))
  }

  test("pageRank: directed source (zero in-degree) keeps base rank and feeds successors") {
    import spark.implicits._
    val S = graft.operators.PageRank.Scale
    // directed chain 1 -> 2 -> 3 -> 1 plus a pure source 4 -> 2: node 4
    // has out-edges but NO in-edges, the case the r7 inner join dropped
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L)).toDF("src", "dst")
    val r2 = graft.operators.PageRank.pageRank(edges, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the source survives every round at the damped base rank
    val r0 = S / 4
    val base = 15 * r0 / 100
    assert(r2.keySet === Set(1L, 2L, 3L, 4L))
    assert(r2(4L) === base)
    // and its round-2 contribution reached node 2: rank(2) reflects both
    // node 1's rank AND the source's base rank from round 1
    val round1n1 = base + 85 * r0 / 100          // from 3 -> 1
    val round1n4 = base                          // no in-edges
    val expect2 = base + 85 * (round1n1 + round1n4) / 100
    assert(r2(2L) === expect2)
  }

  test("saltedJoin equals the plain join on random data, dim dup keys included") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // skewed fact: key 0 holds half the rows
    val fact = (1 to 400).map(i =>
      (i.toLong, if (rnd.nextBoolean()) 0L else rnd.nextInt(20).toLong,
        rnd.nextInt(100)))
      .toDF("row_id", "k", "payload")
    // dim with DUPLICATE keys: multiplicity must be preserved
    val dim = ((0 to 14).map(k => (k.toLong, s"attr$k")) ++
      Seq((0L, "attr0_dup"), (7L, "attr7_dup")))
      .toDF("k", "attr")
    val got = graft.operators.SaltedJoin
      .saltedJoin(fact, dim, keys = Seq("k"), idCols = Seq("row_id"), nSalts = 8)
      .select("row_id", "k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .sorted.toSeq
    val want = fact.join(dim, Seq("k"))
      .select("row_id", "k", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // the reserved salt column is rejected, not silently overwritten
    val clash = fact.withColumnRenamed("payload", "_salt")
    assertThrows[IllegalArgumentException] {
      graft.operators.SaltedJoin.saltedJoin(clash, dim, Seq("k"), Seq("row_id"))
    }
    // non-key name collisions are rejected with the columns named
    val dupCol = dim.withColumnRenamed("attr", "payload")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.SaltedJoin.saltedJoin(fact, dupCol, Seq("k"), Seq("row_id"))
    }
    assert(ex.getMessage.contains("payload"))
  }

  test("linkPrediction: square diagonals score, adjacent pairs never surface") {
    import spark.implicits._
    // square 1-2-3-4-1: the two diagonals are the only non-adjacent
    // pairs; each shares BOTH its endpoints' neighborhoods exactly
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = graft.operators.LinkPred.linkPrediction(square, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    // cn=2, degrees 2/2 => jaccard = 2*1e4 / (2+2-2) = 10000 (identical nbhds)
    assert(got === Seq((1L, 3L, 2L, 10000L), (2L, 4L, 2L, 10000L)))
    // add the 1-3 chord: the pair is now an EDGE and must vanish even
    // though its wedge support only grew
    val chorded = square.unionAll(Seq((1L, 3L)).toDF("src", "dst"))
    val after = graft.operators.LinkPred.linkPrediction(chorded, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.contains((1L, 3L)))
    assert(after.contains((2L, 4L))) // the other diagonal still predicts
  }

  test("linkPrediction: minCommon floors support; the center cap silences hub wedges") {
    import spark.implicits._
    // path a-b-c: one shared neighbor only
    val path = Seq((10L, 11L), (11L, 12L)).toDF("src", "dst")
    assert(graft.operators.LinkPred.linkPrediction(path, minCommon = 2).count() === 0)
    val one = graft.operators.LinkPred.linkPrediction(path, minCommon = 1).collect()
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((10L, 12L, 1L)))
    // star center degree 5: capped at 4 the hub generates NO wedges;
    // at 5 every leaf pair predicts with cn=1
    val star = (1L to 5L).map(i => (100L, 100L + i)).toDF("src", "dst")
    assert(graft.operators.LinkPred.linkPrediction(star,
      minCommon = 1, maxCenterDegree = 4).count() === 0)
    assert(graft.operators.LinkPred.linkPrediction(star,
      minCommon = 1, maxCenterDegree = 5).count() === 10) // C(5,2)
  }
}
