package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{TableMeta, Warehouse}

/** Structured-Streaming expression of the reference's scheduled
  * incremental refresh (SURVEY §2.8): the reference has no true streaming
  * operators — its `hourly`/`daily` tags (core/project.py:308-317) and
  * `insert_overwrite` incremental strategy (model/create.py:456-465) are
  * batch refreshes on a schedule. `Trigger.AvailableNow` is the faithful
  * Spark-native mapping: each invocation processes exactly the data that
  * has arrived, with watermarked event-time windows, then stops — a
  * micro-batch "catch-up" run that scales to a continuous stream by
  * changing only the trigger.
  */
object StreamingIncremental {

  /** Watermarked tumbling-window hourly aggregate over an event stream
    * read from parquet, upserted into warehouse table `dataset.table`
    * (partitioned by day) via update-mode foreachBatch. Returns after the
    * stream drains (AvailableNow).
    *
    * Update mode + keyed upsert is the at-scale shape: state holds only
    * windows inside the watermark (complete mode would retain every
    * window ever seen, growing without bound on a continuous stream), and
    * each micro-batch rewrites only the day partitions it touches. The
    * same pipeline with a kafka source and `Trigger.ProcessingTime` is
    * the continuous form; nothing else changes.
    */
  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set.
    * A stateful streaming plan pins its state-store partition count to
    * this value at the first checkpoint, and AQE never coalesces it
    * (disabled for stateful workloads) — so a run sized for a cluster
    * pays that many state commits per store per micro-batch forever,
    * even when the state fits in a handful of partitions. Size it to
    * expected KEY cardinality, not executor count: the four fixture
    * queries pass [[FixtureStatePartitions]]; a 100 TB continuous
    * pipeline picks hundreds and keeps them for the query's lifetime
    * (the checkpoint pins the choice either way). */
  private def withShufflePartitions[T](spark: SparkSession,
                                       n: Option[Int])(body: => T): T =
    n match {
      case None => body
      case Some(p) =>
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.get(key)
        spark.conf.set(key, p.toString)
        try body finally spark.conf.set(key, prev)
    }

  /** State partitions for the drain-and-stop fixture runs. */
  val FixtureStatePartitions = 8

  /** Stage a fixture into a scratch landing DIRECTORY (the file-stream
    * source monitors directories — exactly how arriving micro-batch
    * files would land in practice) and open a stream on it. A
    * single-file fixture stages as one arrival; a directory-shaped
    * dataset (a Spark-written table) stages its data files — a plain
    * Files.copy of a directory would copy only the EMPTY directory
    * entry and the stream would drain zero rows with no diagnostic. */
  private def stageAndStream(spark: SparkSession, eventsDir: String,
                             prefix: String): org.apache.spark.sql.DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val src = new java.io.File(eventsDir)
    val landing = java.nio.file.Files.createTempDirectory(prefix)
    if (src.isFile)
      java.nio.file.Files.copy(src.toPath, landing.resolve(src.getName))
    else {
      val files = Option(src.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
      require(files.nonEmpty,
        s"$eventsDir holds no data files to stage for the stream")
      files.foreach(f => java.nio.file.Files.copy(
        f.toPath, landing.resolve(f.getName)))
    }
    spark.readStream.schema(schema).parquet(landing.toString)
  }

  /** The fixture's `ts` normalized to a TIMESTAMP column (events.parquet
    * carries TIMESTAMP(NANOS), loaded as Long nanos) — one definition
    * for all pipelines, so the nanos→micros unit rule cannot drift
    * between them. */
  private def tsAsTimestamp(stream: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (stream.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else stream

  /** The fixture's `ts` as epoch-MICROS (`ts_us`) — the integer twin of
    * [[tsAsTimestamp]] for state kernels that keep time as a Long. */
  private def tsAsMicros(stream: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (stream.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream.withColumn("ts_us", expr("ts div 1000"))
    else stream.withColumn("ts_us", unix_micros(col("ts")))

  def runHourlyCounts(spark: SparkSession, eventsDir: String,
                      checkpointDir: String, wh: Warehouse,
                      dataset: String, table: String,
                      statePartitions: Option[Int] = None): Unit =
      withShufflePartitions(spark, statePartitions) {
    val stream = stageAndStream(spark, eventsDir, "graft_landing")
    val withTs = tsAsTimestamp(stream)
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertHourly(wh, dataset, table, batch)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming first-occurrence dedup — custom per-key state via
    * `flatMapGroupsWithState` (the KeyValueGroupedDataset state API):
    * each (user_id, event_type) group keeps ONE tiny state record (the
    * first-seen (ts, event_id)) and emits its first event exactly once;
    * every later occurrence is absorbed. The state store holds O(distinct
    * keys) fixed-size entries — the canonical streaming-dedup state
    * shape; at 100 TB the keys shard across the state store by group
    * hash, and a `GroupStateTimeout` would bound retention for unbounded
    * key spaces (the fixture's key space is finite, so none is set).
    *
    * Within a micro-batch the group iterator is unordered; the kernel
    * takes the (ts, event_id)-minimum so emission is deterministic. With
    * AvailableNow over a staged fixture the run is a single batch, which
    * is what makes the first-occurrence choice oracle-replicable
    * (row_number() = 1 over the same ordering). */
  def runFirstSeen(spark: SparkSession, eventsDir: String,
                   checkpointDir: String,
                   statePartitions: Option[Int] = None)
                  (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = stageAndStream(spark, eventsDir, "graft_landing_fs")
    val withTs = tsAsMicros(stream)
    val typed = withTs
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts_us").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Double)]
    val firstSeen = typed
      .groupByKey { case (uid, et, _, _, _) => (uid, et) }
      .flatMapGroupsWithState[(Long, Long), (Long, String, Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long, Double)],
         state: GroupState[(Long, Long)]) =>
          // batch-local minimum by (ts, event_id) — iterator order is not
          // deterministic, the reduction is
          val cand = rows.minBy { case (_, _, ts, eid, _) => (ts, eid) }
          if (state.exists) Iterator.empty // key already emitted
          else {
            state.update((cand._3, cand._4))
            Iterator.single((key._1, key._2, cand._3, cand._4, cand._5))
          }
      }
      .toDF("user_id", "event_type", "first_ts_us", "first_event_id", "first_value")
    val q = firstSeen.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Streaming first-order transition mining — the
    * [[graft.operators.Transitions]] batch operator's stateful twin:
    * each (user) group keeps ONE tiny state record (its last event's
    * (ts_us, event_id, type)) so transitions BRIDGE micro-batches — the
    * cross-batch pair a stateless per-batch lag would silently drop.
    * Within a batch the group's rows sort by (ts, event_id) (bounded by
    * the user's per-batch activity); the state seeds the chain and
    * updates to the batch's last event. Emits one row per adjacent pair:
    * (user_id, from_type, to_type, ts_us, event_id) keyed by the LATER
    * event; the drained output aggregated by (from, to) equals the batch
    * operator exactly when ingest is time-ordered per user (the file
    * stream's contract here; out-of-order ingest needs watermark
    * buffering, which [[runHourlyCounts]] demonstrates). */
  def runTransitions(spark: SparkSession, eventsDir: String,
                     checkpointDir: String,
                     statePartitions: Option[Int] = None,
                     landingDir: Option[String] = None)
                    (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = landingDir match {
      case Some(dir) =>
        val schema = spark.read.parquet(dir).schema
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1) // one micro-batch per landed file
          .parquet(dir)
      case None => stageAndStream(spark, eventsDir, "graft_landing_tr")
    }
    val withTs = tsAsMicros(stream)
    val typed = withTs
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts_us").cast("long"), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
    val transitions = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (Long, String, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy { case (_, _, ts, eid) => (ts, eid) }
          if (sorted.isEmpty) Iterator.empty
          else {
            var prev: Option[(Long, Long, String)] = state.getOption
            val out = Seq.newBuilder[(Long, String, String, Long, Long)]
            sorted.foreach { case (_, et, ts, eid) =>
              prev.foreach { case (_, _, pType) => out += ((uid, pType, et, ts, eid)) }
              prev = Some((ts, eid, et))
            }
            state.update(prev.get)
            out.result().iterator
          }
      }
      .toDF("user_id", "from_type", "to_type", "ts_us", "event_id")
    val q = transitions.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest decontamination gate — the eval-leak check applied
    * AT INGEST instead of as a batch sweep: each arriving micro-batch of
    * documents scores against ONE prebuilt benchmark shingle set
    * ([[graft.llmops.Decontaminate.benchShingleSet]]), so benchmark
    * answers never enter the corpus in the first place. The operator is
    * stateless (per-doc verdicts need no cross-batch memory): the only
    * streaming state is the source's file log, and the per-batch plan is
    * the batch operator's plan — shingle pass, broadcast probe, one
    * map-side-combined per-doc count.
    *
    * The benchmark side is persisted ONCE here (the first micro-batch
    * fills the cache; every later batch probes it) and unpersisted when
    * the stream drains — the repeated-probe pattern the batch operator's
    * scaladoc defers to this scope boundary (computing the shingle set
    * per micro-batch would re-scan the benchmark forever on a continuous
    * stream). `persist`, not `localCheckpoint`: a checkpoint RDD cannot
    * be released through the DataFrame handle, while the cache-manager
    * entry frees exactly at this boundary. */
  def runDecontaminateGate(spark: SparkSession, docsDir: String,
                           benchmark: DataFrame, checkpointDir: String,
                           statePartitions: Option[Int] = None)
                          (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val benchShingles = graft.llmops.Decontaminate
      .benchShingleSet(benchmark).persist()
    try {
      val stream = stageAndStream(spark, docsDir, "graft_landing_decon")
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          sink(graft.llmops.Decontaminate
            .contaminationScoresAgainst(batch, benchShingles))
        }
        .start()
      q.awaitTermination()
    } finally benchShingles.unpersist()
  }

  /** Streaming near-duplicate ingest gate — the nightly-ingest dedup
    * question asked AT the stream: which incoming documents
    * near-duplicate the STANDING corpus? The corpus's
    * [[graft.llmops.Dedup.SimhashIndex]] (band rows + Bloom bitmap)
    * builds ONCE at stream start — band rows persist at the stream's
    * scope and free at drain, the bitmap rides the probe expression —
    * and every micro-batch then runs the stateless probe plan: batch
    * SimHash → map-side Bloom filter → surviving band rows broadcast
    * back to join the persisted corpus bands → exact Hamming verify.
    * The standing corpus is scanned once for the whole stream, never
    * per batch, and no streaming state accumulates (each batch's
    * verdicts depend only on the batch and the index).
    *
    * `incomingFilter` carves the streamed rows that count as incoming
    * (the fixture streams the whole table and gates the batch slice).
    * Emits (new_id, old_id, hamming) rows per micro-batch. */
  def runNearDupGate(spark: SparkSession, docsDir: String,
                     standing: DataFrame, checkpointDir: String,
                     statePartitions: Option[Int] = None,
                     incomingFilter: org.apache.spark.sql.Column = lit(true))
                    (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    // persist=true: the Bloom-build aggregate fills the band cache, so
    // index construction is the stream's ONLY standing-corpus scan
    val index = graft.llmops.Dedup.simhashBandIndex(standing, persist = true)
    try {
      val stream = stageAndStream(spark, docsDir, "graft_landing_neardup")
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // bracket-scoped probe: candidate cache lives exactly as long
          // as the batch sink — no localCheckpoint, nothing leaks
          graft.llmops.Dedup.withIncrementalPairs(
            index, batch.filter(incomingFilter))(sink)
        }
        .start()
      q.awaitTermination()
    } finally index.bands.unpersist()
  }

  /** Streaming quality gate — Gopher-style document screening applied AT
    * INGEST, completing the ingest-gate family (decontaminate, near-dup,
    * quality): every arriving micro-batch runs the batch
    * [[graft.llmops.QualityRules.gopherRules]] verdict plan verbatim.
    * Fully stateless (each verdict depends only on its own document —
    * no broadcast artifact, no cross-batch memory, no watermark), so the
    * per-batch plan is a narrow codegen'd kernel and the drained output
    * equals the batch twin regardless of how the source files were
    * micro-batched. At scale this is the shape you want for a landing
    * zone: the gate rides the ingest stream's existing file log, adds
    * zero shuffles, and rejected documents never enter the corpus. */
  def runQualityGate(spark: SparkSession, docsDir: String,
                     checkpointDir: String,
                     statePartitions: Option[Int] = None)
                    (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val stream = stageAndStream(spark, docsDir, "graft_landing_quality")
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.llmops.QualityRules.gopherRules(batch))
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming LM-fluency gate — CCNet-style perplexity screening AT
    * INGEST, the fourth member of the ingest-gate family (decontaminate,
    * near-dup, quality, fluency): the bigram model is a per-snapshot
    * ARTIFACT (trained once from the standing corpus — production loads
    * it via [[graft.llmops.LangModel.loadModel]]); every micro-batch
    * runs the stateless [[graft.llmops.LangModel.scoreWithModel]] plan
    * against it. The model tables persist at the stream's scope (each
    * batch joins them; recomputing the corpus aggregate per batch would
    * re-scan the corpus forever) and free at drain — the
    * `runDecontaminateGate` cache-boundary pattern. Per-doc scores are
    * exact integers, so the drained output equals the batch twin
    * bit-for-bit regardless of micro-batching. */
  def runLmGate(spark: SparkSession, docsDir: String,
                model: graft.llmops.LangModel.BigramModel,
                checkpointDir: String,
                statePartitions: Option[Int] = None)
               (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val c12 = model.c12.persist()
    val c1 = model.c1.persist()
    val v = model.vocab.persist()
    val pinned = graft.llmops.LangModel.BigramModel(c12, c1, v)
    try {
      val stream = stageAndStream(spark, docsDir, "graft_landing_lm")
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          sink(graft.llmops.LangModel.scoreWithModel(batch, pinned))
        }
        .start()
      q.awaitTermination()
    } finally { c12.unpersist(); c1.unpersist(); v.unpersist() }
  }

  /** Gap-based sessionization — `session_window` event-time aggregation
    * (SURVEY §2.8 extension): events of a user belong to one session
    * while consecutive gaps stay UNDER `gap`; a gap ≥ `gap` starts a new
    * session (Spark merges session windows only when the half-open
    * [t, t+gap) ranges overlap, so an event landing exactly at
    * last+gap opens a fresh session — the oracle's islands predicate
    * must use `>=`, not `>`).
    *
    * At scale: session state is per-key and watermark-bounded — Spark
    * drops a session's state once the watermark passes its close; keys
    * shard across the state store. On a CONTINUOUS stream the mode is
    * `append` (sessions emit exactly once, when the watermark closes
    * them). A drain-and-stop AvailableNow run must use `complete`
    * instead: Spark rejects `update` for session windows, and in
    * `append` every session in the final watermark-delay+gap tail of the
    * fixture would stay in state forever (no later data ever advances
    * the watermark past it), silently dropping rows. The session bounds
    * are emitted as min/max of the member events (not the struct's
    * padded `end`), so the output is engine-neutral. */
  def runSessions(spark: SparkSession, eventsDir: String,
                  checkpointDir: String, gap: String,
                  statePartitions: Option[Int] = None)
                 (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val stream = stageAndStream(spark, eventsDir, "graft_landing_sess")
    val withTs = tsAsTimestamp(stream)
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Stream-stream interval join (SURVEY §2.8 extension) — click→view
    * attribution: each click pairs with the same user's views in the
    * preceding `window`. Both sides are watermarked and the join
    * condition is time-BOUNDED in both directions, which is what lets
    * Spark expire join state: a buffered view can only match clicks up
    * to `window` later, so once the click watermark passes that horizon
    * the view's state row drops. Unbounded stream-stream joins buffer
    * forever — the interval bound IS the scale story. Append mode:
    * each pair emits exactly once.
    *
    * `joinType` extends the family to `"leftOuter"` (clicks are the left
    * side): a buffered click whose matching-view horizon passes without a
    * match emits ONCE with null view columns — but only when the VIEW
    * watermark passes `click_ts` (the upper bound of any matching view),
    * because until then a match could still arrive. On a drain-and-stop
    * AvailableNow run the final watermark is `max(ts) - delay`, so
    * unmatched clicks in the trailing delay window stay in state and do
    * NOT emit — exactly the continuous-stream contract (they'd emit when
    * later data advanced the watermark), and what the batch oracle must
    * replicate with a `click_ts < max(ts) - delay` gate on null rows.
    *
    * `"fullOuter"` adds the symmetric view side: an unmatched view emits
    * null click columns once the CLICK watermark passes `view_ts +
    * window` (the last click instant it could have matched); its
    * drain-tail gate in the oracle is `view_ts + window < wm`. The
    * output `user_id` coalesces across sides so every row carries it. */
  def runClickViewJoin(spark: SparkSession, eventsDir: String,
                       checkpointDir: String, window: String,
                       statePartitions: Option[Int] = None,
                       joinType: String = "inner")
                      (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val stream = stageAndStream(spark, eventsDir, "graft_landing_ssj")
    val withTs = tsAsTimestamp(stream)
    val views = withTs.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val clicks = withTs.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val joined = clicks.join(views,
      expr(s"c_user = v_user AND " +
        s"view_ts BETWEEN click_ts - INTERVAL $window AND click_ts"),
      joinType)
      .select(coalesce(col("c_user"), col("v_user")).as("user_id"),
        col("click_id"), col("click_ts"), col("view_id"), col("view_ts"))
    val q = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Streaming distinct-cardinality per group — each event_type keeps
    * the 256 HLL max-rank registers as its ONE state record, so total
    * state is O(groups × 256 bytes) however many events stream through:
    * the state shape that makes "distinct users per type, continuously"
    * viable where exact streaming distinct state grows with the key
    * count.
    *
    * Registers MAX-MERGE, so micro-batch arrival order is irrelevant and
    * the drained estimate equals the batch sketch over the same rows
    * ([[graft.operators.Sketch.hllDistinctBy]]) — an order-free state is
    * what lets a STREAMING approximation be oracle-hash-checked. The
    * estimate reuses the batch kernel contract bit for bit: the same
    * md5-derived 60-bit hash ([[graft.llmops.Kernels.md5Long]]), the
    * harmonic sum in exact integer units of 2^-62 (BigInt; one double
    * division at the end), and the floor-round-4 output. */
  def runHllDistinct(spark: SparkSession, eventsDir: String,
                     checkpointDir: String,
                     statePartitions: Option[Int] = None)
                    (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val m = graft.operators.Sketch.HllBuckets
    val stream = stageAndStream(spark, eventsDir, "graft_landing_hll")
    val typed = stream
      .select(col("event_type"), col("user_id").cast("long"))
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .as[(String, Long)]
    val sketched = typed.groupByKey(_._1)
      .mapGroupsWithState[Array[Int], (String, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Array[Int]]) =>
          val reg = state.getOption.getOrElse(new Array[Int](m))
          val md = graft.llmops.Kernels.newMd5()
          rows.foreach { case (_, uid) =>
            val h = graft.llmops.Kernels.md5Long(md, uid.toString)
            val b = (h % m).toInt // h is 60-bit non-negative
            val v = h / m
            // rho = 53 - bitlength(v) (empty register = 0; real rho >= 1)
            val rho =
              if (v == 0L) 53
              else java.lang.Long.numberOfLeadingZeros(v) - 11
            if (rho > reg(b)) reg(b) = rho
          }
          state.update(reg)
          var nz = 0; var ssum = BigInt(0); var i = 0
          while (i < m) {
            if (reg(i) > 0) { nz += 1; ssum += BigInt(1) << (62 - reg(i)) }
            i += 1
          }
          val st = ssum + BigInt(m - nz) * (BigInt(1) << 62)
          val est = graft.llmops.Kernels.floorRound4(
            graft.operators.Sketch.HllNumerator / st.bigInteger.doubleValue)
          (key, nz.toLong, est)
      }
      .toDF("event_type", "n_buckets_used", "estimate")
    val q = sketched.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Stream-static enrichment join — the stateless member of the
    * streaming-join family (vs [[runClickViewJoin]]'s stateful
    * stream-stream form): each micro-batch inner-joins a STATIC
    * dimension frame. No watermark, no join state — the static side is
    * planned per micro-batch (broadcast when it fits, which a dim that
    * enriches a stream should), so arbitrarily long-running streams hold
    * zero join memory. This is the canonical "attach the profile /
    * catalog row as events flow" shape; the static frame re-resolves on
    * restart, which is also the standard slowly-refreshed-dim deployment
    * (restart or swap the table to pick up changes).
    *
    * Append mode + inner join: each enriched event emits exactly once. */
  def runStaticEnrich(spark: SparkSession, eventsDir: String,
                      checkpointDir: String, dim: DataFrame,
                      joinKey: String,
                      statePartitions: Option[Int] = None)
                     (sink: DataFrame => Unit): Unit =
      withShufflePartitions(spark, statePartitions) {
    val stream = stageAndStream(spark, eventsDir, "graft_landing_enrich")
    val withTs = tsAsTimestamp(stream)
    val enriched = withTs.join(broadcast(dim), Seq(joinKey))
    val q = enriched.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }

  /** Partition-scoped upsert of an update-mode micro-batch: latest value
    * per (hour, event_type) wins; only the day partitions present in the
    * batch are rewritten (untouched rows of those days carry over via an
    * anti-join, every other partition's commit is metadata-only). */
  def upsertHourly(wh: Warehouse, dataset: String, table: String,
                   batch0: DataFrame): Unit = {
    val batch = batch0.withColumn("day", to_date(col("hour")))
    if (batch.isEmpty) return // AvailableNow may fire a final empty batch
    if (!wh.exists(dataset, table)) {
      wh.overwrite(dataset, table, batch,
        TableMeta(partitionField = Some("day")))
    } else {
      // touched DAYS, not rows — driver-sized by construction
      val touchedDays = batch.select(col("day")).distinct()
        .collect().map(_.getDate(0).toString).toSeq
      val carry = wh.readPartitions(dataset, table, touchedDays)
        .join(batch.select(col("hour"), col("event_type")),
          Seq("hour", "event_type"), "left_anti")
      wh.insertOverwrite(dataset, table, carry.unionByName(batch))
    }
  }
}
