package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sequence packing — assign each document its token span in the
  * concat-then-split training stream: documents are laid end to end in
  * doc_id order and cut into fixed-size sequences of `seqTokens`; each
  * doc learns its global start offset and the first/last sequence ids it
  * lands in. (Concat-then-split is the packing LLM data loaders actually
  * use; "no doc ever straddles" variants are bin-packing and inherently
  * sequential — this one is exactly parallelizable.)
  *
  * The global token offset is an ORDERED PREFIX SUM, and the naive
  * encoding (`Window.orderBy("doc_id")` with no partitioning) funnels
  * the whole corpus through ONE task — the classic global-window scale
  * trap. This is the textbook two-phase distributed scan instead:
  *
  *  1. per-bucket prefix sums in parallel (`doc_id div bucketSize`
  *     buckets — windows partitioned by bucket, each task bounded);
  *  2. bucket TOTALS (one map-side-combined agg, rows = #buckets) are
  *     scanned on the driver into per-bucket base offsets — driver-sized
  *     by construction (guarded), broadcast back for the final add.
  *
  * Cost at any scale: one narrow tokenize pass, one bounded window
  * shuffle, one #buckets-row agg, one broadcast join. Nothing funnels.
  */
object Pack {

  /** Tokens per packed training sequence (the query's constant; callers
    * pick their own). */
  val SeqTokens = 256

  /** Default bucket: 8k docs per prefix-sum task — small enough that the
    * fixture corpus already takes the multi-bucket path (the single-bucket
    * degenerate case IS the global window), large enough that 10B docs
    * stay under [[graft.operators.PrefixSum.MaxBuckets]]. */
  def packSequences(docs: DataFrame, seqTokens: Int,
                    bucketSize: Long = 8192): DataFrame = {
    require(seqTokens >= 1, s"seqTokens must be >= 1, got $seqTokens")
    // NULL text is pinned to '' (Spark's size(split(NULL)) = -1 while
    // DuckDB's len(string_split(NULL)) is NULL — coalescing on BOTH
    // engines makes a NULL doc one empty token, never a negative span).
    // NULL doc_id is excluded EXPLICITLY (mirrored in the oracle): the
    // bucket join would drop such rows anyway, and the raw-column guard
    // pushes to the scan where the derived isnotnull(doc_id div N) can't.
    val toks = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
      size(split(coalesce(col("text"), lit("")), " "))
        .cast("long").as("n_tokens"),
      expr(s"cast(doc_id as bigint) div $bucketSize").as("bucket"))
    // (sparse 64-bit doc_ids make ~one bucket per doc no matter the
    // bucketSize, so the helper's cap guard genuinely binds here)
    graft.operators.PrefixSum.bucketedRunningSum(toks,
      "bucket", "doc_id", "n_tokens", "cum")
      .withColumn("start_tok", col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div $seqTokens").as("seq_first"),
        expr(s"(start_tok + n_tokens - 1) div $seqTokens").as("seq_last"))
  }

  // ------------------------------------------------------------- chunking

  /** Tokens per chunk / stride for the chunk query (overlap = 16). */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** Overlapping token-window chunking — the other half of sequence prep:
    * instead of packing docs end to end, cut EACH doc into fixed-size
    * windows every `stride` tokens (overlap = chunkTokens - stride), the
    * standard long-document treatment for context-bounded training and
    * for embedding indexes.
    *
    * Shape at 100 TB: one narrow tokenize + generate + explode — no
    * shuffle at all; output rows ≈ input tokens / stride. `split` always
    * yields ≥1 token (empties kept), so every doc emits ≥1 chunk and
    * `sequence(0, n-1, stride)` is never empty. Chunk text is re-joined
    * and hashed so the oracle verifies the exact window CONTENT, not just
    * its coordinates. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = ChunkTokens,
                stride: Int = ChunkStride): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1,
      s"chunkTokens/stride must be >= 1, got $chunkTokens/$stride")
    val chunk = slice(col("toks"), col("start_tok") + 1, lit(chunkTokens))
    docs.select(col("doc_id").cast("long"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("toks"), posexplode(
        sequence(lit(0), size(col("toks")) - 1, lit(stride)))
        .as(Seq("chunk_id", "start_tok")))
      .select(col("doc_id"), col("chunk_id").cast("long"),
        col("start_tok").cast("long"),
        size(chunk).cast("long").as("chunk_len"),
        md5(array_join(chunk, " ")).as("chunk_md5"))
  }

  // -------------------------------------------- length-bucketed batching

  /** Bucket upper bounds (token counts) and docs-per-batch for
    * [[batchBuckets]]' query (fixture token lengths run 10..99, so all
    * four buckets — including the unbounded tail — are populated). */
  val BatchBucketBounds: Seq[Long] = Seq(24, 48, 72)
  val BatchSize = 16

  /** Length-bucketed batch construction — the dynamic-batching step
    * training loaders run when sequences are padded, not packed: group
    * docs of similar token length, cut each group into fixed-count
    * batches, and account the padding each batch pays (batch cost is
    * `n_docs · max_len`; everything above `sum_len` is padding waste).
    * The bucket boundaries ARE the knob — this operator measures what a
    * boundary choice costs, per batch.
    *
    * Batch assignment must be deterministic and avoid the per-bucket
    * global sort (a handful of huge buckets is the hot-key funnel by
    * construction): position-in-bucket comes from
    * [[graft.operators.PrefixSum.perKeyRunningSum]] over a constant-1
    * column — per-(bucket, hash-slice) windows stitched by broadcast
    * offsets, so no task ever sorts a whole length bucket — in the same
    * deterministic (hash, doc_id) order the oracle's window states.
    *
    * Output: (len_bucket, batch_id, n_docs, max_tokens, sum_tokens,
    * padding_tokens); the final batch of a bucket may hold < batchSize
    * docs and pays padding only over its actual membership. */
  def batchBuckets(docs: DataFrame, bounds: Seq[Long] = BatchBucketBounds,
                   batchSize: Int = BatchSize): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.head >= 1,
      s"bounds must be ascending positive token counts, got $bounds")
    val base = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Hashing.md5Long(col("doc_id").cast("string")).as("_h"))
    val bucketExpr = bounds.reverse.foldLeft(lit("binf")) { (acc, b) =>
      when(col("n_tokens") <= b, lit(s"b$b")).otherwise(acc)
    }
    // _h is md5Long: 60-bit non-negative by construction, so the
    // div-2^52 bucket is always 0..255 — no id-domain guard needed
    // (r13 packed-key audit; contrast operators/Triangles)
    val withBucket = base.withColumn("len_bucket", bucketExpr)
      .withColumn("_hb", expr(s"_h div ${1L << 52}"))
      .withColumn("_one", lit(1L))
    val positioned = graft.operators.PrefixSum.perKeyRunningSum(
      withBucket, "len_bucket", "_hb", Seq("_h", "doc_id"), "_one", "_pos")
    positioned
      .select(col("len_bucket"), col("n_tokens"),
        expr(s"(_pos - 1) div $batchSize").as("batch_id"))
      .groupBy(col("len_bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padding_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }

  // ----------------------------------------------------------------- query

  def qPack(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.load(spark, dir, "documents"), SeqTokens)

  def qChunk(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.load(spark, dir, "documents"))

  /** The oracle states the SEMANTICS (one global ordered cumsum) — the
    * Spark side must reproduce it exactly from the two-phase plan. */
  val qPackSql: String =
    s"""WITH t AS (SELECT doc_id, len(string_split(coalesce(text, ''), ' '))
       |                     AS n_tokens
       |           FROM documents WHERE doc_id IS NOT NULL),
       |c AS (SELECT doc_id, n_tokens,
       |             CAST(sum(n_tokens) OVER (ORDER BY doc_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |               AS BIGINT) AS cum
       |      FROM t)
       |SELECT doc_id, n_tokens, cum - n_tokens AS start_tok,
       |       (cum - n_tokens) // $SeqTokens AS seq_first,
       |       (cum - 1) // $SeqTokens AS seq_last
       |FROM c""".stripMargin

  /** `range(0, n, stride)` (end-exclusive) = Spark's
    * `sequence(0, n-1, stride)` (end-inclusive) for n ≥ 1, which `split`
    * guarantees. List slicing is 1-based inclusive on both engines'
    * chosen forms (`list_slice(x, a, b)` ↔ `slice(x, a, len)`). */
  val qChunkSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
       |           FROM documents),
       |s AS (SELECT doc_id, toks,
       |             unnest(range(0, len(toks), $ChunkStride)) AS start_tok
       |      FROM t)
       |SELECT doc_id, start_tok // $ChunkStride AS chunk_id, start_tok,
       |       len(list_slice(toks, start_tok + 1,
       |                      start_tok + $ChunkTokens)) AS chunk_len,
       |       md5(array_to_string(list_slice(toks, start_tok + 1,
       |                           start_tok + $ChunkTokens), ' ')) AS chunk_md5
       |FROM s""".stripMargin

  def qBatch(spark: SparkSession, dir: String): DataFrame =
    batchBuckets(Tables.load(spark, dir, "documents"))

  /** The oracle states the semantics as one per-bucket window
    * (row_number in (hash, doc_id) order); the two-phase per-key sum
    * must reproduce positions — and therefore batches — exactly. */
  val qBatchSql: String = {
    val h = graft.llmops.Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    val cases = BatchBucketBounds
      .map(b => s"WHEN n_tokens <= $b THEN 'b$b'").mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         $h AS h
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |b AS (
       |  SELECT doc_id, n_tokens, h,
       |         CASE $cases ELSE 'binf' END AS len_bucket
       |  FROM t),
       |s AS (
       |  SELECT len_bucket, n_tokens,
       |         row_number() OVER (PARTITION BY len_bucket
       |           ORDER BY h, doc_id) AS pos
       |  FROM b)
       |SELECT len_bucket, (pos - 1) // $BatchSize AS batch_id,
       |       count(*) AS n_docs, max(n_tokens) AS max_tokens,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       count(*) * max(n_tokens) - CAST(sum(n_tokens) AS BIGINT)
       |         AS padding_tokens
       |FROM s GROUP BY len_bucket, batch_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_sequences" -> (qPack _),
    "chunk_docs" -> (qChunk _),
    "batch_buckets" -> (qBatch _))

  val oracleSql: Map[String, String] = Map(
    "pack_sequences" -> qPackSql,
    "chunk_docs" -> qChunkSql,
    "batch_buckets" -> qBatchSql)
}
