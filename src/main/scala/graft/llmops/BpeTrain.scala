package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Distributed BPE merge-table training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer-training primitive a pretraining pipeline runs over its
  * own corpus before anything else tokenizes.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not raw text: the
  * corpus collapses to (word, count) once — that is the only
  * corpus-sized shuffle — and every merge round then runs on the
  * vocabulary table, which is orders of magnitude smaller (Heaps' law:
  * ~millions of rows at 100 TB). Each round:
  *
  *  1. counts adjacent symbol pairs weighted by word count (map-side
  *     combined groupBy on the vocab table; overlapping pairs all count,
  *     matching the reference implementation),
  *  2. picks the argmax pair — count desc, then (lhs, rhs) lexicographic
  *     asc — via a 1-ROW driver collect (the per-round driver traffic is
  *     one pair, the same bounded-scalar pattern as the k-means
  *     trainer's k×dim), and
  *  3. rewrites symbol sequences with the merge applied.
  *
  * Symbol sequences are SEP-framed strings (`␟a␟b␟c␟`, SEP = U+001F):
  * applying a merge is then one literal `replace(seq, ␟a␟b␟, ␟ab␟)` —
  * and because both Spark's and DuckDB's `replace` substitute
  * non-overlapping occurrences greedily LEFT-TO-RIGHT, the rewrite IS
  * the reference BPE merge procedure, bit-identically on both engines
  * (`aaa` + merge (a,a) → `[aa, a]`). Words containing SEP, newline or
  * CR cannot ride the framing and are excluded on both sides; counts
  * are exact integers throughout, so every round's argmax — and hence
  * the whole merge table — is deterministic.
  *
  * MERGE BATCHING: one driver round-trip per merge does not scale to a
  * real 32k-merge tokenizer (~64k Spark jobs). Each round-trip therefore
  * collects the top-[[BatchCollect]] ranked pairs and accepts a prefix
  * of complete, fully symbol-DISJOINT count levels — stopping at the
  * first level containing any conflict (a repeated symbol, a symbol
  * colliding with another accepted pair's lhs/rhs/concatenation, or a
  * truncated level). Accepted merges apply as ONE chained `replace`
  * pass. This is EXACT, not approximate: a merge can only change the
  * count of pairs sharing one of its symbols (destroyed neighbors) or
  * its concatenation (created/extended pairs), and any created pair's
  * count is bounded by a conflicting ancestor pair at a count level ≥
  * its own — so if every level down to a candidate's is conflict-free,
  * the candidate IS the next sequential argmax. The batched merge table
  * is therefore bit-identical to the one-at-a-time loop (and to the
  * strictly sequential DuckDB oracle) by construction, while cutting
  * driver round-trips from O(merges) to O(merges / accepted-per-trip).
  * When even the top level conflicts, the trip falls back to accepting
  * the global top-1 — which is literally the sequential choice.
  *
  * Each round localCheckpoints the (small) vocab frame to keep the
  * iterative plan flat, releasing the superseded copy — the same
  * pattern as [[Dedup.duplicateClusters]]. */
object BpeTrain {

  val Rounds = 8
  val Sep = "\u001F"

  /** Ranked pairs collected per driver round-trip — bounds driver
    * traffic per trip (64 string pairs) and the max batch size. */
  val BatchCollect = 64

  /** Accept the longest prefix of count levels that is provably
    * sequential-exact (see object doc); falls back to the top-1 pair.
    * `pairs` must be ranked (count desc, lhs, rhs); `truncated` = the
    * collect hit its limit, so the last count level may be incomplete. */
  private[graft] def acceptBatch(pairs: Array[(String, String, Long)],
                                 truncated: Boolean): Seq[(String, String, Long)] = {
    val minCount = pairs.last._3
    val used = scala.collection.mutable.Set.empty[String]
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    val levels = pairs.groupBy(_._3).toSeq.sortBy(-_._1).map(_._2)
    for (level <- levels if !stop) {
      val complete = !truncated || level.head._3 > minCount
      val syms = level.flatMap(p => Seq(p._1, p._2))
      val concats = level.map(p => p._1 + p._2)
      val disjoint = complete &&
        syms.distinct.length == syms.length &&
        !concats.exists(syms.contains) &&
        !(syms ++ concats).exists(used)
      if (disjoint) {
        accepted ++= level
        used ++= syms
        used ++= concats
      } else stop = true
    }
    if (accepted.isEmpty) Seq(pairs.head) else accepted.toSeq
  }

  /** Runs the merge loop; returns (merge table rows, final vocab frame
    * with columns word, seq, cnt — seq SEP-framed with all merges
    * applied, driver round-trip count). The caller owns unpersisting
    * the returned frame. `batchLimit = 1` degenerates to the
    * one-merge-per-trip sequential loop (the equivalence spec's
    * reference run). */
  private[graft] def train(docs: DataFrame, rounds: Int,
                           batchLimit: Int = BatchCollect)
      : (Seq[(Int, String, String, Long)], DataFrame, Int) = {
    var checkpointed = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && !col("word").rlike(s"[$Sep\n\r]"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"),
        concat(lit(Sep), regexp_replace(col("word"), "(.)", "$1" + Sep)).as("seq"),
        col("cnt"))
      .localCheckpoint(true)
    var vocab = checkpointed
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var trips = 0
    var done = false
    while (merges.size < rounds && !done) {
      // seq splits to ['', s1, …, sn, ''] — firsts are 0-based 1..n-1
      val top = vocab
        .select(split(col("seq"), Sep).as("s"), col("cnt"))
        .select(explode(expr(
          "transform(slice(s, 2, size(s) - 3), " +
            "(x, i) -> struct(x AS lhs, s[i + 2] AS rhs))")).as("p"), col("cnt"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("cnt")).cast("long").as("c"))
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(batchLimit).collect()
      trips += 1
      if (top.isEmpty) done = true
      else {
        val pairs = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        val batch = acceptBatch(pairs, truncated = pairs.length == batchLimit)
          .take(rounds - merges.size)
        batch.foreach { case (lhs, rhs, c) =>
          merges += ((merges.size + 1, lhs, rhs, c))
        }
        val rewritten = batch.foldLeft(col("seq")) { case (c, (lhs, rhs, _)) =>
          replace(c, lit(Sep + lhs + Sep + rhs + Sep), lit(Sep + lhs + rhs + Sep))
        }
        val next = vocab.withColumn("seq", rewritten).localCheckpoint(true)
        checkpointed.unpersist()
        checkpointed = next
        vocab = next
      }
    }
    (merges.toSeq, checkpointed, trips)
  }

  /** Learned merge table: (round, lhs, rhs, pair_count), one row per
    * merge in training order; stops early if no pairs remain. */
  def bpeMerges(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, vocab, _) = train(docs, rounds)
    vocab.unpersist()
    merges.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Per-document BPE token counts under a merge table trained on the
    * same corpus — the "how many tokens is my corpus" budget question a
    * pretraining run asks before packing. Trains `rounds` merges, derives
    * each vocabulary word's post-merge symbol count from its framed
    * sequence (symbols = SEP-split size - 2), then broadcast-joins the
    * (Heaps'-law-small) word→count table onto the exploded corpus and
    * sums per document — the corpus-sized pass is one explode + broadcast
    * join + map-side-combined sum, no shuffle beyond the doc_id agg.
    * Unframeable words (SEP/newline/CR) are excluded from BOTH counts;
    * documents with no countable words emit nothing. */
  def bpeTokenCounts(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    val (_, vocab, _) = train(docs, rounds)
    // eager: releases the vocab checkpoint before the lazy result is run
    val perWord = vocab.select(col("word"),
      (size(split(col("seq"), Sep)) - 2).cast("long").as("n_syms"))
      .localCheckpoint(true)
    vocab.unpersist()
    docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && !col("word").rlike(s"[$Sep\n\r]"))
      .join(broadcast(perWord), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_tokens"))
  }

  // ------------------------------------------------------------ queries

  def qBpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.load(spark, dir, "documents"))

  /** The same `rounds` BPE iterations as chained CTE blocks: per round a
    * pair count, a 1-row argmax, and a LEFT JOIN rewrite (LEFT so an
    * empty argmax passes the vocab through unchanged instead of wiping
    * it). Every multiply-referenced CTE is MATERIALIZED (DuckDB inlines
    * plain CTEs per reference). */
  /** The shared training CTE chain: w0..w`rounds` vocab states (word,
    * seq, cnt) and m1..m`rounds` one-row argmax picks. */
  private def trainCtes(rounds: Int): String = {
    val sep = "chr(31)"
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"w${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT string_split(seq, $sep) AS s, cnt,
         |               unnest(generate_series(2, len(string_split(seq, $sep)) - 2)) AS i
         |        FROM $prev)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (
         |  SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT w.word, CASE WHEN m.lhs IS NULL THEN w.seq
         |         ELSE replace(w.seq, $sep || m.lhs || $sep || m.rhs || $sep,
         |                      $sep || m.lhs || m.rhs || $sep) END AS seq, w.cnt
         |  FROM $prev w LEFT JOIN m$r m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, $sep || regexp_replace(word, '(.)', '\\1' || $sep, 'g') AS seq,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
       |        WHERE doc_id IS NOT NULL AND text IS NOT NULL)
       |  WHERE word <> '' AND NOT regexp_matches(word, '[\\x1F\\x0A\\x0D]')
       |  GROUP BY word),
       |$roundCtes""".stripMargin
  }

  def bpeMergesSql(rounds: Int = Rounds): String = {
    val finalUnion = (1 to rounds).map { r =>
      s"SELECT $r AS round, lhs, rhs, c AS pair_count FROM m$r"
    }.mkString("\nUNION ALL ")
    s"""${trainCtes(rounds)}
       |$finalUnion""".stripMargin
  }

  /** Encode twin: re-train via [[trainCtes]], then join the exploded
    * corpus to the final vocab state and sum symbol counts per doc. */
  def bpeTokenCountsSql(rounds: Int = Rounds): String =
    s"""${trainCtes(rounds)}
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(string_split(v.seq, chr(31))) - 2) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL) d
       |JOIN w$rounds v ON d.word = v.word
       |GROUP BY d.doc_id""".stripMargin

  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeTokenCounts(Tables.load(spark, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_merges" -> (qBpeMerges _),
    "bpe_encode" -> (qBpeEncode _))

  val oracleSql: Map[String, String] = Map(
    "bpe_merges" -> bpeMergesSql(),
    "bpe_encode" -> bpeTokenCountsSql())
}
