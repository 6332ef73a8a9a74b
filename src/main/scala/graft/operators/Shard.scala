package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.Hashing

/** Deterministic corpus shuffling + sharded export — the last mile of a
  * training-data pipeline: writing the curated corpus as N well-mixed,
  * size-bounded shards that a data loader streams.
  *
  * The "shuffle" is a HASH, not an RNG: shard and within-shard order come
  * from `md5(doc_id)`, so (a) source/time-correlated input is decorrelated
  * (consecutive doc_ids land in different shards — the IID-ish mix
  * training wants), (b) every run, any partitioning, either engine
  * assigns identical shards — the assignment is oracle-checkable — and
  * (c) a re-export after appending documents moves NO existing document
  * between shards.
  *
  * Shape at 100 TB: assignment is a narrow projection; export is ONE
  * shuffle on shard_id, a within-partition sort (no global sort — shard
  * files need internal mixing, not cross-shard total order), and a
  * `partitionBy(shard_id)` write with `maxRecordsPerFile` bounding file
  * sizes. Shard counts should be sized so one shard ≈ one executor-task
  * worth of output.
  */
object Shard {

  val DefaultShards = 8

  /** Adds `_h` (the 60-bit doc hash, the within-shard mix order) and
    * `shard_id = _h mod numShards`. Narrow; no shuffle. */
  def assignShards(df: DataFrame, idCol: String,
                   numShards: Int = DefaultShards): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    df.withColumn("_h", Hashing.md5Long(col(idCol).cast("string")))
      .withColumn("shard_id", pmod(col("_h"), lit(numShards.toLong)))
  }

  /** Export `df` as `numShards` shard directories of parquet files, each
    * file capped at `maxRecordsPerFile` rows. One shuffle total. */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  numShards: Int = DefaultShards,
                  maxRecordsPerFile: Long = 1000000L): Unit = {
    assignShards(df, idCol, numShards)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("_h"), col(idCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard_id")
      .parquet(path)
  }

  // ------------------------------------------------- balanced shards

  /** SIZE-BALANCED sharding — the complement to [[assignShards]]' hash
    * assignment: hash sharding balances document COUNTS but lets token
    * mass skew (long documents concentrate by chance, and shard runtime
    * follows tokens, not docs). Here documents are ranked by size
    * descending and dealt round-robin — the classic LPT-style greedy in
    * its deterministic, engine-neutral form: every round hands each
    * shard one of the n largest remaining docs, so token mass stays
    * within a couple of max-document-sizes across shards, regardless of
    * the length distribution.
    *
    * The size rank is [[GlobalRank.globalRowNumber]] — range-partition +
    * per-partition sort + zipWithIndex offset stitch — so there is NO
    * single-partition window anywhere; the assignment after ranking is
    * a narrow modulo. Output: per-doc (doc_id, n_tokens, shard_id). */
  def balancedShards(docs: DataFrame,
                     numShards: Int = DefaultShards): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val sized = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " "))
          .cast("long").as("n_tokens"))
      .withColumn("_negsize", -col("n_tokens"))
    GlobalRank.globalRowNumber(sized, Seq("_negsize", "doc_id"), "_srank")
      .select(col("doc_id"), col("n_tokens"),
        pmod(col("_srank") - 1L, lit(numShards.toLong)).as("shard_id"))
  }

  // ----------------------------------------------------------------- query

  /** Shard manifest of the documents corpus: per shard, the doc count,
    * token total, and an order-independent XOR checksum of the doc
    * hashes (a 60-bit content fingerprint with no overflow and no
    * FP-order hazard). The oracle recomputes the same assignment — any
    * drift in hashing, modulo, or shard balance breaks the hash match. */
  def qShards(spark: SparkSession, dir: String): DataFrame =
    assignShards(Tables.load(spark, dir, "documents"), "doc_id")
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
          .as("n_tokens"),
        expr("bit_xor(_h)").as("checksum"))

  val qShardsSql: String = {
    val h = Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    s"""SELECT $h % $DefaultShards AS shard_id, count(*) AS n_docs,
       |       CAST(sum(len(string_split(coalesce(text, ''), ' ')))
       |            AS BIGINT) AS n_tokens,
       |       bit_xor($h) AS checksum
       |FROM documents GROUP BY 1""".stripMargin
  }

  /** Per-shard balance manifest: doc count, token mass, and the largest
    * member (rank 1..numShards land one per shard, so max_tokens also
    * pins the deal order). */
  def qBalanced(spark: SparkSession, dir: String): DataFrame =
    balancedShards(Tables.load(spark, dir, "documents"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  val qBalancedSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents WHERE doc_id IS NOT NULL),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS srank
       |  FROM t)
       |SELECT (srank - 1) % $DefaultShards AS shard_id,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       max(n_tokens) AS max_tokens
       |FROM r GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "export_shards" -> (qShards _),
    "shard_balanced" -> (qBalanced _))

  val oracleSql: Map[String, String] = Map(
    "export_shards" -> qShardsSql,
    "shard_balanced" -> qBalancedSql)
}
