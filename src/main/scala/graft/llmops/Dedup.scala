package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Hashing._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB case and oracle-checked at test scale:
  *
  *  - exact: hash-groupBy (one shuffle on a 128-bit digest; map-side combine)
  *  - n-gram Jaccard: shingle → inverted index self-join with a document-
  *    frequency cap on shingles (bounds the quadratic pair blowup — at scale
  *    the cap is what keeps the join from degenerating on stop-shingles)
  *  - MinHash + LSH: 128 permutations → 32 bands × 4 rows → bucket join →
  *    exact-Jaccard verification of candidates only (the classic
  *    shingle→minhash→band→bucket-join pipeline; candidate generation is
  *    O(n·bands), never O(n²))
  *  - SimHash: 60-bit weighted sign-fingerprint; near-dup pairs via 4×15-bit
  *    band buckets + Hamming verification
  *  - embedding cosine: normalized-vector pair join (brute force at test
  *    scale; the LSH-bucketed scale path lives in Similarity.scala)
  *
  * Every hash is the shared md5-derived 60-bit value (Hashing.md5Long), so
  * the DuckDB oracles replicate each pipeline bit-for-bit, including LSH
  * candidate generation.
  */
object Dedup {

  val NumHashes = 128
  val Bands = 32
  val RowsPerBand = 4
  val JaccardThreshold = 0.5
  val ShingleDfCap = 1000
  val SimhashBits = 60
  val SimhashBands = 4
  val HammingMax = 6
  val CosineThreshold = 0.4

  val seeds: IndexedSeq[(Long, Long)] = minhashSeeds(NumHashes)

  // ------------------------------------------------------------- exact dedup

  /** Exact dedup: keep the lowest id per content digest. Single shuffle on
    * md5(text); partial aggregation makes the reduce side tiny. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ----------------------------------------------------------- word shingles

  /** Distinct word-3-gram shingles per doc. `w[i]` is 0-based in Spark SQL;
    * the oracle uses 1-based list indexing — both produce triples 0..n-3. */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', w[i-1], w[i], w[i+1]))"))
        .as("s"))
      .distinct()

  val shinglesSql: String =
    """sh AS (
      |  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
      |  FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      |        WHERE len(words) >= 3))""".stripMargin

  // ------------------------------------------------------ exact n-gram Jaccard

  /** All-pairs exact Jaccard over shingles via inverted-index self-join.
    * Shingles with document frequency > dfCap are dropped BEFORE pair
    * generation (both sides of the oracle do the same), bounding the join
    * fan-out: a shingle appearing in k docs yields k² pair rows. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = JaccardThreshold,
                        dfCap: Int = ShingleDfCap): DataFrame = {
    val sh = shingles(docs).cache()
    val kept = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("s"))
    val shKept = sh.join(kept, Seq("s"))
    val sizes = shKept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = shKept.select(col("doc_id").as("doc_a"), col("s"))
    val b = shKept.select(col("doc_id").as("doc_b"), col("s"))
    val inter = a.join(b, Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def ngramOracleSql(threshold: Double = JaccardThreshold, dfCap: Int = ShingleDfCap): String =
    s"""WITH $shinglesSql,
       |kept AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $dfCap),
       |shk AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shk GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
       |FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
       |           JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= $threshold""".stripMargin

  // ------------------------------------------------------------ MinHash + LSH

  /** MinHash signatures: one groupBy computing all 128 mins in a single
    * pass (partial agg on the map side → the shuffle carries one row per
    * (doc, 128 longs), not per shingle). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val xs = shingles(docs)
      .select(col("doc_id"), (md5Long(col("s")) % P).as("x"))
    val aggs = seeds.zipWithIndex.map { case ((a, b), j) =>
      min((lit(a) * col("x") + lit(b)) % P).as(s"h$j")
    }
    xs.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band view: (doc_id, band, bucket) — bucket is the concat of the
    * band's r signature values. Equal bucket in ANY band → candidate. */
  def lshBands(sig: DataFrame): DataFrame = {
    val bandDfs = (0 until Bands).map { k =>
      val hs = (0 until RowsPerBand).map(r => col(s"h${k * RowsPerBand + r}"))
      sig.select(col("doc_id"), lit(k).as("band"),
        concat_ws("_", hs: _*).as("bucket"))
    }
    bandDfs.reduce(_.unionAll(_))
  }

  /** Full MinHash-LSH dedup: candidates from band buckets, then exact
    * Jaccard verification of candidates only. */
  def minhashDedupPairs(docs: DataFrame, threshold: Double = JaccardThreshold): DataFrame = {
    val cand = {
      val bands = lshBands(minhashSignatures(docs))
      val l = bands.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      val r = bands.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
      l.join(r, Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
    }
    ngramJaccardPairs(docs, threshold, dfCap = Int.MaxValue)
      .join(cand, Seq("doc_a", "doc_b"))
  }

  def minhashOracleSql(threshold: Double = JaccardThreshold): String = {
    val sigCols = seeds.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * x + $b) % $P) AS h$j"
    }.mkString(",\n           ")
    val bandRows = (0 until Bands).map { k =>
      val hs = (0 until RowsPerBand).map(r => s"h${k * RowsPerBand + r}")
      s"SELECT doc_id, $k AS band, concat_ws('_', ${hs.mkString(", ")}) AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shinglesSql,
       |xs AS (SELECT doc_id, ${md5LongSql("s")} % $P AS x FROM sh),
       |sig AS (SELECT doc_id,
       |           $sigCols
       |        FROM xs GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
       |         WHERE a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
       |       round(i.inter * 1.0 / (sa.n + sb.n - i.inter), 4) AS jaccard
       |FROM inter i
       |JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= $threshold""".stripMargin
  }

  // ---------------------------------------------------------------- SimHash

  /** 60-bit count-weighted SimHash per doc: explode words, one groupBy with
    * 60 signed-bit sums, then assemble the fingerprint. */
  def simhash(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), md5Long(col("word")).as("h"))
    val bitSums = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val fp = (0 until SimhashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    words.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  val simhashSqlCte: String = {
    val bitSums = (0 until SimhashBits).map { j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n           ")
    val fp = (0 until SimhashBits).map { j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""wh AS (SELECT doc_id, ${md5LongSql("w")} AS h
       |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
       |bits AS (SELECT doc_id,
       |           $bitSums
       |         FROM wh GROUP BY doc_id),
       |simhash AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  /** Near-dup pairs: equal 15-bit band → candidate → Hamming ≤ max. With 4
    * bands, any pair within Hamming 3 is guaranteed caught (pigeonhole);
    * up to HammingMax it's caught when the flips avoid one band. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = HammingMax): DataFrame = {
    val fp = simhash(docs)
    val bands = (0 until SimhashBands).map { k =>
      fp.select(col("doc_id"), col("simhash"), lit(k).as("band"),
        shiftright(col("simhash"), k * 15).bitwiseAND(0x7fff).as("bucket"))
    }.reduce(_.unionAll(_))
    val l = bands.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val r = bands.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  def simhashPairsSql(maxHamming: Int = HammingMax): String = {
    val bandRows = (0 until SimhashBands).map { k =>
      s"SELECT doc_id, simhash, $k AS band, (simhash >> ${k * 15}) & 32767 AS bucket FROM simhash"
    }.mkString("\n  UNION ALL ")
    s"""WITH $simhashSqlCte,
       |bands AS (
       |  $bandRows)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
       |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin
  }

  // ------------------------------------------------------- embedding cosine

  /** Pairwise cosine near-dup over an Array[Float] embedding column.
    * Brute-force O(n²) pair join is correct at test scale; at 100 TB use
    * the LSH-bucketed path (Similarity.lshTopK) for candidate generation.
    * Dot products fold left-to-right in double — same order as the oracle. */
  def embeddingPairs(emb: DataFrame, threshold: Double = CosineThreshold): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)")))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", round(expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)")
        / (col("na") * col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  def embeddingPairsSql(threshold: Double = CosineThreshold): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= $threshold""".stripMargin

  // ----------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s: SparkSession, d: String) =>
      exactDedup(Tables.load(s, d, "documents"), "doc_id", "text")),
    "dedup_ngram" -> ((s: SparkSession, d: String) =>
      ngramJaccardPairs(Tables.load(s, d, "documents"))),
    "dedup_minhash" -> ((s: SparkSession, d: String) =>
      minhashDedupPairs(Tables.load(s, d, "documents"))),
    "dedup_simhash" -> ((s: SparkSession, d: String) =>
      simhashPairs(Tables.load(s, d, "documents"))),
    "dedup_embed" -> ((s: SparkSession, d: String) =>
      embeddingPairs(Tables.load(s, d, "embeddings"))))

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_ngram" -> ngramOracleSql(),
    "dedup_minhash" -> minhashOracleSql(),
    "dedup_simhash" -> simhashPairsSql(),
    "dedup_embed" -> embeddingPairsSql())
}
