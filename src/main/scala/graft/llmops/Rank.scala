package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** BM25-family ranked retrieval over the corpus — "which documents best
  * match this term set", the relevance scorer behind retrieval-augmented
  * data curation (finding seed-similar documents to upsample) and
  * eval-set mining.
  *
  * Scoring is Robertson/Okapi BM25 with one deliberate change: the idf
  * factor is the RAW odds ratio `(N - df + 0.5) / (df + 0.5)`, not its
  * logarithm. Per-term it is a strictly monotone transform (log is
  * increasing), cross-engine `ln()` is not bit-reproducible (the repo
  * rule since [[CorpusStats.distinctiveKeywords]]), and the exact BM25
  * constant rarely matters next to tf saturation. The tf side is the
  * standard saturation `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
  * with k1 = 1.2, b = 0.75.
  *
  * Scores aggregate ORDER-FREE: each (doc, term) contribution is floored
  * to integer MICRO-units and the per-doc score is an exact integer sum
  * — the same trick as the HLL harmonic sum ([[graft.operators.Sketch]]),
  * so the unordered shuffle combine cannot produce float drift and the
  * oracle hash-matches. Each contribution's expression tree is written
  * identically on both engines (IEEE ops on identical inputs in an
  * identical order are bit-identical; only REORDERED float sums drift).
  *
  * Shape at 100 TB:
  *  - the query-term filter is an `isin` LITERAL predicate applied at the
  *    token explode — no join; the corpus shrinks to rows containing
  *    query terms before anything shuffles;
  *  - `dl` (doc length) is a NARROW `size(split(…))` per row — never a
  *    corpus-wide aggregation;
  *  - `df` per term and the (N, Σdl) corpus scalars are term-count-sized
  *    and 1-row aggregates, broadcast back;
  *  - one real shuffle: tf's `groupBy(doc, term)`; the final per-doc sum
  *    rides a second, already-tiny shuffle; the top-k is
  *    `TakeOrderedAndProject` (per-partition heaps + driver merge of k
  *    rows), never a global sort.
  *
  * Corpus scalars (N, avgdl) are corpus-version constants at production
  * scale — compute once per snapshot and reuse across queries; here they
  * ride the same plan for self-containment.
  */
object Rank {

  /** tf saturation / length normalization (classic Okapi defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Score scale: contributions floor to 1e-6 units. */
  private val Micro = 1e6

  /** Top-k BM25(-idf-ratio) scoring of `docs` against `terms`.
    * Output: (doc_id, score_micros, n_hit) — integer micro-unit score,
    * number of distinct query terms present. Ties break by doc_id. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    // corpus contract: the scored corpus is the docs WITH text (pinned
    // in the oracle) — null-text docs would only pad n_docs/avgdl with
    // empty-token noise, and the raw-column guard pushes to the scan
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("words"))
      .withColumn("dl", size(col("words")).cast("long"))
    val scalars = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("words")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df")) // (doc, term) rows are distinct per doc
    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl))
    tf.join(broadcast(df_), Seq("token"))
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        floor(idf * tfn * lit(Micro)).as("m"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("score_micros"), count(lit(1)).as("n_hit"))
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(k)
  }

  // ----------------------------------------------------------------- query

  /** The fixture query: three vocabulary terms, top 100 documents. */
  val QueryTerms: Seq[String] = Seq("spark", "merge", "window")
  val TopK = 100

  def qBm25(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.load(spark, dir, "documents"), QueryTerms, TopK)

  /** Float literals in e-notation (DuckDB parses `1.2` as DECIMAL and
    * the arithmetic changes domain); every parenthesis mirrors the Spark
    * Column tree above so the per-row IEEE op sequence is identical. */
  val qBm25Sql: String = {
    val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS words
       |  FROM documents WHERE text IS NOT NULL),
       |d AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM base),
       |s AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl
       |      FROM d),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, token, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(words) AS token FROM base)
       |  WHERE token IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |c AS (SELECT tf.doc_id,
       |             CAST(floor(((s.n_docs - df.df + 5e-1) / (df.df + 5e-1))
       |               * ((tf.tf * 2.2e0)
       |                  / (tf.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * d.dl
       |                       / (CAST(s.tot_dl AS DOUBLE) / s.n_docs))))
       |               * 1e6) AS BIGINT) AS m
       |      FROM tf JOIN df USING (token) JOIN d USING (doc_id)
       |           CROSS JOIN s)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micros,
       |       count(*) AS n_hit
       |FROM c GROUP BY 1
       |ORDER BY score_micros DESC, doc_id LIMIT $TopK""".stripMargin
  }

  // ---------------------------------------------------- hybrid RRF fusion

  /** Reciprocal-rank-fusion constant (the standard 60 of Cormack et al.
    * 2009) and the fused result width. The width must not exceed
    * [[Similarity.TopK]]: the oracle's semantic arm nests the
    * brute-force oracle, which truncates at that rank — a wider fused
    * set would fuse engine-side ranks the oracle can never see. */
  val RrfK = 60
  val HybridTopK = 10
  require(HybridTopK <= Similarity.TopK,
    s"HybridTopK ($HybridTopK) must be <= Similarity.TopK " +
      s"(${Similarity.TopK}) — the nested brute-force oracle truncates there")

  /** Lexical top-k per query document: rank corpus documents by shingle
    * Jaccard against the query doc's distinct 3-gram shingle set. The
    * query sets broadcast from one capped collect; the corpus side is a
    * SINGLE narrow kernel pass (sorted-array intersection per query —
    * [[Kernels.sortedIntersectionSize]]), no join, no corpus shuffle;
    * only the per-query rank window shuffles candidate rows (Jaccard >
    * 0 survivors). */
  private[llmops] def lexicalTopK(docs: DataFrame,
                                  isQuery: org.apache.spark.sql.Column,
                                  k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sets = Dedup.shingleHashSets(docs)
    val cap = Similarity.MaxDriverRows
    val qRows = sets.filter(isQuery).as[(Long, Array[Long])]
      .limit(cap + 1).collect()
    require(qRows.length <= cap,
      s"hybrid query set exceeds the $cap-row driver cap — it must stay " +
        "a query batch, not a corpus")
    val bc = spark.sparkContext.broadcast(qRows)
    val scored = sets.filter(!isQuery).as[(Long, Array[Long])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (id, hs) =>
          qs.iterator.flatMap { case (qid, qh) =>
            val inter = Kernels.sortedIntersectionSize(qh, hs)
            if (inter == 0) None
            else Some((qid, id, inter.toLong,
              qh.length.toLong + hs.length - inter))
          }
        }
      }.toDF("query_id", "id", "inter", "un")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy((col("inter").cast("double") / col("un")).desc, col("id"))
    scored.withColumn("r_lex", row_number().over(w).cast("long"))
      .filter(col("r_lex") <= k)
      .select(col("query_id"), col("id"), col("r_lex"))
  }

  /** Hybrid lexical + semantic retrieval with reciprocal-rank fusion —
    * the standard retrieval-ensemble shape (keyword/BM25 arm ∪ vector
    * arm, fused by Σ 1/(K + rank)): each arm ranks independently, RRF
    * rewards documents BOTH arms surface without comparing their
    * incommensurable scores. Contributions floor to integer micro-units
    * (`1e6 div (K + rank)`), so the fused score is an exact integer on
    * any engine — the [[bm25TopK]] discipline.
    *
    * The fixture convention `vec_id = doc_id` links the arms (one id
    * space); a production deployment feeds any two ranked (query, id)
    * frames — the fusion is rank-only. Shape: two independent arm
    * passes (each its own operator's plan), a full-outer join on
    * query-sized top-k frames, one rank window. */
  def hybridTopK(docs: DataFrame, emb: DataFrame,
                 isQueryDoc: org.apache.spark.sql.Column,
                 isQueryVec: org.apache.spark.sql.Column,
                 k: Int = HybridTopK): DataFrame = {
    val lex = lexicalTopK(docs, isQueryDoc, k)
    val sem = Similarity.bruteForceTopK(emb, isQueryVec, k)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("rank").cast("long").as("r_sem"))
    val rrf =
      coalesce(expr(s"1000000L div ($RrfK + r_lex)"), lit(0L)) +
        coalesce(expr(s"1000000L div ($RrfK + r_sem)"), lit(0L))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("rrf_micros").desc, col("id"))
    lex.join(sem, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf_micros", rrf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("rank"), col("rrf_micros"),
        col("r_lex"), col("r_sem"))
  }

  def qHybrid(spark: SparkSession, dir: String): DataFrame =
    hybridTopK(Tables.load(spark, dir, "documents"),
      Tables.load(spark, dir, "embeddings"),
      col("doc_id") < 10, expr(Similarity.isQuerySql))

  /** Lexical arm over the shared 60-bit shingle hash domain, semantic
    * arm = the brute-force rank contract, fusion in exact integer
    * micro-units. */
  lazy val qHybridSql: String =
    s"""WITH sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |         ${graft.llmops.Hashing.md5LongSql(
             "words[i] || ' ' || words[i+1] || ' ' || words[i+2]")} AS h
       |  FROM (SELECT doc_id, words,
       |               unnest(generate_series(1, len(words) - 2)) AS i
       |        FROM (SELECT doc_id, string_split(text, ' ') AS words
       |              FROM documents
       |              WHERE doc_id IS NOT NULL AND text IS NOT NULL)
       |        WHERE len(words) >= 3)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |ix AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS id, count(*) AS inter
       |  FROM sh q JOIN sh c USING (h)
       |  WHERE q.doc_id < 10 AND NOT (c.doc_id < 10)
       |  GROUP BY 1, 2),
       |lex AS MATERIALIZED (
       |  SELECT query_id, id, r_lex FROM (
       |    SELECT ix.query_id, ix.id,
       |           CAST(row_number() OVER (PARTITION BY ix.query_id
       |             ORDER BY ix.inter * 1.0 / (sq.n + sc.n - ix.inter) DESC,
       |                      ix.id) AS BIGINT) AS r_lex
       |    FROM ix JOIN sizes sq ON sq.doc_id = ix.query_id
       |            JOIN sizes sc ON sc.doc_id = ix.id)
       |  WHERE r_lex <= $HybridTopK),
       |sem AS MATERIALIZED (
       |  SELECT query_id, neighbor_id AS id, CAST(rank AS BIGINT) AS r_sem
       |  FROM (${Similarity.qBruteForceSql})
       |  WHERE rank <= $HybridTopK),
       |f AS (
       |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |         coalesce(l.id, s.id) AS id, l.r_lex, s.r_sem,
       |         coalesce(1000000 // ($RrfK + l.r_lex), 0)
       |           + coalesce(1000000 // ($RrfK + s.r_sem), 0) AS rrf_micros
       |  FROM lex l FULL JOIN sem s
       |       ON s.query_id = l.query_id AND s.id = l.id)
       |SELECT query_id, id,
       |       CAST(row_number() OVER (PARTITION BY query_id
       |         ORDER BY rrf_micros DESC, id) AS BIGINT) AS rank,
       |       CAST(rrf_micros AS BIGINT) AS rrf_micros, r_lex, r_sem
       |FROM f
       |QUALIFY rank <= $HybridTopK""".stripMargin

  // ------------------------------------------- RM3 pseudo-relevance feedback

  /** RM3 parameters: feedback depth, expansion width, and the integer
    * interpolation weights (original terms count double — the λ≈2/3 mix,
    * kept in exact integers so no engine ever touches a float λ). */
  val FbDocs = 10
  val ExpTerms = 5
  val OrigWeight = 2L
  val ExpWeight = 1L

  /** BM25 with RM3-style pseudo-relevance feedback (Lavrenko & Croft
    * 2001; the Anserini/Indri default expansion): run the base query,
    * treat the top [[FbDocs]] documents as relevant, mine [[ExpTerms]]
    * expansion terms from them, and re-score with the expanded term set
    * — original terms at [[OrigWeight]], expansions at [[ExpWeight]].
    *
    * Expansion-term weight is the relevance-model estimate pinned to
    * integers: `w(t) = Σ_d (tf(t,d) · score_d) div dl_d` over feedback
    * docs — term mass weighted by the doc's own retrieval score,
    * length-normalized, each step an exact integer op so both engines
    * pick the SAME terms. Candidates must hit ≥ 2 feedback docs (a
    * one-doc term is noise, the standard guard) and pass a stopword
    * screen (`2·df_corpus ≤ N` — a term in over half the corpus carries
    * no relevance signal, only score mass).
    *
    * Driver collects are query-sized by construction: [[FbDocs]] rows
    * after pass 1 and [[ExpTerms]] rows of mined terms — the same
    * contract as [[lexicalTopK]]'s capped query batch, never the corpus.
    * Corpus-scale work is three narrow passes (pass-1 isin-filtered
    * explode, candidate df count, pass-2 isin-filtered explode), each
    * map-side combined; feedback-doc term mining touches [[FbDocs]]
    * documents. */
  def rm3TopK(docs: DataFrame, terms: Seq[String], k: Int,
              fbDocs: Int = FbDocs, expTerms: Int = ExpTerms): DataFrame = {
    require(terms.nonEmpty, "rm3TopK needs at least one query term")
    // pass 1: plain BM25, feedback set = top fbDocs (query-sized collect)
    val fb = bm25TopK(docs, terms, fbDocs)
      .select(col("doc_id"), col("score_micros")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fbIds = fb.keys.toSeq.sorted
    // corpus contract: the scored corpus is the docs WITH text (pinned
    // in the oracle) — null-text docs would only pad n_docs/avgdl with
    // empty-token noise, and the raw-column guard pushes to the scan
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("words"))
      .withColumn("dl", size(col("words")).cast("long"))
    val nDocs = base.count()
    // relevance-model term mining over the fbDocs feedback documents
    val scoreCol = fb.foldLeft(lit(0L)) { case (acc, (id, s)) =>
      when(col("doc_id") === id, lit(s)).otherwise(acc)
    }
    val fbTf = base.filter(col("doc_id").isin(fbIds: _*))
      .select(col("doc_id"), col("dl"), explode(col("words")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("score", scoreCol)
    val cand = fbTf
      .groupBy(col("token"))
      .agg(sum(expr("(tf * score) div dl")).as("w"),
        count(lit(1)).as("df_fb"))
      .filter(col("df_fb") >= 2 && !col("token").isin(terms: _*))
    // stopword screen: corpus df for the candidate vocabulary only
    val candTokens = cand.select(col("token"))
    val dfC = base
      .select(col("doc_id"), explode(col("words")).as("token"))
      .join(broadcast(candTokens), Seq("token"))
      .distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df_c"))
    val mined = cand.join(broadcast(dfC), Seq("token"))
      .filter(col("df_c") * 2 <= lit(nDocs))
      .orderBy(col("w").desc, col("token"))
      .limit(expTerms)
      .select(col("token")).collect().map(_.getString(0)).toSeq
    // pass 2: weighted BM25 over the expanded term set
    val allTerms = terms ++ mined
    val scalars = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("words")).as("token"))
      .filter(col("token").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfn = (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl))
    val wt = when(col("token").isin(terms: _*), lit(OrigWeight))
      .otherwise(lit(ExpWeight))
    tf.join(broadcast(df_), Seq("token"))
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"),
        (floor(idf * tfn * lit(Micro)) * wt).as("m"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("score_micros"), count(lit(1)).as("n_hit"))
      .orderBy(col("score_micros").desc, col("doc_id"))
      .limit(k)
  }

  def qRm3(spark: SparkSession, dir: String): DataFrame =
    rm3TopK(Tables.load(spark, dir, "documents"), QueryTerms, TopK)

  /** The whole three-stage derivation restated in SQL: pass-1 scores,
    * feedback top-[[FbDocs]], integer relevance-model mining with the
    * df screen, weighted pass-2. Every stage is integer-pinned, so the
    * two engines must pick the SAME feedback docs, the SAME expansion
    * terms, and the SAME final ranking. */
  lazy val qRm3Sql: String = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS words
       |  FROM documents WHERE text IS NOT NULL),
       |d AS MATERIALIZED (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM base),
       |s AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl
       |      FROM d),
       |toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(words) AS token FROM base),
       |tf0 AS (
       |  SELECT t.doc_id, t.token, count(*) AS tf
       |  FROM toks t WHERE t.token IN ($termList) GROUP BY 1, 2),
       |df0 AS (SELECT token, count(*) AS df FROM tf0 GROUP BY 1),
       |c0 AS (
       |  SELECT tf0.doc_id,
       |         CAST(floor(((s.n_docs - df0.df + 5e-1) / (df0.df + 5e-1))
       |           * ((tf0.tf * 2.2e0)
       |              / (tf0.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * d.dl
       |                   / (CAST(s.tot_dl AS DOUBLE) / s.n_docs))))
       |           * 1e6) AS BIGINT) AS m
       |  FROM tf0 JOIN df0 USING (token) JOIN d USING (doc_id)
       |       CROSS JOIN s),
       |fb AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micros
       |  FROM c0 GROUP BY 1
       |  ORDER BY score_micros DESC, doc_id LIMIT $FbDocs),
       |fbtf AS (
       |  SELECT t.token, t.doc_id, d.dl, fb.score_micros, count(*) AS tf
       |  FROM toks t JOIN fb USING (doc_id) JOIN d ON d.doc_id = t.doc_id
       |  WHERE t.token <> '' GROUP BY 1, 2, 3, 4),
       |cand AS (
       |  SELECT token, CAST(sum((tf * score_micros) // dl) AS BIGINT) AS w,
       |         count(*) AS df_fb
       |  FROM fbtf GROUP BY 1
       |  HAVING count(*) >= 2 AND token NOT IN ($termList)),
       |dfc AS (
       |  SELECT token, count(*) AS df_c
       |  FROM (SELECT DISTINCT doc_id, token FROM toks
       |        WHERE token IN (SELECT token FROM cand))
       |  GROUP BY 1),
       |mined AS MATERIALIZED (
       |  SELECT cand.token FROM cand JOIN dfc USING (token) CROSS JOIN s
       |  WHERE dfc.df_c * 2 <= s.n_docs
       |  ORDER BY cand.w DESC, cand.token LIMIT $ExpTerms),
       |terms AS (SELECT unnest([$termList]) AS token, $OrigWeight AS wt
       |          UNION ALL SELECT token, $ExpWeight FROM mined),
       |tf1 AS (
       |  SELECT t.doc_id, t.token, count(*) AS tf
       |  FROM toks t WHERE t.token IN (SELECT token FROM terms)
       |  GROUP BY 1, 2),
       |df1 AS (SELECT token, count(*) AS df FROM tf1 GROUP BY 1),
       |c1 AS (
       |  SELECT tf1.doc_id,
       |         CAST(floor(((s.n_docs - df1.df + 5e-1) / (df1.df + 5e-1))
       |           * ((tf1.tf * 2.2e0)
       |              / (tf1.tf + 1.2e0 * (2.5e-1 + 7.5e-1 * d.dl
       |                   / (CAST(s.tot_dl AS DOUBLE) / s.n_docs))))
       |           * 1e6) AS BIGINT) * terms.wt AS m
       |  FROM tf1 JOIN df1 USING (token) JOIN d USING (doc_id)
       |       JOIN terms ON terms.token = tf1.token CROSS JOIN s)
       |SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micros,
       |       count(*) AS n_hit
       |FROM c1 GROUP BY 1
       |ORDER BY score_micros DESC, doc_id LIMIT $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rank_bm25" -> (qBm25 _),
    "rank_hybrid_rrf" -> (qHybrid _),
    "rank_rm3" -> (qRm3 _))

  val oracleSql: Map[String, String] = Map(
    "rank_bm25" -> qBm25Sql,
    "rank_hybrid_rrf" -> qHybridSql,
    "rank_rm3" -> qRm3Sql)
}
