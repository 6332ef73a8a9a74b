package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Cross-lingual bitext candidate mining — margin-based alignment of
  * non-target-language documents to their most similar target-language
  * document in a shared embedding space (the Artetxe & Schwenk 2019
  * margin criterion, forward direction with an absolute floor): a
  * parallel-corpus candidate is a (src, tgt) pair whose cosine clears a
  * floor AND beats the src's SECOND-best target by a margin — absolute
  * cosine alone over-selects hubs; the margin demands a distinguished
  * match.
  *
  * Determinism: cosines are bit-identical cross-engine (shared
  * left-to-right dot folds), rounded to integer e4 units with
  * `floor(cos·10⁴ + 0.5)` on both sides; the margin is an exact integer
  * subtraction of those units, so the whole mining decision hash-gates.
  *
  * Shape: candidates come from the SHARED banded LSH signature kernel
  * ([[Similarity.simBandSigns]] — the same planes every sim_topk query
  * serves from), source side signs only non-target docs, target side
  * only target docs, so the join is (band, sig)-keyed — never an
  * all-pairs cross product; exact cosines touch candidate pairs only.
  * At 100 TB the signature tables are [[AnnIndex]]-style artifacts and
  * the mining pass is one keyed join per snapshot. */
object Bitext {

  /** (src_doc, src_lang, tgt_doc, cos_e4, margin_e4) for every
    * non-target doc whose best target candidate clears `minCosE4` with
    * a margin of at least `minMarginE4` over its second-best (a src
    * with exactly ONE candidate margins against 0 — maximally
    * distinguished). */
  def mineBitext(docs: DataFrame, emb: DataFrame, targetLang: String = "en",
                 minCosE4: Long = 3300L, minMarginE4: Long = 25L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val lang = docs.filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id").cast("long").as("vec_id"), col("lang"))
    val vecs = Similarity.typedVecs(emb).toDF("vec_id", "v")
      .join(lang, Seq("vec_id"))
    val bands = Similarity.simBandSigns
    val sigs = vecs.select(col("vec_id"), col("lang"), col("v"))
      .as[(Long, String, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, lg, v) =>
          Iterator.tabulate(bands.length)(b =>
            (id, lg, b, Kernels.lshSignature(v, bands(b))))
        }
      }.toDF("vec_id", "lang", "band", "sig")
    val cand = sigs.filter(col("lang") =!= targetLang).as("s")
      .join(sigs.filter(col("lang") === targetLang).as("t"),
        col("s.band") === col("t.band") && col("s.sig") === col("t.sig"))
      .select(col("s.vec_id").as("src_doc"), col("t.vec_id").as("tgt_doc"))
      .distinct()
    val scored = cand
      .join(vecs.select(col("vec_id").as("src_doc"), col("lang").as("src_lang"),
        col("v").as("sv")), Seq("src_doc"))
      .join(vecs.select(col("vec_id").as("tgt_doc"), col("v").as("tv")),
        Seq("tgt_doc"))
      .select(col("src_doc"), col("src_lang"), col("tgt_doc"),
        col("sv"), col("tv"))
      .as[(Long, String, Long, Array[Double], Array[Double])]
      .map { case (s, lg, t, sv, tv) =>
        (s, lg, t, Kernels.dot(sv, tv) / (Kernels.norm(sv) * Kernels.norm(tv)))
      }.toDF("src_doc", "src_lang", "tgt_doc", "cos")
    val ordered = Window.partitionBy(col("src_doc"))
      .orderBy(col("cos").desc, col("tgt_doc"))
    scored
      .withColumn("cos_e4", floor(col("cos") * 10000.0 + 0.5).cast("long"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("margin_e4",
        col("cos_e4") - coalesce(lead(col("cos_e4"), 1).over(ordered), lit(0L)))
      .filter(col("rn") === 1 && col("cos_e4") >= minCosE4 &&
        col("margin_e4") >= minMarginE4)
      .select(col("src_doc"), col("src_lang"), col("tgt_doc"),
        col("cos_e4"), col("margin_e4"))
  }

  // ----------------------------------------------------------------- query

  def qBitextMine(spark: SparkSession, dir: String): DataFrame =
    mineBitext(Tables.load(spark, dir, "documents"),
      Tables.load(spark, dir, "embeddings"))

  /** The identical banded candidate generation (shared signature
    * chains), exact-cosine ranking, and integer margin filter. */
  lazy val qBitextMineSql: String = {
    val sigCols = Similarity.simBandPlanes.zipWithIndex.map { case (ps, b) =>
      s"${Similarity.signatureSqlFor(ps, "v")} AS s$b"
    }.mkString(",\n         ")
    val bandRows = Similarity.simBandPlanes.indices.map { b =>
      s"SELECT vec_id, lang, s$b AS sig, $b AS band FROM n"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, d.lang
       |  FROM embeddings
       |  JOIN documents d ON d.doc_id = embeddings.vec_id
       |  WHERE ${Similarity.vecFilterSql} AND d.lang IS NOT NULL),
       |n AS MATERIALIZED (
       |  SELECT vec_id, lang, v,
       |         $sigCols
       |  FROM e),
       |bands AS MATERIALIZED (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT s.vec_id AS src_doc, t.vec_id AS tgt_doc
       |  FROM bands s JOIN bands t ON s.band = t.band AND s.sig = t.sig
       |  WHERE s.lang <> 'en' AND t.lang = 'en'),
       |scored AS (
       |  SELECT c.src_doc, sv.lang AS src_lang, c.tgt_doc,
       |         CAST(floor(list_dot_product(sv.v, tv.v)
       |           / (sqrt(list_dot_product(sv.v, sv.v))
       |              * sqrt(list_dot_product(tv.v, tv.v)))
       |           * 10000.0 + 0.5) AS BIGINT) AS cos_e4,
       |         list_dot_product(sv.v, tv.v)
       |           / (sqrt(list_dot_product(sv.v, sv.v))
       |              * sqrt(list_dot_product(tv.v, tv.v))) AS cos
       |  FROM cand c
       |  JOIN n sv ON sv.vec_id = c.src_doc
       |  JOIN n tv ON tv.vec_id = c.tgt_doc),
       |ranked AS (
       |  SELECT src_doc, src_lang, tgt_doc, cos_e4,
       |         row_number() OVER (PARTITION BY src_doc
       |                            ORDER BY cos DESC, tgt_doc) AS rn,
       |         cos_e4 - coalesce(lead(cos_e4, 1) OVER (
       |             PARTITION BY src_doc ORDER BY cos DESC, tgt_doc), 0)
       |           AS margin_e4
       |  FROM scored)
       |SELECT src_doc, src_lang, tgt_doc, cos_e4, margin_e4
       |FROM ranked
       |WHERE rn = 1 AND cos_e4 >= 3300 AND margin_e4 >= 25""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitext_mine" -> (qBitextMine _))

  val oracleSql: Map[String, String] = Map(
    "bitext_mine" -> qBitextMineSql)
}
