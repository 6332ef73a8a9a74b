package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PII redaction — the scrubbing pass every training-data pipeline runs
  * before export: find emails / IPv4 addresses / phone-shaped spans and
  * replace them with typed placeholder tags, counting what was removed.
  *
  * Shape at 100 TB: a pure narrow per-row transform — three codegen'd
  * `regexp_replace`/`regexp_count` passes, zero shuffles, scales linearly
  * with input splits. The regexes stay in the RE2 ∩ java.util.regex
  * common subset (no lookaround, no backrefs) so the DuckDB oracle runs
  * the *same* patterns and the redacted text hashes bit-identically.
  *
  * Redaction is sequential (emails → IPs → phones), each pattern counted
  * on the text as left by the previous pass, so a numeric span inside an
  * email never double-counts as an IP.
  */
object Redact {

  /** RFC-casual email matcher (common RE2/Java subset). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no octet range check — scrubbing
    * favors recall over precision). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-ish `[+]ddd[- ]ddd[- ]dddd` phone shape. */
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Redact PII from `textCol`, appending counts per category and the
    * scrubbed text. Narrow; no shuffle. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val afterEmail = regexp_replace(t0, EmailRe, EmailTag)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, IpTag)
    val afterPhone = regexp_replace(afterIp, PhoneRe, PhoneTag)
    df.withColumn("n_emails", regexp_count(t0, lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)).cast("long"))
      .withColumn("redacted", afterPhone)
  }

  // ----------------------------------------------------------------- query

  /** The fixture corpus is synthetic word soup with no organic PII, so the
    * query plants PII deterministically from fixture columns (source →
    * email, doc_id → IP octets / phone digits) and then proves the scrub
    * removed it: counts per category plus the md5 of the scrubbed text.
    * Both engines build the identical augmented column, so the oracle is
    * non-vacuous — every row has ≥1 redaction of each type. */
  private def augmented: Column =
    concat(col("text"), lit(" reach "), col("source"), lit("@ex.com at 10."),
      (col("doc_id") % 256).cast("string"), lit(".0."),
      (col("doc_id") % 250).cast("string"), lit(" or 555-123-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  def qRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    redactPii(docs.select(col("doc_id"), augmented.as("t")), "t")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        md5(col("redacted")).as("redacted_md5"),
        length(col("redacted")).cast("long").as("redacted_len"))
  }

  val qRedactSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         text || ' reach ' || source || '@ex.com at 10.' ||
       |         (doc_id % 256) || '.0.' || (doc_id % 250) || ' or 555-123-' ||
       |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents),
       |e AS (SELECT doc_id,
       |             len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
       |             regexp_replace(t, '$EmailRe', '$EmailTag', 'g') AS t
       |      FROM aug),
       |i AS (SELECT doc_id, n_emails,
       |             len(regexp_extract_all(t, '$Ipv4Re')) AS n_ips,
       |             regexp_replace(t, '$Ipv4Re', '$IpTag', 'g') AS t
       |      FROM e),
       |p AS (SELECT doc_id, n_emails, n_ips,
       |             len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
       |             regexp_replace(t, '$PhoneRe', '$PhoneTag', 'g') AS t
       |      FROM i)
       |SELECT doc_id, n_emails, n_ips, n_phones,
       |       md5(t) AS redacted_md5, length(t) AS redacted_len
       |FROM p""".stripMargin

  // ------------------------------------------------------------ k-anonymity

  /** k-anonymity audit (Sweeney 2002) — the re-identification screen a
    * dataset needs before release: every combination of quasi-identifier
    * values whose equivalence class holds FEWER than k rows is a
    * re-identification risk (an attacker who knows those attributes
    * pins the row to < k candidates). Output: the violating classes with
    * their sizes, smallest first — the worklist a generalization/
    * suppression pass consumes.
    *
    * Shape at 100 TB: ONE map-side-combined groupBy on the QI tuple
    * (output is class-count-sized, not row-sized) + a size filter.
    * That's the entire audit — it composes with [[redactPii]] (free-text
    * PII) to cover both structured and unstructured leakage. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Audit the customer dimension under (market segment, nation,
    * balance bracket) — the classic demographic-style QI triple. */
  def qKanon(spark: SparkSession, dir: String): DataFrame =
    kAnonymityAudit(Tables.load(spark, dir, "customer"),
      Seq(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_bracket")),
      k = 5)

  val qKanonSql: String =
    """SELECT c_mktsegment AS segment, c_nationkey AS nation,
      |       CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bracket,
      |       count(*) AS n
      |FROM customer
      |GROUP BY 1, 2, 3
      |HAVING count(*) < 5""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_redact" -> (qRedact _),
    "privacy_kanon" -> (qKanon _))

  val oracleSql: Map[String, String] = Map(
    "pii_redact" -> qRedactSql,
    "privacy_kanon" -> qKanonSql)
}
