package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.Hashing

/** Skew-salted equi-join — the escape hatch for the join AQE can't save:
  * a hot key whose rows land on one shuffle partition and run 100× the
  * median task. Salting rewrites `fact ⋈ dim ON key` as
  * `fact ⋈ dim' ON (key, salt)` where the fact side takes a
  * DETERMINISTIC salt from its row identity and the dim side replicates
  * each row once per salt value — the hot key's rows now spread over
  * `nSalts` partitions, at the price of an `nSalts`× blowup of the
  * (smaller) replicated side.
  *
  * When to reach for it instead of the built-ins, in preference order:
  * a dim that FITS in memory should `broadcast()` (no shuffle at all);
  * a sort-merge join under AQE gets runtime skew-splitting for free
  * (`spark.sql.adaptive.skewJoin`). Salting covers the remainder: the
  * dim too big to broadcast but too small to dominate, joined to a fact
  * with known-hot keys — and, unlike AQE's runtime split, the salted
  * layout is PLANNABLE: downstream per-(key, salt) partial aggregates
  * reuse the partitioning the join just paid for.
  *
  * Multiplicity is preserved exactly (each dim row appears once per
  * salt; each fact row carries one salt), so the result set is
  * row-for-row the unsalted inner join's — the oracle states it as the
  * plain join. The salt never leaves the operator.
  *
  * The join is pinned to a shuffled hash join (`shuffle_hash` hint):
  * sort-merge would re-sort `nSalts`× replicated dim rows for no
  * benefit, and a broadcast of dim' would defeat the point — if dim
  * broadcasts, you didn't need salting.
  */
object SaltedJoin {

  val DefaultSalts = 16

  /** Inner-join `fact ⋈ dim` on `keys`, salted `nSalts` ways. `idCols`
    * name the fact columns whose values identify a row (the salt hash
    * input — any stable identity works; uniqueness is NOT required,
    * identical ids simply share a salt). All `keys` and `idCols` must
    * exist on their respective sides; dim columns may not collide with
    * fact columns beyond the keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 idCols: Seq[String], nSalts: Int = DefaultSalts): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    require(idCols.nonEmpty, "saltedJoin needs identity columns to salt on")
    require(nSalts >= 2, s"nSalts must be >= 2, got $nSalts")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "column name _salt is reserved by saltedJoin")
    val collide = fact.columns.toSet.intersect(dim.columns.toSet) -- keys
    require(collide.isEmpty,
      s"non-key columns ${collide.toSeq.sorted} appear on both sides — " +
        "rename one side before joining (output would be ambiguous)")
    val salted = fact.withColumn("_salt",
      (Hashing.md5Long(concat_ws(":", idCols.map(c => col(c).cast("string")): _*))
        % nSalts).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(lit((0 until nSalts).toArray)))
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_salt")
      .drop("_salt")
  }

  // ----------------------------------------------------------------- query

  /** Enrich every event with its user's profile (first active day, event
    * count) — the classic hot-user fact-dim join, salted 16 ways. The
    * profile is derived from a second scan so the fixture needs no extra
    * table; at warehouse scale it is a stored dim. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull)
    val dim = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("first_day"),
        count(lit(1)).as("user_n"))
    saltedJoin(fact, dim, keys = Seq("user_id"), idCols = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("first_day"), col("user_n"))
  }

  val qSaltedJoinSql: String =
    """WITH d AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
      |                  count(*) AS user_n
      |           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      |SELECT e.event_id, e.user_id, e.event_type, d.first_day, d.user_n
      |FROM events e JOIN d USING (user_id)
      |WHERE e.user_id IS NOT NULL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_salted_join" -> (qSaltedJoin _))

  val oracleSql: Map[String, String] = Map(
    "q43_salted_join" -> qSaltedJoinSql)
}
