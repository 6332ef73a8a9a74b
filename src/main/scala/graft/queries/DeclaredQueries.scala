package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** SURVEY.md §2.9 declared queries Q1-Q11 — the oracle-checked distillation
  * of the reference's relational semantics (amedia/dbtwiz delegates execution
  * to BigQuery; these pin the warehouse-layer surface on Spark).
  *
  * Each query is a declarative DataFrame program (Catalyst optimizes:
  * filter/projection pushdown to the Parquet scan, broadcast joins for the
  * metadata-sized sides, partial aggregation). Paired `oracleSql` entries are
  * ANSI SQL for DuckDB over the same tables; all aggregate/computed columns
  * carry identical aliases on both sides (driver hashes columns by name).
  *
  * Determinism notes:
  *  - doubles that pass through non-deterministically-ordered sums are
  *    `round(_, 2..4)`;
  *  - list aggregations are sorted (`array_sort` vs `ORDER BY` in string_agg);
  *  - window orderings carry a unique tiebreak column.
  */
object DeclaredQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------------
  // Q1 — information-schema pattern (reference: dbtwiz/admin/cleanup.py:64-77)
  // left join + NOT LIKE filter + null-or-compare predicate + groupBy +
  // sorted list-agg. customer≈TABLES, nation≈TABLE_OPTIONS (metadata-sized
  // right side → broadcast hash join).
  // ---------------------------------------------------------------------
  def q1Infoschema(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n),
        c("c_nationkey") === n("n_nationkey") && n("n_name").like("A%"), "left")
      .filter(!c("c_name").like("%9%") &&
        (n("n_name").isNull || c("c_acctbal") > 100.0))
      .groupBy(c("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_tables"),
        array_join(array_sort(collect_list(c("c_name"))), ",").as("tables"))
  }

  val q1Sql: String =
    """SELECT c_mktsegment AS segment, count(*) AS n_tables,
      |       string_agg(c_name, ',' ORDER BY c_name) AS tables
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_name LIKE 'A%'
      |WHERE c.c_name NOT LIKE '%9%' AND (n.n_name IS NULL OR c.c_acctbal > 100.0)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q2 — orphan detection anti-join (reference: dbtwiz/admin/cleanup.py:89-101)
  // warehouse-side rows absent from the manifest-side set → left_anti.
  // ---------------------------------------------------------------------
  def q2Orphans(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val manifest = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    o.join(broadcast(manifest), o("o_custkey") === manifest("c_custkey"), "left_anti")
      .groupBy(o("o_custkey").as("orphan_custkey"))
      .agg(count(lit(1)).as("n_orphaned"),
        round(sum(o("o_totalprice")), 2).as("total"))
  }

  val q2Sql: String =
    """SELECT o_custkey AS orphan_custkey, count(*) AS n_orphaned,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q3 — grants full-outer diff (reference: dbtwiz/admin/grants.py:260-292)
  // desired vs current members per key → needs_granting / needs_revoking.
  // ---------------------------------------------------------------------
  def q3GrantsDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val desired = c.filter(col("c_acctbal") > 5000)
      .select(col("c_nationkey").as("k"), col("c_custkey").as("m"))
    val current = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("k2"), col("c_custkey").as("m2"))
    desired.join(current,
        desired("k") === current("k2") && desired("m") === current("m2"),
        "full_outer")
      .groupBy(coalesce(col("k"), col("k2")).as("k"))
      .agg(
        count(when(col("m2").isNull, 1)).as("needs_grant"),
        count(when(col("m").isNull, 1)).as("needs_revoke"))
  }

  val q3Sql: String =
    """WITH desired AS (SELECT c_nationkey AS k, c_custkey AS m FROM customer WHERE c_acctbal > 5000),
      |     curr AS (SELECT c_nationkey AS k, c_custkey AS m FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT coalesce(d.k, c.k) AS k,
      |       count(CASE WHEN c.m IS NULL THEN 1 END) AS needs_grant,
      |       count(CASE WHEN d.m IS NULL THEN 1 END) AS needs_revoke
      |FROM desired d FULL OUTER JOIN curr c ON d.k = c.k AND d.m = c.m
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q4 — suffix-match theta join (reference: dbtwiz/admin/cleanup.py:209-219:
  // orphan table matched to deleted file when name==t OR name endswith "__"+t).
  // Small right side → broadcast nested-loop join, the correct physical plan
  // for an OR-of-predicates theta join.
  // ---------------------------------------------------------------------
  def q4SuffixMatch(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val deleted = p.filter(col("p_size") > 45)
      .select(element_at(split(col("p_name"), " "), 2).as("suffix"))
      .distinct()
    p.join(broadcast(deleted),
        p("p_name") === deleted("suffix") ||
          p("p_name").endsWith(concat(lit(" "), deleted("suffix"))))
      .groupBy(col("suffix"))
      .agg(count(lit(1)).as("n_matched"), min(col("p_partkey")).as("min_key"))
  }

  val q4Sql: String =
    """WITH deleted AS (SELECT DISTINCT split_part(p_name, ' ', 2) AS suffix
      |                 FROM part WHERE p_size > 45)
      |SELECT d.suffix AS suffix, count(*) AS n_matched, min(p.p_partkey) AS min_key
      |FROM part p JOIN deleted d
      |  ON p.p_name = d.suffix OR ends_with(p.p_name, ' ' || d.suffix)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q5 — date-window scan (reference: dbtwiz/commands/build.py:100 —
  // data_interval_start/end injected per run; Catalyst partition-prunes).
  // ---------------------------------------------------------------------
  def q5DateWindow(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate").between("1995-01-01", "1995-06-30"))
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n"))
  }

  val q5Sql: String =
    """SELECT CAST(l_shipdate AS DATE) AS day,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate BETWEEN '1995-01-01' AND '1995-06-30'
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q6 — date-spine join (reference: dbtwiz/admin/backfill.py:104-114 date
  // chunking). sequence()-generated spine LEFT JOIN fact per day.
  // ---------------------------------------------------------------------
  def q6DateSpine(spark: SparkSession, dir: String): DataFrame = {
    val spine = spark.sql(
      "SELECT explode(sequence(to_date('1995-01-01'), to_date('1995-03-01'), interval 1 day)) AS day")
    // the spine bounds which orders can ever match — push the RANGE to
    // the scan as raw-column predicates (a to_date cast in the filter
    // blocks pushdown; at 100 TB this is the difference between a
    // 60-day partition-pruned scan and a full-table scan)
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-03-02"))
      .withColumn("od", to_date(col("o_orderdate")))
    broadcast(spine).join(o, spine("day") === o("od"), "left")
      .groupBy(col("day"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
  }

  val q6Sql: String =
    """WITH spine AS (SELECT CAST(d AS DATE) AS day
      |               FROM generate_series(DATE '1995-01-01', DATE '1995-03-01', INTERVAL 1 DAY) t(d))
      |SELECT s.day AS day, count(o.o_orderkey) AS n_orders,
      |       round(coalesce(sum(o.o_totalprice), 0), 2) AS total
      |FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.day
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q7 — census + min-reduce (reference: dbtwiz/admin/backfill.py:566-569
  // materialization counts; :91-101 min batch across models).
  // ---------------------------------------------------------------------
  def q7CensusMin(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_total"),
        round(max(col("o_totalprice")), 2).as("max_total"))
  }

  val q7Sql: String =
    """SELECT o_orderstatus AS status, count(*) AS n,
      |       round(min(o_totalprice), 2) AS min_total,
      |       round(max(o_totalprice), 2) AS max_total
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Q8 — scd2-style change tracking (reference: dbtwiz/model/create.py:418-429
  // scd2 materialization implies ordered per-key history). row_number + lag +
  // rows-frame rolling sum over Window.partitionBy(user).orderBy(ts, id).
  // ---------------------------------------------------------------------
  def q8Scd2Window(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e.select(
      col("user_id"),
      col("event_id"),
      row_number().over(w).as("rn"),
      round(col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)), 4)
        .as("delta"),
      round(sum(col("value")).over(w.rowsBetween(-2, 0)), 4).as("roll3"))
  }

  val q8Sql: String =
    """SELECT user_id, event_id,
      |       row_number() OVER w AS rn,
      |       round(value - coalesce(lag(value, 1) OVER w, 0), 4) AS delta,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS roll3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // ---------------------------------------------------------------------
  // Q9 — set-operation triple (reference: dbtwiz/admin/grants.py:278-280 set
  // differences; model/format.py:24 union).
  // ---------------------------------------------------------------------
  def q9SetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").cast("int").as("k")).distinct()
    val b = t(spark, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("k")).distinct()
    a.union(b).distinct().select(lit("union").as("op"), col("k"))
      .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("k")))
      .unionAll(a.except(b).select(lit("except").as("op"), col("k")))
  }

  val q9Sql: String =
    """WITH a AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     b AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS k FROM supplier)
      |SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      |UNION ALL
      |SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL
      |SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)""".stripMargin

  // ---------------------------------------------------------------------
  // Q10 — rollup + distinct agg (Layer-W warehouse assumptions; SURVEY §2.4).
  // approx_count_distinct is sanity-checked with tolerance in ScalaTest, not
  // here (HLL estimates differ across engines by construction).
  // ---------------------------------------------------------------------
  def q10RollupDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        round(sum(col("l_quantity")), 2).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n_orders"), col("qty"))
  }

  val q10Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       count(DISTINCT l_orderkey) AS n_orders,
      |       round(sum(l_quantity), 2) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------------
  // Q11 — scalar-function surface (reference F1/F2/F5: cleanup.py:73-75
  // string-clean + cast + interval; restore.py:12-57 multi-format parse;
  // bigquery.py:471-473 ms↔days). JSON extraction over events.props.
  // ---------------------------------------------------------------------
  def q11Scalars(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    // Synthesize the reference's dirty literal (`TIMESTAMP "…"`), clean it
    // back (F1), cast, add 24h (F2) — a faithful round-trip of cleanup.py:73-75.
    val dirty = concat(lit("TIMESTAMP \""),
      date_trunc("second", col("ts")).cast("string"), lit("\""))
    val cleaned = regexp_replace(
      regexp_replace(dirty, lit("TIMESTAMP "), lit("")), lit("\""), lit(""))
    e.select(
      col("event_id"),
      upper(col("event_type")).as("et"),
      get_json_object(col("props"), "$.k").cast("int").as("k"),
      (to_timestamp(cleaned) + expr("INTERVAL 24 HOURS")).cast("date")
        .as("next_day"),
      expr("unix_millis(cast(ts as timestamp)) div 86400000").as("epoch_day"),
      round(col("value") * 1.1, 3).as("v2"))
  }

  val q11Sql: String =
    """SELECT event_id,
      |       upper(event_type) AS et,
      |       CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |       CAST(CAST(replace(replace('TIMESTAMP "' || CAST(date_trunc('second', ts) AS VARCHAR) || '"',
      |                 'TIMESTAMP ', ''), '"', '') AS TIMESTAMP) + INTERVAL 24 HOUR AS DATE) AS next_day,
      |       epoch_ms(ts) // 86400000 AS epoch_day,
      |       round(value * 1.1, 3) AS v2
      |FROM events""".stripMargin

  /** All declared queries keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_infoschema" -> (q1Infoschema _),
    "q2_orphans" -> (q2Orphans _),
    "q3_grants_diff" -> (q3GrantsDiff _),
    "q4_suffix_match" -> (q4SuffixMatch _),
    "q5_date_window" -> (q5DateWindow _),
    "q6_date_spine" -> (q6DateSpine _),
    "q7_census_min" -> (q7CensusMin _),
    "q8_scd2_window" -> (q8Scd2Window _),
    "q9_setops" -> (q9SetOps _),
    "q10_rollup_distinct" -> (q10RollupDistinct _),
    "q11_scalars" -> (q11Scalars _))

  val oracleSql: Map[String, String] = Map(
    "q1_infoschema" -> q1Sql,
    "q2_orphans" -> q2Sql,
    "q3_grants_diff" -> q3Sql,
    "q4_suffix_match" -> q4Sql,
    "q5_date_window" -> q5Sql,
    "q6_date_spine" -> q6Sql,
    "q7_census_min" -> q7Sql,
    "q8_scd2_window" -> q8Sql,
    "q9_setops" -> q9Sql,
    "q10_rollup_distinct" -> q10Sql,
    "q11_scalars" -> q11Sql)
}
