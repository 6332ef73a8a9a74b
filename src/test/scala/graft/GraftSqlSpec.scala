package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}
import graft.sql.GraftSql

/** SQL DML surface: DELETE/UPDATE/MERGE and VERSION/TIMESTAMP AS OF in
  * SQL TEXT route through the same warehouse row-level machinery as the
  * Scala API (the reference's S6 full-SQL warehouse contract). Each test
  * pins SQL-path state ≡ API-path semantics. */
class GraftSqlSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def fresh(name: String): (Warehouse, String) = {
    val wh = new Warehouse(spark, Files.createTempDirectory("sql_spec").toString)
    wh.overwrite("d", "t", Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "s", "v"))
    GraftSql.register(spark, name, wh, "d", "t")
    (wh, name)
  }

  test("DELETE FROM ... WHERE routes through deleteWhere and reports rows") {
    val (wh, n) = fresh("sql_del")
    val out = spark.sql(s"DELETE FROM $n WHERE id >= 3").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(wh.read("d", "t").orderBy("id").select("id").as[Long].collect().toSeq
      === Seq(1L, 2L))
    // the published view sees the post-DML state
    assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) === 2L)
    // snapshot log carries the delete action
    assert(wh.log("d", "t").latest.get.action === "delete")
  }

  test("UPDATE ... SET applies simultaneous assignments with old-value semantics") {
    val (wh, n) = fresh("sql_upd")
    val out = spark.sql(
      s"UPDATE $n SET v = v * 2, s = concat(s, '!') WHERE id <= 2").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    val got = wh.read("d", "t").orderBy("id")
      .select("s", "v").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("a!", 20.0), ("b!", 40.0), ("c", 30.0), ("d", 40.0)))
    // swap: both assignments read PRE-update values
    val wh2root = Files.createTempDirectory("sql_swap").toString
    val wh2 = new Warehouse(spark, wh2root)
    wh2.overwrite("d", "t", Seq((1L, 5L, 7L)).toDF("id", "x", "y"))
    GraftSql.register(spark, "sql_swap", wh2, "d", "t")
    spark.sql("UPDATE sql_swap SET x = y, y = x")
    val r = wh2.read("d", "t").head()
    assert((r.getLong(1), r.getLong(2)) === ((7L, 5L)))
  }

  test("MERGE INTO upsert (SET * / INSERT *) routes through mergeInto") {
    val (wh, n) = fresh("sql_mrg")
    Seq((2L, "B", 200.0), (9L, "i", 90.0)).toDF("id", "s", "v")
      .createOrReplaceTempView("mrg_src")
    val out = spark.sql(
      s"""MERGE INTO $n t USING mrg_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(out.head.getLong(0) === 1L) // matched
    assert(out.head.getLong(1) === 2L) // source rows
    val got = wh.read("d", "t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d"), (9L, "i")))
  }

  test("MERGE supports MATCHED DELETE; theta-ON still refuses loudly") {
    val (wh, n) = fresh("sql_mrg_bad")
    Seq((2L, "B", 200.0)).toDF("id", "s", "v").createOrReplaceTempView("mrg_src2")
    // r15: WHEN MATCHED THEN DELETE is a supported general shape now
    val r = spark.sql(s"""MERGE INTO $n t USING mrg_src2 s ON t.id = s.id
                 |WHEN MATCHED THEN DELETE""".stripMargin).head()
    assert(r.getLong(1) === 1L) // deleted_rows
    assert(wh.read("d", "t").filter(col("id") === 2L).isEmpty)
    // the warehouse merges BY KEY: arbitrary theta ON refuses
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $n t USING mrg_src2 s ON t.id < s.id
                   |WHEN MATCHED THEN UPDATE SET *
                   |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e2.getMessage.contains("ON clause"))
  }

  test("VERSION AS OF and TIMESTAMP AS OF read snapshots through the log") {
    val (wh, n) = fresh("sql_tt")
    val t1 = System.currentTimeMillis()
    spark.sql(s"DELETE FROM $n WHERE id = 1")
    assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $n VERSION AS OF 1")
      .head().getLong(0) === 4L)
    // timestamp form: as-of just before the delete
    val ts = new java.sql.Timestamp(t1).toString
    assert(spark.sql(s"SELECT count(*) AS c FROM $n TIMESTAMP AS OF '$ts'")
      .head().getLong(0) === 4L)
    // joins against a time-travel relation work too
    val both = spark.sql(
      s"""SELECT cur.id FROM $n cur JOIN $n VERSION AS OF 1 old ON cur.id = old.id
         |ORDER BY cur.id""".stripMargin).as[Long].collect()
    assert(both.toSeq === Seq(2L, 3L, 4L))
  }

  test("SET spark.graft.sql.dml=mor routes DELETE through deletion vectors") {
    val (wh, n) = fresh("sql_mor")
    spark.conf.set("spark.graft.sql.dml", "mor")
    try {
      val out = spark.sql(s"DELETE FROM $n WHERE id = 2").collect()
      assert(out.head.getLong(0) === 1L)
      // MoR: the fragment survives, an entry carries a dv pointer
      assert(wh.log("d", "t").latest.get.entries.exists(_.dv.isDefined))
      assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) === 3L)
    } finally spark.conf.unset("spark.graft.sql.dml")
  }

  test("UPDATE refuses unique-key and partition columns") {
    val root = Files.createTempDirectory("sql_guard").toString
    val wh = new Warehouse(spark, root)
    wh.overwrite("d", "g", Seq((1L, "2024-01-05", 1.0)).toDF("k", "day", "v")
      .select(col("k"), to_date(col("day")).as("day"), col("v")),
      TableMeta(partitionField = Some("day"), uniqueKey = Seq("k", "day")))
    GraftSql.register(spark, "sql_guard", wh, "d", "g")
    val e = intercept[IllegalArgumentException] {
      spark.sql("UPDATE sql_guard SET k = 2 WHERE v = 1.0")
    }
    assert(e.getMessage.contains("unique-key"))
    // partition guard on its own (no unique key in the way)
    wh.overwrite("d", "g2", Seq((1L, "2024-01-05", 1.0)).toDF("k", "day", "v")
      .select(col("k"), to_date(col("day")).as("day"), col("v")),
      TableMeta(partitionField = Some("day")))
    GraftSql.register(spark, "sql_guard2", wh, "d", "g2")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql("UPDATE sql_guard2 SET day = date'2024-01-06'")
    }
    assert(e2.getMessage.contains("partition"))
    // non-key columns update fine on the partitioned table
    spark.sql("UPDATE sql_guard SET v = 9.0 WHERE k = 1")
    assert(wh.read("d", "g").head().getDouble(2) === 9.0)
  }

  test("INSERT INTO appends; INSERT OVERWRITE refreshes; DROP TABLE drops") {
    val (wh, n) = fresh("sql_ins")
    spark.sql(s"INSERT INTO $n VALUES (9, 'i', 90.0), (10, 'j', 100.0)")
    assert(wh.read("d", "t").count() === 6L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) === 6L)
    spark.sql(s"INSERT OVERWRITE $n SELECT id AS id, 'z' AS s, 1.0 AS v " +
      "FROM range(3)")
    assert(wh.read("d", "t").count() === 3L)
    // version history: overwrite is a commit, the old state time-travels
    assert(spark.sql(s"SELECT count(*) AS c FROM $n VERSION AS OF 2")
      .head().getLong(0) === 6L)
    spark.sql(s"DROP TABLE $n")
    assert(!wh.exists("d", "t"))
    intercept[Exception] { spark.sql(s"SELECT * FROM $n") }
  }

  test("table_changes() TVF serves the CDC feed through SQL") {
    val (wh, n) = fresh("sql_cdc")
    // MoR delete: the CDC feed reports exactly the masked row (a CoW
    // delete would report the whole fragment rewrite, by design)
    spark.conf.set("spark.graft.sql.dml", "mor")
    try spark.sql(s"DELETE FROM $n WHERE id = 2") // v2
    finally spark.conf.unset("spark.graft.sql.dml")
    val got = spark.sql(
      s"SELECT _change_type, id FROM table_changes('$n', 1, 2) ORDER BY id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("delete", 2L)))
    // joins against the feed work; unknown names keep Spark's own error
    val joined = spark.sql(
      s"""SELECT c.id FROM table_changes('$n', 1, 2) c
         |JOIN $n VERSION AS OF 1 v ON c.id = v.id""".stripMargin)
    assert(joined.head().getLong(0) === 2L)
    intercept[Exception] { spark.sql("SELECT * FROM table_changes('nope', 1, 2)") }
  }

  test("ALTER TABLE ADD/RENAME/ALTER COLUMN route through schema evolution") {
    val (wh, n) = fresh("sql_ddl")
    spark.sql(s"ALTER TABLE $n ADD COLUMNS (tag STRING DEFAULT 'none')")
    assert(spark.sql(s"SELECT tag FROM $n LIMIT 1").head().getString(0) === "none")
    spark.sql(s"ALTER TABLE $n RENAME COLUMN s TO label")
    assert(wh.read("d", "t").columns.contains("label"))
    assert(spark.sql(s"SELECT label FROM $n WHERE id = 1").head().getString(0) === "a")
  }

  test("ALTER COLUMN TYPE widens; non-widening refuses loudly") {
    val root = Files.createTempDirectory("sql_widen").toString
    val wh = new Warehouse(spark, root)
    wh.overwrite("d", "w", Seq((1, 1.5f)).toDF("k", "v"))
    GraftSql.register(spark, "sql_widen", wh, "d", "w")
    spark.sql("ALTER TABLE sql_widen ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE sql_widen ALTER COLUMN v TYPE DOUBLE")
    val sch = wh.read("d", "w").schema
    assert(sch("k").dataType === org.apache.spark.sql.types.LongType)
    assert(sch("v").dataType === org.apache.spark.sql.types.DoubleType)
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE sql_widen ALTER COLUMN k TYPE INT")
    }
    assert(e.getMessage.contains("cannot widen"))
  }

  test("OPTIMIZE and VACUUM maintenance statements") {
    val (wh, n) = fresh("sql_opt")
    // several small appends -> compaction has something to do
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO $n VALUES (${100 + i}, 'x', 1.0)")
    val entriesBefore = wh.log("d", "t").latest.get.entries.size
    spark.sql(s"OPTIMIZE $n").collect()
    val entriesAfter = wh.log("d", "t").latest.get.entries.size
    assert(entriesAfter < entriesBefore,
      s"compaction must shrink the entry list: $entriesBefore -> $entriesAfter")
    assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) === 8L)
    val removed = spark.sql(s"VACUUM $n RETAIN 0 HOURS").collect()
    assert(removed.nonEmpty, "vacuum after compaction must remove old fragments")
    assert(wh.read("d", "t").count() === 8L)
    // unknown statements still fail with Spark's parser error
    intercept[Exception] { spark.sql("OPTIMIZE definitely_not_registered") }
    // ZORDER BY arity validates in code with a NAMED error, not the
    // delegate parser's generic one (r16 ADVICE)
    val e1 = intercept[Exception] { spark.sql(s"OPTIMIZE $n ZORDER BY (k)") }
    assert(e1.getMessage.contains("at least two columns"), e1.getMessage)
  }

  test("OPTIMIZE ... WHERE scopes compaction to one hive partition") {
    val root = Files.createTempDirectory("sql_optw").toString
    val wh = new Warehouse(spark, root)
    wh.overwrite("d", "p", Seq((1L, "a", "2024-01-01")).toDF("k", "v", "day"),
      graft.core.TableMeta(partitionField = Some("day"), partitionType = "string"))
    // several small fragments in BOTH partitions
    for (i <- 2 to 4) {
      wh.appendPartitioned("d", "p",
        Seq((i.toLong, "a", "2024-01-01")).toDF("k", "v", "day"))
      wh.appendPartitioned("d", "p",
        Seq((i.toLong + 10, "b", "2024-01-02")).toDF("k", "v", "day"))
    }
    graft.sql.GraftSql.register(spark, "optw_p", wh, "d", "p")
    val before = wh.log("d", "p").latest.get.entries
      .groupBy(_.partition).view.mapValues(_.map(_.path).toSet).toMap
    val landed = spark.sql(
      "OPTIMIZE optw_p WHERE day = '2024-01-01'").collect().map(_.getString(0))
    assert(landed.toSeq === Seq("2024-01-01"))
    val after = wh.log("d", "p").latest.get.entries
      .groupBy(_.partition).view.mapValues(_.map(_.path).toSet).toMap
    assert(after("2024-01-02") === before("2024-01-02"),
      "the unscoped partition must keep its fragments byte-for-byte")
    assert(after("2024-01-01").size === 1 && before("2024-01-01").size > 1)
    // WHERE must name the partition column
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE optw_p WHERE v = 'a'")
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("INSERT INTO a partitioned table appends through the hive-fragment path") {
    val root = Files.createTempDirectory("sql_pins").toString
    val wh = new Warehouse(spark, root)
    wh.overwrite("d", "p", Seq((1L, "2024-01-01")).toDF("k", "day")
      .select(col("k"), to_date(col("day")).as("day")),
      TableMeta(partitionField = Some("day"), partitionType = "date"))
    GraftSql.register(spark, "sql_pins", wh, "d", "p")
    spark.sql("INSERT INTO sql_pins VALUES " +
      "(2, date'2024-01-01'), (3, date'2024-01-02')")
    assert(wh.read("d", "p").count() === 3L)
    assert(wh.readPartitions("d", "p", Seq("2024-01-02")).count() === 1L)
    // INSERT OVERWRITE still replaces touched partitions only
    spark.sql("INSERT OVERWRITE sql_pins VALUES (9, date'2024-01-01')")
    val got = wh.read("d", "p").orderBy("k").select("k").as[Long].collect()
    assert(got.toSeq === Seq(3L, 9L))
  }

  test("CTAS against a registered dataset alias creates warehouse tables") {
    val root = Files.createTempDirectory("sql_ctas").toString
    val wh = new Warehouse(spark, root)
    GraftSql.registerDatabase(spark, "mart", wh, "gold")
    spark.sql(
      "CREATE TABLE mart.daily AS SELECT id AS k, id % 3 AS g FROM range(30)")
    assert(wh.exists("gold", "daily"))
    assert(wh.read("gold", "daily").count() === 30L)
    // the new table is immediately addressable by every other statement
    assert(spark.sql("SELECT count(*) AS c FROM daily WHERE g = 0")
      .head().getLong(0) === 10L)
    spark.sql("DELETE FROM daily WHERE k >= 20")
    assert(wh.read("gold", "daily").count() === 20L)
    // plain CREATE refuses an existing table; OR REPLACE refreshes (v-history kept)
    intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE mart.daily AS SELECT 1 AS x")
    }
    spark.sql("CREATE OR REPLACE TABLE mart.daily AS SELECT id AS k FROM range(5)")
    assert(wh.read("gold", "daily").count() === 5L)
    assert(spark.sql("SELECT count(*) AS c FROM daily VERSION AS OF 2")
      .head().getLong(0) === 20L)
    // partitioned CTAS lays out hive dirs
    spark.sql("CREATE TABLE mart.bydate PARTITIONED BY (d) AS " +
      "SELECT id AS k, date_add(date'2024-01-01', CAST(id % 3 AS INT)) AS d FROM range(12)")
    assert(wh.meta("gold", "bydate").partitionField === Some("d"))
    assert(wh.log("gold", "bydate").latest.get.entries.map(_.partition).distinct.size === 3)
    assert(spark.sql("SELECT count(*) AS c FROM bydate").head().getLong(0) === 12L)
  }

  test("DESCRIBE HISTORY surfaces the commit audit through SQL") {
    val (wh, n) = fresh("sql_hist")
    spark.sql(s"DELETE FROM $n WHERE id = 1")
    val h = spark.sql(s"DESCRIBE HISTORY $n")
      .select("version", "action").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(h.toSeq === Seq((1, "write"), (2, "delete")))
  }

  test("non-registered tables keep Spark's own DML behavior") {
    Seq((1, "x")).toDF("id", "s").createOrReplaceTempView("plain_view")
    intercept[Exception] { spark.sql("DELETE FROM plain_view WHERE id = 1") }
  }

  test("UPDATE without WHERE touches every row; qualified names resolve") {
    val (wh, n) = fresh("sql_all")
    val out = spark.sql(s"UPDATE $n SET v = $n.v + 1").collect()
    assert(out.head.getLong(0) === 4L)
    assert(wh.read("d", "t").agg(sum("v")).head().getDouble(0) === 104.0)
  }

  test("GRANT/REVOKE are idempotent; SHOW GRANTS reflects the bindings") {
    val (wh, n) = fresh("sql_iam")
    assert(spark.sql(s"GRANT reader ON $n TO group:analysts").head.getBoolean(0))
    // idempotent re-grant: no change
    assert(!spark.sql(s"GRANT reader ON $n TO group:analysts").head.getBoolean(0))
    spark.sql(s"GRANT owner ON TABLE $n TO user:alice@corp")
    val got = spark.sql(s"SHOW GRANTS ON $n").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("reader", "group:analysts"), ("owner", "user:alice@corp")))
    assert(spark.sql(s"REVOKE reader ON $n FROM group:analysts").head.getBoolean(0))
    assert(!spark.sql(s"REVOKE reader ON $n FROM group:analysts").head.getBoolean(0))
    assert(wh.grants("d", "t") === Seq(("owner", "user:alice@corp")))
    // granting on a missing table refuses loudly
    intercept[Exception] { wh.grant("d", "nope", "reader", "x") }
  }

  test("SCHEMA grants: dataset-level bindings inherit into every table's SHOW GRANTS") {
    val (wh, n) = fresh("sql_schema_iam")
    GraftSql.registerDatabase(spark, "iam_ds", wh, "d")
    assert(spark.sql("GRANT auditor ON SCHEMA iam_ds TO group:audit")
      .head.getBoolean(0))
    assert(!spark.sql("GRANT auditor ON SCHEMA iam_ds TO group:audit")
      .head.getBoolean(0), "idempotent re-grant")
    // no per-table binding was written; SHOW GRANTS serves the union
    assert(wh.grants("d", "t") === Seq.empty)
    assert(spark.sql(s"SHOW GRANTS ON $n").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("auditor", "group:audit")))
    assert(spark.sql("SHOW GRANTS ON SCHEMA iam_ds").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("auditor", "group:audit")))
    // a table + dataset binding union, deduped and sorted
    spark.sql(s"GRANT reader ON $n TO group:analysts")
    assert(spark.sql(s"SHOW GRANTS ON $n").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("auditor", "group:audit"), ("reader", "group:analysts")))
    // a table created AFTER the schema grant inherits it
    spark.sql("CREATE TABLE iam_ds.late AS SELECT 1 AS x")
    assert(spark.sql("SHOW GRANTS ON iam_ds.late").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("auditor", "group:audit")))
    // revoke at the dataset removes it everywhere
    assert(spark.sql("REVOKE auditor ON SCHEMA iam_ds FROM group:audit")
      .head.getBoolean(0))
    assert(spark.sql("SHOW GRANTS ON iam_ds.late").collect().isEmpty)
    // granting on a missing dataset refuses loudly
    intercept[Exception] { wh.grantDataset("nope", "reader", "x") }
  }

  test("RESTORE TABLE: in-place version/timestamp restore, drop-commit and window refusals") {
    val (wh, n) = fresh("sql_restore")
    spark.sql(s"DELETE FROM $n WHERE id >= 3")
    assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) === 2L)
    assert(spark.sql(s"RESTORE TABLE $n TO VERSION AS OF 1").head.getInt(0) === 1)
    assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) === 4L)
    // restore is a commit, not a rewrite of history
    assert(wh.log("d", "t").latest.get.version === 3)
    // TIMESTAMP AS OF epoch-ms form lands on the same snapshot rule
    val ts2 = wh.log("d", "t").version(2).get.tsMillis
    spark.sql(s"RESTORE $n TO TIMESTAMP AS OF '$ts2'")
    assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) === 2L)
    // a drop commit is not a restorable state
    wh.drop("d", "t")
    val e = intercept[Exception] {
      wh.restoreToVersion("d", "t", wh.log("d", "t").latest.get.version)
    }
    assert(e.getMessage.contains("drop commit"))
    // restore-of-dropped to a live version works
    wh.restoreToVersion("d", "t", 1)
    assert(wh.read("d", "t").count() === 4L)
    // outside the 7-day window: loud refusal
    val w = intercept[Exception] {
      wh.restoreToVersion("d", "t", 1,
        nowMillis = System.currentTimeMillis() + 8L * 24 * 3600 * 1000)
    }
    assert(w.getMessage.contains("time-travel window"))
    // unknown version: loud refusal
    intercept[Exception] { wh.restoreToVersion("d", "t", 99) }
  }

  test("ANALYZE TABLE backfills zone sidecars and builds Bloom indexes") {
    val (wh, n) = fresh("sql_analyze")
    val td = java.nio.file.Paths.get(wh.root, "d", "t")
    val entry = wh.log("d", "t").latest.get.entries.head
    // simulate a legacy/external fragment: remove its zone sidecar
    java.nio.file.Files.delete(graft.core.ZoneMaps.statsPath(td, entry.path))
    val out = spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("zones") === 1L, s"zone backfill must cover the stripped entry: $out")
    assert(graft.core.ZoneMaps.read(td, entry.path).isDefined)
    // FOR COLUMNS builds Bloom sidecars on the named column
    val out2 = spark.sql(
      s"ANALYZE TABLE $n COMPUTE STATISTICS FOR COLUMNS s").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out2("blooms") >= 1L, s"expected bloom entries: $out2")
    assert(graft.core.BloomIndex.read(td, entry.path).exists(_.cols.contains("s")))
    // FOR ALL COLUMNS takes the Bloom-eligible set (id/s, never double v)
    spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR ALL COLUMNS").collect()
    val eb = graft.core.BloomIndex.read(td, entry.path).get
    assert(eb.cols.keySet === Set("id", "s"), s"eligible set wrong: ${eb.cols.keySet}")
    // unknown column refuses loudly; unregistered names keep Spark's error
    val e = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS FOR COLUMNS nope").collect()
    }
    assert(e.getMessage.contains("no such column"))
  }
}
