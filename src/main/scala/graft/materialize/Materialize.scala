package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType
import graft.core.{TableMeta, Warehouse}

/** The five materializations of the reference
  * (dbtwiz/core/project.py:271-289, dbtwiz/model/create.py:438-470),
  * executed against the [[Warehouse]]:
  *
  *  - view: persisted SQL text, evaluated at read
  *  - table: CTAS full refresh
  *  - incremental: `insert_overwrite` by date partition, with
  *    `on_schema_change: append_new_columns` evolution
  *  - scd2: incremental + merge on a primary key — change tracking with
  *    valid_from/valid_to/is_current built from window functions
  *  - ephemeral: no storage; the DataFrame composes into consumers (CTE
  *    inlining)
  */
final class Materialize(wh: Warehouse) {

  /** View materialization: SQL text stored beside the table dir and
    * registered in the session catalog. Reads re-evaluate the text. */
  def view(dataset: String, name: String, sql: String): Unit = {
    wh.ensureDataset(dataset)
    val dir = java.nio.file.Paths.get(wh.root, dataset, name)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("_view.sql"),
      sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    wh.spark.sql(sql).createOrReplaceTempView(s"${dataset}__$name")
  }

  def readView(dataset: String, name: String): DataFrame = {
    val f = java.nio.file.Paths.get(wh.root, dataset, name, "_view.sql")
    val sql = new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
    wh.spark.sql(sql)
  }

  /** Table materialization: CTAS full refresh preserving existing meta. */
  def table(dataset: String, name: String, df: DataFrame): Unit =
    wh.overwrite(dataset, name, df)

  /** Table materialization: CTAS full refresh with explicit meta. */
  def table(dataset: String, name: String, df: DataFrame, meta: TableMeta): Unit =
    wh.overwrite(dataset, name, df, meta)

  /** Incremental materialization (insert_overwrite on the date partition,
    * model/create.py:456-465): first run creates the partitioned table;
    * later runs replace only the partitions present in `df`.
    *
    * `on_schema_change: append_new_columns` evolution is METADATA-ONLY:
    * the incoming frame is aligned to the DECLARED schema (no data read),
    * the commit pins the union schema, and pre-existing fragments are
    * padded with typed nulls at read time — an evolution commit touches
    * zero old data files. At 100 TB, adding a column costs a manifest
    * line, never a history rewrite. */
  def incremental(dataset: String, name: String, df: DataFrame,
                  partitionField: String = "partitiondate",
                  meta: TableMeta = TableMeta()): Unit = {
    val m = meta.copy(partitionField = Some(partitionField))
    if (!wh.exists(dataset, name)) {
      wh.overwrite(dataset, name, df, m)
    } else {
      val target = wh.schema(dataset, name) // declared DDL — metadata, not a scan
      wh.insertOverwrite(dataset, name, alignAppendNewColumns(target, df))
    }
  }

  /** `on_schema_change: append_new_columns`: incoming columns missing from
    * the target are appended (schema grows additively); target columns
    * missing from the incoming frame are filled with nulls; column order
    * follows target-then-new. */
  def alignAppendNewColumns(target: StructType, df: DataFrame): DataFrame = {
    val incoming = df.schema.fieldNames.toSet
    val targetCols = target.fields.toSeq.map { f =>
      if (incoming(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    val newCols = df.schema.fieldNames.filterNot(target.fieldNames.contains)
      .map(col(_)).toSeq
    df.select(targetCols ++ newCols: _*)
  }

  /** scd2 materialization (model/create.py:416-429, 466-470: incremental +
    * merge on primary key): slowly-changing-dimension history from a
    * snapshot stream. Given rows keyed by `pk` ordered by `orderCol`,
    * keeps one row per (pk, change) with valid_from/valid_to/is_current —
    * consecutive rows whose tracked columns are unchanged collapse into
    * one validity interval. */
  def scd2Frame(snapshot: DataFrame, pk: Seq[String], orderCol: String,
                tracked: Seq[String], tiebreak: Seq[String] = Nil): DataFrame =
    Materialize.scd2Frame(snapshot, pk, orderCol, tracked, tiebreak)

  /** scd2 merge into the warehouse (the MERGE side of incremental+merge,
    * model/create.py:416-429, 466-470), PARTITION-SCOPED.
    *
    * The history table is hash-bucketed on the primary key
    * (`_pk_bucket = pmod(xxhash64(pk), buckets)`), so every key's whole
    * validity history lives in exactly one partition. A merge then:
    *
    *  1. derives the touched buckets from the incoming snapshot's keys
    *     (≤ `buckets` values — driver-sized by construction, never rows),
    *  2. reads ONLY those partitions (manifest-level pruning),
    *  3. rebuilds the touched keys' intervals from stored change rows ∪
    *     new snapshot rows (collapsed change rows are a faithful basis:
    *     re-running change detection over them yields the same intervals
    *     as over the raw stream, since dropped rows were value-duplicates
    *     of their predecessor change row),
    *  4. `insertOverwrite`s the touched buckets — untouched-key rows in
    *     those buckets are carried through; every other partition keeps
    *     its fragments untouched.
    *
    * Cost is O(touched buckets), not O(table): merging one key into a
    * 100 TB history rewrites ~1/buckets of it, and the commit is
    * metadata-only for the rest. Size `buckets` so a bucket is a few GB
    * at the target scale.
    *
    * PRECONDITION (enforced): snapshots must arrive in order — every
    * incoming row's `orderCol` must be > the stored key's highest seen
    * `orderCol` (stamped per key as `_max_seen`, which includes dropped
    * value-duplicates, not just surviving change rows). The rebuild basis
    * is stored CHANGE rows ∪ new rows; a late row landing between a
    * stored change row and its dropped duplicates would silently produce
    * different history than a full rebuild (the duplicate that should
    * re-assert the old value after the late row no longer exists). A
    * merge containing such a row throws — recover by rebuilding the key
    * from the raw stream. Rows at orderCol == `_max_seen` additionally
    * require the tiebreak columns to order them after the seen row; keep
    * snapshot batches strictly ordered to stay clear of the boundary. */
  def scd2(dataset: String, name: String, snapshot: DataFrame, pk: Seq[String],
           orderCol: String, tracked: Seq[String], tiebreak: Seq[String] = Nil,
           buckets: Int = 32): Unit = {
    val bucketCol = pmod(xxhash64(pk.map(col): _*), lit(buckets)).cast("int")
    def stampMaxSeen(frame: DataFrame, basis: DataFrame): DataFrame =
      frame.join(
        basis.groupBy(pk.map(col): _*).agg(max(col(orderCol)).as("_max_seen")),
        pk)
    if (!wh.exists(dataset, name)) {
      wh.overwrite(dataset, name,
        stampMaxSeen(scd2Frame(snapshot, pk, orderCol, tracked, tiebreak), snapshot)
          .withColumn("_pk_bucket", bucketCol),
        TableMeta(partitionField = Some("_pk_bucket"), partitionType = "int"))
    } else {
      val touched = snapshot.select(pk.map(col): _*).distinct()
      val touchedBuckets = touched.select(bucketCol.as("b")).distinct()
        .collect().map(_.getInt(0)).sorted
      val affected = wh.readPartitions(dataset, name,
        touchedBuckets.map(_.toString).toSeq)
      // Monotone-orderCol gate: any incoming row strictly below its key's
      // stored high-water mark breaks the collapsed-change-row rebuild
      // basis (see scaladoc). One narrow agg over the touched buckets +
      // an equi-join with the (already driver-sized) snapshot keys.
      val storedSeen = affected.join(touched, pk, "left_semi")
        .groupBy(pk.map(col): _*).agg(max(col("_max_seen")).as("_stored_seen"))
      val late = snapshot.join(storedSeen, pk)
        .filter(col(orderCol) < col("_stored_seen"))
        .select((pk.map(col) :+ col(orderCol) :+ col("_stored_seen")): _*)
        .take(1)
      if (late.nonEmpty)
        throw new IllegalArgumentException(
          s"scd2 merge into $dataset.$name received an out-of-order snapshot " +
            s"row (key/order/stored-max: ${late.head}); merged history would " +
            "diverge from a full rebuild — rebuild the affected keys from " +
            "the raw stream instead")
      val untouched = affected.join(touched, pk, "left_anti")
      val history = affected.join(touched, pk, "left_semi")
        .drop("valid_from", "valid_to", "is_current", "_pk_bucket", "_max_seen")
      val basis = history.unionByName(snapshot).distinct()
      val rebuilt = stampMaxSeen(
        scd2Frame(basis, pk, orderCol, tracked, tiebreak), basis)
        .withColumn("_pk_bucket", bucketCol)
      wh.insertOverwrite(dataset, name, untouched.unionByName(rebuilt))
    }
  }

  /** Ephemeral materialization: never stored; composes into the consumer
    * exactly as dbt inlines ephemeral models as CTEs. */
  def ephemeral(df: DataFrame): DataFrame = df
}

object Materialize {

  /** scd2 change tracking as a PURE transform (no warehouse involved) —
    * consumers that only need the history frame (the PIT lookup, specs)
    * call this without constructing a Warehouse. */
  def scd2Frame(snapshot: DataFrame, pk: Seq[String], orderCol: String,
                tracked: Seq[String], tiebreak: Seq[String] = Nil): DataFrame = {
    val keyCols = pk.map(col)
    val orderCols = (orderCol +: tiebreak).map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    val changeFlag = tracked.map { c =>
      val prev = lag(col(c), 1).over(w)
      // null-safe inequality: a change is a value difference incl. null flips
      !(col(c) <=> prev)
    }.reduce(_ || _)
    val flagged = snapshot
      .withColumn("_is_first", lag(col(orderCol), 1).over(w).isNull)
      .withColumn("_changed", changeFlag || col("_is_first"))
      .filter(col("_changed"))
    val w2 = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    flagged
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_is_first", "_changed")
  }
}
