package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** Merge-on-read deletes (deletion vectors): a sparse delete must write
  * KBs (a positional sidecar), never rewrite fragments; reads, pruned
  * reads, time travel, CDC, compaction, copy and vacuum must all stay
  * exact through the mask. */
class DeletionVectorSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): (Warehouse, Path) = {
    val root = Files.createTempDirectory("dv_spec")
    (new Warehouse(spark, root.toString), root)
  }

  private def dirBytes(p: Path): Long = {
    if (!Files.exists(p)) return 0L
    val w = Files.walk(p)
    try w.iterator().asInstanceOf[java.util.Iterator[Path]].asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
    finally w.close()
  }
  private implicit class It[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  test("single-row MoR delete writes KBs, rewrites nothing, masks exactly that row") {
    val (wh, root) = freshWh()
    // a wide-ish fragment: 50k rows with padding so the fragment has bulk
    val df = spark.range(50000).select(col("id"),
      concat(lit("pad-"), rpad(col("id").cast("string"), 200, "x")).as("payload"))
    wh.overwrite("d", "big", df)
    val entriesBefore = wh.log("d", "big").latest.get.entries
    val fragBytes = dirBytes(root.resolve("d/big").resolve(entriesBefore.head.path))
    assert(fragBytes > 500000, s"fixture fragment too small: $fragBytes")

    val r = wh.deleteWhereMor("d", "big", col("id") === 12345L)
    assert(r.deletedRows === 1L)
    assert(r.dvPath.isDefined)
    // the data fragment is untouched: same entry path, new dv pointer
    val entriesAfter = wh.log("d", "big").latest.get.entries
    assert(entriesAfter.map(_.path) === entriesBefore.map(_.path))
    assert(entriesAfter.head.dv === r.dvPath)
    // the delete wrote only the vector - KBs, not the fragment's MBs
    val dvBytes = dirBytes(root.resolve("d/big").resolve(r.dvPath.get))
    assert(dvBytes > 0 && dvBytes < 100000,
      s"deletion vector should be KBs, was $dvBytes (fragment $fragBytes)")
    assert(dvBytes * 50 < fragBytes,
      s"delete cost must be a small fraction of a rewrite: dv=$dvBytes frag=$fragBytes")
    // reads mask exactly the one row
    assert(wh.read("d", "big").count() === 49999L)
    assert(wh.read("d", "big").filter(col("id") === 12345L).count() === 0L)
    assert(wh.readWhere("d", "big", col("id") === 12346L).count() === 1L)
    // time travel: pre-delete version still serves the full table
    assert(wh.readVersion("d", "big", 1).count() === 50000L)
  }

  test("MoR deletes ACCUMULATE; re-deleting masked rows is a zero-count no-op") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "acc", spark.range(1000).toDF("id"))
    assert(wh.deleteWhereMor("d", "acc", col("id") < 10).deletedRows === 10L)
    assert(wh.read("d", "acc").count() === 990L)
    // second delete overlaps the first: only the NEW rows count
    val r2 = wh.deleteWhereMor("d", "acc", col("id") < 20)
    assert(r2.deletedRows === 10L, s"masked rows must not re-count: $r2")
    assert(wh.read("d", "acc").count() === 980L)
    // the newest vector is the complete mask (readers touch ONE vector)
    val e = wh.log("d", "acc").latest.get.entries.head
    assert(e.dv === r2.dvPath)
    // every version boundary is exact
    assert(wh.readVersion("d", "acc", 1).count() === 1000L)
    assert(wh.readVersion("d", "acc", 2).count() === 990L)
    assert(wh.readVersion("d", "acc", 3).count() === 980L)
    // NULL predicate rows are KEPT (SQL DELETE semantics)
    val r3 = wh.deleteWhereMor("d", "acc",
      when(col("id") < 30, lit(null).cast("boolean")).otherwise(col("id") === 30))
    assert(r3.deletedRows === 1L)
    assert(wh.read("d", "acc").count() === 979L)
  }

  test("MoR delete on a partitioned table: zone-prune untouched partitions, mask inside hits") {
    val (wh, _) = freshWh()
    val df = Seq(
      (1, "2024-01-01", 5), (2, "2024-01-01", 6),
      (3, "2024-01-02", 7), (4, "2024-01-03", 8)
    ).toDF("id", "day", "n")
    wh.overwrite("d", "pt", df,
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    val r = wh.deleteWhereMor("d", "pt", col("day") === "2024-01-01" && col("n") === 5)
    assert(r.deletedRows === 1L)
    assert(r.pruned >= 2, s"day-02/03 partitions must zone-prune: $r")
    assert(r.updated === Seq("2024-01-01"))
    val got = wh.read("d", "pt").orderBy("id")
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(2, 3, 4))
    // partition-predicate pruned read composes with the mask
    assert(wh.readWhere("d", "pt", col("day") === "2024-01-01")
      .collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("CDC surfaces MoR-deleted rows as deletes even though no fragment path changed") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "cdc", spark.range(100).select(col("id"),
      (col("id") % 7).as("grp")))
    wh.deleteWhereMor("d", "cdc", col("id").isin(3L, 55L, 99L))
    val ch = wh.changesBetween("d", "cdc", 1, 2)
    val deletes = ch.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(deletes === Set(3L, 55L, 99L))
    assert(ch.filter(col("_change_type") === "insert").count() === 0L)
    // a second delete: the v2->v3 feed carries only the NEW masks
    wh.deleteWhereMor("d", "cdc", col("id").isin(55L, 60L)) // 55 already masked
    val ch2 = wh.changesBetween("d", "cdc", 2, 3)
    assert(ch2.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet === Set(60L))
    // and the span feed v1->v3 carries the union
    val ch3 = wh.changesBetween("d", "cdc", 1, 3)
    assert(ch3.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet === Set(3L, 55L, 99L, 60L))
  }

  test("compact MATERIALIZES the mask: clean fragments, no dv, reads unchanged, old vectors vacuumable") {
    val (wh, root) = freshWh()
    wh.overwrite("d", "cp", spark.range(0, 500).toDF("id"))
    wh.append("d", "cp", spark.range(500, 1000).toDF("id"))
    wh.deleteWhereMor("d", "cp", col("id") % 100 === 0)
    assert(wh.read("d", "cp").count() === 990L)
    wh.compact("d", "cp")
    val after = wh.log("d", "cp").latest.get.entries
    assert(after.forall(_.dv.isEmpty), "compaction must drop the vectors")
    assert(wh.read("d", "cp").count() === 990L)
    assert(wh.read("d", "cp").filter(col("id") % 100 === 0).count() === 0L)
    // vacuum reclaims the old vector dirs once their commits expire
    val dvDir = root.resolve("d/cp/_dv")
    assert(Files.exists(dvDir) && Files.list(dvDir).count() > 0)
    wh.log("d", "cp").vacuum(retainMillis = 0,
      nowMillis = System.currentTimeMillis() + 100000)
    assert(!Files.exists(dvDir) || Files.list(dvDir).count() === 0,
      "expired deletion vectors must be vacuumed")
  }

  test("dv debt is a compaction trigger of its own: a single-file masked fragment compacts clean; dvDebt reports the tax") {
    val (wh, _) = freshWh()
    // ONE fragment, one file — the file-count trigger alone would never
    // elect it; the vector must
    wh.overwrite("d", "dbt", spark.range(1000).coalesce(1).toDF("id"))
    wh.deleteWhereMor("d", "dbt", col("id") % 10 === 0)
    assert(wh.dvDebt("d", "dbt") ===
      Seq(wh.log("d", "dbt").latest.get.entries.head.path -> 100L))
    val compacted = wh.compact("d", "dbt")
    assert(compacted === Seq(""), s"masked fragment must compact: $compacted")
    assert(wh.log("d", "dbt").latest.get.entries.forall(_.dv.isEmpty))
    assert(wh.dvDebt("d", "dbt").isEmpty)
    assert(wh.read("d", "dbt").count() === 900L)
    // and a clean single-file fragment is still LEFT ALONE
    assert(wh.compact("d", "dbt").isEmpty)
  }

  test("CoW deleteWhere and mergeInto COMPOSE with a standing vector (mask applied, then dropped)") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "mix", Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "v"))
    wh.deleteWhereMor("d", "mix", col("id") === 2)
    // CoW delete on the same fragment: must see the mask (not resurrect 2)
    val r = wh.deleteWhere("d", "mix", col("id") === 3)
    assert(r.deletedRows === 1L)
    assert(wh.read("d", "mix").orderBy("id").collect().map(_.getInt(0)).toSeq
      === Seq(1, 4))
    assert(wh.log("d", "mix").latest.get.entries.forall(_.dv.isEmpty))
    // merge after that: upsert id=4, insert id=9
    wh.mergeInto("d", "mix", Seq((4, "D"), (9, "i")).toDF("id", "v"), Seq("id"))
    assert(wh.read("d", "mix").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      === Seq((1, "a"), (4, "D"), (9, "i")))
  }

  test("mergeIntoMor: upsert masks matched rows + lands the source; no rewrite; composes with compact and CDC") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "mm", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val before = wh.log("d", "mm").latest.get.entries.map(_.path)
    val r = wh.mergeIntoMor("d", "mm",
      Seq((2, "B"), (9, "i")).toDF("id", "v"), Seq("id"))
    assert(r.matchedRows === 1L && r.sourceRows === 2L)
    val after = wh.log("d", "mm").latest.get.entries
    // original fragment kept (masked), source fragment appended
    assert(after.map(_.path).take(before.size) === before)
    assert(after.size === before.size + 1)
    assert(after.head.dv.isDefined && after.last.dv.isEmpty)
    assert(wh.read("d", "mm").orderBy("id")
      .collect().map(x => (x.getInt(0), x.getString(1))).toSeq
      === Seq((1, "a"), (2, "B"), (3, "c"), (9, "i")))
    // upserting the same key AGAIN: the first source fragment is now a
    // target; its row masks and the newer row wins
    wh.mergeIntoMor("d", "mm", Seq((2, "BB")).toDF("id", "v"), Seq("id"))
    assert(wh.read("d", "mm").filter(col("id") === 2)
      .collect().map(_.getString(1)).toSeq === Seq("BB"))
    // CDC across the merge: delete side = the OLD row images,
    // insert side = the landed source rows
    val ch = wh.changesBetween("d", "mm", 1, 2)
    assert(ch.filter(col("_change_type") === "delete")
      .collect().map(x => (x.getInt(0), x.getString(1))).toSet === Set((2, "b")))
    assert(ch.filter(col("_change_type") === "insert")
      .collect().map(x => (x.getInt(0), x.getString(1))).toSet
      === Set((2, "B"), (9, "i")))
    // time travel + compact
    assert(wh.readVersion("d", "mm", 1).count() === 3L)
    wh.compact("d", "mm")
    assert(wh.log("d", "mm").latest.get.entries.forall(_.dv.isEmpty))
    assert(wh.read("d", "mm").orderBy("id")
      .collect().map(x => (x.getInt(0), x.getString(1))).toSeq
      === Seq((1, "a"), (2, "BB"), (3, "c"), (9, "i")))
  }

  test("mergeIntoMor: pure insert (no key overlap) just appends; NULL source key rejects orphan-free") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "mi", Seq((1, "a")).toDF("id", "v"))
    val r = wh.mergeIntoMor("d", "mi", Seq((5, "x")).toDF("id", "v"), Seq("id"))
    assert(r.matchedRows === 0L && r.sourceRows === 1L)
    assert(wh.read("d", "mi").count() === 2L)
    assert(wh.log("d", "mi").latest.get.entries.forall(_.dv.isEmpty))
    intercept[IllegalArgumentException] {
      wh.mergeIntoMor("d", "mi",
        Seq((Option.empty[Int], "bad")).toDF("id", "v"), Seq("id"))
    }
    assert(wh.orphanFiles("d", "mi", graceMillis = 0L).isEmpty)
    assert(wh.read("d", "mi").count() === 2L)
  }

  test("copy/restore MATERIALIZE vectors; the copy is independent and clean") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", spark.range(100).toDF("id"))
    wh.deleteWhereMor("d", "src", col("id") >= 90)
    wh.copy("d", "src", "d", "dst")
    assert(wh.read("d", "dst").count() === 90L)
    assert(wh.log("d", "dst").latest.get.entries.forall(_.dv.isEmpty))
    // the copy must not resurrect rows nor depend on the source's vector
    wh.drop("d", "src")
    assert(wh.read("d", "dst").count() === 90L)
    assert(wh.read("d", "dst").filter(col("id") >= 90).count() === 0L)
  }

  test("schema evolution composes: predicate on a column the masked fragment predates") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "ev", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    wh.append("d", "ev", Seq((3, "c", 30L), (4, "d", 40L)).toDF("id", "v", "extra"))
    // mask one row in the OLD (narrow) fragment via a pred on the new col
    val r = wh.deleteWhereMor("d", "ev", col("extra").isNull && col("id") === 1)
    assert(r.deletedRows === 1L)
    assert(wh.read("d", "ev").orderBy("id").collect().map(_.getInt(0)).toSeq
      === Seq(2, 3, 4))
  }
}
