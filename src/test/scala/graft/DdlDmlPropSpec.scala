package graft

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.Warehouse

/** The cross-product walk: schema evolution (add with/without default,
  * rename, metadata-only drop) INTERLEAVED with row-level mutations
  * (CoW delete, MoR delete, update, truncate, full rewrite) — the
  * composition space the schema walk (DDL × append/rewrite only) and
  * the DML walk (fixed schema) each leave dark. The model tracks
  * column IDENTITY and per-row PHYSICAL presence at FRAGMENT
  * granularity: a CoW rewrite materializes every current column into
  * the rewritten rows (they stop serving later default changes — the
  * Iceberg initial-default distinction), a MoR delete materializes
  * nothing, and every recorded version must keep serving ITS schema
  * and ITS cells verbatim — a default declared before a rename serves
  * under the pinned commit's own name (the exact time-travel fidelity
  * bug modeling this walk found: renameColumn re-keys columnDefaults
  * and the as-of lookup missed; fixed via the backward rename walk in
  * Warehouse.defaultNameAsOf). */
class DdlDmlPropSpec extends AnyFunSuite {
  import TestSession._

  private case class MCol(id: Int, name: String, default: Option[Long])
  /** vals: colId -> stored value (Some(null-able)); ABSENT id = the
    * row's fragment physically lacks the column. */
  private case class MRow(k: Long, frag: Long, vals: Map[Int, Option[Long]])

  private def expectCell(r: MRow, c: MCol): Option[Long] =
    r.vals.getOrElse(c.id, c.default)

  for (seed <- 1 to 8) test(s"random DDL x DML walk, seed $seed") {
    val rnd = new Random(900 + seed)
    val wh = new Warehouse(spark, Files.createTempDirectory("ddl_dml").toString)
    var nextId = 1
    var nextK = 0L
    var nextFrag = 0L
    var cols = Vector(MCol(0, "c0", None))
    var rows = Vector.empty[MRow]
    // per recorded version: full model state (for restore) — the served
    // view derives from it
    var history = Map.empty[Int, (Vector[MCol], Vector[MRow])]

    def schemaOf(cs: Vector[MCol]) = StructType(
      StructField("k", LongType, nullable = false) +:
        cs.map(c => StructField(c.name, LongType, nullable = true)))

    def append(n: Int): Unit = {
      val frag = { nextFrag += 1; nextFrag }
      val batch = (0 until n).map { _ =>
        val k = { nextK += 1; nextK }
        MRow(k, frag, cols.map(c => c.id ->
          (if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100).toLong))).toMap)
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(batch.map(r => Row.fromSeq(
          r.k +: cols.map(c => r.vals(c.id).map(Long.box).orNull))): _*),
        schemaOf(cols))
      wh.append("d", "t", df)
      rows ++= batch
    }

    /** Every current column materializes into the row (rewrite paths
      * read padded+defaulted and write physically). */
    def materialize(r: MRow, frag: Long): MRow =
      MRow(r.k, frag, cols.map(c => c.id -> expectCell(r, c)).toMap)

    def servedOf(cs: Vector[MCol], rs: Vector[MRow]): Vector[(Long, Vector[Option[Long]])] =
      rs.sortBy(_.k).map(r => r.k -> cs.map(c => expectCell(r, c)))

    def servedNow(): Vector[(Long, Vector[Option[Long]])] = servedOf(cols, rows)

    def record(): Unit =
      wh.log("d", "t").latest.filter(!_.isDrop).foreach { c =>
        history += c.version -> ((cols, rows))
      }

    def collectServed(df: org.apache.spark.sql.DataFrame,
                      names: Vector[String]): Vector[(Long, Vector[Option[Long]])] =
      df.select("k", names: _*).collect().map(r =>
        r.getLong(0) -> names.indices.map(i =>
          Option(r.get(i + 1)).map(_.asInstanceOf[Long])).toVector)
        .sortBy(_._1).toVector

    def verify(step: String): Unit = {
      val df = wh.read("d", "t")
      assert(df.columns.toSeq === ("k" +: cols.map(_.name)),
        s"[$step] column set/order diverged")
      assert(collectServed(df, cols.map(_.name)) === servedNow(),
        s"[$step] served state diverged")
      if (history.nonEmpty) {
        val (ver, (cs, rs)) = history.toSeq(rnd.nextInt(history.size))
        val names = cs.map(_.name)
        val at = wh.readVersion("d", "t", ver)
        assert(at.columns.toSeq === ("k" +: names),
          s"[$step] v$ver schema diverged")
        assert(collectServed(at, names) === servedOf(cs, rs),
          s"[$step] time travel to v$ver diverged")
      }
    }

    /** A predicate over k or over one column's SERVED value, with its
      * model twin. */
    def somePred(): (org.apache.spark.sql.Column, MRow => Boolean) =
      if (cols.isEmpty || rnd.nextBoolean()) {
        val cut = math.max(1L, nextK - rnd.nextInt(5))
        (col("k") >= cut, r => r.k >= cut)
      } else {
        val c = cols(rnd.nextInt(cols.size))
        val v = rnd.nextInt(100).toLong
        (col(c.name) >= v, r => expectCell(r, c).exists(_ >= v))
      }

    wh.overwrite("d", "t", spark.createDataFrame(
      new java.util.ArrayList[Row](), schemaOf(cols)))
    append(3)
    record(); verify("init")

    for (op <- 1 to 18) {
      val step = rnd.nextInt(13) match {
        case 12 => // in-place restore: data AND schema revert; name-keyed
          // meta re-keys through compensating rename links, so later
          // renames of restored names must keep mapping physical bytes
          // (the fork bug this walk's modeling found)
          val ver = history.keys.toSeq(rnd.nextInt(history.size))
          wh.restoreToVersion("d", "t", ver)
          val (cs, rs) = history(ver)
          cols = cs; rows = rs
          s"restore v$ver"
        case 0 | 1 =>
          append(1 + rnd.nextInt(3)); "append"
        case 2 => // add a fresh column, half the time with a default
          val name = s"c$nextId"
          val default = if (rnd.nextBoolean()) Some(rnd.nextInt(50).toLong) else None
          wh.addColumn("d", "t", name, "BIGINT", default.map(_.toString))
          cols :+= MCol(nextId, name, default); nextId += 1
          s"addColumn $name"
        case 3 => // rename a random column
          val c = cols(rnd.nextInt(cols.size))
          val name = s"c$nextId"; nextId += 1
          wh.renameColumn("d", "t", c.name, name)
          cols = cols.map(x => if (x.id == c.id) x.copy(name = name) else x)
          s"rename -> $name"
        case 4 if cols.size > 1 => // metadata-only drop
          val c = cols(rnd.nextInt(cols.size))
          wh.dropColumn("d", "t", c.name)
          cols = cols.filterNot(_.id == c.id)
          s"drop ${c.name}"
        case 5 | 6 => // CoW delete: survivors of hit fragments materialize
          val (pred, hit) = somePred()
          wh.deleteWhere("d", "t", pred)
          val hitFrags = rows.filter(hit).map(_.frag).toSet
          val frag = { nextFrag += 1; nextFrag }
          rows = rows.filterNot(hit).map(r =>
            if (hitFrags(r.frag)) materialize(r, frag) else r)
          "deleteWhere"
        case 7 => // MoR delete: nothing materializes
          val (pred, hit) = somePred()
          wh.deleteWhereMor("d", "t", pred)
          rows = rows.filterNot(hit)
          "deleteWhereMor"
        case 8 => // update one column; every row of a hit fragment
          // materializes, matching rows take the assignment
          val c = cols(rnd.nextInt(cols.size))
          val (pred, hit) = somePred()
          val nv = 500L + rnd.nextInt(100)
          wh.updateWhere("d", "t", Seq(c.name -> lit(nv)), pred)
          val hitFrags = rows.filter(hit).map(_.frag).toSet
          if (hitFrags.nonEmpty) {
            val frag = { nextFrag += 1; nextFrag }
            rows = rows.map { r =>
              if (!hitFrags(r.frag)) r
              else {
                val m = materialize(r, frag)
                if (hit(r)) m.copy(vals = m.vals + (c.id -> Some(nv))) else m
              }
            }
          }
          s"update ${c.name}"
        case 9 => // truncate, rarely
          if (rnd.nextInt(3) == 0) { wh.truncate("d", "t"); rows = Vector.empty; "truncate" }
          else "skip"
        case _ => // full rewrite: everything materializes
          wh.overwrite("d", "t", spark.createDataFrame(
            java.util.Arrays.asList(rows.map(r => Row.fromSeq(
              r.k +: cols.map(c => expectCell(r, c).map(Long.box).orNull))): _*),
            schemaOf(cols)))
          val frag = { nextFrag += 1; nextFrag }
          rows = rows.map(materialize(_, frag))
          "overwrite"
      }
      record()
      verify(s"op $op: $step")
    }
  }
}
