package graft

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.core.Warehouse

/** Model-based random walk over the schema-evolution surface: a table
  * takes a random interleaving of appends, column adds (with and
  * without defaults), renames, metadata-only drops, default changes,
  * NOT NULL declarations and full rewrites, and after EVERY step the
  * real read must match an in-memory model that tracks column IDENTITY
  * (an added-then-renamed column is the same column; a dropped-then-
  * readded name is a different one — the exact distinction field-ID
  * engines make and our rename-chain + droppedColumns metadata must
  * reproduce). The model also predicts the REFUSALS: SET DEFAULT while
  * absent-column fragments survive, SET NOT NULL over served nulls —
  * both must refuse exactly when the model says the data is unsafe.
  *
  * This is the interaction surface where pad-on-read, rename chains,
  * read-time defaults and per-commit schemas meet; deterministic specs
  * cover each pairwise case, the walk covers the compositions. */
class SchemaEvolutionPropSpec extends AnyFunSuite {
  import TestSession._

  /** One live column: `id` is identity (survives renames), `name` the
    * current display name, `default` the read-time default for rows
    * whose fragment predates the column. */
  private case class MCol(id: Int, name: String, default: Option[Long])

  /** A model row: the row key plus, per column IDENTITY, the value its
    * fragment physically holds (absent id = fragment predates the
    * column or was rewritten without it). */
  private case class MRow(rid: Long, vals: Map[Int, Option[Long]])

  private def expectCell(r: MRow, c: MCol): Option[Long] =
    r.vals.get(c.id) match {
      case Some(v) => v // physically present (explicit null stays null)
      case None => c.default // absent: read-time default (or null)
    }

  for (seed <- 1 to 10) test(s"random schema-evolution walk, seed $seed") {
    val rnd = new Random(seed)
    val wh = new Warehouse(spark, Files.createTempDirectory("schema_walk").toString)
    var nextId = 1
    var nextRid = 0L
    var cols = Vector(MCol(0, "c0", None))
    var rows = Vector.empty[MRow]
    var notNull = Set.empty[Int]
    // names freed by DROP COLUMN — eligible for IMMEDIATE re-use (r16
    // item 6: the tombstone link gives fresh-field-ID semantics, so a
    // re-added name is a brand-new column and old bytes stay hidden)
    var droppedNames = Vector.empty[String]

    def schemaOf(cs: Vector[MCol]) = StructType(
      StructField("rid", LongType, nullable = false) +:
        cs.map(c => StructField(c.name, LongType, nullable = true)))

    def freshName(): String = { val n = s"c$nextId"; n }

    def append(n: Int): Unit = {
      val batch = (0 until n).map { _ =>
        val rid = { nextRid += 1; nextRid }
        val vals = cols.map { c =>
          val v = if (notNull(c.id)) Some(rnd.nextLong() % 100)
            else if (rnd.nextInt(4) == 0) None
            else Some(rnd.nextLong() % 100)
          c.id -> v
        }.toMap
        MRow(rid, vals)
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(batch.map(r => Row.fromSeq(
          r.rid +: cols.map(c => r.vals(c.id).map(Long.box).orNull))): _*),
        schemaOf(cols))
      wh.append("d", "t", df)
      rows ++= batch
    }

    def verify(step: String): Unit = {
      val df = wh.read("d", "t")
      assert(df.columns.toSeq === ("rid" +: cols.map(_.name)),
        s"[$step] column set/order diverged")
      val got = df.orderBy("rid").collect().map(r =>
        r.getLong(0) -> cols.zipWithIndex.map { case (c, i) =>
          Option(r.get(i + 1)).map(_.asInstanceOf[Long])
        })
      val want = rows.sortBy(_.rid).map(r =>
        r.rid -> cols.map(c => expectCell(r, c)))
      assert(got.toSeq === want, s"[$step] values diverged")
    }

    // the table must exist before the walk: one seed batch
    wh.overwrite("d", "t", spark.createDataFrame(
      new java.util.ArrayList[Row](), schemaOf(cols)))
    append(3)
    verify("init")

    for (op <- 1 to 14) {
      rnd.nextInt(11) match {
        case 0 | 1 | 2 | 3 => // append a small batch
          append(1 + rnd.nextInt(3))

        case 4 => // add a column — a fresh name, or (when one exists)
          // RE-USE a dropped name: the model treats it as a NEW column
          // identity either way, which is exactly the tombstone contract
          val name =
            if (droppedNames.nonEmpty && rnd.nextBoolean()) {
              val n = droppedNames(rnd.nextInt(droppedNames.size))
              droppedNames = droppedNames.filterNot(_ == n)
              n
            } else freshName()
          val default = if (rnd.nextBoolean()) Some(rnd.nextInt(50).toLong) else None
          wh.addColumn("d", "t", name, "BIGINT", default.map(_.toString))
          cols :+= MCol(nextId, name, default)
          nextId += 1

        case 5 => // rename a random column — to a fresh name, or ONTO a
          // previously dropped name (the tombstone link must keep the
          // dropped column's bytes hidden while the renamed column's
          // identity and values carry over unchanged)
          val c = cols(rnd.nextInt(cols.size))
          val name =
            if (droppedNames.nonEmpty && rnd.nextInt(3) == 0) {
              val n = droppedNames(rnd.nextInt(droppedNames.size))
              droppedNames = droppedNames.filterNot(_ == n)
              n
            } else { val n = freshName(); nextId += 1; n }
          wh.renameColumn("d", "t", c.name, name)
          cols = cols.map(x => if (x.id == c.id) x.copy(name = name) else x)

        case 6 if cols.size > 1 => // metadata-only drop
          val c = cols(rnd.nextInt(cols.size))
          wh.dropColumn("d", "t", c.name)
          cols = cols.filterNot(_.id == c.id)
          droppedNames :+= c.name
          notNull -= c.id

        case 7 => // SET DEFAULT: the model predicts the refusal —
          // unsafe exactly while any live row's fragment lacks the col
          val c = cols(rnd.nextInt(cols.size))
          val nd = Some(rnd.nextInt(50).toLong + 100L)
          val unsafe = rows.exists(r => !r.vals.contains(c.id))
          val res = scala.util.Try(
            wh.setColumnDefault("d", "t", c.name, nd.map(_.toString)))
          assert(res.isSuccess === !unsafe,
            s"SET DEFAULT safety gate disagreed with the model: $res")
          if (!unsafe) cols = cols.map(x =>
            if (x.id == c.id) x.copy(default = nd) else x)

        case 8 => // SET NOT NULL: refusal iff any served cell is null
          val c = cols(rnd.nextInt(cols.size))
          val hasNull = rows.exists(r => expectCell(r, c).isEmpty)
          val res = scala.util.Try(
            wh.setColumnNullability("d", "t", c.name, nullable = false))
          assert(res.isSuccess === !hasNull,
            s"SET NOT NULL gate disagreed with the model: $res")
          if (!hasNull) notNull += c.id

        case 9 => // compaction: rewritten groups migrate physical names
          // (and rename eras) as a side effect; SERVED values must not
          // move. compact() reports what landed — "" = the (single)
          // unpartitioned group rewrote, empty = nothing to do.
          val landed = wh.compact("d", "t")
          if (landed.nonEmpty)
            rows = rows.map(r => r.copy(vals =
              cols.map(c => c.id -> expectCell(r, c)).toMap))

        case _ => // full rewrite (relayout): every row's fragment now
          // physically holds exactly the CURRENT read values
          wh.overwrite("d", "t", wh.read("d", "t"))
          rows = rows.map(r => r.copy(vals =
            cols.map(c => c.id -> expectCell(r, c)).toMap))
      }
      verify(s"op $op")
    }
  }
}
