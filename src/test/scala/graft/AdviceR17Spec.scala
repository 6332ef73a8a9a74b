package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Round-18 closures of the round-17 ADVICE findings — each test is the
  * adviser's concrete failure scenario, pinned. */
class AdviceR17Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse = {
    val root = Files.createTempDirectory("advice_r17")
    new Warehouse(spark, root.toString)
  }

  test("ADVICE-high: copy of a copy keeps a sequential rename chain sequential") {
    // copy T1(a->b) -> T2, rename b->c on T2, copy T2 -> T3: the second
    // rebase allocated -2 again, colliding with the retained -2 link, so
    // linkGroups fused [a->b, b->c] into one simultaneous group and the
    // trajectory from `a` stopped at `b` — old-era `c` read NULL.
    val wh = freshWh()
    wh.overwrite("d", "t1", Seq((1L, "x1"), (2L, "x2")).toDF("id", "a"))
    wh.renameColumn("d", "t1", "a", "b")
    wh.copy("d", "t1", "d", "t2")
    wh.renameColumn("d", "t2", "b", "c")
    wh.copy("d", "t2", "d", "t3")
    val got = wh.read("d", "t3").select("id", "c").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "x1", 2L -> "x2"), s"chain collapsed: $got")
  }

  test("ADVICE-low: rename link stamps match the version the rename commit actually took") {
    // A concurrent writer winning the CAS race used to land the rename
    // commit at stampV+1 while the link stayed stamped stampV — a pinned
    // read at the raced version applied the rename one version early.
    // Race renames against a busy no-op committer and assert the
    // invariant: every positive link stamp names a "rename" commit.
    val wh = freshWh()
    wh.overwrite("d", "t", Seq((1L, "x")).toDF("id", "c0"))
    @volatile var stop = false
    val racer = new Thread(() => {
      val lg = wh.log("d", "t")
      while (!stop)
        lg.commitWith("write", cur => cur.filter(!_.isDrop)
          .map(_.entries).getOrElse(Seq.empty))
    })
    racer.start()
    try (0 until 8).foreach(i => wh.renameColumn("d", "t", s"c$i", s"c${i + 1}"))
    finally { stop = true; racer.join() }
    val lg = wh.log("d", "t")
    val m = wh.meta("d", "t")
    val stamps = m.columnRenameVersions.padTo(m.columnRenames.size, -1)
    m.columnRenames.zip(stamps).filter(_._2 >= 0).foreach { case ((f, t), v) =>
      val action = lg.version(v).map(_.action)
      assert(action.contains("rename"),
        s"link $f->$t stamped v$v but that commit is $action")
    }
    // and the renamed column still reads through the full chain
    assert(wh.read("d", "t").select("c8").as[String].collect().toSeq == Seq("x"))
  }

  test("ADVICE-low: OPTIMIZE ... WHERE escapes hostile partition values and refuses no-match scopes") {
    // entries store the PATH-ESCAPED hive dir value; a raw literal with
    // a space/colon matched nothing and OPTIMIZE silently no-opped
    val wh = freshWh()
    wh.overwrite("d", "p", Seq((1L, "x", "US west")).toDF("k", "v", "region"),
      graft.core.TableMeta(partitionField = Some("region"),
        partitionType = "string"))
    for (i <- 2 to 3)
      wh.appendPartitioned("d", "p",
        Seq((i.toLong, "x", "US west")).toDF("k", "v", "region"))
    wh.appendPartitioned("d", "p",
      Seq((9L, "y", "EU:east")).toDF("k", "v", "region"))
    graft.sql.GraftSql.register(spark, "adv_optw", wh, "d", "p")
    val before = wh.log("d", "p").latest.get.entries.groupBy(_.partition)
    assert(before.size == 2 && before.values.exists(_.size > 1))
    val landed = spark.sql("OPTIMIZE adv_optw WHERE region = 'US west'")
      .collect().map(_.getString(0)).toSeq
    assert(landed.size == 1, s"scoped rewrite must land once, got $landed")
    val after = wh.log("d", "p").latest.get.entries.groupBy(_.partition)
    val usKey = after.keys.find(_.contains("US")).get
    assert(after(usKey).size == 1,
      s"scoped partition must compact to one fragment: ${after(usKey)}")
    // data intact across the escape boundary
    assert(wh.read("d", "p").count() == 4)
    // a scope matching no live partition must refuse, not silently no-op
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE adv_optw WHERE region = 'nope'")
    }
    assert(e.getMessage.contains("matches no live partition"), e.getMessage)
  }

  test("ADVICE-low: SET NOT NULL treats rename-ambiguous fragments as unproven, not absent") {
    // A legacy unstamped link a->b plus a physical b makes TWO physical
    // columns map to current name b. The sidecar lookup used to report
    // that as None — the same answer as "column absent" — and with a
    // non-null default declared, SET NOT NULL proved itself over a
    // fragment whose rows hold NULLs. Ambiguous must fall to the probe.
    val wh = freshWh()
    wh.overwrite("d", "t", Seq(
      (1L, Option("av"), Option.empty[String]),
      (2L, Option.empty[String], Option("bv"))).toDF("id", "a", "b"))
    val m = wh.meta("d", "t")
    wh.setMeta("d", "t", m.copy(
      columnRenames = Seq("a" -> "b"),
      columnRenameVersions = Seq(-1),
      columnDefaults = Seq("b" -> "'x'")))
    val e = intercept[Exception] {
      wh.setColumnNullability("d", "t", "b", nullable = false)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("ADVICE-low: ANALYZE NOSCAN refuses a row count under merge-on-read masks") {
    val wh = freshWh()
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    assert(wh.tableStats("d", "t")._2.contains(3L))
    wh.deleteWhereMor("d", "t", col("id") === 2L)
    // sidecar still says 3; the mask serves 2 — report unknown, never 3
    assert(wh.tableStats("d", "t")._2.isEmpty,
      "dv-masked table must not report the unmasked sidecar sum")
    // compaction materializes the mask away; the exact count returns
    wh.compact("d", "t", targetBytes = 1L << 30)
    assert(wh.tableStats("d", "t")._2.contains(2L))
  }

  test("ADVICE-high: three-deep copy chain with interleaved appends") {
    val wh = freshWh()
    wh.overwrite("d", "s1", Seq((1L, "v1")).toDF("id", "a"))
    wh.renameColumn("d", "s1", "a", "b")
    wh.append("d", "s1", Seq((2L, "v2")).toDF("id", "b"))
    wh.copy("d", "s1", "d", "s2")
    wh.renameColumn("d", "s2", "b", "c")
    wh.append("d", "s2", Seq((3L, "v3")).toDF("id", "c"))
    wh.copy("d", "s2", "d", "s3")
    wh.renameColumn("d", "s3", "c", "dd")
    wh.copy("d", "s3", "d", "s4")
    val got = wh.read("d", "s4").select("id", "dd").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "v1", 2L -> "v2", 3L -> "v3"),
      s"deep chain collapsed: $got")
  }
}
