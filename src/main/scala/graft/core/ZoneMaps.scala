package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
import org.apache.spark.sql.types._

/** Per-fragment zone maps (min/max/null-count column statistics) — the
  * data-skipping layer every lakehouse format carries (Delta per-file
  * stats, Iceberg manifest metrics, Parquet row-group stats surfaced to
  * the planner): at 100 TB, a predicate on a clustered column should open
  * the handful of fragments whose [min,max] can satisfy it, not list and
  * footer-read a million files. The reference outsources this to
  * BigQuery's clustering metadata (admin/clustering.py relies on it);
  * a Spark-native warehouse has to carry its own.
  *
  * Stats live as one JSON sidecar per commit-log entry under
  * `_stats/<sanitized entry path>.json`. Entries (fragments) are
  * immutable, so a sidecar is write-once; entries with no sidecar
  * (legacy fragments, external writers) are simply never pruned —
  * data skipping is an optimization, never a correctness gate.
  *
  * Pruning ([[mayMatch]]) is a conservative may-contain test over the
  * UNRESOLVED predicate expression tree (the shape `Column` DSL
  * predicates arrive in): supported conjuncts prune, anything
  * unrecognized evaluates to "may match". String stats longer than
  * [[MaxStatLen]] are dropped at write time (the Delta trade: a min/max
  * over document text would bloat every manifest); the null/row counts
  * remain, so IsNull/IsNotNull pruning still works on such columns.
  */
object ZoneMaps {

  /** Drop string min/max beyond this length (document bodies etc.):
    * a truncated max is not a valid upper bound without increment
    * logic, and long stats bloat the sidecar. */
  val MaxStatLen = 64

  /** min/max arrive as `CAST(agg AS STRING)`; None = no stat (all-null
    * fragment, or dropped by the length cap — disambiguated via counts). */
  final case class ColStat(min: Option[String], max: Option[String],
                           nulls: Long, typ: String)

  /** Entry-level stats plus the per-FILE zones inside the entry. File
    * granularity is what makes skipping compose with clustering: a
    * range-clustered rewrite ([[Warehouse.recluster]]) produces ONE
    * fragment whose files each cover a narrow key range — per-file zones
    * prune inside it, per-entry zones cannot. `files` keys are file
    * names relative to the entry dir (fragments are immutable, so the
    * names never move); empty for sidecars written before file zones. */
  final case class FragStats(rows: Long, cols: Map[String, ColStat],
                             files: Map[String, FragStats] = Map.empty) {
    def nonNullRows(c: String): Option[Long] = cols.get(c).map(s => rows - s.nulls)
  }

  // ------------------------------------------------------------- compute

  private[core] def eligible(f: StructField): Boolean = f.dataType match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  private def typeTag(dt: DataType): String = dt match {
    case _: DecimalType => "decimal"
    case t => t.typeName
  }

  /** Per-FILE stats from the parquet FOOTER — metadata-only, no data
    * scan: the writer already computed per-row-group min/max/null-count
    * while writing, so zone maps cost a footer read per file (KBs)
    * instead of a second pass over the fragment (the Iceberg
    * manifest-metrics approach; Delta computes the same inline). Row
    * groups merge to a file zone via [[mergeAll]]. Returns None for an
    * unreadable/empty footer (caller records nothing — the fragment
    * simply never prunes).
    *
    * Soundness rules at the type boundary:
    *  - values render into the SAME canonical strings the prune-side
    *    `key()` parser reads (ISO dates/timestamps, plain/E-notation
    *    numerics, true/false);
    *  - string bounds are accepted only if pure ASCII (parquet orders
    *    bytes; Java compares UTF-16 code units — they agree on ASCII
    *    only) and within [[MaxStatLen]];
    *  - NaN/Infinity double bounds drop the pair (parquet's NaN
    *    ordering is unusable for range pruning);
    *  - a chunk without a null count drops the COLUMN for the file
    *    (both over- and under-stating nulls is unsound). */
  def statsFromFooter(conf: org.apache.hadoop.conf.Configuration,
                      file: Path): Option[FragStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    try {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), conf)
      val reader = ParquetFileReader.open(in)
      val blocks = try reader.getFooter.getBlocks finally reader.close()
      val perBlock = blocks.asScala.toSeq.map { b =>
        val rows = b.getRowCount
        val cols = b.getColumns.asScala.toSeq.flatMap { ch =>
          if (ch.getPath.size != 1) None // nested leaves: not prunable here
          else {
            val name = ch.getPath.toDotString
            val st = ch.getStatistics
            if (st == null || !st.isNumNullsSet) None
            else footerTypeTag(ch.getPrimitiveType).map { typ =>
              val (lo, hi) =
                if (!st.hasNonNullValue) (None, None)
                else (renderFooterValue(st.genericGetMin, typ, ch.getPrimitiveType),
                  renderFooterValue(st.genericGetMax, typ, ch.getPrimitiveType)) match {
                  case (Some(a), Some(b)) => (Some(a), Some(b))
                  case _ => (None, None) // one undrendered bound poisons the pair
                }
              name -> ColStat(lo, hi, st.getNumNulls, typ)
            }
          }
        }.toMap
        FragStats(rows, cols)
      }
      if (perBlock.isEmpty) Some(FragStats(0L, Map.empty)) else Some(mergeAll(perBlock))
    } catch { case _: Exception => None }
  }

  private def footerTypeTag(pt: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val lta = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case BOOLEAN => Some("boolean")
      case INT32 => lta match {
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some("date")
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some("decimal")
        case _ => Some("integer")
      }
      case INT64 => lta match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS |
                 LogicalTypeAnnotation.TimeUnit.MICROS =>
              Some(if (t.isAdjustedToUTC) "timestamp" else "timestamp_ntz")
            case _ => None // NANOS: engine normalizes to micros upstream
          }
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some("decimal")
        case _ => Some("long")
      }
      case FLOAT | DOUBLE => Some("double")
      case BINARY => lta match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => Some("string")
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some("decimal")
        case _ => None
      }
      case FIXED_LEN_BYTE_ARRAY => lta match {
        case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => Some("decimal")
        case _ => None
      }
      case _ => None
    }
  }

  private def renderFooterValue(v: Any, typ: String,
                                pt: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    try typ match {
      case "boolean" | "integer" | "long" => Some(v.toString)
      case "double" =>
        val d = v match {
          case f: java.lang.Float => f.doubleValue
          case d: java.lang.Double => d.doubleValue
        }
        if (d.isNaN || d.isInfinite) None else Some(d.toString)
      case "date" =>
        Some(java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue).toString)
      case "timestamp" | "timestamp_ntz" =>
        val unit = pt.getLogicalTypeAnnotation
          .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation].getUnit
        val micros = unit match {
          case LogicalTypeAnnotation.TimeUnit.MILLIS => v.asInstanceOf[java.lang.Long] * 1000L
          case _ => v.asInstanceOf[java.lang.Long].longValue
        }
        val t = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        Some(t.toString)
      case "decimal" =>
        val scale = pt.getLogicalTypeAnnotation
          .asInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation].getScale
        v match {
          case b: org.apache.parquet.io.api.Binary =>
            Some(new java.math.BigDecimal(
              new java.math.BigInteger(b.getBytes), scale).toPlainString)
          case i: java.lang.Integer => Some(java.math.BigDecimal.valueOf(i.longValue, scale).toPlainString)
          case l: java.lang.Long => Some(java.math.BigDecimal.valueOf(l.longValue, scale).toPlainString)
          case _ => None
        }
      case "string" =>
        val bytes = v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
        if (bytes.length <= MaxStatLen && bytes.forall(b => b >= 0)) // pure ASCII
          Some(new String(bytes, StandardCharsets.UTF_8))
        else None
      case _ => None
    } catch { case _: Exception => None }
  }

  /** Merge sibling zones up to their entry: min of mins / max of maxes
    * in the column's TYPED order, null/row counts add. A side whose
    * bounds were cap-dropped (values exist, no min/max) poisons the
    * merged pair to unknown; a side with no values at all defers to the
    * other. Columns present on only one side drop out (conservative:
    * absent stat = never prune). */
  def mergeAll(fs: Seq[FragStats]): FragStats = fs.reduce { (x, y) =>
    // a zero-row side is the merge identity: Spark writers emit empty
    // part files next to data files, and intersecting against their
    // (empty) column map would silently wipe every zone
    if (x.rows == 0) y
    else if (y.rows == 0) x
    else {
    val cols = x.cols.keySet.intersect(y.cols.keySet).flatMap { c =>
      val (a, b) = (x.cols(c), y.cols(c))
      val aVals = x.rows - a.nulls > 0
      val bVals = y.rows - b.nulls > 0
      val (lo, hi): (Option[String], Option[String]) =
        if (!aVals) (b.min, b.max)
        else if (!bVals) (a.min, a.max)
        else (a.min, a.max, b.min, b.max) match {
          case (Some(amn), Some(amx), Some(bmn), Some(bmx)) =>
            (key(a.typ, amn), key(a.typ, amx), key(a.typ, bmn), key(a.typ, bmx)) match {
              case (Some(k1), Some(k2), Some(k3), Some(k4)) =>
                (Some(if (cmp(a.typ, k1, k3) <= 0) amn else bmn),
                  Some(if (cmp(a.typ, k2, k4) >= 0) amx else bmx))
              case _ => (None, None)
            }
          case _ => (None, None)
        }
      Some(c -> ColStat(lo, hi, a.nulls + b.nulls, a.typ))
    }.toMap
    FragStats(x.rows + y.rows, cols)
    }
  }

  // ------------------------------------------------------------ sidecars

  /** INJECTIVE flattening of an entry path to a sidecar file name:
    * `[A-Za-z0-9.-]` verbatim, every other char (including `_`, the
    * escape lead) as `_xx` / `_uxxxx` hex. A lossy replacement (the old
    * `[^\w.-] → _`) let two partition values like `x y` and `x+y` in
    * one fragment COLLIDE on a sidecar — the second write overwrites
    * the first and pruning then consults the wrong min/max, which can
    * prune fragments that contain matches. Old-scheme sidecars simply
    * stop resolving (absent stat = never prune — conservative). */
  private[core] def sidecarName(entryPath: String): String = {
    val sb = new StringBuilder(entryPath.length + 8)
    entryPath.foreach { c =>
      if (c == '.' || c == '-' || (c >= '0' && c <= '9') ||
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) sb.append(c)
      else if (c < 0x100) sb.append(f"_$c%02x")
      else sb.append(f"_u$c%04x")
    }
    sb.toString
  }

  def statsPath(tableDir: Path, entryPath: String): Path =
    tableDir.resolve("_stats").resolve(sidecarName(entryPath) + ".json")

  private val mapper = new ObjectMapper()

  private def renderStats(node: ObjectNode, st: FragStats): Unit = {
    node.put("rows", st.rows)
    val cols = node.putObject("cols")
    st.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val n = cols.putObject(name)
      c.min.foreach(n.put("min", _))
      c.max.foreach(n.put("max", _))
      n.put("nulls", c.nulls)
      n.put("type", c.typ)
    }
    if (st.files.nonEmpty) {
      val fn = node.putObject("files")
      st.files.toSeq.sortBy(_._1).foreach { case (name, f) =>
        renderStats(fn.putObject(name), f)
      }
    }
  }

  /** Process-wide sidecar cache, keyed by absolute sidecar path.
    * SOUND because fragment dirs are full-UUID write-once paths (never
    * reused) and a present sidecar's content never changes after its
    * write — only ABSENT sidecars can transition (analyze backfill), so
    * misses are never cached. Bounded, insert-until-full (entries are a
    * few KB; 64k ≈ tens of MB). Why it exists: the SQL read path prunes
    * through sidecars at PLAN time, and a hot append table with
    * thousands of live fragments must not pay thousands of driver file
    * opens per statement — cached, planning costs one map probe per
    * entry after first touch. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Path, FragStats]()
  private val MaxCached = 65536

  def write(tableDir: Path, entryPath: String, st: FragStats): Unit = {
    val root = mapper.createObjectNode()
    renderStats(root, st)
    val p = statsPath(tableDir, entryPath)
    Files.createDirectories(p.getParent)
    Files.write(p, mapper.writeValueAsBytes(root))
    // keep the cache coherent for the writer's own process (re-writes
    // happen only in hand-built test states, but stale would be unsound)
    if (cache.size < MaxCached) cache.put(p, st) else cache.remove(p)
  }

  private def parseStats(root: com.fasterxml.jackson.databind.JsonNode): FragStats = {
    val cols = Option(root.get("cols")).map { cn =>
      cn.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> ColStat(
          Option(v.get("min")).map(_.asText()),
          Option(v.get("max")).map(_.asText()),
          Option(v.get("nulls")).map(_.asLong()).getOrElse(0L),
          Option(v.get("type")).map(_.asText()).getOrElse("string"))
      }.toMap
    }.getOrElse(Map.empty[String, ColStat])
    val files = Option(root.get("files")).map { fn =>
      fn.properties().asScala.map(e => e.getKey -> parseStats(e.getValue)).toMap
    }.getOrElse(Map.empty[String, FragStats])
    FragStats(root.get("rows").asLong(), cols, files)
  }

  def read(tableDir: Path, entryPath: String): Option[FragStats] = {
    val p = statsPath(tableDir, entryPath)
    val hit = cache.get(p)
    // a cache hit still stats the file (µs-scale on a real filesystem):
    // out-of-band sidecar deletion must keep reading as "no stats — no
    // pruning", exactly as before the cache. The parse is what's saved.
    if (hit != null) {
      if (Files.exists(p)) return Some(hit)
      cache.remove(p)
      return None
    }
    if (!Files.exists(p)) return None
    try {
      val st = parseStats(
        mapper.readTree(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
      if (cache.size < MaxCached) cache.put(p, st)
      Some(st)
    } catch { case _: Exception => None } // corrupt sidecar = no pruning
  }

  /** Remove sidecars whose entry no longer exists in any live commit
    * (vacuum's counterpart for stats; sidecars are tiny, so this is
    * hygiene, not capacity). */
  def vacuumStats(tableDir: Path, liveEntryPaths: Set[String]): Unit = {
    val dir = tableDir.resolve("_stats")
    if (!Files.isDirectory(dir)) return
    val liveFiles = liveEntryPaths.flatMap(p =>
      Seq(sidecarName(p) + ".json", sidecarName(p) + ".bloom"))
    val ls = Files.list(dir)
    try ls.iterator().asScala.toSeq
      .filterNot(p => liveFiles(p.getFileName.toString))
      .foreach { p =>
        cache.remove(p); BloomIndex.invalidate(p)
        Files.deleteIfExists(p)
      }
    finally ls.close()
  }

  // ------------------------------------------------------------- pruning

  /** Resolve a DSL predicate against a table schema: Spark 4 `Column`s
    * carry ColumnNodes, not Catalyst expressions, so pruning works on the
    * ANALYZED condition — which also buys type coercion (a string literal
    * against a date column arrives as a typed date literal, exactly the
    * value space the stats were recorded in). Unresolvable predicates
    * (unknown column, etc.) yield None → caller scans everything; the
    * real read will surface the analysis error with Spark's own message. */
  def resolvePredicate(spark: org.apache.spark.sql.SparkSession,
                       schema: StructType, pred: Column): Option[Expression] =
    try {
      val empty = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      empty.filter(pred).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    } catch { case _: Exception => None }

  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.name)
      // deliberately NOT seeing through Cast on the attribute side: a
      // non-order-isomorphic cast (string→int, long→float rounding)
      // would make range pruning unsound
      case _ => None
    }
  }

  private object Lit {
    def unapply(e: Expression): Option[Any] = e match {
      case Literal(v, _) => Some(v) // null value → Some(null)
      // coercion wraps literals as Cast(Literal): foldable, safe to eval
      case _ if e.foldable && e.deterministic =>
        try Some(e.eval(null)) catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Order-comparable key for a stat string / literal under the column's
    * type tag; None = unparseable → caller must not prune. */
  private def key(typ: String, v: Any): Option[Any] = {
    if (v == null) return None
    val s = v.toString
    try typ match {
      case "string" => Some(s)
      case "boolean" => Some(if (s.toBoolean) 1L else 0L)
      case "date" => v match {
        case i: java.lang.Integer => Some(i.longValue) // catalyst DateType: epoch days
        case _ => Some(java.time.LocalDate.parse(s).toEpochDay)
      }
      case "timestamp" | "timestamp_ntz" => v match {
        case l: java.lang.Long => Some(l.longValue) // catalyst micros
        case _ =>
          val t = if (s.contains(" ") || s.contains("T"))
            java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          else java.time.LocalDate.parse(s).atStartOfDay()
          Some(t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L +
            t.getNano / 1000 % 1000)
      }
      case _ => Some(new java.math.BigDecimal(s)) // numeric family
    } catch { case _: Exception => None }
  }

  private def cmp(typ: String, a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case _ => 0 // mixed keys can't happen for one typ; defensive no-prune
  }

  /** Conservative "this fragment may contain a row where `pred` is TRUE".
    * Sound for WHERE/DELETE semantics (NULL counts as no-match): a
    * `false` here proves no row in the fragment satisfies the predicate. */
  def mayMatch(pred: Expression, st: FragStats): Boolean =
    if (st.rows == 0) false // an empty fragment matches nothing
    else mayMatchNonEmpty(pred, st)

  private def mayMatchNonEmpty(pred: Expression, st: FragStats): Boolean = pred match {
    case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
    case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
    case Literal(b: Boolean, BooleanType) => b
    case Literal(null, _) => false // WHERE NULL matches nothing

    case EqualTo(Attr(c), Lit(v)) => rangeMay(st, c, v, lo = true, hi = true, strict = false)
    case EqualTo(Lit(v), Attr(c)) => rangeMay(st, c, v, lo = true, hi = true, strict = false)
    case EqualNullSafe(Attr(c), Lit(v)) =>
      if (v == null) hasNulls(st, c) else rangeMay(st, c, v, lo = true, hi = true, strict = false)
    case EqualNullSafe(Lit(v), Attr(c)) =>
      if (v == null) hasNulls(st, c) else rangeMay(st, c, v, lo = true, hi = true, strict = false)

    case LessThan(Attr(c), Lit(v)) => rangeMay(st, c, v, lo = false, hi = true, strict = true)
    case LessThanOrEqual(Attr(c), Lit(v)) => rangeMay(st, c, v, lo = false, hi = true, strict = false)
    case GreaterThan(Attr(c), Lit(v)) => rangeMay(st, c, v, lo = true, hi = false, strict = true)
    case GreaterThanOrEqual(Attr(c), Lit(v)) => rangeMay(st, c, v, lo = true, hi = false, strict = false)
    // literal-on-the-left flips the direction
    case LessThan(Lit(v), Attr(c)) => rangeMay(st, c, v, lo = true, hi = false, strict = true)
    case LessThanOrEqual(Lit(v), Attr(c)) => rangeMay(st, c, v, lo = true, hi = false, strict = false)
    case GreaterThan(Lit(v), Attr(c)) => rangeMay(st, c, v, lo = false, hi = true, strict = true)
    case GreaterThanOrEqual(Lit(v), Attr(c)) => rangeMay(st, c, v, lo = false, hi = true, strict = false)

    case In(Attr(c), vs) =>
      val lits = vs.map(Lit.unapply)
      if (lits.exists(_.isEmpty)) true // a non-literal member defeats pruning
      else lits.flatten.exists(v => rangeMay(st, c, v, lo = true, hi = true, strict = false))
    case InSet(Attr(c), vs) =>
      vs.exists(v => rangeMay(st, c, v, lo = true, hi = true, strict = false))

    case IsNull(Attr(c)) => hasNulls(st, c)
    case IsNotNull(Attr(c)) => hasNonNull(st, c)

    case StartsWith(Attr(c), Lit(v)) if v != null =>
      st.cols.get(c) match {
        case Some(cs) if st.rows - cs.nulls == 0 => false
        case Some(ColStat(Some(mn), Some(mx), _, "string")) =>
          val p = v.toString
          // s has prefix p ⇒ s >= p and min<=s ⇒ min.take(|p|) <= p;
          // both bounds complete, never prune a match
          mn.take(p.length) <= p && p <= mx
        case _ => true
      }

    case _ => true // unsupported shape: never prune
  }

  private def hasNulls(st: FragStats, c: String): Boolean =
    st.cols.get(c).forall(_.nulls > 0)

  private def hasNonNull(st: FragStats, c: String): Boolean =
    st.cols.get(c).forall(cs => st.rows - cs.nulls > 0)

  /** May a non-null value v' of column c with (lo: v' >= v / hi: v' <= v,
    * strict per flag... inverted: we test whether the fragment range
    * intersects the half-line/point the predicate asks for. `lo` = the
    * predicate needs values >= v possible, i.e. max(c) must reach v;
    * `hi` = needs values <= v possible, i.e. min(c) must not exceed v. */
  private def rangeMay(st: FragStats, c: String, v: Any,
                       lo: Boolean, hi: Boolean, strict: Boolean): Boolean = {
    if (v == null) return false // comparison with NULL never TRUE
    st.cols.get(c) match {
      case None => true // column not covered by stats
      case Some(cs) =>
        if (st.rows - cs.nulls == 0) return false // all-null: no value comparisons
        (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            (key(cs.typ, v), key(cs.typ, mn), key(cs.typ, mx)) match {
              case (Some(kv), Some(kmn), Some(kmx)) =>
                val upOk = !lo || (if (strict) cmp(cs.typ, kmx, kv) > 0 else cmp(cs.typ, kmx, kv) >= 0)
                val loOk = !hi || (if (strict) cmp(cs.typ, kmn, kv) < 0 else cmp(cs.typ, kmn, kv) <= 0)
                upOk && loOk
              case _ => true // unparseable (NaN etc.): no pruning
            }
          case _ => true // stats dropped by length cap
        }
    }
  }

  /** File-level scan plan inside one entry: (files to scan, files the
    * zones prove clean), names relative to the entry dir. None when the
    * sidecar predates file zones (caller scans the whole entry). */
  def pruneFiles(st: FragStats, resolved: Expression)
      : Option[(Seq[String], Seq[String])] =
    if (st.files.isEmpty) None
    else Some(st.files.keys.toSeq.sorted.partition(f => mayMatch(resolved, st.files(f))))

  /** Re-key a fragment's stats from PHYSICAL column names to the
    * CURRENT names the resolved predicate uses, via the fragment's own
    * rename map ([[graft.core.Warehouse]] linksFor — pre-rename
    * fragments re-label, post-reuse fragments don't). Without this a
    * predicate on a renamed column never prunes (stale sidecar name),
    * and under name REUSE it would prune against the WRONG column's
    * min/max — missing rows silently. Two physical columns landing on
    * one current name (legacy unstamped fragments under reuse) are
    * ambiguous: that stat drops entirely — never prune on a name you
    * cannot attribute. */
  def rekey(st: FragStats, rm: Map[String, String]): FragStats =
    if (rm.isEmpty) st
    else {
      val cols = st.cols.toSeq
        .groupBy { case (p, _) => rm.getOrElse(p, p) }
        .collect { case (n, Seq((_, cs))) => n -> cs }
      FragStats(st.rows, cols.toMap,
        st.files.map { case (f, fs) => f -> rekey(fs, rm) })
    }

  /** Entry-level scan plan: partition `entries` into (scan, pruned) under
    * the RESOLVED predicate (see [[resolvePredicate]]) using whatever
    * sidecars exist. `renamesFor` supplies each entry's physical→current
    * rename map (see [[rekey]]); the default (no renames) probes the
    * sidecar names as written. */
  def prune(tableDir: Path, entries: Seq[SnapshotLog.Entry], resolved: Option[Expression],
            renamesFor: SnapshotLog.Entry => Map[String, String] = _ => Map.empty)
      : (Seq[SnapshotLog.Entry], Seq[SnapshotLog.Entry]) =
    resolved match {
      case None => (entries, Seq.empty)
      case Some(expr) =>
        entries.partition { e =>
          read(tableDir, e.path) match {
            case Some(st) => mayMatch(expr, rekey(st, renamesFor(e)))
            case None => true
          }
        }
    }
}
