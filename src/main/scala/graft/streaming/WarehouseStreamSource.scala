package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.core.Warehouse

/** Structured Streaming source over a warehouse table's commit log —
  * the push twin of the pull-shaped `nextAppends`/`commitConsumed`
  * (graft.core.Warehouse): instead of hand-rolling a poll loop, a
  * consumer writes
  *
  *   spark.readStream.format("graft-table")
  *     .option("root", wh.root).option("dataset", d).option("table", t)
  *     .load()
  *
  * and composes watermarks/windows/joins on top — the Delta-style
  * "commit log as a stream" contract.
  *
  * Semantics (identical to nextAppends, offset = COMMIT VERSION):
  *  - the first batch is the table's full state at the stream-start
  *    commit (initial snapshot), served through the normal read path —
  *    deletion-vector masks, renames, and column defaults all apply;
  *  - each subsequent batch is exactly the fragments appended between
  *    the consumed version and the current one (appendedBetween) — an
  *    O(new data) read, the standing corpus never rescans;
  *  - a non-append-only span (delete/merge/compact/replace landed
  *    mid-stream) fails LOUDLY with the same message as nextAppends —
  *    silently replaying rewritten fragments would double-count;
  *  - WAP-staged fragments live outside the commit log until publish,
  *    so staged data is invisible by construction; a publish becomes an
  *    ordinary append commit and flows through.
  *
  * The v1 Source API is deliberate: `getBatch` returns a DataFrame, so
  * the snapshot log's read path (manifest pruning, dv anti-joins,
  * rename relabeling) is reused verbatim instead of reimplementing a
  * parquet reader inside a DSv2 PartitionReader. Offsets are plain
  * version numbers — restart-safe via the checkpoint's offset log. */
class WarehouseStreamSource(sqlContext: SQLContext, root: String,
                            dataset: String, table: String)
    extends Source {

  private val wh = new Warehouse(sqlContext.sparkSession, root)

  override val schema: StructType =
    WarehouseStreamSource.tableSchema(wh, dataset, table)

  override def getOffset: Option[Offset] = {
    val latest = wh.log(dataset, table).latest
    // a mid-stream DROP must fail the query loudly, not read as "no new
    // data" forever: filtering the drop commit away would leave the
    // stream idling healthy while the table is gone (and a later
    // recreate would then fail with a misleading not-append-only error)
    latest.filter(_.isDrop).foreach { c =>
      throw new IllegalStateException(
        s"$dataset.$table was DROPPED at v${c.version} mid-stream — " +
          "the append stream cannot continue")
    }
    latest.map(c => WarehouseStreamSource.VersionOffset(c.version))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = WarehouseStreamSource.version(end)
    val out = start.map(WarehouseStreamSource.version) match {
      case None => wh.readVersion(dataset, table, endV) // initial snapshot
      case Some(v1) if v1 >= endV =>
        sqlContext.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      case Some(v1) =>
        wh.appendedBetween(dataset, table, v1, endV).getOrElse(
          throw new IllegalStateException(
            s"$dataset.$table history ($v1, $endV] is not append-only " +
              "(delete/merge/compact/replace happened) — streaming append " +
              "consumption would be wrong; consume changesBetween instead"))
    }
    // Resolve each STREAM-DECLARED column against the batch: additive
    // evolution pads new-schema-only columns with nulls, and a column
    // RENAMED mid-stream is the SAME column — follow the rename chain
    // from the declared name to whatever the batch serves it under
    // (matching by name alone would pad the old name with nulls and
    // DROP the renamed column's data: silent corruption).
    val cols = schema.fieldNames.map { n =>
      val cur = currentNameOf(n)
      if (out.columns.contains(cur)) org.apache.spark.sql.functions.col(cur).as(n)
      else if (out.columns.contains(n)) org.apache.spark.sql.functions.col(n)
      else org.apache.spark.sql.functions.lit(null)
        .cast(schema(n).dataType).as(n)
    }
    WarehouseStreamSource.asStreaming(out.select(cols.toSeq: _*))
  }

  /** The CURRENT name of the column the stream declared as `n`: walk
    * the persisted rename chain forward from `n`. Name REUSE across the
    * chain (a→b then c→a) cannot be disambiguated without per-link
    * versions — that stream must restart, loudly, rather than serve the
    * wrong column. */
  private def currentNameOf(n: String): String = {
    val links = wh.meta(dataset, table).columnRenames
    var cur = n
    var firstLink = -1
    links.zipWithIndex.foreach { case ((o, t), i) =>
      if (o == cur) { cur = t; if (firstLink < 0) firstLink = i }
    }
    if (cur != n) {
      val reused = links.zipWithIndex
        .exists { case ((_, t), i) => t == n && i > firstLink }
      if (reused) throw new IllegalStateException(
        s"column '$n' was renamed mid-stream and its name later reused " +
          "by another rename — ambiguous for a running stream; restart " +
          "the streaming query to pick up the current schema")
    }
    // dropped-then-re-added mid-stream: the chain maps the declared
    // name to its tombstone — the stream's declared column no longer
    // exists as a logical column; serving the RE-ADDED one silently
    // would swap columns under the consumer
    if (cur.startsWith("__graft_dropped__")) throw new IllegalStateException(
      s"column '$n' was dropped and its name re-added mid-stream — " +
        "restart the streaming query to pick up the current schema")
    cur
  }

  override def stop(): Unit = ()
}

object WarehouseStreamSource {

  /** Version-number offset (json = the integer as text). */
  final case class VersionOffset(v: Int) extends Offset {
    override def json: String = v.toString
  }

  private[streaming] def version(o: Offset): Int = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toInt // offset-log round trip
  }

  private[streaming] def tableSchema(wh: Warehouse, dataset: String,
                                     table: String): StructType = {
    val c = wh.log(dataset, table).latest.filter(!_.isDrop).getOrElse(
      throw new IllegalArgumentException(
        s"no such table: $dataset.$table (stream sources need an existing table)"))
    c.schemaDdl.map(StructType.fromDDL).getOrElse(wh.schema(dataset, table))
  }

  /** Batch plan → one streaming-tagged leaf over the same rows — keeps
    * interior batch joins (dv anti-joins, unions) OUT of the streaming
    * plan so they are never mistaken for stream-stream joins. */
  private[streaming] def asStreaming(df: DataFrame): DataFrame =
    org.apache.spark.sql.GraftBridge.streamingDataFrame(df)
}

/** EXACTLY-ONCE streaming sink into a warehouse table — the write twin
  * of [[WarehouseStreamSource]]:
  *
  *   df.writeStream.format("graft-table")
  *     .option("root", wh.root).option("dataset", d).option("table", t)
  *     .option("checkpointLocation", ckpt).start()
  *
  * Each micro-batch appends through
  * [[graft.core.Warehouse.append(dataset:String,table:String,df:org\.apache\.spark\.sql\.DataFrame,idempotencyTag:Option[String])*]]
  * with the (streamId, batchId) idempotency tag as the commit action:
  * a replayed batch (restart after a crash between commit and offset
  * write, or a zombie racing its own restart) is detected IN the commit
  * CAS and skipped — the batch lands exactly once no matter how many
  * times Structured Streaming re-delivers it. The streamId derives from
  * the checkpoint location (one checkpoint = one logical stream), or an
  * explicit `streamId` option. Constraints/UNIQUE keys enforce exactly
  * as on any append; a violation fails the batch and the query, loudly. */
class WarehouseStreamSink(sqlContext: SQLContext, root: String,
                          dataset: String, table: String, streamId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val wh = new Warehouse(sqlContext.sparkSession, root)

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val batch = org.apache.spark.sql.GraftBridge.batchDataFrame(data)
    val tag = Some(s"append stream=$streamId batch=$batchId")
    // partitioned targets take the hive-fragment append (day-partition
    // streaming ingest); unpartitioned the plain one — same tag contract
    val committed =
      if (wh.meta(dataset, table).partitionField.isDefined)
        wh.appendPartitioned(dataset, table, batch, tag)
      else wh.append(dataset, table, batch, tag)
    if (!committed)
      System.err.println(
        s"[graft-table sink] batch $batchId of stream $streamId already " +
          "committed — replay skipped")
  }

  override def toString: String = s"WarehouseStreamSink($dataset.$table)"
}

/** `format("graft-table")` registration (source + sink). */
class WarehouseSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def opt(parameters: Map[String, String], k: String): String =
    parameters.getOrElse(k, throw new IllegalArgumentException(
      s"graft-table stream source needs option '$k' " +
        "(root, dataset, table)"))

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink: partitioning is table metadata, not a writer option")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-table sink supports Append output mode only, got $outputMode")
    // the FULL name-UUID: truncating it (an earlier 8-hex-char cut)
    // let two distinct checkpoints collide on the idempotency tag and
    // silently skip a real batch as a "replay" — 32 bits of id buys
    // nothing but collision risk on a tag with no length constraint
    val streamId = parameters.get("streamId")
      .orElse(parameters.get("checkpointLocation").map(p =>
        java.util.UUID.nameUUIDFromBytes(
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString))
      .getOrElse(throw new IllegalArgumentException(
        "graft-table sink needs a checkpointLocation (or explicit " +
          "streamId) to make batch replays identifiable"))
    new WarehouseStreamSink(sqlContext, opt(parameters, "root"),
      opt(parameters, "dataset"), opt(parameters, "table"), streamId)
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val wh = new Warehouse(sqlContext.sparkSession, opt(parameters, "root"))
    ("graft-table", schema.getOrElse(WarehouseStreamSource.tableSchema(
      wh, opt(parameters, "dataset"), opt(parameters, "table"))))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new WarehouseStreamSource(sqlContext, opt(parameters, "root"),
      opt(parameters, "dataset"), opt(parameters, "table"))
}
