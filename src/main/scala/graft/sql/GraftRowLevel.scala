package graft.sql

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** v2-NATIVE UPDATE / MERGE / (non-metadata) DELETE — Spark's own
  * row-level framework (`SupportsRowLevelOperations`), group-based
  * copy-on-write, continuing the r15/r16 `SupportsDelete` work: under
  * `spark.graft.sql.dml.v2=true` the parse-time interception stands
  * down for catalog-qualified names and the ANALYZER rewrites
  * UPDATE/MERGE into `ReplaceData` over this operation —
  * `RewriteUpdateTable` / `RewriteMergeIntoTable`, the same plans
  * Iceberg runs.
  *
  * Division of labor:
  *  - READ side: the rewrite reads the target through a relation over
  *    `RowLevelOperationTable`; [[GraftRelationSubstitution]] splices
  *    the warehouse read plan there exactly as for SELECTs (deletion
  *    vectors, rename chains, defaults all served), so
  *    [[newScanBuilder]] delegates to the table's refusing stub — a
  *    batch-planned scan means the extensions are missing.
  *  - WRITE side: `ReplaceDataExec` streams the replacement rows
  *    (Spark applied the update/merge projections) into
  *    [[GraftReplaceDataWrite]] — executor tasks write parquet into a
  *    STAGED fragment of the table's own pool, and the driver commit
  *    lands it through the warehouse commit machinery (constraints,
  *    UNIQUE, zone sidecars, CAS log commit) as a full-table replace.
  *
  * One metadata attribute (`_g_frag`, the fragment-provenance column)
  * is required — Spark 4's group-based exec only projects the
  * `__row_operation` discriminator out of the writer's rows when a
  * metadata projection exists, so a no-metadata connector would
  * receive raw query output. The substituted read has no v2 scan, so
  * there is no RUNTIME group filtering: every group is considered
  * replaced and the write is a whole-table CoW rewrite — the honest
  * v2-native baseline. The PRUNED row-level paths remain the
  * interception commands and the warehouse API
  * (`updateWhere`/`mergeInto`), which zone/Bloom-prune candidates
  * before rewriting. MoR composes on the READ side: standing deletion
  * vectors mask rows going into the rewrite and the staged result is
  * written clean. */
final case class GraftRowLevelOperation(t: GraftTable,
                                        cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    t.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        // group-based CoW rewrites the table as ONE unpartitioned
        // fragment; hive-partitioned tables keep the pruned
        // interception/API paths (which preserve the layout)
        require(t.wh.meta(t.dataset, t.table).partitionField.isEmpty,
          s"${t.name()}: v2-native $cmd on a hive-partitioned table " +
            "would flatten its layout — run with " +
            "spark.graft.sql.dml.v2=false (parse-time interception) or " +
            "use the warehouse DML API")
        new GraftReplaceDataWrite(t, info.schema())
      }
    }

  /** `_g_frag` (see [[GraftTable.metadataColumns]]): its presence makes
    * the analyzer build a METADATA PROJECTION, which is what routes
    * `ReplaceDataExec` through the projecting write task — the writer
    * then receives clean data rows instead of raw query output still
    * carrying `__row_operation`. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftTable.FragColumn))

  override def description(): String = s"GraftRowLevel($cmd, ${t.name()})"
}

/** The ReplaceData write: executors stage parquet, the driver commits a
  * full-replace snapshot through the warehouse. Task attempts write
  * attempt-unique files and the commit keeps ONLY files named in the
  * commit messages — a zombie speculative task's stray file can never
  * leak rows into the committed snapshot. */
final class GraftReplaceDataWrite(t: GraftTable, schema: StructType)
    extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    private val frag = t.wh.stageFragmentDir(t.dataset, t.table)

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      // the session's full SQL conf rides into the Hadoop conf, plus
      // the row schema — and the keys ParquetWriteSupport.init ASSERTS
      // are explicitly present (FileFormat.prepareWrite normally sets
      // them; this write path talks to the writer support directly)
      val conf = t.wh.spark.sessionState.newHadoopConf()
      ParquetWriteSupport.setSchema(schema, conf)
      val sqlConf = t.wh.spark.sessionState.conf
      conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
        sqlConf.writeLegacyParquetFormat.toString)
      conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
        sqlConf.parquetOutputTimestampType.toString)
      conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
        sqlConf.parquetFieldIdWriteEnabled.toString)
      conf.set(org.apache.spark.sql.internal.SQLConf
          .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
        sqlConf.getConf(org.apache.spark.sql.internal.SQLConf
          .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
      conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
        sqlConf.getConf(org.apache.spark.sql.internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
      conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
        sqlConf.getConf(org.apache.spark.sql.internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
      new GraftParquetWriterFactory(frag.toString,
        new SerializableConfiguration(conf))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val keep = messages.collect { case GraftFileCommitMessage(f, n) if n >= 0 => f }
      t.wh.commitStagedReplace(t.dataset, t.table, frag, schema, keep.toSeq)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      t.wh.abortStagedFragment(t.dataset, t.table, frag)
  }

  override def description(): String = s"GraftReplaceDataWrite(${t.name()})"
}

/** One staged file per task attempt; rows = -1 marks "no file written"
  * (zero-row task). */
final case class GraftFileCommitMessage(file: String, rows: Long)
    extends WriterCommitMessage

final class GraftParquetWriterFactory(fragDir: String,
                                      conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftParquetDataWriter(fragDir, partitionId, taskId, conf.value)
}

/** Executor-side parquet writer over Spark's own
  * [[ParquetWriteSupport]] (the codec every other fragment in the pool
  * is written with, so footers carry the same stats zone maps read).
  * The file opens LAZILY on the first row — a zero-row task commits no
  * file. File names are attempt-unique (partitionId + taskId), so
  * retries never collide and the driver-side keep-list filters losers. */
final class GraftParquetDataWriter(fragDir: String, partitionId: Int,
                                   taskId: Long, conf: Configuration)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.api.WriteSupport
  import org.apache.parquet.hadoop.metadata.CompressionCodecName

  private val fileName = f"part-$partitionId%05d-$taskId.parquet"
  private val path = new org.apache.hadoop.fs.Path(fragDir, fileName)
  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L

  private final class B(p: org.apache.hadoop.fs.Path)
      extends ParquetWriter.Builder[InternalRow, B](p) {
    override def self(): B = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Metadata-carrying write (copied-over rows ride through with their
    * `_g_frag` tag): the tag is provenance, not payload — ignore it. */
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = new B(path).withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY).build()
    writer.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    GraftFileCommitMessage(fileName, if (rows > 0) rows else -1)
  }

  override def abort(): Unit = {
    close()
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) { fs.delete(path, false); () }
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
