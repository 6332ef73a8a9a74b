package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source and sink — the interchange
  * format LLM data pipelines actually exchange (WebText-style dumps,
  * filtered-corpus drops, eval sets). Spark's json reader/writer IS
  * line-delimited by default, so this wrapper's job is to pin the
  * at-scale contract rather than add mechanics:
  *
  *  - **Reads take an explicit schema, always.** Schema inference on
  *    JSONL means an EXTRA FULL PASS over 100 TB before the real scan,
  *    and a schema that drifts with whatever the sampled lines happened
  *    to contain. The schema is the contract; the reader enforces it.
  *  - **Corrupt lines are counted, not silently dropped or fatally
  *    thrown.** PERMISSIVE mode parks unparsable lines in
  *    `_corrupt_record`; [[readCounted]] surfaces the count so a
  *    pipeline can fail on a threshold ("> 0.1% bad lines = upstream
  *    broke") instead of either extreme.
  *  - **Writes shard by partition** — one file per task, so writer
  *    parallelism = reader parallelism of the next stage; compression is
  *    zstd-class splittable-enough for line formats at the file grain
  *    (a file is a shard; shards are the parallel unit, as in
  *    [[graft.operators.Shard]]).
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Write `df` as compressed JSONL, one file per partition. */
  def write(df: DataFrame, path: String,
            compression: String = "gzip"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .json(path)

  /** Schema-enforced read; unparsable lines land in [[CorruptCol]]
    * (added to the schema here — callers pass the DATA schema only). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"pass the data schema only; $CorruptCol is added by the reader")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** (clean rows, corrupt-line count) — the shape a gate consumes; the
    * persisted-count dance lives in the shared [[CorruptGate]]. At
    * petabyte grain, prefer splitting once via a partitioned write of
    * the parsed frame instead of counting up front. */
  def readCounted(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, Long) =
    CorruptGate.readCounted(read(spark, path, schema), CorruptCol)
}
