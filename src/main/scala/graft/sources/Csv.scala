package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV source and sink with the same at-scale contract as [[Jsonl]]:
  * schema-enforced reads (CSV inference is an extra full pass AND
  * type-guesses from whatever rows it samples), corrupt lines counted
  * rather than silently dropped or fatally thrown, per-partition
  * sharded compressed writes. Headers are written and expected on read
  * (`header` carries column ORDER; the schema stays the type
  * authority). Prefer JSONL for nested data — CSV is the flat-table
  * interchange lane. */
object Csv {

  val CorruptCol = "_corrupt_record"

  /** Spark's CSV WRITER trims field whitespace by default — silent data
    * mutation; pinned off so the round trip is lossless like JSONL's. */
  def write(df: DataFrame, path: String,
            compression: String = "gzip"): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("compression", compression)
      .csv(path)

  /** Schema-enforced read; unparsable lines land in [[CorruptCol]].
    * `multiLine` honors quoted fields spanning physical lines (the
    * writer legally produces them for newline-bearing strings) at the
    * cost of file-grain parallelism — the same grain gzip compression
    * already imposes; shards are the parallel unit either way. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"pass the data schema only; $CorruptCol is added by the reader")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** (clean rows, corrupt-line count) — the shared [[CorruptGate]]. */
  def readCounted(spark: SparkSession, path: String,
                  schema: StructType): (DataFrame, Long) =
    CorruptGate.readCounted(read(spark, path, schema), CorruptCol)
}
