package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source and sink — the columnar interchange lane beside the
  * text-line formats ([[Jsonl]], [[Csv]]): for data that leaves Spark
  * toward Hive/Trino-side consumers, ORC is the format they mount
  * natively. Same at-scale contract as the siblings where it applies:
  * schema-enforced reads (no footer-sampling schema merge pass across
  * thousands of files — the caller's schema is the type authority and
  * mismatches fail loudly instead of silently widening), compressed
  * sharded writes. Corrupt-RECORD counting has no ORC analog — a
  * corrupt stripe is a hard read error by design in a checksummed
  * binary format, not a row to quarantine.
  *
  * Like parquet, ORC scans serve predicate pushdown and column pruning
  * (min/max stripe statistics + bloom filters); the PlanSpec gate pins
  * that filters actually reach the scan, so the format keeps its
  * scan-skipping value at 100 TB. */
object Orc {

  def write(df: DataFrame, path: String,
            compression: String = "zstd"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .orc(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
