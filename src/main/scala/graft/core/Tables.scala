package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic warehouse fixtures (TESTDATA.md).
  *
  * Tables are one Parquet file/dir per name under a scale-factor dir.
  * All engine operators take `(SparkSession, sfDir)` and pull inputs
  * through here so that column pruning + filter pushdown reach the
  * Parquet scan (the scan is declared lazily; Catalyst prunes).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") return loadEvents(spark, dir)
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** NTZ→LTZ fallback for sessions built without
    * [[GraftSession.requiredConfs]] (which disable NTZ inference at the
    * scan): under the engine's UTC session timezone the cast reads the
    * naive wall-clock as UTC — the same instants the oracle sees. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    ntz.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** The events fixture stores `ts` as Parquet TIMESTAMP(NANOS), which the
    * Spark reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as Long
    * (legacy conf) and convert to a microsecond TimestampType column with
    * integer arithmetic (ns since 2024 ≈ 1.7e18 > 2^53, so a double-typed
    * division would lose precision — `div` keeps it integral).
    *
    * The nanosAsLong conf is session-level and is expected to be applied at
    * session construction ([[GraftSession.builder]]); it is only set here as
    * a one-time fallback for ad-hoc sessions (never toggled back, so reads
    * can't race on session state mid-flight).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else normalizeNtz(raw)
  }

  /** Register every fixture table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
