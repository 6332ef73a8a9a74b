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
    normalizeNtz(spark, spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** NTZ→LTZ fallback for sessions built without
    * [[GraftSession.requiredConfs]] (which disable NTZ inference at the
    * scan): the cast reads the naive wall-clock in the SESSION timezone,
    * so UTC is forced first (ad-hoc sessions lack the UTC conf that
    * requiredConfs sets — without it the cast would shift every instant
    * by the machine zone offset relative to the oracle's naive read).
    * NTZ fields nested in structs/arrays/maps are rewritten too, via a
    * whole-type cast to the NTZ-free mirror of the field's type. */
  private def normalizeNtz(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    def swap(dt: DataType): DataType = dt match {
      case TimestampNTZType    => TimestampType
      case s: StructType       => StructType(s.fields.map(f => f.copy(dataType = swap(f.dataType))))
      case a: ArrayType        => a.copy(elementType = swap(a.elementType))
      case m: MapType          => m.copy(keyType = swap(m.keyType), valueType = swap(m.valueType))
      case other               => other
    }
    val changed = df.schema.fields.filter(f => swap(f.dataType) != f.dataType)
    if (changed.isEmpty) return df
    if (spark.conf.getOption("spark.sql.session.timeZone").forall(_ != "UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    changed.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(swap(f.dataType))))
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
    else normalizeNtz(spark, raw)
  }

  /** Register every fixture table as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
