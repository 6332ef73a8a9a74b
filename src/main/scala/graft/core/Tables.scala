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
    * scan). The naive wall-clock is interpreted as UTC — matching the
    * oracle's naive read — WITHOUT touching session state: a plain cast
    * would read the wall-clock in the SESSION zone, and forcing the
    * session zone to UTC (the pre-r11 fallback) silently changed the
    * semantics of every later timestamp expression in an ad-hoc session
    * that deliberately set another zone. Instead each NTZ leaf is
    * pre-shifted with `convert_timezone('UTC', current_timezone(), ntz)`
    * (render the UTC-interpreted instant as session-zone wall clock) so
    * the session-zone cast lands on exactly the UTC-interpreted instant;
    * `current_timezone()` resolves at analysis of the consuming query,
    * so the pair can never disagree. NTZ nested in structs/arrays/maps
    * is rewritten recursively (struct rewrite is null-preserving).
    * Caveat: the shift-then-cast pair applies the zone offset at two
    * wall times `offset` apart, so instants inside a DST transition of a
    * non-UTC session zone can land an hour off — engine sessions run
    * UTC (requiredConfs), where the pair is exact. */
  private def normalizeNtz(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def swap(dt: DataType): DataType = dt match {
      case TimestampNTZType    => TimestampType
      case s: StructType       => StructType(s.fields.map(f => f.copy(dataType = swap(f.dataType))))
      case a: ArrayType        => a.copy(elementType = swap(a.elementType))
      case m: MapType          => m.copy(keyType = swap(m.keyType), valueType = swap(m.valueType))
      case other               => other
    }
    def fix(c: Column, dt: DataType): Column = dt match {
      case TimestampNTZType =>
        convert_timezone(lit("UTC"), current_timezone(), c).cast(TimestampType)
      case s: StructType =>
        when(c.isNull, lit(null).cast(swap(s))).otherwise(
          struct(s.fields.map(f => fix(c.getField(f.name), f.dataType).as(f.name)): _*))
      case a: ArrayType => transform(c, x => fix(x, a.elementType))
      case m: MapType => map_from_arrays(
        transform(map_keys(c), k => fix(k, m.keyType)),
        transform(map_values(c), v => fix(v, m.valueType)))
      case _ => c
    }
    val changed = df.schema.fields.filter(f => swap(f.dataType) != f.dataType)
    if (changed.isEmpty) return df
    changed.foldLeft(df)((d, f) => d.withColumn(f.name, fix(col(f.name), f.dataType)))
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
