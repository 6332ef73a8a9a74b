package graft.core

import org.apache.spark.sql.types._

/** The warehouse type surface (Layer W): BigQuery-style type names ↔ Spark
  * Catalyst types, plus the recursive schema flatten/rebuild walks.
  *
  * Type map distilled from the reference's canonical map
  * (dbtwiz/integrations/bigquery.py:570-602); documented approximations:
  * BIGNUMERIC (76.76 digits in BQ) → Decimal(38,18); TIME → string;
  * RANGE → struct(start,end); GEOGRAPHY → WKT string; JSON → string
  * (SURVEY §1.2).
  */
object WarehouseTypes {

  /** Canonical SQL type name for a field-type alias
    * (bigquery.py:570-602 `get_sql_type_name` semantics). */
  def canonicalTypeName(fieldType: String): String = {
    val aliases = Map(
      "INTEGER" -> "INT64", "INT" -> "INT64", "SMALLINT" -> "INT64",
      "BIGINT" -> "INT64", "TINYINT" -> "INT64", "BYTEINT" -> "INT64",
      "FLOAT" -> "FLOAT64", "FLOAT64" -> "FLOAT64",
      "NUMERIC" -> "NUMERIC", "DECIMAL" -> "NUMERIC",
      "BIGNUMERIC" -> "BIGNUMERIC", "BIGDECIMAL" -> "BIGNUMERIC",
      "BOOLEAN" -> "BOOL", "BOOL" -> "BOOL",
      "RECORD" -> "STRUCT", "STRUCT" -> "STRUCT")
    val u = fieldType.toUpperCase
    aliases.getOrElse(u, u)
  }

  /** Warehouse type name → Spark type (SURVEY §1.2 map). */
  def toSpark(typeName: String): DataType = canonicalTypeName(typeName) match {
    case "INT64" => LongType
    case "FLOAT64" => DoubleType
    case "NUMERIC" => DecimalType(38, 9)
    case "BIGNUMERIC" => DecimalType(38, 18) // BQ is 76.76 — documented gap
    case "STRING" => StringType
    case "BYTES" => BinaryType
    case "BOOL" => BooleanType
    case "DATE" => DateType
    case "DATETIME" => TimestampNTZType
    case "TIME" => StringType // no Spark analog; ISO string
    case "TIMESTAMP" => TimestampType
    case "INTERVAL" => DayTimeIntervalType()
    case "GEOGRAPHY" => StringType // WKT
    case "JSON" => StringType
    case other => throw new IllegalArgumentException(s"unknown warehouse type: $other")
  }

  /** Spark type → warehouse type name (lowercased, arrays as `array<t>`,
    * matching the rendering at bigquery.py:627-630). */
  def fromSpark(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "int64"
    case FloatType | DoubleType => "float64"
    case d: DecimalType if d.scale > 9 => "bignumeric"
    case _: DecimalType => "numeric"
    case StringType => "string"
    case BinaryType => "bytes"
    case BooleanType => "bool"
    case DateType => "date"
    case TimestampNTZType => "datetime"
    case TimestampType => "timestamp"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "interval"
    case ArrayType(et, _) => s"array<${fromSpark(et)}>"
    case _: StructType => "struct"
    case _: MapType => "json"
    case other => other.simpleString
  }

  /** One flattened column: dotted path, warehouse type name, description. */
  final case class ColumnInfo(name: String, dataType: String, description: String)

  /** Flatten a (possibly nested) schema into dotted column paths: structs
    * recurse with `prefix.name`, arrays render as `array<t>`, descriptions
    * come from field metadata key "comment"
    * (bigquery.py:604-642 `parse_schema` semantics). */
  def flattenSchema(schema: StructType, prefix: String = ""): Seq[ColumnInfo] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          flattenSchema(st, s"$prefix${f.name}.")
        case ArrayType(st: StructType, _) =>
          // Repeated RECORD: the reference recurses into the fields the
          // same as a plain RECORD (parse_schema checks type before mode).
          flattenSchema(st, s"$prefix${f.name}.")
        case dt =>
          Seq(ColumnInfo(s"$prefix${f.name}", fromSpark(dt), comment(f)))
      }
    }

  private def comment(f: StructField): String =
    if (f.metadata.contains("comment")) f.metadata.getString("comment") else ""

  /** Rebuild a schema applying `descriptions` (dotted path → text) into
    * each field's metadata "comment", preserving all other metadata and
    * unknown paths — the walk of descriptions.py:43-82, expressed over
    * StructType. */
  def withDescriptions(schema: StructType, descriptions: Map[String, String],
                       prefix: String = ""): StructType =
    StructType(schema.fields.map { f =>
      val path = s"$prefix${f.name}"
      val updated = f.dataType match {
        case st: StructType =>
          f.copy(dataType = withDescriptions(st, descriptions, s"$path."))
        case _ => f
      }
      descriptions.get(path) match {
        case Some(d) =>
          val mb = new MetadataBuilder().withMetadata(updated.metadata)
            .putString("comment", d)
          updated.copy(metadata = mb.build())
        case None => updated
      }
    })

  /** Flattened description map (dotted path → comment), for diffing
    * manifest-declared vs live descriptions (descriptions.py:85-97). */
  def descriptionMap(schema: StructType, prefix: String = ""): Map[String, String] =
    schema.fields.flatMap { f =>
      val path = s"$prefix${f.name}"
      val self = if (f.metadata.contains("comment"))
        Seq(path -> f.metadata.getString("comment")) else Seq.empty
      f.dataType match {
        case st: StructType => self ++ descriptionMap(st, s"$path.")
        case _ => self
      }
    }.toMap
}
