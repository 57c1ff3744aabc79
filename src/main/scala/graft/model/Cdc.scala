package graft.model

import org.apache.spark.sql.types._

/**
 * CDC data model: the GoldenGate-style change-event envelope and the
 * Oracle-source type system the reference ingests.
 *
 * Envelope (reference docs/schema_example.json:1-487, FIXTURES.md §1):
 * {{{
 *   table       "SCHEMA.TABLE" (uppercase)
 *   op_type     "I" | "U" | "D"
 *   op_ts       "yyyy-MM-dd HH:mm:ss.ffffff[f]" string
 *   current_ts  string
 *   pos         20-char zero-padded string — a total order over events
 *   tokens      variable-key object, dropped at ingest
 *   before      full row image struct (absent on I)
 *   after       full row image struct (absent on D)
 * }}}
 */
object CdcModel {

  /** Admin/audit fields appended to every structured target row
   * (reference dev/_sample_target_offenders.py:92-95). */
  val AdminHash = "admin_hash"
  val AdminGgPos = "admin_gg_pos"
  val AdminGgOpTs = "admin_gg_op_ts"
  val AdminEventTs = "admin_event_ts"

  val adminFields: Seq[StructField] = Seq(
    StructField(AdminHash, IntegerType),
    StructField(AdminGgPos, StringType),
    StructField(AdminGgOpTs, TimestampType),
    StructField(AdminEventTs, TimestampType))

  /** Transient fields carried through the merge then dropped
   * (reference `update_schema`, src/apply_change_log_to_delta.py:123-138). */
  val EventType = "event_type"
  val PreviousHash = "previous_hash"
  val SrcTable = "table"
  val SrcSchema = "schema"
  val transientFields: Seq[StructField] = Seq(
    StructField(EventType, StringType),
    StructField(PreviousHash, IntegerType),
    StructField(SrcTable, StringType),
    StructField(SrcSchema, StringType))

  val Action = "__action"

  /** Envelope StructType for a given row-image payload schema. */
  def envelope(payload: StructType): StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("op_type", StringType),
    StructField("op_ts", StringType),
    StructField("current_ts", StringType),
    StructField("pos", StringType),
    StructField("before", payload),
    StructField("after", payload)))

  /** target schema = business fields + admin fields. */
  def targetSchema(business: StructType): StructType =
    StructType(business.fields.toSeq ++ adminFields)

  /** merge-time schema = target + transients
   * (reference `update_schema` with with_event_type=True). */
  def mergeSchema(target: StructType): StructType =
    StructType(target.fields.toSeq ++ transientFields)

  /** "OMS_OWNER.OFFENDERS" -> ("oms_owner", "offenders")
   * (reference `format_table_name`, src/apply_change_log_to_delta.py:114-120). */
  def splitSourceTable(qualified: String): (String, String) = {
    val parts = qualified.toLowerCase.split("\\.", 2)
    if (parts.length == 2) (parts(0), parts(1)) else ("", parts(0))
  }
}

/**
 * Oracle -> Spark type mapping (reference `possible_types`,
 * src/apply_change_log_to_delta.py:69-96: varchar2->String, number->Integer,
 * date->Date, timestamp->Timestamp, plus protobuf-style numeric codes;
 * anything unknown defaults to String).
 */
object OracleTypes {
  private val byName: Map[String, DataType] = Map(
    "varchar2" -> StringType,
    "varchar" -> StringType,
    "char" -> StringType,
    "nvarchar2" -> StringType,
    "clob" -> StringType,
    "number" -> IntegerType,
    "integer" -> IntegerType,
    "int" -> IntegerType,
    "date" -> DateType,
    "timestamp" -> TimestampType,
    "blob" -> BinaryType,
    "raw" -> BinaryType,
    "float" -> FloatType,
    "binary_double" -> DoubleType,
    "binary_float" -> FloatType)

  private val byCode: Map[Int, DataType] = Map(
    1 -> DoubleType, 2 -> FloatType, 3 -> LongType, 4 -> LongType,
    5 -> IntegerType, 8 -> BooleanType, 12 -> BinaryType, 14 -> StringType,
    15 -> IntegerType, 16 -> LongType, 17 -> IntegerType, 18 -> LongType)

  def toSpark(oracleType: String): DataType = {
    val base = oracleType.trim.toLowerCase.takeWhile(c => c != '(' && c != ' ')
    base.toIntOption.flatMap(byCode.get)
      .orElse(byName.get(base))
      .getOrElse(StringType)
  }
}

/**
 * Oracle DDL column-list parser: builds a StructType from a
 * `"NAME TYPE, NAME TYPE, ..."` fragment, lowercasing names (reference
 * `get_schema` bootstraps target schemas this way,
 * dev/_sample_target_offenders.py:64-98).
 */
object OracleDdl {
  def parse(ddl: String): StructType = {
    val fields = ddl.split(",").map(_.trim).filter(_.nonEmpty).map { colDef =>
      val sp = colDef.indexOf(' ')
      require(sp > 0, s"bad DDL column def: '$colDef'")
      val name = colDef.substring(0, sp).trim.toLowerCase
      val typ = colDef.substring(sp + 1).trim
      StructField(name, OracleTypes.toSpark(typ))
    }
    StructType(fields.toSeq)
  }
}

/**
 * A reporting-view definition stored as data (reference
 * tests/data/dummy/database/domain_definitions CSVs with columns
 * Status,Type,Domain,Dependancies,Target,Resolution, executed via
 * spark.sql — src/apply_to_domains.py:54-68).
 */
final case class DomainDef(
    status: String,
    defType: String,
    domain: String,
    dependencies: Seq[String],
    target: String,
    resolution: String)
