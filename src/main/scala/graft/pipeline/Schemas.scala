package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for every pipeline relation (reference declares all of
  * these by hand: _SIERRA_COLUMNS / _REDSHIFT_COLUMNS / _DTYPE_MAP at
  * lib/pipeline_controller.py:23-42). Never inferred — SURVEY §1.3.
  */
object Schemas {

  /** Sierra active-patrons scan result (12 cols, reference
    * lib/pipeline_controller.py:27-30; types per FIXTURES.md §A1), plus the
    * two address-priority columns the reference only ORDER BYs
    * (helpers/query_helper.py:30: `ORDER BY {ordering_field}, display_order,
    * patron_record_address_type_id`). Pandas inherits that SQL order and
    * `duplicated(keep='first')` implicitly keeps the lowest-priority-value
    * address row; Spark has no input order, so the columns must be carried
    * and the priority made explicit (see [[PatronPipeline.addressPriority]]).
    * `patron_id_plaintext` arrives as a long and is canonicalized to a
    * digit string (two-step cast, reference :147-148).
    */
  val sierraActive: StructType = StructType(Seq(
    StructField("patron_id_plaintext", LongType),
    StructField("ptype_code", IntegerType),
    StructField("pcode3", IntegerType),
    StructField("patron_home_library_code", StringType),
    StructField("city", StringType),
    StructField("region", StringType),
    StructField("postal_code", StringType),
    StructField("address", StringType),
    StructField("circ_active_date_et", DateType),
    StructField("deletion_date_et", DateType),
    StructField("last_updated_timestamp", TimestampType),
    StructField("creation_timestamp", TimestampType),
    StructField("display_order", IntegerType),
    StructField("patron_record_address_type_id", IntegerType)))

  /** Sierra deleted-patrons scan result (reference
    * lib/pipeline_controller.py:258-260).
    */
  val sierraDeleted: StructType = StructType(Seq(
    StructField("patron_id_plaintext", LongType),
    StructField("deletion_date_et", DateType)))

  /** Redshift address-hash lookup result (reference
    * lib/pipeline_controller.py:324-327).
    */
  val redshiftAddress: StructType = StructType(Seq(
    StructField("address_hash", StringType),
    StructField("patron_id", StringType),
    StructField("geoid", StringType),
    StructField("initial_patron_home_library_code", StringType)))

  /** Redshift patron lookup result, 10 cols (reference _REDSHIFT_COLUMNS
    * lib/pipeline_controller.py:23-26; types per FIXTURES.md §A3).
    */
  val redshiftPatron: StructType = StructType(Seq(
    StructField("patron_id", StringType),
    StructField("address_hash", StringType),
    StructField("postal_code", StringType),
    StructField("geoid", StringType),
    StructField("creation_date_et", DateType),
    StructField("circ_active_date_et", DateType),
    StructField("ptype_code", IntegerType),
    StructField("pcode3", IntegerType),
    StructField("patron_home_library_code", StringType),
    StructField("initial_patron_home_library_code", StringType)))

  /** Redshift iphlc lookup result (reference helpers/query_helper.py:48-52). */
  val redshiftIphlc: StructType = StructType(Seq(
    StructField("patron_id", StringType),
    StructField("initial_patron_home_library_code", StringType)))

  /** The 11 output columns, in Avro-schema order (reference _DTYPE_MAP
    * lib/pipeline_controller.py:31-42: 9 strings + 2 nullable longs; dates
    * are ISO-serialized strings at this boundary, FIXTURES.md §A5).
    */
  val outputColumns: Seq[String] = Seq(
    "patron_id", "address_hash", "postal_code", "geoid",
    "creation_date_et", "deletion_date_et", "circ_active_date_et",
    "ptype_code", "pcode3", "patron_home_library_code",
    "initial_patron_home_library_code")

  val output: StructType = StructType(outputColumns.map {
    case c @ ("ptype_code" | "pcode3") => StructField(c, LongType)
    case c => StructField(c, StringType)
  })

  /** PatronInfo Avro schema (reference fetches this from a registry at
    * startup, lib/pipeline_controller.py:59; the field list/kinds are
    * pinned by tests/test_pipeline_controller.py:113-167).
    */
  val patronInfoAvroJson: String = {
    val fields = outputColumns.map { c =>
      val t = c match {
        case "ptype_code" | "pcode3" => "\"long\""
        case _ => "\"string\""
      }
      s"""{"name": "$c", "type": ["null", $t], "default": null}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "PatronInfo", "fields": [$fields]}"""
  }
}
