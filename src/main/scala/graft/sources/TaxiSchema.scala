package graft.sources

import org.apache.spark.sql.types._

/** The reference's 19-column yellow-taxi trip schema as ONE shared
  * definition. The reference hand-declares it twice, field-for-field,
  * with a comment demanding they stay in sync
  * (producer/ProducerOperations.scala:23-43 and
  * consumer/FileReader.scala:25-45 — the match requirement at
  * FileReader.scala:22-24); a drifted copy silently null-fills every
  * mismatched column under PERMISSIVE parsing. One object ends that
  * hazard: producer scan, consumer stream, and every downstream schema
  * reference point here.
  *
  * Types follow the reference exactly — e.g. passenger_count is DOUBLE
  * because the TLC parquet carries NaNs (SURVEY.md §1.2).
  */
object TaxiSchema {
  val schema: StructType = StructType(Seq(
    StructField("VendorID", IntegerType, nullable = true),
    StructField("tpep_pickup_datetime", TimestampType, nullable = true),
    StructField("tpep_dropoff_datetime", TimestampType, nullable = true),
    StructField("passenger_count", DoubleType, nullable = true),
    StructField("trip_distance", DoubleType, nullable = true),
    StructField("RatecodeID", DoubleType, nullable = true),
    StructField("store_and_fwd_flag", StringType, nullable = true),
    StructField("PULocationID", IntegerType, nullable = true),
    StructField("DOLocationID", IntegerType, nullable = true),
    StructField("payment_type", IntegerType, nullable = true),
    StructField("fare_amount", DoubleType, nullable = true),
    StructField("extra", DoubleType, nullable = true),
    StructField("mta_tax", DoubleType, nullable = true),
    StructField("tip_amount", DoubleType, nullable = true),
    StructField("tolls_amount", DoubleType, nullable = true),
    StructField("improvement_surcharge", DoubleType, nullable = true),
    StructField("total_amount", DoubleType, nullable = true),
    StructField("congestion_surcharge", DoubleType, nullable = true),
    StructField("Airport_fee", DoubleType, nullable = true)))

  /** Column names of the two aggregation keys (pickup / dropoff legs of
    * the flagship query). */
  val pickupKey = "PULocationID"
  val dropoffKey = "DOLocationID"
  val eventTime = "tpep_pickup_datetime"
}
