package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine operators take DataFrames; this is the only place that
  * binds them to the on-disk parquet star schema. Explicit-schema,
  * inference-free reads mirror the reference's deliberate choice
  * (reference: producer/ProducerOperations.scala:21) — parquet carries
  * its own schema so no duplication hazard here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeEventTs(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet (pandas default), which Spark
    * refuses to read as a timestamp. Read it as a raw nanosecond long
    * (legacy conf) and truncate to a microsecond TimestampType with
    * integral division — ns epoch values exceed 2^53, so a double-typed
    * `/` would corrupt the low bits.
    *
    * The legacy conf is SESSION-GLOBAL and stays set after the first
    * events read (deliberate: unsetting mid-session would make reads
    * order-dependent the other way, since the scan captures the conf at
    * planning). Any new nanos-typed table must therefore go through
    * this normalization path too, or its ts column arrives as a raw
    * Long.
    */
  private def normalizeEventTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
}
