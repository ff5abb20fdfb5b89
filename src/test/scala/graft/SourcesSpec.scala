package graft

import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("ts", TimestampType)))

  test("readCsv: header, empty-string nulls, timestamp format, permissive") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "in.csv")
    Files.writeString(f.toPath,
      "id,name,ts\n1,alice,2024-01-02 03:04:05\n2,,2024-01-02 03:04:06\nbad-row,x,y\n")
    val rows = Sources.readCsv(spark, f.getPath, schema).collect()
    assert(rows.length === 3)
    val r1 = rows.find(_.getAs[Any]("id") == 1).get
    assert(r1.getAs[java.sql.Timestamp]("ts").toString === "2024-01-02 03:04:05.0")
    assert(rows.find(_.getAs[Any]("id") == 2).get.isNullAt(1)) // "" -> null
    assert(rows.count(_.isNullAt(0)) === 1) // permissive: bad row nulled
  }

  test("writeJsonBatch produces one file; readJson round-trips") {
    val dir = Files.createTempDirectory("graft_json").toString + "/drop"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
      .withColumn("ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05")))
    Sources.writeJsonBatch(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length === 1)
    val back = Sources.readJson(spark, dir, schema)
    assert(back.count() === 2)
    assert(back.schema === schema)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    // disable broadcast so the planner exercises the bucketed
    // sort-merge path these tables exist for
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      Sources.writeBucketed(a, "graft_bkt_a", "k", 4, sortCol = Some("k"))
      Sources.writeBucketed(b, "graft_bkt_b", "k", 4, sortCol = Some("k"))
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() === 100L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("bucketed signature index probes with zero index-side exchanges") {
    import spark.implicits._
    import graft.operators.Dedup
    // the 100 TB arrival shape end-to-end: band index persisted
    // BUCKETED on the probe keys, arrivals signed statelessly — the
    // only exchange in the whole probe plan is the arrival side's
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about spark engines here now"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (10L, " THE quick brown fox jumps over the lazy dog tonight "),
      (20L, "entirely unrelated words describing database internals deeply"))
      .toDF("doc_id", "text")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      Sources.writeBucketed(
        Dedup.simhashBandIndex(corpus, "doc_id", "text"),
        "graft_band_idx", Seq("band", "bv"), 4, Seq("band", "bv"))
      val probe = Dedup.withBandKeys(
        Dedup.withSimhashColumn(fresh, "text", "sig"), "sig")
        .join(spark.table("graft_band_idx"), Seq("band", "bv"))
        .filter(Dedup.hamming(col("sig"), col("corpus_sh")) <= 3)
        .select(col("doc_id").as("new_id"), col("corpus_id").as("dup_of"))
        .distinct()
      assert(probe.as[(Long, Long)].collect().toSet === Set((10L, 1L)))
      val plan = probe.queryExecution.executedPlan.toString
      // distinct adds its own exchange; the JOIN itself must show
      // exactly one (the arrival side) — the index reads pre-hashed
      val joinPlan = Dedup.withBandKeys(
        Dedup.withSimhashColumn(fresh, "text", "sig"), "sig")
        .join(spark.table("graft_band_idx"), Seq("band", "bv"))
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(joinPlan).size === 1,
        s"expected only the arrival-side exchange:\n$joinPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_band_idx")
    }
  }

  test("taxi CSV reads through the shared 19-column schema") {
    import graft.sources.TaxiSchema
    val dir = Files.createTempDirectory("graft_taxi").toFile
    val f = new java.io.File(dir, "trips.csv")
    Files.writeString(f.toPath,
      TaxiSchema.schema.fieldNames.mkString(",") + "\n" +
        "1,2024-01-01 00:10:00,2024-01-01 00:25:00,2.0,3.5,1.0,N,132,75," +
        "1,17.5,1.0,0.5,3.0,0.0,1.0,23.0,2.5,1.75\n" +
        "2,2024-01-01 00:12:00,,,4.1,1.0,N,75,132,2,19.0,1.0,0.5,0.0,0.0," +
        "1.0,21.5,2.5,0.0\n")
    val df = Sources.readCsv(spark, f.getPath, TaxiSchema.schema)
    assert(df.schema === TaxiSchema.schema)
    assert(df.count() === 2)
    val r = df.filter(col("VendorID") === 1).head()
    assert(r.getAs[Double]("total_amount") === 23.0)
    assert(df.filter(col("VendorID") === 2).head()
      .isNullAt(df.columns.indexOf("tpep_dropoff_datetime")))
    // the flagship tagged-count shape runs unchanged on the taxi schema
    val counts = graft.operators.Relational.taggedKeyCounts(df,
      TaxiSchema.pickupKey, "pickup_location",
      TaxiSchema.dropoffKey, "dropoff_location")
    assert(counts.count() === 4) // 132,75 on each leg
  }

  test("readTripsTyped: Dataset[Trip] round-trips the shared schema") {
    import graft.sources.{TaxiSchema, Trip}
    val dir = Files.createTempDirectory("graft_taxi_t").toFile
    val f = new java.io.File(dir, "trips.csv")
    Files.writeString(f.toPath,
      TaxiSchema.schema.fieldNames.mkString(",") + "\n" +
        "1,2024-01-01 00:10:00,2024-01-01 00:25:00,2.0,3.5,1.0,N,132,75," +
        "1,17.5,1.0,0.5,3.0,0.0,1.0,23.0,2.5,1.75\n" +
        "2,2024-01-01 00:12:00,,,4.1,1.0,N,75,132,2,19.0,1.0,0.5,0.0,0.0," +
        "1.0,21.5,2.5,0.0\n")
    val ds = Sources.readTripsTyped(spark, f.getPath)
    // the encoder's structure IS the shared schema (names + types in
    // order) — the drift guard the reference's twin copies lacked
    assert(ds.schema.fields.map(x => (x.name, x.dataType)).toSeq ===
      TaxiSchema.schema.fields.map(x => (x.name, x.dataType)).toSeq)
    val trips = ds.collect().sortBy(_.VendorID)
    assert(trips.length === 2)
    assert(trips(0) === Trip(Some(1),
      Some(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")),
      Some(java.sql.Timestamp.valueOf("2024-01-01 00:25:00")),
      Some(2.0), Some(3.5), Some(1.0), Some("N"), Some(132), Some(75),
      Some(1), Some(17.5), Some(1.0), Some(0.5), Some(3.0), Some(0.0),
      Some(1.0), Some(23.0), Some(2.5), Some(1.75)))
    // PERMISSIVE nulls surface as None, not a deserialization throw
    assert(trips(1).tpep_dropoff_datetime === None)
    assert(trips(1).passenger_count === None)
    // typed transforms compose (the Dataset face is real, not a cast)
    val fares = ds.map(t => t.total_amount.getOrElse(0.0))
      .collect().sorted
    assert(fares === Array(21.5, 23.0))
  }

  test("date-partitioned writes prune the scan to matching partitions") {
    val base = Files.createTempDirectory("graft_part").toString
    val df = (1 to 300).map(i =>
      (i.toLong, f"2024-01-${i % 3 + 1}%02d", i * 1.0))
      .toDF("id", "dt", "value")
    Sources.write(df, s"$base/t", partitionBy = Seq("dt"))
    val read = spark.read.parquet(s"$base/t").filter(col("dt") === "2024-01-02")
    assert(read.count() === 100L)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan.take(600))
    // pruned scan must not list the other partitions' files
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("dt=2024-01-01"), scanned.take(400))
  }

  test("compact rewrites many small files into few, rows preserved") {
    val base = Files.createTempDirectory("graft_compact").toString
    (1 to 1000).toDF("x").repartition(50).write.parquet(s"$base/in")
    val inFiles = new java.io.File(s"$base/in").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(inFiles === 50)
    Sources.compact(spark, s"$base/in", s"$base/out", targetMB = 128)
    val outFiles = new java.io.File(s"$base/out").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(outFiles === 1) // tiny dataset -> one target-size file
    assert(spark.read.parquet(s"$base/out").count() === 1000L)
  }

  test("convert parquet -> csv preserves rows") {
    val base = Files.createTempDirectory("graft_conv").toString
    Seq((1, "x"), (2, "y")).toDF("id", "name")
      .write.parquet(s"$base/in")
    Sources.convert(spark, s"$base/in", "parquet", s"$base/out", "csv")
    val out = spark.read.option("header", "true").csv(s"$base/out")
    assert(out.count() === 2)
  }

  test("writeObserved reports row and null counts from the write job") {
    val base = Files.createTempDirectory("graft_obs").toString
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "name")
    val m = Sources.writeObserved(df, s"$base/out", Seq("name"))
    assert(m("rows") === 3L && m("nulls_name") === 1L)
    assert(spark.read.parquet(s"$base/out").count() === 3L)
  }

  test("convert parquet -> orc -> parquet round-trips values exactly") {
    val base = Files.createTempDirectory("graft_orc").toString
    val in = Seq((1L, "x", 1.5), (2L, "y", -2.25), (3L, null, 0.0))
      .toDF("id", "name", "v")
    in.write.parquet(s"$base/p0")
    Sources.convert(spark, s"$base/p0", "parquet", s"$base/orc", "orc")
    Sources.convert(spark, s"$base/orc", "orc", s"$base/p1", "parquet")
    val back = spark.read.parquet(s"$base/p1")
      .as[(Long, Option[String], Double)].collect().toSet
    assert(back === in.as[(Long, Option[String], Double)].collect().toSet)
  }
}
