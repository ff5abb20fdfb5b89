package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Data-layout clustering for scan pruning — the write-side half of the
  * 100 TB story, a gap-fill family (the reference never touches physical
  * layout: its outputs are append-only JSON drops,
  * consumer/StreamProcessor.scala:156-184). At warehouse scale, WHICH
  * rows share a file decides how much of the 100 TB a selective scan
  * must read: parquet keeps min/max statistics per row group and file
  * footer, and a stats-aware reader skips every unit whose range
  * excludes the predicate. A z-order (Morton) layout interleaves the
  * bits of two clustering columns so each file covers a small RECTANGLE
  * of the key space — a box predicate on EITHER dimension then prunes
  * most files, where a single-column sort layout prunes only on its
  * sort key and an arrival-order layout prunes nothing.
  *
  * Everything here is deterministic and oracle-replayable: the z-value
  * is pure bit arithmetic, bucket assignment is an exact integer rank
  * formula (not sampled range boundaries), and the zone map / skip
  * witness are plain aggregates over the bucketed frame. The production
  * write path is `df.repartitionByRange(nBuckets, zCol)` + one file per
  * partition — same clustering, boundaries picked by Spark's range
  * sampler; the rank-exact form exists so correctness is checkable
  * bit-for-bit in a second engine.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Rows adjacent in z-value are close in BOTH x and y, so
    * bucketing by z-value gives every bucket a bounded rectangle of
    * (x, y) space. Pure shift/and/or built-ins — codegen'd, no UDF.
    *
    * DOMAIN REQUIREMENT: both inputs must satisfy 0 ≤ v < 2^bits.
    * Values outside that range alias onto low-bit cells — no wrong
    * rows (zone maps are built from real data), but the bounded-
    * rectangle property quietly degrades and pruning stops working.
    * Callers must pre-reduce wide dims (pmod, bucketize) as
    * `rel_zorder_skip` does. Pass `checked = true` to trade one
    * codegen'd branch per row for a loud `raise_error` on the first
    * out-of-domain value. */
  def zorderValue(x: Column, y: Column, bits: Int,
      checked: Boolean = false): Column = {
    require(bits >= 1 && bits <= 31, s"zorderValue bits out of range: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    val z = (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    if (!checked) z
    else {
      val lim = 1L << bits
      when(xl < 0 || xl >= lim || yl < 0 || yl >= lim,
        raise_error(concat(lit(s"zorderValue: input outside [0, $lim): x="),
          xl.cast("string"), lit(" y="), yl.cast("string")))
        .cast("long"))
        .otherwise(z)
    }
  }

  /** The DuckDB-replayable SQL text of [[zorderValue]] — the oracle
    * computes the identical interleave with the same integer ops. */
  def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** N-dimensional Morton interleave — the general form of
    * [[zorderValue]] for warehouses that cluster on 3–4 dims: bit i of
    * dimension j lands at position i·n + j (round-robin), so rows
    * adjacent in z-value are close in EVERY dimension and each bucket
    * covers a bounded n-box. Same domain requirement per dim
    * (0 ≤ v < 2^bits, see [[zorderValue]]); n·bits must fit a signed
    * long. At n = 2 this IS [[zorderValue]] bit-for-bit (spec-pinned).
    * Pruning power per dim decays with n (each dim contributes
    * bits/n of the leading bits) — 2–4 dims is the useful range, the
    * same guidance every z-order warehouse documents. */
  def zorderValueN(dims: Seq[Column], bits: Int,
      checked: Boolean = false): Column = {
    val n = dims.size
    require(n >= 1, "zorderValueN: no dimensions")
    require(bits >= 1 && n.toLong * bits <= 62,
      s"zorderValueN: n*bits out of range: $n*$bits")
    val longs = dims.map(_.cast("long"))
    val z = (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (d, j) =>
        shiftleft(shiftrightunsigned(d, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
    if (!checked) z
    else {
      val lim = 1L << bits
      val bad = longs.map(d => d < 0 || d >= lim).reduce(_ || _)
      when(bad, raise_error(concat(
        lit(s"zorderValueN: input outside [0, $lim): ("),
        concat_ws(", ", longs.map(_.cast("string")): _*), lit(")")))
        .cast("long"))
        .otherwise(z)
    }
  }

  /** The DuckDB-replayable SQL text of [[zorderValueN]]. */
  def zorderSqlN(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        s"((($d >> $i) & 1) << ${i * n + j})"
      }
    }.mkString("(", " | ", ")")
  }

  /** Assign each row to one of `nBuckets` near-equal-size buckets by
    * rank in `order` — the bucket IS the file in the write path. The
    * assignment is exact integer arithmetic, floor((rank−1)·B / N), so
    * a second engine replays it bit-for-bit (sampled range-partition
    * boundaries can't be). Rank comes from
    * [[Relational.withScalableOrdinal]] — range-partitioned sort plus
    * per-partition offsets, never a single-partition window. EAGER
    * (one count + the ordinal's sort job).
    *
    * The input must be DETERMINISTIC across re-evaluation: n comes from
    * one pass and ranks from a second over the same lineage. The
    * `least(...)` clamp below makes the failure mode of a
    * nondeterministic/growing input a mild skew of the last bucket
    * rather than bucket ids silently spilling past nBuckets−1. */
  def bucketByOrder(df: DataFrame, order: Seq[Column], nBuckets: Int,
      bucketName: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, s"bucketByOrder nBuckets out of range: $nBuckets")
    val n = df.count()
    require(n > 0, "bucketByOrder: empty input")
    Relational.withScalableOrdinal(df, order, "__rank")
      .withColumn(bucketName,
        least(expr(s"CAST(((__rank - 1) * $nBuckets) div ${n}L AS BIGINT)"),
          lit(nBuckets - 1L)))
      .drop("__rank")
  }

  /** Zone map: per-bucket min/max of each pruning dimension plus row
    * count — exactly the statistics a parquet footer keeps per row
    * group, materialized as a table a planner (or the skip witness
    * below) can consult without touching the data. */
  def zoneMap(bucketed: DataFrame, bucketCol: String,
      dims: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"),
        max(col(d)).as(s"max_$d")))
    bucketed.groupBy(col(bucketCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Skip witness against a box predicate (lo ≤ dim ≤ hi per listed
    * dimension): how many buckets can a stats-only reader prove empty
    * of matches, and how many rows sit in the buckets it must scan? A
    * bucket is skippable iff its zone excludes the box on ANY dimension
    * — the no-false-negative test a parquet reader applies to row-group
    * stats. One summary row, tagged with the layout's name. */
  def skipWitness(zones: DataFrame, layout: String,
      box: Seq[(String, Long, Long)]): DataFrame = {
    require(box.nonEmpty, "skipWitness: empty box predicate")
    val skip = box.map { case (d, lo, hi) =>
      col(s"max_$d") < lit(lo) || col(s"min_$d") > lit(hi)
    }.reduce(_ || _)
    zones.agg(
      count(lit(1)).as("buckets_total"),
      sum(when(skip, 1L).otherwise(0L)).as("buckets_skipped"),
      sum(when(skip, 0L).otherwise(col("n_rows"))).as("rows_scanned"))
      .withColumn("layout", lit(layout))
  }

  // ------------------------------------------------------------------
  // Physical write path: the zone map above predicts what a parquet
  // footer will hold; the pieces below write the clustered layout for
  // real and read the ACTUAL footer statistics back, so LayoutSpec can
  // assert witness == physical reality instead of witness == witness.
  // ------------------------------------------------------------------

  /** Write `bucketed` (a [[bucketByOrder]] output) as one
    * `bucket=N/` directory per bucket — each directory is the "file"
    * of the layout story, its parquet footers carrying real min/max
    * stats for every remaining column. `repartition(bucketCol)`
    * co-locates each bucket in one task so a bucket's directory holds
    * one data file (hash collisions between buckets only ADD a file
    * per colliding bucket, never split a bucket's rows across
    * directories — the per-bucket stats aggregate is exact either
    * way). */
  def writeClustered(bucketed: DataFrame, bucketCol: String,
      path: String): Unit =
    bucketed.repartition(col(bucketCol))
      .write.mode("overwrite").partitionBy(bucketCol).parquet(path)

  /** Write `bucketed` like [[writeClustered]], additionally building a
    * parquet BLOOM FILTER on `bloomCol` in every file (public
    * parquet-hadoop writer options `parquet.bloom.filter.enabled#col` /
    * `...expected.ndv#col`). Zone maps prune RANGE predicates on the
    * clustering dims; blooms prune POINT predicates on a column the
    * layout did NOT cluster by — on an orderkey-clustered layout every
    * bucket spans the full custkey range, so min/max stats can never
    * skip a `custkey = k` probe, while the bloom skips every bucket the
    * key truly misses (minus a bounded false-positive rate; never a
    * false negative). `expectedNdv` sizes the filter — pass the
    * expected per-bucket distinct count of `bloomCol`.
    *
    * Dictionary interplay: parquet-mr OMITS the bloom filter for a
    * chunk it fully dictionary-encodes (the dictionary page already is
    * an exact membership filter), which at test scale is every chunk —
    * so dictionary encoding is disabled for `bloomCol` specifically,
    * guaranteeing the filter exists at any scale. At production
    * cardinalities a key column blows past the dictionary-page
    * threshold anyway and falls back to plain encoding + bloom. */
  def writeClusteredWithBloom(bucketed: DataFrame, bucketCol: String,
      path: String, bloomCol: String, expectedNdv: Long): Unit =
    bucketed.repartition(col(bucketCol))
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
        expectedNdv.toString)
      .option(s"parquet.enable.dictionary#$bloomCol", "false")
      .partitionBy(bucketCol).parquet(path)

  /** Probe the written blooms: which buckets' filters report "might
    * contain" for each value in `probes`? A stats-aware reader scans
    * exactly those buckets for a point predicate. Reads the filters
    * through the same `BloomFilterReader` a parquet reader uses; a
    * bucket is positive if ANY of its row groups is. Fails loudly if a
    * file carries no bloom for `bloomCol` (a misconfigured write must
    * not read as "skip everything"). Driver-side cost is bounded by
    * file count × probe count — the planner's own listing cost, never
    * row count. Output: one row per POSITIVE (probe, bucket) pair, so
    * callers can verify set containment (no false negatives) exactly,
    * not just compare counts. */
  def bloomProbeBuckets(spark: SparkSession, path: String,
      bloomCol: String, probes: Seq[Long]): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val buckets = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.contains("="))
    require(buckets.nonEmpty, s"no bucket directories under $path")
    val pairs = Seq.newBuilder[(Long, Long)]
    buckets.foreach { bdir =>
      val bucket = bdir.getName.split("=", 2)(1).toLong
      val files = fs.listStatus(bdir).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      require(files.nonEmpty, s"no parquet files under $bdir")
      val positive = collection.mutable.Set.empty[Long]
      files.foreach { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala.foreach { block =>
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == bloomCol)
            .getOrElse(sys.error(s"column $bloomCol missing from $f"))
          val bloom = reader.getBloomFilterDataReader(block)
            .readBloomFilter(chunk)
          require(bloom != null,
            s"no bloom filter for $bloomCol in $f — misconfigured write")
          probes.foreach { p =>
            if (bloom.findHash(bloom.hash(p))) positive += p
          }
        } finally reader.close()
      }
      positive.foreach(p => pairs += ((p, bucket)))
    }
    import spark.implicits._
    pairs.result().toDF("probe", "bucket")
  }

  /** Per-bucket statistics REREAD from the written files' parquet
    * footers (`ParquetFileReader` over every data file under
    * `bucket=N/`, row-group column stats aggregated per bucket) — the
    * exact metadata a stats-aware reader consults, in [[zoneMap]]'s
    * schema so the two are directly comparable. Driver-side work is
    * bounded by FILE COUNT (the planner's own listing cost), never row
    * count. Long/int `dims` only. */
  def footerZoneMap(spark: SparkSession, path: String,
      dims: Seq[String]): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val buckets = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.contains("="))
    val rows = buckets.map { bdir =>
      val bucket = bdir.getName.split("=", 2)(1).toLong
      val files = fs.listStatus(bdir).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      require(files.nonEmpty, s"no parquet files under $bdir")
      var nRows = 0L
      val mins = collection.mutable.Map.empty[String, Long]
      val maxs = collection.mutable.Map.empty[String, Long]
      files.foreach { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala.foreach { block =>
          nRows += block.getRowCount
          val byCol = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          dims.foreach { d =>
            val st = byCol.getOrElse(d,
              sys.error(s"column $d missing from footer of $f"))
            require(st.hasNonNullValue, s"no stats for $d in $f")
            val mn = st.genericGetMin.asInstanceOf[Number].longValue()
            val mx = st.genericGetMax.asInstanceOf[Number].longValue()
            mins(d) = math.min(mins.getOrElse(d, Long.MaxValue), mn)
            maxs(d) = math.max(maxs.getOrElse(d, Long.MinValue), mx)
          }
        } finally reader.close()
      }
      org.apache.spark.sql.Row.fromSeq(
        bucket +: nRows +: dims.flatMap(d => Seq(mins(d), maxs(d))))
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      dims.flatMap(d => Seq(
        org.apache.spark.sql.types.StructField(s"min_$d",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(s"max_$d",
          org.apache.spark.sql.types.LongType, nullable = false))))
    spark.createDataFrame(rows.asJava, schema)
  }

  /** List one directory's parquet files as an inventory frame —
    * (file_name, bytes), the compaction planner's input. Driver-side
    * Hadoop FS listing: cost is file-count-sized, the same listing any
    * planner pays; at warehouse scale the inventory comes from the
    * table format's manifest instead, and [[compactionPlan]] doesn't
    * care which. */
  def fileInventory(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val rows = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
    import spark.implicits._
    rows.toDF("file_name", "bytes")
  }

  /** Plan a small-file compaction: assign every file to a rewrite bin
    * so each bin holds ≥ `targetBytes` (except possibly the last) —
    * the OPTIMIZE/bin-packing step every parquet warehouse runs, and
    * the write-side fix for the small-file problem that kills scan
    * throughput at 100 TB (per-file open cost and row groups too small
    * to prune).
    *
    * Deterministic sorted running-fill: files order by (bytes DESC,
    * path ASC) — largest first, the FFD heuristic's ordering — and
    * bin = exclusive-prefix-bytes div target. An oversized file
    * (≥ target) lands alone in its own bin because the prefix jumps
    * past a whole target stride. Pure integer arithmetic end to end.
    *
    * Scale shape: the inventory is METADATA-sized (100 TB at 256 MB
    * per file ≈ 400k rows), but the plan still avoids the
    * single-partition global window: a range-partitioned sort, one
    * bounded per-sort-partition byte-total collect (the
    * withScalableOrdinal two-phase), and a window partitioned BY SORT
    * PARTITION for the within-partition running sum.
    *
    * Output: (pathCol, bytesCol, bin) — one row per file. */
  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0,
      s"compactionPlan: targetBytes must be positive, got $targetBytes")
    val sorted = files
      .select(col(pathCol), col(bytesCol).cast("long").as(bytesCol))
      .orderBy(col(bytesCol).desc, col(pathCol))
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val pid = shiftrightunsigned(col("__mid"), 33).cast("int")
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    // per-sort-partition byte totals -> exclusive offsets (partition-
    // count-sized driver array, the withScalableOrdinal convention)
    val sizeRows = sorted.groupBy(pid.as("__pid"))
      .agg(sum(col(bytesCol)).as("__b")).collect()
    val nParts = sizeRows.map(_.getInt(0)).foldLeft(-1)(math.max) + 1
    val totals = Array.fill(nParts)(0L)
    sizeRows.foreach(r => totals(r.getInt(0)) = r.getLong(1))
    val offsets = totals.scanLeft(0L)(_ + _).dropRight(1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pid).orderBy(localIdx)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sorted
      .withColumn("__before",
        element_at(typedLit(offsets), pid + 1) +
          coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .select(col(pathCol), col(bytesCol), col("bin"))
  }

  /** Execute a [[compactionPlan]] against real files: read every
    * planned file, route rows to their bin, and write EXACTLY ONE
    * parquet file per bin under `outDir/bin=N/`. One distributed job:
    * rows tag themselves with their source file via
    * `input_file_name()`, join the (broadcast, file-count-sized) plan
    * on file name, and `repartition(bin)` + `partitionBy(bin)` puts
    * every bin's rows in one task → one output file. Fails loudly if
    * any read row's file is missing from the plan. */
  def compactFiles(spark: SparkSession, dir: String, plan: DataFrame,
      outDir: String): Unit = {
    val tagged = spark.read.parquet(dir)
      .withColumn("__fname",
        element_at(split(input_file_name(), "/"), -1))
    val routes = plan.select(col("file_name").as("__fname"), col("bin"))
    tagged.join(broadcast(routes), Seq("__fname"), "left")
      .withColumn("bin",
        when(col("bin").isNull,
          raise_error(concat(lit("compactFiles: unplanned file "),
            col("__fname"))))
          .otherwise(col("bin")))
      .drop("__fname")
      .repartition(col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
  }
}
