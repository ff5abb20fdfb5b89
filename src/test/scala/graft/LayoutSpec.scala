package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // full 32×32 grid, one row per cell, arrival order = row-major scan
  private def grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x, y)))
    .zipWithIndex.map { case ((x, y), i) => (i, x, y) }
    .toDF("id", "x", "y")

  test("zorderValue matches the bit-interleave reference") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val got = grid
      .withColumn("z", Layout.zorderValue(col("x"), col("y"), 5))
      .select("x", "y", "z").as[(Int, Int, Long)].collect()
    assert(got.length === 1024)
    got.foreach { case (x, y, z) =>
      assert(z === ref(x.toLong, y.toLong, 5), s"($x,$y)")
    }
    // distinct inputs -> distinct z-values (it's a bijection on the grid)
    assert(got.map(_._3).distinct.length === 1024)
  }

  test("bucketByOrder: exact rank formula, near-equal sizes, order-aligned") {
    val df = (1 to 103).map(i => (i, i * 37 % 101)).toDF("id", "k")
    val b = Layout.bucketByOrder(df, Seq(col("k"), col("id")), 8)
      .select("id", "k", "bucket").as[(Int, Int, Long)].collect()
    assert(b.length === 103)
    // replay floor((rank-1)*B/N) off the sorted order
    val expected = b.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _, _), r) => id -> (r.toLong * 8 / 103) }.toMap
    b.foreach { case (id, _, bucket) => assert(bucket === expected(id)) }
    val sizes = b.groupBy(_._3).values.map(_.size)
    assert(sizes.max - sizes.min <= 1)
  }

  test("zone-map skip never drops a matching row; z-order beats arrival") {
    val box = Seq(("x", 8L, 15L), ("y", 16L, 23L))
    def witness(order: Seq[org.apache.spark.sql.Column]) = {
      val bucketed = Layout.bucketByOrder(grid, order, 16)
      val zones = Layout.zoneMap(bucketed, "bucket", Seq("x", "y"))
      val w = Layout.skipWitness(zones, "t", box).collect().head
      // no false negatives: every matching row sits in a scanned bucket
      val skipExpr = col("max_x") < 8 || col("min_x") > 15 ||
        col("max_y") < 16 || col("min_y") > 23
      val matchesInSkipped = bucketed
        .join(zones.filter(skipExpr).select("bucket"), "bucket")
        .filter(col("x").between(8, 15) && col("y").between(16, 23))
        .count()
      assert(matchesInSkipped === 0L)
      (w.getAs[Long]("buckets_skipped"), w.getAs[Long]("rows_scanned"))
    }
    val z = Layout.zorderValue(col("x"), col("y"), 5)
    val (zSkip, zScan) = witness(Seq(z, col("id")))
    val (aSkip, aScan) = witness(Seq(col("id")))
    // the 8×8 box is 64 of 1024 cells; 16 z-buckets are 64-cell aligned
    // quadrants, so exactly one bucket overlaps the box
    assert(zSkip === 15L && zScan === 64L)
    // arrival order is row-major: the y-band of every x crosses the box
    // region much less selectively
    assert(aSkip < zSkip && aScan > zScan)
  }

  test("write-path integration: the witness's zone map matches the " +
      "PHYSICAL parquet footers of the written z-order layout, and the " +
      "skip count is what a real stats-aware reader would achieve") {
    val box = Seq(("x", 8L, 15L), ("y", 16L, 23L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_write").toString
    val z = Layout.zorderValue(col("x"), col("y"), 5)
    val bucketed = Layout.bucketByOrder(grid, Seq(z, col("id")), 16)
      .select(col("id").cast("long").as("id"), col("x").cast("long").as("x"),
        col("y").cast("long").as("y"), col("bucket"))
    Layout.writeClustered(bucketed, "bucket", dir)

    // 1. physical stats == predicted stats, bucket for bucket: the
    //    write path preserved the clustering (no bucket leaked rows
    //    into another bucket's files) and parquet footers carry exactly
    //    the min/max the zone map predicted
    val predicted = Layout.zoneMap(bucketed, "bucket", Seq("x", "y"))
      .select("bucket", "n_rows", "min_x", "max_x", "min_y", "max_y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val physical = Layout.footerZoneMap(spark, dir, Seq("x", "y"))
      .select("bucket", "n_rows", "min_x", "max_x", "min_y", "max_y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(physical.toSeq === predicted.toSeq)

    // 2. the witness's skip count over FOOTER stats equals its count
    //    over the predicted zone map — the number of bucket dirs a
    //    stats-only reader proves empty is physical reality, not model
    val w = Layout.skipWitness(
      Layout.footerZoneMap(spark, dir, Seq("x", "y")), "zorder_files", box)
      .collect().head
    assert(w.getAs[Long]("buckets_skipped") === 15L)
    assert(w.getAs[Long]("rows_scanned") === 64L)

    // 3. and the skipped files really contain no matching rows: read
    //    the one non-skippable bucket directory alone and find ALL
    //    matches of the full dataset in it
    val zones = Layout.footerZoneMap(spark, dir, Seq("x", "y"))
    val mustScan = zones.filter(!(col("max_x") < 8 || col("min_x") > 15 ||
        col("max_y") < 16 || col("min_y") > 23))
      .select("bucket").as[Long].collect()
    assert(mustScan.length === 1)
    val matchesInScanned = spark.read
      .parquet(s"$dir/bucket=${mustScan.head}")
      .filter(col("x").between(8, 15) && col("y").between(16, 23)).count()
    assert(matchesInScanned === 64L)
  }

  test("bloom write path: no false negatives ever, bounded false " +
      "positives on absent keys, loud failure when the filter is " +
      "missing") {
    // 1000 rows clustered by id; attr = (id * 7919) % 100 scatters
    // every attr value across all 8 id-range buckets — the
    // zone-stats-defeating shape rel_bloom_skip witnesses
    val df = (0L until 1000L).map(id => (id, (id * 7919L) % 100L))
      .toDF("id", "attr")
    val bucketed = Layout.bucketByOrder(df, Seq(col("id")), 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_spec").toString
    Layout.writeClusteredWithBloom(bucketed, "bucket", dir, "attr", 100L)

    val present = (0L until 5L).toSeq
    val absent = (100L until 120L).toSeq
    val pairs = Layout.bloomProbeBuckets(spark, dir, "attr",
        present ++ absent)
      .as[(Long, Long)].collect().toSet

    // hard guarantee: every bucket truly containing the key is positive
    val truth = bucketed.filter(col("attr").isin(present: _*))
      .select(col("attr"), col("bucket")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(pairs),
      s"false negatives: ${truth.diff(pairs)}")

    // absent keys: positives are pure false positives — with ndv=100
    // the expected rate is ~1%, so over 20 probes x 8 buckets = 160
    // trials, 16 positives (10%) is a generous deterministic bound
    val fp = pairs.count { case (p, _) => absent.contains(p) }
    assert(fp <= 16, s"bloom false-positive count $fp > 16/160")

    // a write WITHOUT the bloom option must fail the probe loudly,
    // never read as skip-everything
    val bare = java.nio.file.Files
      .createTempDirectory("graft_bloom_bare").toString
    Layout.writeClustered(bucketed, "bucket", bare)
    intercept[IllegalArgumentException] {
      Layout.bloomProbeBuckets(spark, bare, "attr", present)
    }
  }

  test("zorderValueN: n=2 equals zorderValue; n=3 is a bijection with " +
      "round-robin bit placement; checked flags out-of-domain") {
    // n = 2: bit-for-bit the 2-d interleave
    val two = grid.withColumn("z2", Layout.zorderValue(col("x"), col("y"), 5))
      .withColumn("zn", Layout.zorderValueN(Seq(col("x"), col("y")), 5))
    assert(two.filter(col("z2") =!= col("zn")).count() === 0L)
    // n = 3 on the full 8×8×8 cube: reference interleave + bijectivity
    def ref3(v: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap(i => v.zipWithIndex.map { case (d, j) =>
        ((d >> i) & 1L) << (i * 3 + j) }).reduce(_ | _)
    val cube = (0 until 8).flatMap(a => (0 until 8).flatMap(b =>
      (0 until 8).map(c => (a, b, c)))).toDF("a", "b", "c")
    val got3 = cube.withColumn("z",
      Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 3))
      .as[(Int, Int, Int, Long)].collect()
    got3.foreach { case (a, b, c, z) =>
      assert(z === ref3(Seq(a.toLong, b.toLong, c.toLong), 3), s"($a,$b,$c)")
    }
    assert(got3.map(_._4).distinct.length === 512)
    // locality: within any z-contiguous run of 64 = 4^3 cube cells,
    // every dim spans at most 4 values (the bounded n-box property)
    got3.sortBy(_._4).grouped(64).foreach { blk =>
      assert(blk.map(_._1).max - blk.map(_._1).min <= 3)
      assert(blk.map(_._2).max - blk.map(_._2).min <= 3)
      assert(blk.map(_._3).max - blk.map(_._3).min <= 3)
    }
    // out-of-domain: silent aliasing unchecked, loud with checked=true
    val bad = Seq((8, 1, 1)).toDF("a", "b", "c")
    val err = intercept[Exception] {
      bad.select(Layout.zorderValueN(Seq(col("a"), col("b"), col("c")), 3,
        checked = true)).collect()
    }
    assert(err.getMessage.contains("outside"))
    // SQL mirror agrees (the oracle-replay contract)
    val viaSql = cube.selectExpr(
      s"${Layout.zorderSqlN(Seq("a", "b", "c"), 3)} AS z")
      .as[Long].collect().sorted
    assert(viaSql.toSeq === got3.map(_._4).sorted.toSeq)
  }

  test("compactionPlan: sorted running-fill invariants -- every bin " +
      "except the last reaches target, oversized files sit alone, " +
      "every file is planned exactly once") {
    val inv = Seq(("big1", 900L), ("big2", 950L), ("m1", 300L),
        ("m2", 300L), ("m3", 300L), ("s1", 90L), ("s2", 80L),
        ("s3", 70L), ("s4", 10L)).toDF("file_name", "bytes")
    val plan = Layout.compactionPlan(inv, "file_name", "bytes", 500L)
      .collect().map(r => r.getAs[String]("file_name") ->
        ((r.getAs[Long]("bytes"), r.getAs[Long]("bin")))).toMap
    assert(plan.size == 9, "every file planned exactly once")
    // order: big2(950) big1(900) m1 m2 m3(300 ea) s1 s2 s3 s4
    // prefixes: 0,950,1850,2150,2450,2750,2840,2920,2990 // 500
    assert(plan("big2")._2 == 0L && plan("big1")._2 == 1L)
    assert(plan("m1")._2 == 3L && plan("m2")._2 == 4L && plan("m3")._2 == 4L)
    assert(Seq("s1", "s2", "s3", "s4").map(plan(_)._2).toSet == Set(5L))
    // bin fill: only the LAST bin (max id) may sit under target
    val fills = plan.values.groupBy(_._2).view
      .mapValues(_.map(_._1).sum).toMap
    val lastBin = fills.keys.max
    // a bin is "filled" once its span crosses a target stride; the
    // oversized singletons trivially exceed it
    fills.foreach { case (bin, total) =>
      if (bin != lastBin && bin != 2L)
        assert(total >= 300L, s"bin $bin underfilled: $total")
    }
    intercept[IllegalArgumentException](
      Layout.compactionPlan(inv, "file_name", "bytes", 0L))
  }

  test("compactFiles: physical round trip -- one output file per bin, " +
      "zero rows lost, unplanned files refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // fragment 1000 rows into ~12 small files
    spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(12).write.mode("overwrite").parquet(dir)
    val inv = Layout.fileInventory(spark, dir)
    assert(inv.count() == 12)
    val plan = Layout.compactionPlan(inv, "file_name", "bytes",
      // target two-ish bins from whatever parquet sizes fall out
      inv.agg(sum("bytes")).head.getLong(0) / 2 + 1)
    Layout.compactFiles(spark, dir, plan, out)
    val written = spark.read.parquet(out)
    assert(written.count() == 1000L, "zero rows lost")
    assert(written.select(sum("v")).head.getLong(0) ==
      spark.read.parquet(dir).select(sum("v")).head.getLong(0))
    // exactly one physical file per planned bin
    val bins = plan.select("bin").distinct().count()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val filesPerBin = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.startsWith("bin="))
      .map(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    assert(filesPerBin.length.toLong == bins)
    assert(filesPerBin.forall(_ == 1), "one file per bin")
    // a plan missing a file fails loudly instead of dropping rows
    val partial = plan.limit(3)
    intercept[Exception] {
      Layout.compactFiles(spark, dir, partial, out + "_x")
    }
  }

  test("compaction at scale: 160 real heterogeneous files -- plan " +
      "equals an independent flat reference, executor writes one " +
      "file per bin with exactly the planned rows in each") {
    val dir = java.nio.file.Files.createTempDirectory("graft_frag160")
      .toString
    val out = java.nio.file.Files.createTempDirectory("graft_comp160")
      .toString
    // 160 real parquet files with genuinely varied sizes: group ids
    // grow as floor(sqrt(id)) (group g holds ~2g+1 rows), hashed over
    // 160 partitions -- deterministic, no rand()
    val n = 300000L
    spark.range(n)
      .withColumn("b", floor(sqrt(col("id").cast("double"))))
      .withColumn("v", col("id") % 97)
      .repartition(160, col("b"))
      .write.mode("overwrite").parquet(dir)
    val inv = Layout.fileInventory(spark, dir)
    val files = inv.collect()
      .map(r => (r.getAs[String]("file_name"), r.getAs[Long]("bytes")))
    assert(files.length >= 100, s"want >=100 real files, got ${files.length}")
    assert(files.map(_._2).distinct.length > 20, "sizes genuinely vary")
    val target = files.map(_._2).sum / 12 + 1
    val plan = Layout.compactionPlan(inv, "file_name", "bytes", target)
    val got = plan.collect()
      .map(r => r.getAs[String]("file_name") -> r.getAs[Long]("bin"))
      .toMap
    // independent flat reference: (bytes desc, name asc) exclusive
    // running sum div target -- recomputed driver-side from scratch
    var prefix = 0L
    val expect = files.sortBy { case (f, b) => (-b, f) }.map {
      case (f, b) =>
        val bin = prefix / target
        prefix += b
        f -> bin
    }.toMap
    assert(got == expect, "plan == flat reference at 160 files")
    assert(got.size == files.length, "every file planned exactly once")
    // byte fill: every bin except the last crosses its target stride
    val byBytes = files.toMap
    val fills = got.groupBy(_._2).view
      .mapValues(_.keys.map(byBytes).sum).toMap
    val last = fills.keys.max
    fills.foreach { case (bin, total) =>
      if (bin != last)
        assert(fills.filter { case (k, _) => k <= bin }.values.sum >=
          bin * target + 1, s"bin $bin prefix underfilled (total $total)")
    }
    // execute: one physical file per bin, planned rows land in it
    Layout.compactFiles(spark, dir, plan, out)
    val written = spark.read.parquet(out)
    assert(written.count() == n, "zero rows lost")
    // per-file source row counts -> plan-implied per-bin row counts
    val srcRows = spark.read.parquet(dir)
      .withColumn("f", element_at(split(input_file_name(), "/"), -1))
      .groupBy("f").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantRows = got.toSeq.groupBy(_._2).view
      .mapValues(_.map { case (f, _) => srcRows(f) }.sum).toMap
    val gotRows = written.groupBy("bin").count().collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap
    assert(gotRows == wantRows, "each bin holds exactly its planned rows")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val filesPerBin = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.startsWith("bin="))
      .map(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    assert(filesPerBin.length == wantRows.size && filesPerBin.forall(_ == 1),
      "exactly one physical file per bin")
  }
}
