package graft

import graft.operators.Incremental
import graft.streaming.MaintainedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class TestChange(k: Long, s: String, v: Double, seq: Long, op: String)

class MaintainedTableSpec extends SparkSpec {
  import spark.implicits._

  private def dir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mtable_$tag").toString

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  private def feed(rows: (Long, String, Double, Long, String)*) =
    rows.toDF("k", "s", "v", "seq", "op")

  private def sorted(df: DataFrame) =
    df.select("k", "s", "v").as[(Long, String, Double)].collect()
      .sortBy(_._1).toSeq

  test("applyBatch: versions accumulate, final state == composed applyChangeLog") {
    val d = dir("apply")
    val f0 = feed((2L, "B", 21.0, 1L, "upsert"), (9L, "z", 90.0, 2L, "upsert"))
    val f1 = feed((9L, "-", 0.0, 1L, "delete"), (3L, "C", 33.0, 2L, "upsert"))
    val s0 = MaintainedTable.applyBatch(base, f0, Seq("k"),
      Seq(col("seq")), d, "run-a", 0L)
    val s1 = MaintainedTable.applyBatch(base, f1, Seq("k"),
      Seq(col("seq")), d, "run-a", 1L)
    assert(MaintainedTable.versions(spark, d) === Seq(0L, 1L))
    val composed = Incremental.applyChangeLog(
      Incremental.applyChangeLog(base, f0, Seq("k"), Seq(col("seq"))),
      f1, Seq("k"), Seq(col("seq")))
    assert(sorted(s1) === sorted(composed))
    // time travel: v=0 is the post-batch-0 snapshot, untouched by batch 1
    assert(sorted(MaintainedTable.readVersion(spark, d, 0L)) === sorted(s0))
  }

  test("sequential per-batch apply == one-shot apply of the unioned feed") {
    val d = dir("compose")
    val f0 = feed((2L, "B", 21.0, 1L, "upsert"), (4L, "d", 40.0, 2L, "upsert"))
    val f1 = feed((2L, "-", 0.0, 3L, "delete"), (9L, "z", 90.0, 4L, "upsert"))
    MaintainedTable.applyBatch(base, f0, Seq("k"), Seq(col("seq")), d, "r", 0L)
    val twoStep = MaintainedTable.applyBatch(base, f1, Seq("k"),
      Seq(col("seq")), d, "r", 1L)
    val oneShot = Incremental.applyChangeLog(base, f0.unionByName(f1),
      Seq("k"), Seq(col("seq")))
    assert(sorted(twoStep) === sorted(oneShot))
  }

  test("at-least-once replay of a committed batch is a no-op") {
    val d = dir("replay")
    val f0 = feed((2L, "B", 21.0, 1L, "upsert"))
    val once = MaintainedTable.applyBatch(base, f0, Seq("k"),
      Seq(col("seq")), d, "r", 0L)
    // replay with a DIFFERENT (corrupt) batch payload: the committed
    // version must win — state comes from v=0, not a re-application
    val replay = MaintainedTable.applyBatch(base,
      feed((2L, "WRONG", -1.0, 9L, "upsert")), Seq("k"),
      Seq(col("seq")), d, "r", 0L)
    assert(sorted(replay) === sorted(once))
    assert(MaintainedTable.versions(spark, d) === Seq(0L))
  }

  test("run-id marker: a different run against surviving state fails loudly") {
    val d = dir("runid")
    MaintainedTable.applyBatch(base, feed((2L, "B", 21.0, 1L, "upsert")),
      Seq("k"), Seq(col("seq")), d, "run-a", 0L)
    val e = intercept[IllegalStateException] {
      MaintainedTable.applyBatch(base, feed((3L, "C", 31.0, 1L, "upsert")),
        Seq("k"), Seq(col("seq")), d, "run-b", 0L)
    }
    assert(e.getMessage.contains("run-a"))
  }

  test("vacuum drops old versions, never the latest; reads of vacuumed fail loudly") {
    val d = dir("vacuum")
    (0L to 3L).foreach { b =>
      MaintainedTable.applyBatch(base,
        feed((2L, s"b$b", b.toDouble, 1L, "upsert")),
        Seq("k"), Seq(col("seq")), d, "r", b)
    }
    val dropped = MaintainedTable.vacuum(spark, d, keepLast = 2)
    assert(dropped === Seq(0L, 1L))
    assert(MaintainedTable.versions(spark, d) === Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      MaintainedTable.readVersion(spark, d, 0L)
    }
    assert(sorted(MaintainedTable.latest(spark, d).get._2)
      .exists(_._2 == "b3"))
  }

  test("streaming end-to-end: maintained table tracks the change stream") {
    implicit val ctx = spark.sqlContext
    val d = dir("stream")
    val in = MemoryStream[TestChange]
    val q = MaintainedTable.maintain(in.toDF(), base, Seq("k"),
      Seq(col("seq")), d, "stream-run")()
    try {
      in.addData(TestChange(2L, "B", 21.0, 1L, "upsert"),
        TestChange(9L, "z", 90.0, 2L, "upsert"))
      q.processAllAvailable()
      in.addData(TestChange(9L, "-", 0.0, 1L, "delete"),
        TestChange(1L, "A", 11.0, 2L, "upsert"))
      q.processAllAvailable()
    } finally q.stop()
    val fin = MaintainedTable.latest(spark, d).get._2
    assert(sorted(fin) === Seq((1L, "A", 11.0), (2L, "B", 21.0),
      (3L, "c", 30.0)))
    // every micro-batch left a committed, time-travelable snapshot
    assert(MaintainedTable.versions(spark, d).size === 2)
  }
}
