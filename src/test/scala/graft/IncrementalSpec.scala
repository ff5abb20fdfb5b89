package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("mergeUpsert: updates replace, inserts land, untouched rows survive") {
    val delta = Seq((2L, "B", 21.0), (9L, "z", 90.0)).toDF("k", "s", "v")
    val out = Incremental.mergeUpsert(base, delta, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a", 10.0), (2L, "B", 21.0),
      (3L, "c", 30.0), (4L, "d", 40.0), (9L, "z", 90.0)))
  }

  test("mergeUpsert is idempotent: replaying the same delta is a no-op") {
    val delta = Seq((2L, "B", 21.0), (9L, "z", 90.0)).toDF("k", "s", "v")
    val once = Incremental.mergeUpsert(base, delta, Seq("k"))
    val twice = Incremental.mergeUpsert(once, delta, Seq("k"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("mergeUpsert drops extra feed columns by name, keeps target schema") {
    val delta = Seq((2L, "B", 21.0, "noise")).toDF("k", "s", "v", "extra")
    val out = Incremental.mergeUpsert(base, delta, Seq("k"))
    assert(out.columns.toSeq === base.columns.toSeq)
  }

  test("snapshotDiff tags I/U/D, new payload on I/U, old payload on D") {
    val newSnap = Seq( // 1 unchanged, 2 updated, 3 deleted (absent), 9 inserted
      (1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0), (9L, "z", 90.0)
    ).toDF("k", "s", "v")
    val d = Incremental.snapshotDiff(base, newSnap, Seq("k"))
      .as[(Long, String, String, Double)].collect().sortBy(_._1)
    assert(d.toSeq === Seq((2L, "U", "B", 21.0), (3L, "D", "c", 30.0),
      (9L, "I", "z", 90.0)))
  }

  test("snapshotDiff null-safe compare: null->value flips are U, null==null is unchanged") {
    val o = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val n = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val d = Incremental.snapshotDiff(o, n, Seq("k"))
      .select("k", "op").as[(Long, String)].collect().toSeq
    assert(d === Seq((2L, "U")))
  }

  test("round-trip: applying snapshotDiff's delta to old reproduces new exactly") {
    val newSnap = Seq(
      (1L, "a", 10.0), (2L, "B", 21.0), (4L, "D2", 44.0), (9L, "z", 90.0)
    ).toDF("k", "s", "v")
    val delta = Incremental.snapshotDiff(base, newSnap, Seq("k"))
    val replayed = Incremental.mergeUpsert(base,
        delta.filter(col("op") =!= "D").drop("op"), Seq("k"))
      .join(delta.filter(col("op") === "D").select("k"), Seq("k"), "left_anti")
    assert(replayed.exceptAll(newSnap).isEmpty &&
      newSnap.exceptAll(replayed).isEmpty)
  }

  test("applyChangeLog: latest op per key wins; delete removes; upsert lands") {
    val feed = Seq(
      (2L, "B1", 21.0, 1L, "upsert"), // overridden by the later delete
      (2L, "B2", 22.0, 2L, "delete"),
      (3L, "C1", 31.0, 1L, "delete"), // overridden by the later upsert
      (3L, "C2", 32.0, 2L, "upsert"),
      (9L, "z", 90.0, 1L, "upsert")   // insert of an unseen key
    ).toDF("k", "s", "v", "seq", "op")
    val out = Incremental.applyChangeLog(base, feed, Seq("k"),
        Seq(col("seq")))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a", 10.0), (3L, "C2", 32.0),
      (4L, "d", 40.0), (9L, "z", 90.0)))
  }

  test("scd2History compresses same-value runs and stamps validity") {
    val feed = Seq(
      (1L, "x", 10L), (1L, "x", 20L), (1L, "y", 30L), (1L, "x", 40L),
      (2L, "q", 15L)
    ).toDF("k", "attr", "ver")
    val h = Incremental.scd2History(feed, Seq("k"),
        Seq(col("ver")), Seq("attr"), "ver")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
      .sortBy(r => (r._1, r._3))
    assert(h.toSeq === Seq(
      (1L, "x", 10L, Some(30L), false),
      (1L, "y", 30L, Some(40L), false),
      (1L, "x", 40L, None, true),
      (2L, "q", 15L, None, true)))
  }

  test("scd2History: latest attrs per key match a direct latest-per-key read") {
    val feed = (1 to 200).map { i =>
      (i % 7L, s"v${i % 3}", i.toLong)
    }.toDF("k", "attr", "ver")
    val current = Incremental.scd2History(feed, Seq("k"),
        Seq(col("ver")), Seq("attr"), "ver")
      .filter(col("is_current")).select("k", "attr")
    val direct = Incremental.latestPerKey(feed, Seq("k"), Seq(col("ver")))
      .select("k", "attr")
    assert(current.exceptAll(direct).isEmpty &&
      direct.exceptAll(current).isEmpty)
  }
}
