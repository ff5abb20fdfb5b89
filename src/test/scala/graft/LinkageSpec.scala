package graft

import graft.operators.{LinkField, Linkage}
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    LinkField("name", col("l_name") === col("r_name"), m = 0.9, u = 0.01),
    LinkField("bal", abs(col("l_bal") - col("r_bal")) <= lit(0.5),
      m = 0.8, u = 0.05))
  private val (awN, dwN) = (fields(0).agreeWeight, fields(0).disagreeWeight)
  private val (awB, dwB) = (fields(1).agreeWeight, fields(1).disagreeWeight)

  private def left(rows: (Long, Long, String, Double)*) =
    rows.toDF("left_id", "blk", "l_name", "l_bal")
  private def right(rows: (Long, Long, String, Double)*) =
    rows.toDF("right_id", "blk", "r_name", "r_bal")

  test("linkPairs: agree/disagree weights sum EXACTLY (fixed-order " +
      "literal adds), and thresholds classify match/possible") {
    val out = Linkage.linkPairs(
        left((1L, 0L, "ann", 10.0), (2L, 0L, "bob", 50.0)),
        right((101L, 0L, "ann", 10.2), (102L, 0L, "bob", 99.0)),
        Seq("blk"), fields,
        matchThreshold = awN + awB, possibleThreshold = 0.0)
      .collect().map(r => (r.getAs[Long]("left_id"),
        r.getAs[Long]("right_id"), r.getAs[Double]("score"),
        r.getAs[String]("verdict"))).toSet
    // (1,101): both agree — exactly awN+awB, classed match at the
    // exact-equality boundary; (2,102): name agrees, bal off by 49
    assert(out == Set((1L, 101L, awN + awB, "match"),
      (2L, 102L, awN + dwB, "possible")))
  }

  test("linkPairs: a NULL comparand contributes weight 0 (the FS " +
      "missing-data state), with the agree flag NULL in the output") {
    val out = Linkage.linkPairs(
        left((1L, 0L, "ann", 10.0)),
        Seq((101L, 0L, null.asInstanceOf[String], 10.0))
          .toDF("right_id", "blk", "r_name", "r_bal"),
        Seq("blk"), fields, matchThreshold = 100.0,
        possibleThreshold = 0.0)
      .collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("agree_name")))
    assert(out.head.getAs[Double]("score") == 0.0 + awB)
  }

  test("linkPairs: blocking bounds candidates — cross-block pairs are " +
      "never scored; nonmatches drop unless keepNonMatches") {
    val l = left((1L, 0L, "ann", 10.0), (2L, 1L, "ann", 10.0))
    val r = right((101L, 0L, "zed", 99.0), (102L, 2L, "ann", 10.0))
    // only (1,101) shares a block, and it disagrees on everything
    assert(Linkage.linkPairs(l, r, Seq("blk"), fields, 10.0, 5.0).isEmpty)
    val kept = Linkage.linkPairs(l, r, Seq("blk"), fields, 10.0, 5.0,
      keepNonMatches = true).collect()
    assert(kept.length == 1)
    assert(kept.head.getAs[String]("verdict") == "nonmatch")
    assert(kept.head.getAs[Double]("score") == dwN + dwB)
  }

  test("guards: construction rejects bad m/u, empty blocking, " +
      "duplicate fields, inverted thresholds") {
    intercept[IllegalArgumentException](
      LinkField("f", lit(true), m = 0.5, u = 0.5))
    intercept[IllegalArgumentException](
      LinkField("f", lit(true), m = 1.0, u = 0.5))
    val l = left((1L, 0L, "a", 1.0)); val r = right((2L, 0L, "a", 1.0))
    intercept[IllegalArgumentException](
      Linkage.linkPairs(l, r, Seq.empty, fields, 1.0, 0.0))
    intercept[IllegalArgumentException](
      Linkage.linkPairs(l, r, Seq("blk"),
        fields :+ LinkField("name", lit(true), 0.9, 0.1), 1.0, 0.0))
    intercept[IllegalArgumentException](
      Linkage.linkPairs(l, r, Seq("blk"), fields, 0.0, 1.0))
  }

  test("goldenRecords: every rule picks its winner deterministically, " +
      "all-null fields survive as NULL, one pass per cluster") {
    val members = Seq(
      // cluster 1: three sources disagreeing everywhere
      (1L, 2L, Option("Ann B"), 10.0, 100L),
      (1L, 0L, Option("Ann"), 30.0, 50L),
      (1L, 1L, Option("Ann Brown~"), 20.0, 200L),
      // cluster 2: the preferred source is missing the name -> falls
      // through to the next priority; one member has the only ts-max
      (2L, 0L, None, 5.0, 10L),
      (2L, 1L, Option("Bob"), 7.0, 20L))
      .toDF("cluster", "prio", "name", "bal", "ts")
    val out = Linkage.goldenRecords(members, "cluster", Seq(
        Linkage.Prefer("name", "prio"),
        Linkage.MaxOf("bal"),
        Linkage.Latest("ts", "ts")))
      .collect().map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("n_members"), r.getAs[String]("name"),
          r.getAs[Double]("bal"), r.getAs[Long]("ts")))).toMap
    assert(out(1L) == ((3L, "Ann", 30.0, 200L)))
    assert(out(2L) == ((2L, "Bob", 7.0, 20L)))

    // Longest picks by char count (ties -> greatest string); a field
    // null on EVERY member yields NULL, not a crash
    val allNull = Seq((9L, Option.empty[String], Option.empty[String]),
        (9L, Option("xy"), None), (9L, Option("abc"), None))
      .toDF("cluster", "s", "ghost")
    val g = Linkage.goldenRecords(allNull, "cluster", Seq(
        Linkage.Longest("s"), Linkage.Longest("ghost")))
      .collect().head
    assert(g.getAs[String]("s") == "abc")
    assert(g.isNullAt(g.fieldIndex("ghost")))
    intercept[IllegalArgumentException](
      Linkage.goldenRecords(allNull, "cluster", Seq.empty))
    intercept[IllegalArgumentException](
      Linkage.goldenRecords(allNull, "cluster",
        Seq(Linkage.Longest("s"), Linkage.MinOf("s"))))
  }
}
