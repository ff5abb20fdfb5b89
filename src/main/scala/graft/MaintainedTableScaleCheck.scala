package graft

import graft.streaming.MaintainedTable
import org.apache.spark.sql.functions._

/** Delta-cost diagnostic for the maintained-table variants: apply the
  * SAME one-key change batch to the same base table through the flat
  * path (whole-table rewrite per version) and the partitioned path
  * (touched partitions only), and time both. The claim under test
  * (SCALE.md / DEPLOY.md): partitioned batch cost tracks the DELTA —
  * ~table/nParts rows read+written — while the flat path rewrites
  * everything, so the gap must widen linearly with table size over a
  * fixed delta.
  *
  * Usage: runMain graft.MaintainedTableScaleCheck <sfDir>  (default sf0.1)
  */
object MaintainedTableScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("16")
    val keys = Seq("o_orderkey")
    val ord = Seq(col("seq"))
    val base = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .cache()
    val n = base.count()
    println(s"BASE_ROWS=$n")
    import spark.implicits._
    val delta = Seq((1L, 1.0, "X", 1L, "upsert"), (2L, 2.0, "X", 1L, "upsert"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus", "seq", "op")

    val root = java.nio.file.Files
      .createTempDirectory("graft_mtable_scale").toString

    // flat: one warm batch, then time two more (each rewrites ALL rows)
    val flatDir = s"$root/flat"
    MaintainedTable.applyBatch(base, delta, keys, ord, flatDir, "r", 0L)
    val (_, tFlat1) = time(MaintainedTable.applyBatch(
      base, delta, keys, ord, flatDir, "r", 1L))
    val (_, tFlat2) = time(MaintainedTable.applyBatch(
      base, delta, keys, ord, flatDir, "r", 2L))
    println(f"FLAT_APPLY=${math.min(tFlat1, tFlat2)}%.3f")

    // partitioned: bootstrap once (the full write — not the steady
    // state), then time two delta applies (each touches ≤2 partitions)
    val partDir = s"$root/part"
    val nParts = 64
    val (_, tBoot) = time(MaintainedTable.bootstrap(
      base, keys, partDir, "r", nParts))
    println(f"PART_BOOTSTRAP=$tBoot%.3f")
    MaintainedTable.applyBatchPartitioned(delta, keys, ord, partDir, "r",
      0L, nParts)
    val (_, tPart1) = time(MaintainedTable.applyBatchPartitioned(
      delta, keys, ord, partDir, "r", 1L, nParts))
    val (_, tPart2) = time(MaintainedTable.applyBatchPartitioned(
      delta, keys, ord, partDir, "r", 2L, nParts))
    println(f"PART_APPLY=${math.min(tPart1, tPart2)}%.3f")

    // equivalence while we're here: both paths hold the same table
    val flat = MaintainedTable.latest(spark, flatDir).get._2
    val part = MaintainedTable.latestPartitioned(spark, partDir).get._2
    val same = flat.exceptAll(part).isEmpty && part.exceptAll(flat).isEmpty
    println(s"STATES_EQUAL=$same")
    spark.stop()
  }
}
