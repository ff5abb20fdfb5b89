package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Cost-law diagnostic for the quality gate. Two claims under test
  * (SCALE.md): (1) a suite is ONE scan however many constraints —
  * cost must be near-flat in suite size for Expand-free metrics; (2)
  * exact multi-column `uniqueRatio` is the documented cliff (Spark's
  * Expand copies the input once per distinct column) while the HLL
  * flavor stays flat at the same suite size.
  *
  * Usage: runMain graft.QualityScaleCheck <sfDir>  (default sf0.1)
  */
object QualityScaleCheck {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def minOf2(f: => Unit): Double = {
    val (_, a) = time(f); val (_, b) = time(f); math.min(a, b)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build("16")
    val li = Tables(spark, dir, "lineitem")
    println(s"ROWS=${li.count()}")

    // claim 1: Expand-free suites — 2 vs 8 vs 32 constraints, one scan
    def flatSuite(k: Int): Seq[Quality.Constraint] =
      (0 until k).map { i =>
        i % 4 match {
          case 0 => Quality.completeness(s"c$i", "l_returnflag")
          case 1 => Quality.fractionWhere(s"c$i", "l_quantity",
            col("l_quantity") >= lit(i.toDouble), ">=", 0.0)
          case 2 => Quality.maxOf(s"c$i", "l_extendedprice", "<=", 1e9)
          case 3 => Quality.meanOf(s"c$i", "l_discount", "<=", 1.0)
        }
      }
    for (k <- Seq(2, 8, 32)) {
      val t = minOf2(Quality.check(li, flatSuite(k)).collect())
      println(f"FLAT_SUITE_$k%d=$t%.3f")
    }

    // claim 2: 4 exact distinct columns (Expand x5) vs 4 HLL (no
    // Expand) at identical suite shape
    val distinctCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag")
    val exact = distinctCols.zipWithIndex.map { case (c, i) =>
      Quality.uniqueRatio(s"u$i", c, "<=", 1.0) }
    val hll = distinctCols.zipWithIndex.map { case (c, i) =>
      Quality.approxUniqueRatio(s"u$i", c, "<=", 1.0) }
    val tExact = minOf2(Quality.check(li, exact).collect())
    val tHll = minOf2(Quality.check(li, hll).collect())
    println(f"EXACT_DISTINCT_4=$tExact%.3f")
    println(f"HLL_DISTINCT_4=$tHll%.3f")

    // the same cliff at the profile surface: audit vs scale flavor
    val tProf = minOf2(Quality.profile(li, distinctCols).collect())
    val tApprox = minOf2(Quality.approxProfile(li, distinctCols).collect())
    println(f"PROFILE_EXACT=$tProf%.3f")
    println(f"PROFILE_APPROX=$tApprox%.3f")
    spark.stop()
  }
}
