package graft

import org.apache.spark.sql.functions._

/** Input-scan-multiplicity diagnostic: runs groupedQuantiles over an
  * accumulator-instrumented source and reports how many times each input
  * row was read end-to-end. Guards against DAG forks silently re-scanning
  * the base data (Spark reuses nothing across plan branches unless an
  * exchange-reuse rule happens to fire — measured: it often doesn't).
  * Expected output: SCANS_PER_ROW=2.0 (pass A bracket + pass B counts).
  */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("8")
    import spark.implicits._
    val n = 50000
    val acc = spark.sparkContext.longAccumulator("scans")
    val base = spark.range(n)
      .map { x => acc.add(1); (("g" + (x % 3)), x.toDouble % 97) }
      .toDF("g", "x")
    graft.operators.Relational.groupedQuantiles(base, "g",
      Seq(("x", 0.5, "med"), ("x", 0.95, "p95"))).collect()
    println(s"SCANS_PER_ROW=${acc.value / n.toDouble}")
    spark.stop()
  }
}
