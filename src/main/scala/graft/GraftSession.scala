package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for every CLI main: `SPARK_GRAFT_CPUS`
  * (or the per-main default) drives both the master thread count and
  * the shuffle-partition count, UTC timezone, UI off, WARN logs. One
  * place to apply session-level fixes instead of six copy-pasted
  * builder blocks.
  */
object GraftSession {
  def build(defaultCpus: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
