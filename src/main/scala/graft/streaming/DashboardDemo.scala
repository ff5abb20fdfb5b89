package graft.streaming

import graft.GraftConfig

/** Live console dashboard over a MultiSink output root — the engine-side
  * analog of the reference's Streamlit app (src/main/python/
  * taxi_dashboard.py): poll the latest batches every refresh interval
  * and redraw the three panels. Config-driven like every other main;
  * point it at a running StreamDemo's output to watch batches arrive.
  *
  * Usage: runMain graft.streaming.DashboardDemo [site.conf] [processedDir]
  */
object DashboardDemo {
  def main(args: Array[String]): Unit = {
    val c = GraftConfig.loadWithDefaults(args.find(_.endsWith(".conf")))
    val processed = args.filterNot(_.endsWith(".conf")).headOption
      .getOrElse(c.str("graft.consumer.output.directory",
        "/tmp/graft_stream_demo/processed"))
    val ticks = c.int("graft.dashboard.ticks", 1)
    val refreshSeconds = c.long("graft.dashboard.refreshSeconds", 5L)
    val spark = graft.GraftSession.build("4")
    (1 to ticks).foreach { i =>
      println(s"--- refresh $i/$ticks (${java.time.Instant.now()}) ---")
      println(Dashboard.renderPanels(spark, processed,
        topK = c.int("graft.dashboard.topK", 10)))
      if (i < ticks) Thread.sleep(refreshSeconds * 1000L)
    }
    spark.stop()
  }
}
