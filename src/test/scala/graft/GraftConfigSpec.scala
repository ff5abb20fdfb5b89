package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private val sample =
    """
      |# top comment
      |graft {
      |  producer {
      |    data {
      |      sourceDir = "/data/sf1"   # inline comment
      |      batchSize = 250
      |      intervalSeconds: 5        // colon separator + slash comment
      |    }
      |    file { outputDir = /tmp/bus }
      |  }
      |  consumer {
      |    output {
      |      drainOnce = true
      |      format = parquet
      |    }
      |  }
      |}
      |""".stripMargin

  test("parse: nesting, comments, quotes, separators, types") {
    val c = GraftConfig.parse(sample)
    assert(c.str("graft.producer.data.sourceDir", "") === "/data/sf1")
    assert(c.long("graft.producer.data.batchSize", 0L) === 250L)
    assert(c.long("graft.producer.data.intervalSeconds", 0L) === 5L)
    assert(c.str("graft.producer.file.outputDir", "") === "/tmp/bus")
    assert(c.bool("graft.consumer.output.drainOnce", false) === true)
    assert(c.str("graft.consumer.output.format", "") === "parquet")
  }

  test("defaults apply for absent keys; overlay overrides win") {
    val c = GraftConfig.parse(sample)
    assert(c.str("graft.consumer.output.directory", "/fallback") === "/fallback")
    assert(c.int("graft.consumer.source.maxFilesPerTrigger", 2) === 2)
    val over = c.overlay(Map("graft.producer.data.batchSize" -> "9"))
    assert(over.long("graft.producer.data.batchSize", 0L) === 9L)
    assert(over.str("graft.producer.data.sourceDir", "") === "/data/sf1")
  }

  test("bundled graft.conf resource loads with the reference key shapes") {
    val c = GraftConfig.loadWithDefaults(None)
    // the reference's producer data/file + consumer source/output blocks
    assert(c.strOpt("graft.producer.data.sourceDir").nonEmpty)
    assert(c.strOpt("graft.producer.file.outputDir").nonEmpty)
    assert(c.strOpt("graft.consumer.source.directory").nonEmpty)
    assert(c.strOpt("graft.consumer.output.directory").nonEmpty)
    assert(c.long("graft.consumer.output.triggerSeconds", -1L) >= 0L)
  }

  test("site file overlays bundled defaults; missing file = defaults") {
    val f = java.nio.file.Files.createTempFile("graft_site", ".conf")
    java.nio.file.Files.writeString(f,
      "graft { consumer { output { format = json } } }")
    val c = GraftConfig.loadWithDefaults(Some(f.toString))
    assert(c.str("graft.consumer.output.format", "") === "json")
    // untouched default survives the overlay
    assert(c.strOpt("graft.producer.file.outputDir").nonEmpty)
    val miss = GraftConfig.loadWithDefaults(Some("/nonexistent/x.conf"))
    assert(miss.strOpt("graft.producer.file.outputDir").nonEmpty)
  }

  test("bare URI values survive the // comment rule") {
    val c = GraftConfig.parse(
      """g {
        |  a = hdfs://namenode:8020/data   // trailing comment still works
        |  b = s3a://bucket/prefix
        |  c = "http://quoted/kept"  # hash comment
        |}""".stripMargin)
    assert(c.str("g.a", "") === "hdfs://namenode:8020/data")
    assert(c.str("g.b", "") === "s3a://bucket/prefix")
    assert(c.str("g.c", "") === "http://quoted/kept")
  }

  test("bundled graft.conf never drifts from the code Defaults") {
    val res = GraftConfig.resourceConf()
    assert(res.entries.nonEmpty, "resource missing from classpath")
    // every key present in the resource must exist in Defaults with the
    // SAME value, and vice versa — one source of truth, two renderings
    assert(res.entries === GraftConfig.Defaults)
  }

  test("malformed input fails loudly") {
    assertThrows[IllegalArgumentException](GraftConfig.parse("a { b = 1"))
    assertThrows[IllegalArgumentException](GraftConfig.parse("}"))
    assertThrows[IllegalArgumentException](GraftConfig.parse("a { novalue }"))
  }
}
