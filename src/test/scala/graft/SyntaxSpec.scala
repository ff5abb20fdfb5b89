package graft

import graft.syntax._
import org.apache.spark.sql.functions._

/** The fluent facade must forward to the operator objects verbatim. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("fluent calls produce the same results as the operator objects") {
    val docs = Seq((1L, "a b c"), (2L, "a  B C"), (3L, "x y z"))
      .toDF("doc_id", "text")
    assert(docs.dedupExactGroups("doc_id", "text").collect().toSet ===
      graft.operators.Dedup.exactDupGroups(docs, "doc_id", "text")
        .collect().toSet)
    val events = (1 to 20).map(i => (i.toLong, i % 3, i.toDouble))
      .toDF("id", "k", "v")
    assert(events.capPerKey("k", Seq(col("id")), 2).count() === 6L)
    assert(events.topKByCount("k", 1).as[(Int, Long)].head()._2 === 7L)
  }
}
