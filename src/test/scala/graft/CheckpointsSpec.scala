package graft

import org.apache.spark.sql.functions._
import graft.operators.Checkpoints

/** The concurrent-pin helper behind the r19 guide-§2.6 overlaps
  * (lshRecallReport truth/cand, the recall facets, the layout
  * witnesses): results must keep argument order, thunks must actually
  * run Spark jobs safely off-thread, and a failing thunk must surface
  * its OWN exception. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("parEager keeps argument order and materializes real frames") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    val Seq(a, b) = Checkpoints.parEager(
      () => df.select(sum(col("x")).as("s")).localCheckpoint(true),
      () => df.select(count(lit(1)).as("n")).localCheckpoint(true))
    assert(a.head().getLong(0) === 6L)
    assert(b.head().getLong(0) === 3L)
  }

  test("parEager surfaces the thunk's own exception, not the wrapper") {
    val boom = intercept[IllegalStateException] {
      Checkpoints.parEager[Int](
        () => 1,
        () => throw new IllegalStateException("thunk failure"))
    }
    assert(boom.getMessage === "thunk failure")
  }
}
