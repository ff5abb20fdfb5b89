package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle helper for eager localCheckpoint intermediates shared by
  * the iterative fits (CC fixpoint, BPE merge loop).
  */
private[graft] object Checkpoints {

  /** Release an iteration intermediate: the CacheManager entry (if the
    * frame was persist()ed) AND the executor-local blocks behind an
    * eager localCheckpoint. Dataset.unpersist alone only touches the
    * CacheManager — checkpoint blocks are RDD-level and are otherwise
    * freed only when the ContextCleaner GCs the RDD (ADVICE r9: a
    * long-running driver composing many iterative queries would
    * accumulate executor-local storage between GCs). After this the
    * frame is DEAD: a truncated lineage cannot recompute its blocks.
    *
    * Only the plan ROOT is matched — a checkpointed frame IS a root
    * LogicalRDD. Descending the tree would also find checkpoint
    * leaves the frame merely READS (a plan built on top of a
    * still-live checkpoint) and free blocks other consumers depend
    * on. */
  def releaseIntermediate(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
