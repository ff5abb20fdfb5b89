package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * The heap root is the WORST kept element so a beaten candidate is
  * rejected in O(1) / replaced in O(log k). */
final class TopKBuffer(val k: Int) {
  // ordering: head = worst = (lowest score, then highest id)
  private val heap = mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.by[(Double, Long), (Double, Long)] {
      case (s, id) => (-s, id)
    })

  def add(score: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      if (score > ws || (score == ws && id < wid)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, id) => add(s, id) }

  /** Best-first: score desc, id asc. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, id) => (-s, id) }

  def foreachRaw(f: (Double, Long) => Unit): Unit =
    heap.foreach { case (s, id) => f(s, id) }

  def size: Int = heap.size
}

/** Top-k-by-score typed aggregate: graft_topk(score, id, k) returns
  * array<struct<score:double, id:bigint>>, best first (score desc, id
  * asc ties).
  *
  * Why not row_number() over a window: the window shuffles EVERY scored
  * row to its query's partition before ranking — at n·q scored pairs
  * that shuffle is the job. This aggregate is algebraic: each map task
  * keeps at most k rows per group (bounded heap), so the shuffle
  * carries partitions·k rows per group. That is the difference between
  * shuffling 10^11 pairs and 10^5 partial heaps on a 1000-executor
  * similarity search.
  */
case class TopKByScore(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  require(kExpr.foldable, "k must be a literal")

  // without this, a float score or int id passes analysis and dies at
  // execution in update()'s asInstanceOf
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects (double, bigint, int literal), got $other")
    }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    buf.foreachRaw { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1), kExpr = c(2))
}

object TopKAggregate {
  val registration = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKByScore].getName, "graft_topk"),
    (cs: Seq[Expression]) => TopKByScore(cs(0), cs(1), cs(2))
      .toAggregateExpression())
}
