package graft

import graft.functions.TopKBuffer
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the pure-JVM bounded top-k heap backing the
  * graft_topk aggregate: against any input, in any arrival order, with
  * any merge split, the buffer must agree with sort-take-k. */
object TopKBufferProps extends Properties("TopKBuffer") {

  private val entries: Gen[List[(Double, Long)]] = Gen.listOf(for {
    s <- Gen.chooseNum(0.0, 1.0)
    id <- Gen.chooseNum(0L, 50L) // small id space -> frequent score ties
  } yield (s, id))

  private def expected(xs: List[(Double, Long)], k: Int) =
    xs.distinct.sortBy { case (s, id) => (-s, id) }.take(k)

  // distinct inputs throughout: in the aggregate the id is unique per
  // group, so duplicate (score, id) pairs cannot occur
  property("sorted == sort-take-k") =
    Prop.forAll(entries, Gen.chooseNum(1, 10)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.distinct.foreach { case (s, id) => buf.add(s, id) }
      buf.sorted == expected(xs, k)
    }

  property("merge(split) == bulk insert") =
    Prop.forAll(entries, Gen.chooseNum(1, 10), Gen.chooseNum(0, 100)) {
      (xs, k, cutRaw) =>
        val distinct = xs.distinct
        val cut = if (distinct.isEmpty) 0 else cutRaw % (distinct.size + 1)
        val (a, b) = distinct.splitAt(cut)
        val bufA = new TopKBuffer(k); a.foreach(p => bufA.add(p._1, p._2))
        val bufB = new TopKBuffer(k); b.foreach(p => bufB.add(p._1, p._2))
        bufA.mergeFrom(bufB)
        bufA.sorted == expected(distinct, k)
    }

  property("never holds more than k") =
    Prop.forAll(entries, Gen.chooseNum(1, 10)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, id) => buf.add(s, id) }
      buf.size <= k
    }
}
