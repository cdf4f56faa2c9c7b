package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One top-k candidate: `key` is the (pre-rounded) ranking score, `id`
  * the deterministic tie-break (ascending), `sim` the raw score carried
  * through for output. */
final case class ScoredNeighbor(key: Double, id: Long, sim: Double)

/**
 * Bounded exact top-k aggregate: keeps the k best rows by
 * (key DESC, id ASC). The buffer never exceeds k elements, and the
 * merge is associative/commutative, so Spark runs it with MAP-SIDE
 * PARTIAL AGGREGATION: each partition ships at most k candidates per
 * group instead of every scored pair crossing the shuffle — the
 * difference between moving |corpus|·|queries| rows and k·partitions
 * rows at 100 TB. The window-function formulation (`row_number() <= k`)
 * shuffles and sorts the full pair set; this is the operator you want
 * instead.
 */
case class TopKByScore(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  require(k > 0 && k <= 10000, s"k out of range: $k")

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  // Double.compare ordering (not raw >): NaN sorts greatest and -0 < 0,
  // matching Spark's sort order — raw comparisons would let a NaN entry
  // admitted early block every later finite candidate.
  private def beats(a: ScoredNeighbor, b: ScoredNeighbor): Boolean = {
    val c = java.lang.Double.compare(a.key, b.key)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def reduce(buf: Seq[ScoredNeighbor], x: ScoredNeighbor): Seq[ScoredNeighbor] = {
    if (x == null) buf
    else if (buf.size >= k && !beats(x, buf.last)) buf
    else {
      val at = buf.indexWhere(b => beats(x, b)) match {
        case -1 => buf.size
        case i => i
      }
      val w = (buf.take(at) :+ x) ++ buf.drop(at)
      if (w.size > k) w.take(k) else w
    }
  }

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = buf

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}

object TopKByScore {
  /** Column aggregate over (ranking key, tie-break id, carried sim). */
  def top_k(key: Column, id: Column, sim: Column, k: Int): Column = {
    implicit val enc: Encoder[ScoredNeighbor] = ExpressionEncoder[ScoredNeighbor]()
    udaf(TopKByScore(k)).apply(key, id, sim)
  }
}
