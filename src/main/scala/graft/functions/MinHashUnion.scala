package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Mergeable MinHash-union aggregate: element-wise min over per-document
 * signatures yields the signature of the group's shingle-set UNION —
 * the sketch property that makes corpus-level similarity cheap.
 *
 * Constant-size buffer + associative/commutative merge means Spark
 * runs it with map-side partial aggregation: at 100 TB each partition
 * contributes one `perms × 8` byte sketch, and group signatures can be
 * further unioned across corpora without touching documents again.
 */
case class MinHashUnion(perms: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(perms)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null && sig.length == perms) {
      var i = 0
      while (i < perms) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Column aggregate: union per-row signatures into one sketch. */
  def minhash_union(sig: Column, perms: Int = 32): Column =
    udaf(MinHashUnion(perms)).apply(sig)

  /** Estimated Jaccard between two signatures: fraction of agreeing
    * slots (standard MinHash estimator). */
  def estimatedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a).cast("double")
  }
}
