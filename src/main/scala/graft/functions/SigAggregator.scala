package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash-signature union: the element-wise minimum of k-value
  * signatures. Because min is commutative/associative per position, the
  * group signature of a union of documents is exactly the element-wise min
  * of their signatures — so partial aggregates combine map-side and merge
  * across partitions like any built-in agg (the distributed UDAF pattern
  * from SURVEY §2.11; the reference's registry has scalar functions only,
  * `frontends/mysqlfe/mysql_functions.go:20-78`).
  *
  * The result is itself a valid MinHash signature of the merged shingle
  * set, so signature agreement between two group signatures estimates the
  * Jaccard similarity of the groups' full shingle unions.
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val K = TextHash.SigK

  def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
    if (a != null) {
      // a shorter/longer input is a producer bug (K drift), not data —
      // fail loudly instead of MaxValue-padding the group signature
      require(a.length == K,
        s"MinHashUnion: signature length ${a.length} != K=$K")
      var i = 0
      while (i < K) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
    }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
