package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the k largest doubles per group — the UDAF
  * surface (SURVEY.md §2b, §7 phase 6). Registered via `functions.udaf`,
  * it aggregates with full partial/merge support: each partition reduces
  * to at most k values map-side before the shuffle (the property that
  * makes grouped top-k linear at 100 TB — only k values per group cross
  * the wire, vs a window function sorting every row).
  *
  * The buffer is a descending-sorted Vector capped at k; `merge` is a
  * bounded merge of two such buffers, so state is O(k) everywhere —
  * including as `flatMapGroupsWithState`-style running state in streaming.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0)

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.size < k) insert(buf, v)
    else if (v > buf.last) insert(buf.dropRight(1), v)
    else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    // merge two descending-sorted buffers, keep the k largest
    val out = Vector.newBuilder[Double]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && a(i) >= b(j))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    val idx = buf.indexWhere(_ < v) match {
      case -1 => buf.size
      case i => i
    }
    (buf.take(idx) :+ v) ++ buf.drop(idx)
  }
}
