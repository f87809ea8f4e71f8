package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed `Aggregator` (public:
  * Misra & Gries '82; mergeability per Agarwal et al. PODS'12 "Mergeable
  * summaries"). The candidate-finding half of the two-phase heavy-hitter
  * pattern in [[graft.operators.Corpus.heavyHitters]]: the sketch GUARANTEES
  * every item with true frequency > n/(k+1) survives in the final state, so
  * an exact recount pass restricted to the ≤ k candidates returns the exact
  * heavy-hitter set without ever shuffling the full (item, count) space.
  *
  * State is a Map of at most k counters everywhere — map-side partials,
  * shuffle payload, and merged result — so the sketch pass costs one
  * O(k)-byte row per partition regardless of item cardinality (contrast a
  * full wordcount, which shuffles every distinct item). `reduce` is the
  * classic decrement-all step; `merge` sums counters then subtracts the
  * (k+1)-th largest count from all (the PODS'12 merge), both of which only
  * ever UNDER-count — never over — which is why the guarantee needs the
  * recount phase for exact answers.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"sketch size k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      // full and unseen: decrement every counter, drop zeros (the item
      // itself is implicitly "added then decremented away")
      case None => buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from all; ≤ k stay positive
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.collect { case (t, c) if c - cut > 0L => t -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
