package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Approximate heavy hitters via the SpaceSaving sketch (Metwally,
  * Agrawal, El Abbadi '05) as a typed `Aggregator` — the bounded-memory
  * member of the sketch surface next to HLL (`approx_count_distinct`) and
  * KLL (`approx_percentile`). An exact per-item count over a 100 TB token
  * stream needs |vocabulary| state; this keeps a fixed `capacity` of
  * counters per partial, merges associatively (mergeable-summaries
  * property: union counts, keep the top `capacity`), and guarantees any
  * item with true frequency > N/capacity survives. Counts are exact
  * whenever the distinct-item count never exceeded `capacity` anywhere
  * (asserted in HeavyHittersSpec); otherwise they are overestimates
  * bounded by the evicted minimum, tracked per item in `err`.
  *
  * Output: top-k (item, count, err) by count desc, item asc — the tie
  * break makes the result deterministic under any partitioning when
  * counts are exact; under approximation the item SET near the tail is
  * partitioning-dependent, which is why the query is rows-only (like the
  * other sketches).
  */
object HeavyHitters {

  case class Counter(count: Long, err: Long)
  case class Summary(counters: Map[String, Counter])
  case class Hitter(item: String, count: Long, err: Long)

  def topK(capacity: Int, k: Int): Aggregator[String, Summary, Seq[Hitter]] =
    new Aggregator[String, Summary, Seq[Hitter]] {
      override def zero: Summary = Summary(Map.empty)

      private def insert(s: Summary, item: String, by: Long,
                         err: Long): Summary = s.counters.get(item) match {
        case Some(c) =>
          Summary(s.counters.updated(item, Counter(c.count + by, c.err + err)))
        case None if s.counters.size < capacity =>
          Summary(s.counters.updated(item, Counter(by, err)))
        case None =>
          // evict the minimum counter; the newcomer inherits its count as
          // the classic SpaceSaving overestimate bound
          val (minItem, minC) = s.counters.minBy { case (i, c) => (c.count, i) }
          Summary(s.counters - minItem +
            (item -> Counter(minC.count + by, minC.count + err)))
      }

      override def reduce(b: Summary, item: String): Summary =
        insert(b, item, 1L, 0L)

      override def merge(a: Summary, b: Summary): Summary = {
        // mergeable-summaries union: sum counts and error bounds for
        // common items, then keep the top `capacity` by count
        val union = (a.counters.keySet ++ b.counters.keySet).map { i =>
          val ca = a.counters.getOrElse(i, Counter(0, 0))
          val cb = b.counters.getOrElse(i, Counter(0, 0))
          i -> Counter(ca.count + cb.count, ca.err + cb.err)
        }.toMap
        if (union.size <= capacity) Summary(union)
        else Summary(union.toSeq
          .sortBy { case (i, c) => (-c.count, i) }
          .take(capacity).toMap)
      }

      override def finish(s: Summary): Seq[Hitter] =
        s.counters.toSeq
          .sortBy { case (i, c) => (-c.count, i) }
          .take(k)
          .map { case (i, c) => Hitter(i, c.count, c.err) }

      override def bufferEncoder: Encoder[Summary] = Encoders.product
      override def outputEncoder: Encoder[Seq[Hitter]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
