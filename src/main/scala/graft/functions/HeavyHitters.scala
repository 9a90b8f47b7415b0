package graft.functions

import scala.collection.mutable

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

  /** Mutable sketch buffer: item → (count, err). Kryo-encoded — the
    * buffer only crosses the wire at partial-merge boundaries; within a
    * partition `reduce` mutates the hash map in place, so the per-token
    * cost is one map update instead of an immutable-Map copy. */
  final class Summary(val counters: mutable.HashMap[String, (Long, Long)])
    extends Serializable

  case class Hitter(item: String, count: Long, err: Long)

  def topK(capacity: Int, k: Int): Aggregator[String, Summary, Seq[Hitter]] =
    new Aggregator[String, Summary, Seq[Hitter]] {
      override def zero: Summary = new Summary(mutable.HashMap.empty)

      /** O(capacity) scan for the eviction victim only when the sketch is
        * full AND the item is new — the hot path (known item) is a single
        * hash update. Tie on count breaks to the smallest item so the
        * sketch state is partitioning-independent while counts are exact. */
      private def insert(s: Summary, item: String, by: Long,
                         err: Long): Summary = {
        val m = s.counters
        m.get(item) match {
          case Some((c, e)) => m.update(item, (c + by, e + err))
          case None if m.size < capacity => m.update(item, (by, err))
          case None =>
            // evict the minimum counter; the newcomer inherits its count
            // as the classic SpaceSaving overestimate bound
            var minItem: String = null
            var minCount = Long.MaxValue
            val it = m.iterator
            while (it.hasNext) {
              val (i, (c, _)) = it.next()
              if (c < minCount ||
                  (c == minCount && (minItem == null || i < minItem))) {
                minCount = c; minItem = i
              }
            }
            m.remove(minItem)
            m.update(item, (minCount + by, minCount + err))
        }
        s
      }

      override def reduce(b: Summary, item: String): Summary =
        insert(b, item, 1L, 0L)

      override def merge(a: Summary, b: Summary): Summary = {
        // mergeable-summaries union: sum counts and error bounds for
        // common items, then keep the top `capacity` by count
        b.counters.foreach { case (i, (c, e)) =>
          val (c0, e0) = a.counters.getOrElse(i, (0L, 0L))
          a.counters.update(i, (c0 + c, e0 + e))
        }
        if (a.counters.size > capacity) {
          val keep = a.counters.toSeq
            .sortBy { case (i, (c, _)) => (-c, i) }
            .take(capacity)
          a.counters.clear()
          keep.foreach { case (i, ce) => a.counters.update(i, ce) }
        }
        a
      }

      override def finish(s: Summary): Seq[Hitter] =
        s.counters.toSeq
          .sortBy { case (i, (c, _)) => (-c, i) }
          .take(k)
          .map { case (i, (c, e)) => Hitter(i, c, e) }

      override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
      override def outputEncoder: Encoder[Seq[Hitter]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
