package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a mergeable typed `Aggregator` — the
  * GROUPED TakeOrderedAndProject Spark doesn't ship. A `row_number()`
  * window ranks by shuffling the FULL candidate set to its group's
  * partition first; this keeps at most k (score, id) pairs per group
  * per partition, so map-side combine collapses every scan partition's
  * contribution to ≤ k rows BEFORE the exchange (the [[HeavyHitters]]
  * mergeable-summary discipline applied to ranking — top-k is a
  * mergeable summary: union two top-k sets and re-take k).
  *
  * For a kNN-graph candidate frame of C rows over Q queries this cuts
  * the ranking shuffle from C rows to ≤ min(C, k·Q·partitions) — at
  * 100 TB the difference between re-shuffling the candidate blow-up
  * and shuffling roughly the OUTPUT.
  *
  * Ordering is (score desc, id asc) — the ANN ranking rule shared by
  * every ranker in [[graft.similarity.Similarity]]; comparisons are
  * exact doubles, so the result is identical to the window formulation
  * under any partitioning (spec-pinned equivalence).
  */
object TopKAgg {

  /** One scored candidate. `id` breaks exact score ties ascending. */
  case class Scored(score: Double, id: Long)

  /** Mutable best-first buffer, capacity k. Kryo-encoded — it only
    * crosses the wire at partial-merge boundaries; within a partition
    * inserts mutate in place (k is ranking-sized, so the linear insert
    * is a handful of comparisons). */
  final class Buf(var scores: Array[Double], var ids: Array[Long],
                  var n: Int) extends Serializable

  /** true iff (s1, i1) ranks strictly better than (s2, i2), under
    * Spark's DOUBLE ordering (NaN greatest and self-equal, -0.0 ==
    * 0.0) — kept identical to [[TopKExpr.beats]] so the spec-pinned
    * Aggregator ≡ native ≡ window equivalence holds for NaN scores. */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 || n2) (n1 && !n2) || (n1 == n2 && i1 < i2)
    else s1 > s2 || (s1 == s2 && i1 < i2)
  }

  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] = {
    require(k >= 1, s"top-k size must be >= 1, got $k")
    new Aggregator[Scored, Buf, Seq[Scored]] {
      override def zero: Buf =
        new Buf(new Array[Double](k), new Array[Long](k), 0)

      private def insert(b: Buf, score: Double, id: Long): Buf = {
        if (b.n < k || beats(score, id, b.scores(b.n - 1), b.ids(b.n - 1))) {
          // find insertion point from the tail (candidates usually lose)
          var pos = math.min(b.n, k - 1)
          while (pos > 0 && beats(score, id, b.scores(pos - 1), b.ids(pos - 1)))
            pos -= 1
          var i = math.min(b.n, k - 1)
          while (i > pos) {
            b.scores(i) = b.scores(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
          }
          b.scores(pos) = score; b.ids(pos) = id
          if (b.n < k) b.n += 1
        }
        b
      }

      override def reduce(b: Buf, a: Scored): Buf =
        insert(b, a.score, a.id)

      override def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < b.n) { insert(a, b.scores(i), b.ids(i)); i += 1 }
        a
      }

      override def finish(b: Buf): Seq[Scored] =
        (0 until b.n).map(i => Scored(b.scores(i), b.ids(i)))

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }
}
