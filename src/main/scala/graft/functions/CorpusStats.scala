package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` — the custom-UDAF rung of the
  * extension surface (SURVEY.md §2.10): corpus-level length statistics in
  * one pass. The buffer keeps exact integer moments (count, sum, sum of
  * squares), so partial merges are associative and bit-deterministic
  * regardless of partitioning; the floating-point mean/variance are
  * derived once at `finish`. That is what makes the result
  * oracle-comparable — a Welford-style double buffer would drift with
  * merge order.
  */
object CorpusStats {

  case class Moments(n: Long, sum: Long, sumSq: Long)
  case class Stats(n_docs: Long, mean_len: Double, var_len: Double)

  val lengthStats: Aggregator[Long, Moments, Stats] =
    new Aggregator[Long, Moments, Stats] {
      override def zero: Moments = Moments(0L, 0L, 0L)

      override def reduce(b: Moments, len: Long): Moments =
        Moments(b.n + 1, b.sum + len, b.sumSq + len * len)

      override def merge(a: Moments, b: Moments): Moments =
        Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

      override def finish(m: Moments): Stats =
        // empty input: 0/0 would yield NaN stats that silently poison
        // any downstream comparison (NaN != NaN) — zeros are the
        // well-defined empty-corpus answer
        if (m.n == 0L) Stats(0L, 0.0, 0.0)
        else {
          val n = m.n.toDouble
          val mean = m.sum / n
          Stats(m.n, mean, m.sumSq / n - mean * mean)
        }

      override def bufferEncoder: Encoder[Moments] = Encoders.product
      override def outputEncoder: Encoder[Stats] = Encoders.product
    }
}
