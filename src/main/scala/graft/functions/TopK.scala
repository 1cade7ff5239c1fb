package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Scored row for bounded top-k aggregation. */
case class Scored(score: Double, id: Long)

/** Bounded top-k per group as a typed Aggregator (SURVEY.md §2.2 B17).
  *
  * Why not window row_number: a window must shuffle EVERY row of every
  * group and sort it before discarding all but k. This aggregator is
  * partial-aggregatable — each map task keeps a k-bounded buffer per
  * group and the shuffle carries at most k rows per (partition, group):
  * at 100 TB that's the difference between shuffling the fact table
  * and shuffling k·|groups| rows.
  *
  * Ordering: score descending, id ascending on ties — deterministic,
  * matching `ORDER BY score DESC, id` in the oracle.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
    // fast path: buffer full and the new row can't enter
    if (b.length >= k && ord.gteq(a, b.last)) b
    else ((b :+ a).sorted(ord)).take(k)
  }

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(ord)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
