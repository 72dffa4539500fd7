package graft.llm

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation (SURVEY.md §4.3's deferred `Aggregator`
  * candidate, now implemented): keeps the k best (score desc, id asc)
  * pairs per group in a fixed-size buffer with map-side partial
  * aggregation. Versus a `row_number` window, nothing is globally
  * sorted and the shuffle carries at most k rows per (partition, group)
  * — the difference between shuffling N×Q scored pairs and k×Q at
  * billion-row corpus scale.
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  /** Merge-sorted, deterministic ordering: higher score first, then
    * lower id (ties on rounded scores stay engine-portable).
    */
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopKAggregator(k: Int)
      extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], in: Scored): List[Scored] =
      insert(buf, in)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[Scored], x: Scored): List[Scored] = {
      // buf is sorted best-first and at most k long
      if (buf.sizeIs >= k && !better(x, buf.last)) buf
      else {
        val (front, back) = buf.span(better(_, x))
        (front ::: x :: back).take(k)
      }
    }

    override def finish(buf: List[Scored]): Seq[Scored] = buf
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
