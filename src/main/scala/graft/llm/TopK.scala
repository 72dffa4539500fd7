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

  /** Bounded bottom-k DISTINCT sketch over long hashes — the KMV
    * (k-minimum-values) sketch buffer: ascending-sorted, duplicate
    * values inserted once, never more than k long. Partial aggregation
    * keeps every map-side buffer ≤ k, so a billion-gram source ships
    * `partitions × k` longs through the shuffle instead of its gram
    * set — no upstream `distinct()` pass needed (the sketch dedups).
    */
  final class BottomKAggregator(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {
    require(k > 0, "k must be positive")
    override def zero: List[Long] = Nil

    override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)

    override def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[Long], x: Long): List[Long] = {
      // buf is ascending and at most k long; x >= last of a full
      // buffer can neither enter nor be an unseen smaller value
      if (buf.sizeIs >= k && x >= buf.last) buf
      else {
        val (front, back) = buf.span(_ < x)
        if (back.headOption.contains(x)) buf // distinct: drop the dup
        else (front ::: x :: back).take(k)
      }
    }

    override def finish(buf: List[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
