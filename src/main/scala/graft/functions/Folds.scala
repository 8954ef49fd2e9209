package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed whole-stream folds — the reference's only aggregation surface is
  * folding a materialized stream through host-language ranges
  * (SURVEY.md §2.7 "Aggregations"); `Aggregator[IN, BUF, OUT]` is the
  * distributed version: per-partition fold + associative merge, usable on
  * `Dataset`s and `KeyValueGroupedDataset`s at any scale.
  */
object Folds {

  /** Order-insensitive 64-bit checksum (xor of element hashes) — the
    * distributed analog of a stream checksum fold; xor is associative +
    * commutative so any partitioning gives the same result. */
  object XorChecksum extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, e: Long): Long = acc ^ scramble(e)
    override def merge(a: Long, b: Long): Long = a ^ b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    private def scramble(e: Long): Long = {
      var h = e * 0x9e3779b97f4a7c15L
      h ^= (h >>> 32); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 32)
      h
    }
  }

  /** k-component MinHash sketch as a typed, mergeable aggregate: each
    * input token updates k minimums (hash seeded per component);
    * merging two sketches is elementwise min — the sketch algebra that
    * lets 100 TB of shingles reduce tree-wise without collecting. */
  final class MinHashSketch(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(acc: Array[Long], token: String): Array[Long] = {
      val base = token.hashCode.toLong & 0xffffffffL
      var i = 0
      while (i < k) {
        val h = mix(base + i * 0x9e3779b97f4a7c15L)
        if (h < acc(i)) acc(i) = h
        i += 1
      }
      acc
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(acc: Array[Long]): Array[Long] = acc
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    private def mix(x: Long): Long = {
      var h = x
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
      h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
      h ^= (h >>> 33)
      h & Long.MaxValue // keep non-negative so Long.MaxValue is the identity
    }

    /** Estimated Jaccard similarity of two sketches. */
    def jaccard(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / k
  }

  /** Bounded per-group top-k as a mergeable fold — the windowless answer
    * to "top k rows per group". ROW_NUMBER() OVER (PARTITION BY group)
    * routes EVERY row of a group through one task (the q76 lesson);
    * this buffer instead holds at most k (score, id) pairs at every
    * stage: partial aggregation caps map-side, merge concatenates and
    * re-caps, so shuffle traffic is ≤ k rows per (partition, group)
    * regardless of group size. Ordering is score DESC with id ASC
    * tiebreak — fully deterministic under any partitioning. */
  final class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def cap(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, id) => (-score, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(acc: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] =
      cap(acc :+ e)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      cap(a ++ b)
    override def finish(acc: Seq[(Double, Long)]): Seq[(Double, Long)] = acc
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }
}
