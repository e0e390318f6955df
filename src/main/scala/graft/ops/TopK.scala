package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-priority-queue top-k per group — the north star's "per-cell
  * bounded priority queue" as a typed `Aggregator`.
  *
  * vs `row_number().over(Window...)`: the window form sorts every candidate
  * row within each partition (O(n log n) over ALL candidates, all rows
  * shuffled); the aggregator keeps only k entries per group per partition
  * (O(n log k)), combines partially map-side, and shuffles at most
  * k·groups·partials rows. At 100 TB candidate sets this is the difference
  * between shuffling the candidate set and shuffling the answer.
  */
object TopK {

  type Entry = (Long, Long) // (d2, neighbor_id) — ordering = smaller is better

  /** Bounded top-k buffer as a FLAT Array[Long] of (d2, id) pairs (≤ k pairs,
    * unordered). The buffer crosses the shuffle between partial and final
    * aggregation, so its encoder matters: a flat long array is a primitive
    * unsafe-array write (~10× cheaper than the former
    * `Encoders.javaSerialization` heap object). Inserts are O(k) worst-pair
    * scans — k is small (≤ tens) and the common case is "not better than the
    * worst", a single scan with no write.
    */
  class TopKAgg(k: Int)(implicit bufEnc: Encoder[Array[Long]],
                        outEnc: Encoder[Seq[Entry]])
      extends Aggregator[(Long, Long), Array[Long], Seq[Entry]] {

    override def zero: Array[Long] = Array.emptyLongArray

    private def worse(d1: Long, i1: Long, d2: Long, i2: Long): Boolean =
      d1 > d2 || (d1 == d2 && i1 > i2)

    override def reduce(b: Array[Long], e: (Long, Long)): Array[Long] = {
      if (b.length < 2 * k) {
        val nb = java.util.Arrays.copyOf(b, b.length + 2)
        nb(b.length) = e._1; nb(b.length + 1) = e._2
        nb
      } else {
        // replace the worst pair if the new entry beats it
        var wi = 0
        var i = 2
        while (i < b.length) {
          if (worse(b(i), b(i + 1), b(wi), b(wi + 1))) wi = i
          i += 2
        }
        if (worse(b(wi), b(wi + 1), e._1, e._2)) { b(wi) = e._1; b(wi + 1) = e._2 }
        b
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var r = a
      var i = 0
      while (i < b.length) { r = reduce(r, (b(i), b(i + 1))); i += 2 }
      r
    }

    override def finish(b: Array[Long]): Seq[Entry] =
      b.grouped(2).map(p => (p(0), p(1))).toSeq.sorted

    override def bufferEncoder: Encoder[Array[Long]] = bufEnc
    override def outputEncoder: Encoder[Seq[Entry]] = outEnc
  }

  /** Top-k of `cands` (query_id, neighbor_id, d2) per query; output
    * (query_id, neighbor_id, d2, rn) identical to the window form
    * `row_number over (partition by query_id order by d2, neighbor_id) <= k`.
    */
  def topK(spark: SparkSession, cands: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // untyped UDAF binding of the same aggregator (round 6): the previous
    // typed groupByKey form deserialized every candidate row to Scala tuples
    // through two AppendColumns lambdas and re-serialized the flatMap output
    // — pure object-boundary overhead on the hottest aggregation; the UDAF
    // form keeps rows in Tungsten format end to end and emits ranks with a
    // codegen posexplode. Identical output (finish() returns the entries
    // sorted, so pos + 1 IS the row_number).
    val f = udaf(new TopKAgg(k))
    cands.groupBy("query_id")
      .agg(f(col("d2"), col("neighbor_id")).as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")))
      .select(col("query_id"),
        col("col._2").as("neighbor_id"),
        col("col._1").as("d2"),
        (col("pos") + 1).as("rn"))
  }
}
