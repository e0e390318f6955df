package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
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

  /** Max-heap of the current k best (worst on top for O(log k) eviction). */
  class Heap(val k: Int) extends Serializable {
    val pq = scala.collection.mutable.PriorityQueue.empty[Entry](
      Ordering.Tuple2[Long, Long]) // max-first on (d2, id)
    def add(e: Entry): this.type = {
      if (pq.size < k) pq.enqueue(e)
      else if (Ordering.Tuple2[Long, Long].lt(e, pq.head)) { pq.dequeue(); pq.enqueue(e) }
      this
    }
    def merge(o: Heap): this.type = { o.pq.foreach(add); this }
    def result: Seq[Entry] = pq.toSeq.sorted
  }

  class TopKAgg(k: Int)(implicit outEnc: Encoder[Seq[Entry]])
      extends Aggregator[(Long, Long), Heap, Seq[Entry]] {
    override def zero: Heap = new Heap(k)
    override def reduce(h: Heap, e: (Long, Long)): Heap = h.add((e._1, e._2))
    override def merge(a: Heap, b: Heap): Heap = a.merge(b)
    override def finish(h: Heap): Seq[Entry] = h.result
    override def bufferEncoder: Encoder[Heap] = Encoders.javaSerialization[Heap]
    override def outputEncoder: Encoder[Seq[Entry]] = outEnc
  }

  /** Top-k of `cands` (query_id, neighbor_id, d2) per query; output
    * (query_id, neighbor_id, d2, rn) identical to the window form
    * `row_number over (partition by query_id order by d2, neighbor_id) <= k`.
    */
  def topK(spark: SparkSession, cands: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    cands.select(col("query_id").as[Long],
        struct(col("d2").as("_1"), col("neighbor_id").as("_2")).as[(Long, Long)])
      .as[(Long, (Long, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (qid, entries) =>
        entries.zipWithIndex.map { case ((d2, nid), i) => (qid, nid, d2, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "d2", "rn")
  }
}
