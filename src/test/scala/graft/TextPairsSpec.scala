package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Pair-extraction properties of the dedup operators (value correctness is
  * the DuckDB oracle; these pin the set-level guarantees).
  */
class TextPairsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").localCheckpoint()

  test("simhash multi-index pairs EQUAL the brute hamming pairs (pigeonhole is exact, not approximate)") {
    val got = TextOps.simhashPairs(docs, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    // exactly-once emission (first-block dedup)
    assert(got.length === got.map(p => (p._1, p._2)).distinct.length)
    // brute twin: all-pairs hamming over the signatures
    val sigs = TextOps.simhash(docs)
    val a = sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === brute.toSet,
      "pigeonhole blocks must recover EVERY pair within the distance — zero recall loss")
    assert(got.nonEmpty, "fixture must contain near-dup pairs for the test to bite")
  }
}
