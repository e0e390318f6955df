package graft

import org.apache.spark.sql.functions._
import graft.sim.Ann

/** Similarity-search recall properties (the correctness side is the DuckDB
  * oracle; these pin the approximate operators' relationship to their brute
  * twins).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").localCheckpoint()

  test("banded LSH pairs are a subset of the brute pairs with measured recall above the single-table variant") {
    val thr = 0.4
    val brute = Ann.cosinePairs(vecs, thr)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = Ann.lshPairs(vecs, thr)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Ann.lshPairsBanded(vecs, thr)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(brute), "LSH candidates must never invent a pair")
    assert(single.subsetOf(brute))
    val recallBanded = banded.size.toDouble / brute.size
    val recallSingle = single.size.toDouble / brute.size
    info(f"cos>=$thr%.1f pairs: brute=${brute.size} single=${single.size} " +
      f"banded=${banded.size} recall single=$recallSingle%.3f banded=$recallBanded%.3f")
    assert(recallBanded > recallSingle,
      s"bands must buy recall: banded=$recallBanded single=$recallSingle")
    assert(recallBanded >= 0.3, s"banded recall too low: $recallBanded")
  }

  test("banded LSH emits each candidate pair exactly once (first-band dedup)") {
    val all = Ann.lshPairsBanded(vecs, -1.0) // no threshold: every candidate
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(all.length === all.distinct.length, "a pair must materialize once")
  }
}
