package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.Icelite
import graft.text.TextOps

/** The end-to-end corpus-curation job: raw web documents → training chunks,
  * composing the curation operator family in the order a production
  * pipeline runs it:
  *
  *  1. PII scrub ([[TextOps.piiScrub]]) — masked text + redaction counts
  *  2. selection ([[TextOps.corpusSelect]]) — duplicate-cluster
  *     representative ∧ quality ∧ boilerplate ∧ language
  *  3. mixing weights ([[TextOps.sampleMix]]) — deterministic per-language
  *     hash rates
  *  4. token budget ([[TextOps.tokenBudgetSharded]]) — per-(lang, shard)
  *     prefix-sum fill, no single-language partition
  *  5. chunking ([[TextOps.chunkWindows]]) — fixed-size overlapping token
  *     windows over the SCRUBBED text
  *
  * The chunk table is committed as an Icelite snapshot keyed by the input
  * fingerprint; per-stage doc counts come back for the job's metrics line.
  * Every stage is narrow or bucket-bounded (see the operator scaladocs), so
  * the composition inherits the 100 TB story of its parts.
  */
object CurateJob {

  case class Result(docsIn: Long, selected: Long, sampled: Long,
                    budgeted: Long, chunks: Long, chunkTokens: Long,
                    snapshotId: Long)

  def run(spark: SparkSession, sfDir: String, outRoot: String,
          rates: Map[String, Double] = Map("en" -> 0.9, "de" -> 0.5),
          defaultRate: Double = 0.25,
          budgetPerShard: Long = 50000L, nShards: Int = 8,
          chunkSize: Int = 64, stride: Int = 48): Result = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 1. scrub (kept separate from selection: quality/dedup signals must see
    // the ORIGINAL text — a mass-masked page should score as its raw self)
    val scrubbed = TextOps.piiScrub(docs)
      .select(col("doc_id"), col("clean_text"))

    // 2-3. survivors ∩ sample, with lang for the budget fill
    val selected = TextOps.corpusSelect(docs).select("doc_id")
    val sampled = TextOps.sampleMix(docs, rates, defaultRate).select("doc_id")
    val kept = docs.select(col("doc_id"), col("lang"), col("text"))
      .join(selected, Seq("doc_id"), "left_semi")
    val mixed = kept.join(sampled, Seq("doc_id"), "left_semi")

    // 4. budget fill over the mixed set (deterministic doc_id order)
    val budgeted = TextOps.tokenBudgetSharded(
      mixed, budgetPerShard, nShards).select("doc_id")

    // 5. chunk the SCRUBBED text of the budgeted survivors
    val toChunk = scrubbed.join(budgeted, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("clean_text").as("text"))
    val chunks = TextOps.chunkWindows(toChunk, chunkSize, stride)

    val snap = Icelite.commit(spark, chunks, s"$outRoot/curated_chunks",
      s"curate:$sfDir")
    val chunkStats = Icelite.read(spark, s"$outRoot/curated_chunks")
      .agg(coalesce(sum(col("n_chunk_tokens")), lit(0L))).head().getLong(0)
    Result(docs.count(), count1(selected), count1(mixed.select("doc_id")),
      count1(budgeted), snap.rowCount, chunkStats, snap.id)
  }

  private def count1(df: DataFrame): Long = df.count()
}
