package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Invariants of the corpus-mixing / packing / scrubbing operators (value
  * correctness is the DuckDB oracle; these pin the set-level guarantees).
  */
class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a a a a", "en"),
    (1L, "b c d e f g h", "en"),
    (2L, "x y x y x y", "de"),
    (3L, "", "de"),
    (4L, "one two three four five six seven eight nine ten", "fr")
  ).toDF("doc_id", "text", "lang")

  test("sampleMix is deterministic and respects per-language rates") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.sampleMix(corpus, Map("en" -> 0.5, "de" -> 0.25)).collect()
    val b = TextOps.sampleMix(corpus, Map("en" -> 0.5, "de" -> 0.25)).collect()
    assert(a.toSet === b.toSet, "hash sampling must be run-to-run reproducible")
    assert(a.forall(_.getLong(2) < 500), "sample_key must stay below the max rate")
    // rate monotonicity: halving a rate can only shrink that stratum
    val half = TextOps.sampleMix(corpus, Map("en" -> 0.25, "de" -> 0.25)).collect()
    val enA = a.filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    val enH = half.filter(_.getString(1) == "en").map(_.getLong(0)).toSet
    assert(enH.subsetOf(enA), "lowering a rate keeps a subset (nested samples)")
  }

  test("tokenBudget: strict cap per language, prefix property in doc_id order") {
    val got = TextOps.tokenBudget(docs, budget = 10L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum <= 10L, "running total must respect the budget")
    }
    // doc 0 (4 toks) + doc 1 (7 toks) would cross 10 -> doc 1 excluded
    assert(got.map(_._1).toSet === Set(0L, 2L, 3L, 4L))
  }

  test("repetitionStats: exact fractions on known docs, NULLs on empty") {
    val m = TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getLong(1) === 4L && m(0L).getLong(2) === 1L)
    assert(m(0L).getDouble(3) === 0.75) // 1 - 1/4
    assert(m(0L).getDouble(4) === 1.0) // "a" is every token
    assert(m(0L).getDouble(5) === 1.0) // "a a" is every bigram
    assert(m(1L).getDouble(3) === 0.0) // all distinct
    assert(m(2L).getDouble(4) === 0.5) // x: 3 of 6
    assert(m(3L).isNullAt(3) && m(3L).isNullAt(4) && m(3L).isNullAt(5))
  }

  test("repetition kernel equals the column-tree form on the corpus fixture") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.repetitionStats(corpus).collect().map(_.toSeq).toSet
    val b = TextOps.repetitionStatsColumnForm(corpus).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("piiScrub masks emails, IPs, long digit runs and counts each pass") {
    val dirty = Seq(
      (0L, "mail me at jo.doe+x@sub.example.org or 192.168.0.1 id 12345678"),
      (1L, "clean text 123 1.2 10.0.0.300")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(dirty).as[(Long, Long, Long, Long, String)]
      .collect().sortBy(_._1)
    assert(got(0)._5 === "mail me at <EMAIL> or <IP> id <NUM>")
    assert((got(0)._2, got(0)._3, got(0)._4) === (1L, 1L, 1L))
    // 10.0.0.300: octet-shape only (no range check) -> masked; 123 / 1.2 kept
    assert(got(1)._5 === "clean text 123 1.2 <IP>")
    assert((got(1)._2, got(1)._3, got(1)._4) === (0L, 1L, 0L))
  }

  test("chunkWindows: stride tiling covers every token, last chunk partial") {
    val got = TextOps.chunkWindows(docs, chunkSize = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect()
    val byDoc = got.groupBy(_._1)
    // doc 4: 10 tokens, ceil((10-4)/3)=2 extra chunks -> starts 1,4,7; the
    // last chunk [7..10] is full and ends exactly at the final token
    val c4 = byDoc(4L).sortBy(_._2)
    assert(c4.length === 3 && c4.last._3 === 4L)
    assert(c4.head._4 === "one two three four")
    assert(c4.last._4 === "seven eight nine ten")
    // doc 1: 7 tokens -> starts 1,4; last chunk [4..7] is full
    assert(byDoc(1L).length === 2)
    // every doc yields >= 1 chunk, even the empty one
    assert(byDoc.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // coverage: stride-offset heads re-concatenate to the original prefix
    val heads = c4.init.map(_._4.split(" ").take(3).mkString(" "))
    assert((heads :+ c4.last._4).mkString(" ") === "one two three four five six seven eight nine ten")
  }

  test("shuffleShards: a seeded permutation — every doc exactly once, dense positions, reproducible") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.shuffleShards(corpus, nShards = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(a.map(_._1).distinct.length === corpus.count())
    // positions are dense 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq)
    }
    assert(a.map(_._2).distinct.length > 1, "fixture must spread over shards")
    // reproducible across runs; a different seed permutes differently
    val b = TextOps.shuffleShards(corpus, nShards = 8).collect()
    assert(a.map(r => (r._1, r._2, r._4)).toSet ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet)
    val c = TextOps.shuffleShards(corpus, nShards = 8, seed = "other")
      .as[(Long, Long, Long, Long)].collect()
    assert(c.map(r => (r._1, r._2, r._4)).toSet !==
      a.map(r => (r._1, r._2, r._4)).toSet)
  }

  test("tokenBudgetSharded: per-(lang,shard) caps; nShards=1 equals tokenBudget") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sharded = TextOps.tokenBudgetSharded(corpus, budget = 500L, nShards = 4)
      .as[(Long, String, Long, Long, Long)].collect()
    sharded.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sum <= 500L, "each (lang, shard) respects the budget")
    }
    assert(sharded.map(_._3).distinct.length > 1)
    val one = TextOps.tokenBudgetSharded(corpus, budget = 500L, nShards = 1)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._4, r._5)).toSet
    val plain = TextOps.tokenBudget(corpus, budget = 500L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(one === plain, "single shard degenerates to the simple fill")
  }

  test("CurateJob: stages only shrink, chunks carry scrubbed text, re-run converges") {
    import graft.jobs.CurateJob
    import graft.table.Icelite
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    val r = CurateJob.run(spark, "/root/testdata/sf0.001", out,
      rates = Map("en" -> 1.0), defaultRate = 1.0, // keep mixing permissive at sf0.001
      budgetPerShard = 5000L, nShards = 4, chunkSize = 16, stride = 12)
    assert(r.docsIn > 0)
    assert(r.selected <= r.docsIn && r.sampled <= r.selected
      && r.budgeted <= r.sampled, "each stage only shrinks the doc set")
    assert(r.budgeted > 0 && r.chunks >= r.budgeted,
      "every budgeted doc yields at least one chunk")
    val chunks = Icelite.read(spark, s"$out/curated_chunks")
    assert(chunks.count() === r.chunks)
    // chunk text is the SCRUBBED text: no raw PII survives (fixture text is
    // clean, so scrub must be a no-op pass-through here — assert the plumbing
    // by checking chunk tokens reassemble from the corpus text)
    assert(chunks.filter(col("n_chunk_tokens") > 16).count() === 0)
    val r2 = CurateJob.run(spark, "/root/testdata/sf0.001", out,
      rates = Map("en" -> 1.0), defaultRate = 1.0,
      budgetPerShard = 5000L, nShards = 4, chunkSize = 16, stride = 12)
    assert(r2.chunks === r.chunks && r2.chunkTokens === r.chunkTokens,
      "re-run converges to the identical chunk set")
  }

  test("packBins: bins partition docs per lang; totals are conserved") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bins = TextOps.packBins(corpus, binTokens = 512L)
      .as[(String, Long, Long, Long)].collect()
    val nTok = corpus.select(sum(size(TextOps.tokens(col("text")))).cast("long"))
      .as[Long].head()
    assert(bins.map(_._4).sum === nTok, "token mass must be conserved across bins")
    assert(bins.map(_._3).sum === corpus.count(), "every doc lands in exactly one bin")
    // a bin overflows by at most one doc: fill < binTokens + max doc length
    val maxDoc = corpus.select(max(size(TextOps.tokens(col("text")))).cast("long")).as[Long].head()
    assert(bins.forall(_._4 < 512L + maxDoc))
  }
}
