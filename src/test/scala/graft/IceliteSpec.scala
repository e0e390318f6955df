package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.table.{Icelite, Pipeline}
import graft.jobs.IndexJob

/** Snapshot layer: atomic commit, manifest-scoped reads, lineage, and the
  * kill-and-resume equality guarantee (SURVEY.md §5(g), §7.2 step 8).
  */
class IceliteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("icelite").toString

  test("commit/read roundtrip with manifest-scoped files") {
    val t = tmpDir() + "/t1"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val snap = Icelite.commit(spark, df, t)
    assert(snap.rowCount === 100)
    assert(snap.files.map(_.rows).sum === 100)
    val back = Icelite.read(spark, t)
    assert(back.count() === 100)
    assert(back.as[(Long, String)].collect().toSet === df.as[(Long, String)].collect().toSet)
  }

  test("uncommitted data dirs are invisible to readers") {
    val t = tmpDir() + "/t2"
    Icelite.commit(spark, Seq((1L, "a")).toDF("id", "v"), t)
    // simulate a crashed half-commit: stray data dir, no manifest/pointer
    val stray = Paths.get(t, "data", "stray-uuid")
    Seq((99L, "ghost")).toDF("id", "v").write.parquet(stray.toString)
    assert(Icelite.read(spark, t).count() === 1)
  }

  test("snapshot ids advance; old snapshots stay readable via manifest") {
    val t = tmpDir() + "/t3"
    Icelite.commit(spark, Seq((1L, "a")).toDF("id", "v"), t)
    Icelite.commit(spark, Seq((2L, "b"), (3L, "c")).toDF("id", "v"), t)
    assert(Icelite.currentSnapshotId(t) === Some(2L))
    val s1 = Icelite.readManifest(t, 1)
    assert(spark.read.parquet(s1.filePaths: _*).count() === 1)
    assert(Icelite.read(spark, t).count() === 2)
  }

  test("check (J11) catches divergence") {
    val t = tmpDir() + "/t4"
    val df = (1 to 10).map(i => (s"r$i", i)).toDF("record_id", "x")
    Icelite.commit(spark, df, t)
    assert(Icelite.check(spark, df, t, "record_id") === 0)
    val tampered = (2 to 11).map(i => (s"r$i", i)).toDF("record_id", "x")
    assert(Icelite.check(spark, tampered, t, "record_id") === 2) // r11 fwd + r1 back
  }

  test("pipeline resume: stage skipped when fingerprint matches, rerun when not") {
    val root = tmpDir()
    val pipe = new Pipeline(spark, root)
    var ran = 0
    def body = { ran += 1; Seq((1L, "x")).toDF("id", "v") }
    pipe.stage("s1", "fpA")(body)
    pipe.stage("s1", "fpA")(body) // resume: same fingerprint -> skip
    assert(ran === 1)
    pipe.stage("s1", "fpB")(body) // input changed -> recompute
    assert(ran === 2)
  }

  test("kill-and-resume produces output identical to a clean run") {
    val cleanRoot = tmpDir()
    val resumeRoot = tmpDir()
    // clean run
    val (n1, diff1) = IndexJob.run(spark, Sf, cleanRoot)
    assert(diff1 === 0)
    // "killed" run: only the first stage committed
    val pipe = new Pipeline(spark, resumeRoot)
    pipe.stage("pages", s"pages:$Sf") { graft.pages.Pages.fromDocuments(spark, Sf) }
    // resume: full run on the partially-complete root
    val (n2, diff2) = IndexJob.run(spark, Sf, resumeRoot)
    assert(diff2 === 0)
    assert(n1 === n2)
    val a = Icelite.read(spark, s"$cleanRoot/index").select("record_id")
    val b = Icelite.read(spark, s"$resumeRoot/index").select("record_id")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("width validation skips wide rows and observes invalid counts (P6/A13)") {
    val df = Seq(("short", 1), ("waaaaaaaaaaaaaaay-too-long", 2)).toDF("s", "x")
    val validated = IndexJob.validateWidths(df, Map("s" -> 10))
    assert(validated.count() === 1)
  }

  test("error sample is capped at 30 (O3, index_setsm.py:1150-1156)") {
    val df = (1 to 100).map(i => (s"r$i-${"x" * 20}", i)).toDF("record_id", "x")
    val errs = IndexJob.errorSample(df, Map("record_id" -> 10), cap = 30)
    assert(errs.count() === 30)
  }

  test("MERGE upsert: incoming wins on PK collision, novel rows append (S17)") {
    val t = tmpDir() + "/m1"
    Icelite.merge(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id"))
    Icelite.merge(spark, Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), t, Seq("id"))
    val got = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("MERGE is idempotent: re-running the same batch converges (S17)") {
    val t = tmpDir() + "/m2"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Icelite.merge(spark, batch, t, Seq("id"))
    val once = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    Icelite.merge(spark, batch, t, Seq("id"))
    val twice = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(once === twice)
    assert(Icelite.currentSnapshotId(t) === Some(2L)) // new snapshot, same rows
  }

  test("MERGE dedups the incoming batch on PK (ON CONFLICT within a batch)") {
    val t = tmpDir() + "/m3"
    Icelite.merge(spark, Seq((1L, "a"), (1L, "a2")).toDF("id", "v"), t, Seq("id"))
    assert(Icelite.read(spark, t).count() === 1)
  }

  test("crash mid-merge (data written, no manifest) leaves table intact; re-run converges") {
    val t = tmpDir() + "/m4"
    Icelite.merge(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq("id"))
    // simulate a crash after the data write but before the manifest/pointer:
    // a stray uuid data dir with rows that must stay invisible
    val stray = Paths.get(t, "data", "crashed-merge-uuid")
    Seq((9L, "ghost")).toDF("id", "v").write.parquet(stray.toString)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet === Set((1L, "a")))
    // re-running the interrupted merge converges to the intended state
    Icelite.merge(spark, Seq((9L, "g2")).toDF("id", "v"), t, Seq("id"))
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (9L, "g2")))
  }

  test("merge rewrites only claim-intersecting slices; untouched files carry byte-identical (O(batch))") {
    val t = tmpDir() + "/m5"
    val big = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, big, t, Seq("id"), nBuckets = 16)
    val s1 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s1.nBuckets === 16)
    assert(s1.bucketSpec === "id")
    assert(s1.files.map(f => (f.mod, f.res)).sorted === (0 until 16).map((16, _)))
    // snapshot every file's bytes before the upsert
    val bytesBefore = s1.files.map(f => f.path ->
      java.security.MessageDigest.getInstance("MD5").digest(Files.readAllBytes(Paths.get(f.path))).toSeq).toMap
    // single-row upsert touches exactly one slice
    Icelite.merge(spark, Seq((5L, "V5")).toDF("id", "v"), t, Seq("id"), nBuckets = 16)
    val s2 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    val replaced = s1.files.toSet -- s2.files.toSet
    val replacedSlices = replaced.map(f => (f.mod, f.res))
    assert(replacedSlices.size === 1, s"one slice must be rewritten, got $replacedSlices")
    assert(s1.files.filterNot(f => replacedSlices((f.mod, f.res))).toSet
      .subsetOf(s2.files.toSet), "untouched slices' file entries must carry verbatim")
    assert((s2.files.toSet -- s1.files.toSet).forall(f => replacedSlices((f.mod, f.res))),
      "new files may only land in the touched slice")
    // carried files are BYTE-identical, not just same-path (immutability)
    s2.files.filter(f => bytesBefore.contains(f.path)).foreach { f =>
      val now = java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(Paths.get(f.path))).toSeq
      assert(now === bytesBefore(f.path), s"carried file mutated: ${f.path}")
    }
    // content + lineage still correct
    val got = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(got === (1 to 1000).map(i => (i.toLong, if (i == 5) "V5" else s"v$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("merge writes one file per slice (no file-count rot across merges)") {
    val t = tmpDir() + "/m7"
    val big = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, big, t, Seq("id"), nBuckets = 8)
    val s1 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s1.files.groupBy(f => (f.mod, f.res)).forall(_._2.size == 1),
      s"one file per slice expected, got ${s1.files.groupBy(f => (f.mod, f.res)).view.mapValues(_.size).toMap}")
    Icelite.merge(spark, Seq((3L, "x"), (4L, "y")).toDF("id", "v"), t, Seq("id"), nBuckets = 8)
    val s2 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s2.files.groupBy(f => (f.mod, f.res)).forall(_._2.size == 1))
  }

  test("merge splits output past maxRowsPerFile; buckets never grow unbounded") {
    val t = tmpDir() + "/m8"
    val big = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, big, t, Seq("id"), nBuckets = 4, maxRowsPerFile = 50)
    val s1 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s1.files.forall(_.rows <= 50),
      s"file over bound: ${s1.files.filter(_.rows > 50).map(f => (f.mod, f.res, f.rows))}")
    assert(s1.files.forall(_.mod > 4), "1000 rows over 4 buckets must refine the modulus")
    // a small follow-up merge rewrites only intersecting slices, still bounded
    Icelite.merge(spark, Seq((7L, "X")).toDF("id", "v"), t, Seq("id"),
      nBuckets = 4, maxRowsPerFile = 50)
    val s2 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s2.files.forall(_.rows <= 50))
    assert((s1.files.toSet -- s2.files.toSet).size <= 2, "small batch must not rewrite the table")
    val got = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(got === (1 to 1000).map(i => (i.toLong, if (i == 7) "X" else s"v$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("compact splits oversized files and coalesces sliver siblings; content intact") {
    val t = tmpDir() + "/c1"
    val big = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    // write fat files (bound effectively off), then tighten the bound
    Icelite.merge(spark, big, t, Seq("id"), nBuckets = 4)
    val s1 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s1.files.exists(_.rows > 50))
    val (rewritten, filesAfter) = Icelite.compact(spark, t, maxRowsPerFile = 50)
    assert(rewritten >= s1.files.count(_.rows > 50))
    val s2 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s2.files.size === filesAfter)
    assert(s2.files.forall(_.rows <= 50),
      s"file over bound after compact: ${s2.files.filter(_.rows > 50).map(f => (f.mod, f.res, f.rows))}")
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === (1 to 1000).map(i => (i.toLong, s"v$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
    // idempotent: a second compact at the same bound is a no-op
    val (r2, _) = Icelite.compact(spark, t, maxRowsPerFile = 50)
    assert(r2 === 0)
    // relaxing the bound lets compact coalesce fine sibling slices back up
    val (r3, f3) = Icelite.compact(spark, t, maxRowsPerFile = 100000)
    assert(r3 > 0, "sliver siblings must coalesce under a loose bound")
    assert(f3 < s2.files.size)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === (1 to 1000).map(i => (i.toLong, s"v$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("merge with a different PK spec refuses stale claims (full re-slice, no dup PKs)") {
    val t = tmpDir() + "/spec1"
    Icelite.merge(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id"))
    // same table, different key columns: claims hashed under "id" are
    // untrustworthy for key (v,id) — must full-rewrite, not carry
    Icelite.merge(spark, Seq((2L, "b"), (3L, "c")).toDF("id", "v"), t, Seq("v", "id"))
    val s = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s.bucketSpec === "v,id")
    val got = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")), "no duplicate/stale PK rows")
    assert(Icelite.verifyLineage(spark, t))
  }

  test("diffSnapshots: insert/update/delete deltas, file-pruned, move-invariant (CDC)") {
    val t = tmpDir() + "/cdc1"
    Icelite.merge(spark, (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      t, Seq("id"), nBuckets = 4)
    Icelite.merge(spark, Seq((3L, "X3"), (6L, "v6")).toDF("id", "v"), t, Seq("id"),
      nBuckets = 4)
    val d12 = Icelite.diffSnapshots(spark, t, 1, 2, Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(d12 === Set((3L, "X3", "update"), (6L, "v6", "insert")))
    // delete via a full-overwrite commit dropping id=1
    Icelite.commit(spark, Icelite.read(spark, t).filter(col("id") =!= 1L), t)
    val d23 = Icelite.diffSnapshots(spark, t, 2, 3, Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(d23 === Set((1L, "v1", "delete")))
    // a compaction rewrites files but changes no rows: empty delta
    Icelite.merge(spark, Icelite.read(spark, t), t + "_c", Seq("id"), nBuckets = 2)
    Icelite.compact(spark, t + "_c", maxRowsPerFile = 2)
    val dc = Icelite.diffSnapshots(spark, t + "_c", 1,
      Icelite.currentSnapshotId(t + "_c").get, Seq("id"))
    assert(dc.count() === 0, "moved-but-identical rows must not appear in the delta")
    // identical snapshot ids: empty
    assert(Icelite.diffSnapshots(spark, t, 2, 2, Seq("id")).count() === 0)
  }

  test("commit metadata is O(changed buckets): untouched manifest segments are reused by name") {
    def segRefs(t: String, id: Long): Set[String] = {
      val txt = Files.readString(Paths.get(t, "meta", s"snapshot-$id.json"))
      """segment-[0-9a-f]{32}\.json""".r.findAllMatchIn(txt).map(_.matched).toSet
    }
    val t = tmpDir() + "/seg1"
    val big = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, big, t, Seq("id"), nBuckets = 16)
    val s1 = segRefs(t, 1)
    assert(s1.size > 1, "segments must be split by base bucket")
    // single-row upsert: every untouched bucket's segment is the SAME file
    Icelite.merge(spark, Seq((5L, "V5")).toDF("id", "v"), t, Seq("id"), nBuckets = 16)
    val s2 = segRefs(t, 2)
    assert((s1 -- s2).size <= 1 && (s2 -- s1).size <= 1,
      s"one bucket changed -> at most one segment may differ (old-only=${s1 -- s2}, new-only=${s2 -- s1})")
    assert((s1 & s2).nonEmpty)
    // expire drops segments only the expired snapshot referenced
    Icelite.expireSnapshots(t, retain = 1, orphanGraceMs = 0L)
    val liveSegs = {
      val ls = Files.list(Paths.get(t, "meta"))
      try ls.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("segment-")).toSet
      finally ls.close()
    }
    assert(liveSegs === s2, "GC must keep exactly the retained snapshot's segments")
    assert(Icelite.read(spark, t).count() === 1000)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("readWhere prunes whole segments at the manifest-list level (clustered commit)") {
    val t = tmpDir() + "/seglevel1"
    // a range-CLUSTERED full-overwrite commit: 80 part files with disjoint
    // tenx ranges → unsliced entries chunk into ~9 path-ordered segments
    // whose aggregated bounds are tight, so a narrow range keeps one chunk
    val df = (1 to 2000).map(i => (i.toLong, i * 10L)).toDF("id", "tenx")
      .repartitionByRange(80, col("tenx"))
    Icelite.commit(spark, df, t)
    val id1 = Icelite.currentSnapshotId(t).get
    val hit = Icelite.readWhere(spark, t, "tenx", 550L, 550L)
    assert(hit.as[(Long, Long)].collect().toSet === Set((55L, 550L)))
    val meta = Paths.get(t, "meta")
    val txt = Files.readString(meta.resolve(s"snapshot-$id1.json"))
    val segs = """segment-[0-9a-f]{32}\.json""".r.findAllMatchIn(txt).map(_.matched).toSeq.distinct
    assert(segs.size > 1, "clustered commit must chunk into multiple segments")
    // the keeper: the segment whose aggregated tenx zone map contains 550
    def dec(x: String) = new String(java.util.Base64.getDecoder.decode(x), "UTF-8")
    val keepers = segs.filter { s =>
      val refRe = ("""\{"name":"""" + java.util.regex.Pattern.quote(s) +
        """","rows":\d+,"stats64":\{([^}]*)\}\}""").r
      refRe.findFirstMatchIn(txt).exists { m =>
        """"([A-Za-z0-9+/=]*)":\["([A-Za-z0-9+/=]*)","([A-Za-z0-9+/=]*)"\]""".r
          .findAllMatchIn(m.group(1)).exists { p =>
            dec(p.group(1)) == "tenx" &&
              BigDecimal(dec(p.group(2))) <= 550 && BigDecimal(dec(p.group(3))) >= 550
          }
      }
    }
    assert(keepers.size === 1, s"tight chunk bounds must keep exactly one segment, got $keepers")
    // delete every OTHER segment file: a full manifest parse now throws, but
    // the list-level pruned scan never opens them — proof the planner
    // skipped whole segments, not just files
    segs.filterNot(keepers.contains).foreach(s => Files.delete(meta.resolve(s)))
    intercept[Exception](Icelite.read(spark, t).count())
    val pruned = Icelite.readWhere(spark, t, "tenx", 550L, 550L)
    assert(pruned.as[(Long, Long)].collect().toSet === Set((55L, 550L)))
  }

  test("round-4 inline manifests (files embedded) still read after the segment change") {
    val t = tmpDir() + "/inline1"
    Icelite.merge(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id"), nBuckets = 2)
    val snap = Icelite.readManifest(t, 1)
    // rewrite the manifest in the round-4 inline form (same entries, no segments)
    val inline = snap.files.map(f =>
      s"""{"path":"${f.path}","mod":${f.mod},"res":${f.res},"rows":${f.rows},"checksum":${f.checksum}}""")
      .mkString("[", ",", "]")
    Files.writeString(Paths.get(t, "meta", "snapshot-1.json"),
      s"""{"id":1,"uuid":"${snap.uuid}","rowCount":${snap.rowCount},
         |"inputFingerprint":"","nBuckets":2,"bucketSpec":"id",
         |"files":$inline}""".stripMargin)
    val back = Icelite.readManifest(t, 1)
    // legacy inline entries carry no zone-map stats — identity modulo stats
    assert(back.files.map(_.copy(stats = Map.empty)).toSet
      === snap.files.map(_.copy(stats = Map.empty)).toSet)
    assert(back.files.forall(_.stats.isEmpty))
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
  }

  test("unsupported legacy manifest fails loudly instead of reading as empty") {
    val t = tmpDir() + "/legacy1"
    Icelite.merge(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq("id"))
    // overwrite the manifest with a pre-round-3 shape: rows claimed, but
    // files as a plain string array no parser accepts
    val manifest = Paths.get(t, "meta", "snapshot-1.json")
    Files.writeString(manifest,
      """{"id":1,"uuid":"u","rowCount":1,"inputFingerprint":"","partitions":[[0,1]],
        |"files":["/some/old/file.parquet"]}""".stripMargin)
    val ex = intercept[IllegalStateException](Icelite.read(spark, t))
    assert(ex.getMessage.contains("unsupported/corrupt manifest"))
  }

  test("concurrent merge and expire are serialized; no lost rows, no GC'd live files") {
    val t = tmpDir() + "/conc1"
    Icelite.merge(spark, Seq((0L, "seed")).toDF("id", "v"), t, Seq("id"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val merger = new Thread(() => {
      try (1 to 6).foreach { i =>
        Icelite.merge(spark, Seq((i.toLong, s"m$i")).toDF("id", "v"), t, Seq("id"))
      } catch { case e: Throwable => errs.add(e) }
    })
    val expirer = new Thread(() => {
      try (1 to 6).foreach { _ =>
        Icelite.expireSnapshots(t, retain = 1) // default grace spares in-flight writes
        Thread.sleep(5)
      } catch { case e: Throwable => errs.add(e) }
    })
    merger.start(); expirer.start(); merger.join(); expirer.join()
    assert(errs.isEmpty, s"concurrent merge/expire failed: ${errs.asScala.map(_.toString)}")
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === (0 to 6).map(i => (i.toLong, if (i == 0) "seed" else s"m$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
    // grace=0 after quiescence still GCs expired data
    val (_, fDel) = Icelite.expireSnapshots(t, retain = 1, orphanGraceMs = 0L)
    assert(fDel >= 0)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("time travel: readAt returns a retained old snapshot's rows") {
    val t = tmpDir() + "/tt1"
    Icelite.merge(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq("id"), nBuckets = 4)
    Icelite.merge(spark, Seq((1L, "A2"), (2L, "b")).toDF("id", "v"), t, Seq("id"), nBuckets = 4)
    assert(Icelite.readAt(spark, t, 1).as[(Long, String)].collect().toSet === Set((1L, "a")))
    assert(Icelite.readAt(spark, t, 2).as[(Long, String)].collect().toSet
      === Set((1L, "A2"), (2L, "b")))
  }

  test("merge onto a legacy unbucketed snapshot re-buckets once") {
    val t = tmpDir() + "/m6"
    Icelite.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) // nBuckets = 0
    Icelite.merge(spark, Seq((2L, "B")).toDF("id", "v"), t, Seq("id"), nBuckets = 4)
    val s = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s.nBuckets === 4)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "B")))
    assert(Icelite.verifyLineage(spark, t))
  }

  test("expireSnapshots keeps current reads, drops old manifests, GCs orphans") {
    val t = tmpDir() + "/exp1"
    val base = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, base, t, Seq("id"), nBuckets = 4)
    Icelite.merge(spark, Seq((1L, "x")).toDF("id", "v"), t, Seq("id"), nBuckets = 4)
    Icelite.merge(spark, Seq((2L, "y")).toDF("id", "v"), t, Seq("id"), nBuckets = 4)
    // stray orphan from a crashed commit
    Seq((99L, "ghost")).toDF("id", "v").write.parquet(t + "/data/orphan-uuid")
    val before = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    // grace = 0: the test's orphan is brand-new; production keeps the default
    // grace so an in-flight writer's uncommitted dir survives GC
    val (mDel, fDel) = Icelite.expireSnapshots(t, retain = 1, orphanGraceMs = 0L)
    assert(mDel === 2)
    assert(fDel > 0)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet === before)
    assert(Icelite.verifyLineage(spark, t))
    assert(!Files.exists(Paths.get(t, "data", "orphan-uuid")), "orphan dir must be GC'd")
    assert(!Files.exists(Paths.get(t, "meta", "snapshot-1.json")))
    assert(Files.exists(Paths.get(t, "meta", "snapshot-3.json")))
  }

  test("two writers + aggressive expirer: retries converge, nothing lost (multi-writer race)") {
    val t = tmpDir() + "/conc2"
    Icelite.merge(spark, Seq((0L, "seed")).toDF("id", "v"), t, Seq("id"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(ids: Range) = new Thread(() => {
      try ids.foreach { i =>
        Icelite.merge(spark, Seq((i.toLong, s"m$i")).toDF("id", "v"), t, Seq("id"))
      } catch { case e: Throwable => errs.add(e) }
    })
    val w1 = writer(1 to 5)
    val w2 = writer(6 to 10)
    val expirer = new Thread(() => {
      try (1 to 8).foreach { _ =>
        // retain=1 GCs a lost-race base's files while the loser may still be
        // scanning them — the loser must retry from the winner's snapshot,
        // not fail (grace=default spares in-flight uuid dirs via markers)
        Icelite.expireSnapshots(t, retain = 1)
        Thread.sleep(3)
      } catch { case e: Throwable => errs.add(e) }
    })
    w1.start(); w2.start(); expirer.start()
    w1.join(); w2.join(); expirer.join()
    assert(errs.isEmpty, s"multi-writer merge/expire failed: ${errs.asScala.map(_.toString)}")
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === (0 to 10).map(i => (i.toLong, if (i == 0) "seed" else s"m$i")).toSet)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("expire spares a live writer's uncommitted files via the inflight marker") {
    val t = tmpDir() + "/infl1"
    Icelite.merge(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq("id"))
    // simulate a slow in-flight writer: marker present, data dir aging
    val uuid = "slow-writer-uuid"
    Files.createDirectories(Paths.get(t, "_inflight"))
    Files.writeString(Paths.get(t, "_inflight", uuid), "")
    Seq((9L, "pending")).toDF("id", "v").write.parquet(s"$t/data/$uuid")
    // age the data files past any grace (grace=0), marker stays young
    val (_, fDel) = Icelite.expireSnapshots(t, retain = 1, orphanGraceMs = 0L)
    assert(Files.exists(Paths.get(t, "data", uuid)),
      "live writer's data dir must survive GC even past the orphan grace")
    // crashed writer: marker older than the inflight TTL -> files become GC-able
    val (_, fDel2) = Icelite.expireSnapshots(t, retain = 1,
      orphanGraceMs = 0L, inflightTtlMs = 0L)
    assert(fDel2 > 0 && !Files.exists(Paths.get(t, "data", uuid)),
      "stale marker must age out and release the orphan files")
  }

  test("lineage verification detects tampered snapshot data") {
    val t = tmpDir() + "/lv1"
    val df = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val snap = Icelite.commit(spark, df, t)
    assert(Icelite.verifyLineage(spark, t), "pristine snapshot must verify")
    // tamper: overwrite one data file with different rows (same schema)
    val victim = snap.files.head.path
    val tmp = tmpDir() + "/tampered"
    Seq((9999L, "evil")).toDF("id", "v").coalesce(1).write.parquet(tmp)
    val replacement = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    // drop Hadoop's local .crc sidecar so the read reaches OUR check (an
    // object store has no such sidecar; lineage is the defense there)
    val victimPath = Paths.get(victim)
    Files.deleteIfExists(victimPath.getParent.resolve("." + victimPath.getFileName + ".crc"))
    Files.copy(replacement, victimPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(!Icelite.verifyLineage(spark, t), "tampering must be detected")
  }

  test("empty committed snapshot verifies (zero-row xor is vacuous)") {
    val t = tmpDir() + "/lv2"
    Icelite.commit(spark, Seq.empty[(Long, String)].toDF("id", "v"), t)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("density cache: recompute skipped on matching fingerprint (S10)") {
    val root = tmpDir()
    val pages = graft.pages.Pages.fromDocuments(spark, Sf)
    val first = graft.ops.Tiling.densityCached(spark, pages, root, s"pages:$Sf")
      .as[(String, Long, Double, Double)].collect().toSet
    val firstSnap = Icelite.currentSnapshotId(s"$root/density")
    // second call with the same fingerprint must NOT commit a new snapshot
    val second = graft.ops.Tiling.densityCached(spark, pages, root, s"pages:$Sf")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(Icelite.currentSnapshotId(s"$root/density") === firstSnap)
    assert(first === second)
    // and the cached values equal a direct computation
    val direct = graft.ops.Tiling.densityStats(pages)
      .as[(String, Long, Double, Double)].collect().toSet
    assert(first === direct)
  }

  test("path-list source expands txt lists, dirs, and single files (S3)") {
    val root = Files.createTempDirectory("pathlist")
    val sub = Files.createDirectories(root.resolve("sub"))
    Files.writeString(root.resolve("a_dem.tif"), "x")
    Files.writeString(sub.resolve("b_dem.tif"), "x")
    Files.writeString(sub.resolve("c_meta.txt"), "x")
    val list = root.resolve("paths.txt")
    Files.writeString(list,
      s"""# comment
         |${root.resolve("a_dem.tif")}
         |$sub
         |${root.resolve("a_dem.tif")}
         |not-matching.bin
         |""".stripMargin)
    val got = graft.sources.PathList.expand(spark, list.toString, "_dem.tif")
      .as[String].collect().toSet
    assert(got === Set(root.resolve("a_dem.tif").toString, sub.resolve("b_dem.tif").toString))
    // dir mode
    val dirGot = graft.sources.PathList.expand(spark, root.toString, "_dem.tif")
      .as[String].collect().toSet
    assert(dirGot === got)
    // single-file mode
    assert(graft.sources.PathList.expand(spark, root.resolve("a_dem.tif").toString, "_dem.tif")
      .count() === 1)
    // S1 depth bound: maxDepth=1 sees only the root level, not sub/
    val shallow = graft.sources.PathList.expand(spark, root.toString, "_dem.tif", maxDepth = 1)
      .as[String].collect().toSet
    assert(shallow === Set(root.resolve("a_dem.tif").toString))
    // S1 lower bound: minDepth=2 sees only sub/, not the root level
    val deep = graft.sources.PathList.expand(spark, root.toString, "_dem.tif", minDepth = 2)
      .as[String].collect().toSet
    assert(deep === Set(sub.resolve("b_dem.tif").toString))
  }
}

/** Per-file zone maps (Iceberg lower/upper-bounds analog) + manifest-level
  * data skipping. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("zonemap").toString

  test("readWhere prunes range scans at the manifest level; results exact") {
    val t = tmpDir() + "/z1"
    val df = (0 until 20000).map(i => (i.toLong, 1700000000L + i, s"name_$i"))
      .toDF("id", "ts", "name")
      .repartitionByRange(8, col("ts")) // time-clustered files, like an append-by-day table
    Icelite.commit(spark, df, t)
    val snap = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(snap.files.size === 8)
    assert(snap.files.forall(_.stats.contains("ts")))
    val keep = Icelite.pruneFiles(snap.files, "ts", 1700005000L, 1700007000L)
    assert(keep.size < snap.files.size, s"pruning must drop files (kept ${keep.size}/8)")
    val got = Icelite.readWhere(spark, t, "ts", 1700005000L, 1700007000L)
      .as[(Long, Long, String)].collect().toSet
    val want = Icelite.read(spark, t)
      .filter(col("ts") >= 1700005000L && col("ts") <= 1700007000L)
      .as[(Long, Long, String)].collect().toSet
    assert(got === want)
    assert(got.size === 2001)
    // fully-out-of-range scan: zero files, empty result, schema preserved
    val none = Icelite.readWhere(spark, t, "ts", 0L, 10L)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("id", "ts", "name"))
  }

  test("string bounds are truncated soundly (prefix lower, incremented upper)") {
    val t = tmpDir() + "/z2"
    val longPfx = "a" * 30 // longer than StatsTruncateLen
    val df = (0 until 100).map(i => (i.toLong, f"$longPfx$i%03d")).toDF("id", "s")
      .repartitionByRange(4, col("s"))
    Icelite.commit(spark, df, t)
    val snap = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    val st = snap.files.flatMap(_.stats.get("s"))
    assert(st.nonEmpty)
    assert(st.forall { case (lo, hi) =>
      lo.length <= Icelite.StatsTruncateLen && hi.length <= Icelite.StatsTruncateLen })
    // truncated bounds stay sound: an exact-value range query still finds its row
    val got = Icelite.readWhere(spark, t, "s", s"${longPfx}042", s"${longPfx}042")
      .as[(Long, String)].collect()
    assert(got.toSeq === Seq((42L, s"${longPfx}042")))
  }

  test("merge carries stats on untouched files; rewritten slices get fresh stats") {
    val t = tmpDir() + "/z3"
    val b1 = (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    Icelite.merge(spark, b1, t, Seq("id"), nBuckets = 4)
    val s1 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(s1.files.forall(f => f.stats.contains("id") && f.stats.contains("v")))
    // touch ONE id: only its slice rewrites; carried entries keep stats verbatim
    val b2 = Seq((17L, "updated")).toDF("id", "v")
    Icelite.merge(spark, b2, t, Seq("id"), nBuckets = 4)
    val s2 = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    val carried = s2.files.filter(f => s1.files.exists(_.path == f.path))
    assert(carried.nonEmpty)
    carried.foreach { f =>
      assert(f.stats === s1.files.find(_.path == f.path).get.stats) }
    assert(s2.files.forall(_.stats.contains("id")))
    // pruning on the PK: hash slices span the full range, so nothing prunes —
    // but nothing is WRONGLY pruned either
    val got = Icelite.readWhere(spark, t, "id", 17L, 17L)
      .as[(Long, String)].collect()
    assert(got.toSeq === Seq((17L, "updated")))
  }

  test("entries without stats are never pruned (legacy manifests)") {
    val legacy = Seq(
      Icelite.FileEntry("/x/a.parquet", 0, 0, 10, 1L),
      Icelite.FileEntry("/x/b.parquet", 0, 0, 10, 2L, Map("id" -> ("0", "5"))))
    val kept = Icelite.pruneFiles(legacy, "id", 100L, 200L)
    assert(kept.map(_.path) === Seq("/x/a.parquet"))
    // stats on a different column don't affect pruning on this one
    assert(Icelite.pruneFiles(legacy, "other", 1L, 2L).size === 2)
  }

  test("readWhereAll prunes on the conjunction of ranges; results exact") {
    val t = tmpDir() + "/z7"
    val df = (0 until 20000).map(i => (i.toLong, 1700000000L + i, s"n_$i"))
      .toDF("id", "ts", "name")
      .repartitionByRange(8, col("ts"))
    Icelite.commit(spark, df, t)
    val snap = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    // both columns are range-clustered (id tracks ts), so the conjunction
    // prunes at least as hard as either single range
    val single = Icelite.pruneFiles(snap.files, "ts", 1700005000L, 1700007000L)
    val both = Icelite.pruneFiles(single, "id", 5000L, 5500L)
    assert(both.size <= single.size && both.size < snap.files.size)
    val got = Icelite.readWhereAll(spark, t,
        Seq(("ts", 1700005000L, 1700007000L), ("id", 5000L, 5500L)))
      .as[(Long, Long, String)].collect().toSet
    val want = Icelite.read(spark, t)
      .filter(col("ts") >= 1700005000L && col("ts") <= 1700007000L
        && col("id") >= 5000L && col("id") <= 5500L)
      .as[(Long, Long, String)].collect().toSet
    assert(got === want && got.size === 501)
  }

  test("string pruning uses UTF-8 byte order (Spark's), not UTF-16 compareTo") {
    // U+E000 vs U+1F600: Java compareTo says emoji <  (surrogate units
    // sort low); Spark min/max and filters order by UTF-8 bytes, where the
    // emoji is GREATER. A compareTo-based pruner would drop this file.
    val e000 = ""
    val emoji = new String(Character.toChars(0x1F600))
    assert(emoji.compareTo(e000) < 0, "fixture must expose the ordering split")
    assert(Icelite.utf8Lt(e000, emoji), "UTF-8 order: E000 < U+1F600")
    val entry = Icelite.FileEntry("/x/c.parquet", 0, 0, 2, 1L,
      Map("s" -> (e000, emoji))) // Spark-computed bounds (UTF-8 min/max)
    assert(Icelite.pruneFiles(Seq(entry), "s", e000, e000).nonEmpty,
      "file containing the exact value must never be pruned")
    // end-to-end: commit rows with both values, range-read each back
    val t = tmpDir() + "/z4"
    Icelite.commit(spark, Seq((1L, e000), (2L, emoji)).toDF("id", "s"), t)
    assert(Icelite.readWhere(spark, t, "s", e000, e000)
      .as[(Long, String)].collect().toSeq === Seq((1L, e000)))
    assert(Icelite.readWhere(spark, t, "s", emoji, emoji)
      .as[(Long, String)].collect().toSeq === Seq((2L, emoji)))
  }

  test("truncateBounds never splits surrogate pairs; bounds survive the b64 roundtrip") {
    val n = Icelite.StatsTruncateLen
    // 24th UTF-16 unit is the HIGH surrogate of an emoji: a unit-level cut
    // would strand it and b64's UTF-8 encode would mangle it to '?'
    val risky = "a" * (n - 1) + new String(Character.toChars(0x1F600)) + "tail"
    val Some((lo, hi)) = Icelite.truncateBounds("a" * (n + 5), risky)
    Seq(lo, hi).foreach { b =>
      // a lone surrogate would encode to '?' and fail this roundtrip
      assert(new String(b.getBytes("UTF-8"), "UTF-8") === b,
        s"bound must survive the UTF-8 manifest roundtrip byte-identically: $b")
    }
    // upper bound soundness in UTF-8 byte order: hi > risky
    assert(Icelite.utf8Lt(risky, hi), "incremented upper bound must exceed the value")
    // lower bound: plain prefix, <= original
    assert(!Icelite.utf8Lt("a" * (n + 5), lo))
    // increment never lands in the surrogate gap
    val preGap = "b" * (n - 1) + "퟿" + "tail"
    val Some((_, hi2)) = Icelite.truncateBounds("b", preGap)
    assert(hi2.last == '', "bump past the surrogate range, not into it")
    // all-U+10FFFF: no valid upper bound exists -> no stats
    val top = new String(Character.toChars(0x10FFFF)) * (n / 2 + 2)
    assert(Icelite.truncateBounds("a", top).isEmpty)
  }

  test("exotic column names keep zone maps (keys are b64 in the manifest)") {
    val t = tmpDir() + "/z5"
    val weird = "a\"b}:,\\"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", weird)
    Icelite.commit(spark, df, t)
    val snap = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(snap.files.nonEmpty)
    assert(snap.files.forall(f => f.stats.contains("id") && f.stats.contains(weird)),
      "JSON-structural chars in a column name must not cost its zone map")
    assert(Icelite.read(spark, t).count() === 2)
    assert(Icelite.pruneFiles(snap.files, weird, "x", "x").nonEmpty)
    assert(Icelite.pruneFiles(snap.files, weird, "zz", "zz").isEmpty)
  }

  test("dotted column names commit, keep zone maps, and merge (exact-name resolution)") {
    val t = tmpDir() + "/z8"
    // col("a.b") would parse as nested access — lineage/merge must resolve
    // the literal flat name
    Icelite.commit(spark, Seq((1L, "x"), (2L, "y")).toDF("id", "a.b"), t)
    val snap = Icelite.readManifest(t, Icelite.currentSnapshotId(t).get)
    assert(snap.files.forall(f => f.stats.contains("id") && f.stats.contains("a.b")))
    assert(Icelite.read(spark, t).count() === 2)
    Icelite.merge(spark, Seq((3L, "z")).toDF("id", "a.b"), t, Seq("id"))
    assert(Icelite.read(spark, t).count() === 3)
    assert(Icelite.verifyLineage(spark, t))
  }

  test("pre-key-encoding `stats` field (raw keys) still parses") {
    val t = tmpDir() + "/z6"
    Icelite.merge(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id"), nBuckets = 2)
    val snap = Icelite.readManifest(t, 1)
    def b64(s: String) = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    // rewrite the manifest inline with the OLD stats form: raw key, b64 values
    val inline = snap.files.map(f =>
      s"""{"path":"${f.path}","mod":${f.mod},"res":${f.res},"rows":${f.rows},"checksum":${f.checksum},"stats":{"id":["${b64("1")}","${b64("2")}"]}}""")
      .mkString("[", ",", "]")
    Files.writeString(Paths.get(t, "meta", "snapshot-1.json"),
      s"""{"id":1,"uuid":"${snap.uuid}","rowCount":${snap.rowCount},
         |"inputFingerprint":"","nBuckets":2,"bucketSpec":"id",
         |"files":$inline}""".stripMargin)
    val back = Icelite.readManifest(t, 1)
    assert(back.files.forall(_.stats.get("id").contains(("1", "2"))))
    assert(Icelite.read(spark, t).count() === 2)
  }
}

/** Schema persistence: zero-file snapshots must read back typed. */
class EmptySnapshotSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("empty commit keeps its schema through read/readWhere/diffSnapshots") {
    val t = Files.createTempDirectory("emptyschema").toString + "/t"
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    Icelite.commit(spark, empty, t)
    val back = Icelite.read(spark, t)
    assert(back.columns.toSeq === Seq("id", "v"))
    assert(back.schema("id").dataType.typeName === "long")
    // downstream ops that name columns work on the empty table
    assert(back.select("v").filter(col("id") > 0).count() === 0)
    assert(Icelite.readWhere(spark, t, "id", 1L, 2L).columns.toSeq === Seq("id", "v"))
    // identical snapshots diff to an empty-but-typed changelog
    Icelite.commit(spark, Seq((1L, "a")).toDF("id", "v"), t)
    val d = Icelite.diffSnapshots(spark, t, 2, 2, Seq("id"))
    assert(d.columns.contains("__change"))
    assert(d.filter(col("__change") === "insert").count() === 0)
  }
}

/** Snapshot rollback + files metadata view. */
class RollbackSpec extends SparkSpec {
  import spark.implicits._

  test("rollback is an O(1) pointer swap; content restored, roll-forward works") {
    val t = Files.createTempDirectory("rollback").toString + "/r1"
    Icelite.merge(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t, Seq("id"))
    Icelite.merge(spark, Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), t, Seq("id"))
    val v2 = Icelite.read(spark, t).as[(Long, String)].collect().toSet
    assert(v2 === Set((1L, "a"), (2L, "B2"), (3L, "c")))
    Icelite.rollback(t, 1)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
    // a merge on the rolled-back state allocates a FRESH id (no overwrite)
    Icelite.merge(spark, Seq((9L, "z")).toDF("id", "v"), t, Seq("id"))
    assert(Icelite.currentSnapshotId(t).get === 3L)
    assert(Icelite.read(spark, t).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (9L, "z")))
    // snapshot 2 is untouched and still readable (roll-forward)
    assert(Icelite.readAt(spark, t, 2).as[(Long, String)].collect().toSet === v2)
    // rollback to an unknown id fails loudly
    intercept[Exception] { Icelite.rollback(t, 99) }
  }

  test("historyDf lists retained snapshots with the current flag; expire shrinks it") {
    val t = Files.createTempDirectory("rollback").toString + "/r3"
    Icelite.merge(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq("id"))
    Icelite.merge(spark, Seq((2L, "b")).toDF("id", "v"), t, Seq("id"))
    Icelite.merge(spark, Seq((3L, "c")).toDF("id", "v"), t, Seq("id"))
    val h = Icelite.historyDf(spark, t).collect().sortBy(_.getLong(0))
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(h.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L)) // cumulative row counts
    assert(h.count(_.getBoolean(6)) === 1 && h.last.getBoolean(6))
    assert(h.forall(_.getString(4) == "id"))
    Icelite.expireSnapshots(t, retain = 2)
    val h2 = Icelite.historyDf(spark, t).collect().map(_.getLong(0)).sorted
    assert(h2.toSeq === Seq(2L, 3L))
  }

  test("filesDf exposes slice claims, lineage, and zone maps without data IO") {
    val t = Files.createTempDirectory("rollback").toString + "/r2"
    Icelite.merge(spark, (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      t, Seq("id"), nBuckets = 4)
    val fdf = Icelite.filesDf(spark, t)
    val rows = fdf.collect()
    assert(rows.length === 4)
    assert(fdf.columns.toSeq === Seq("path", "mod", "res", "rows", "checksum", "stats"))
    assert(rows.map(_.getAs[Long]("rows")).sum === 100L)
    // every file carries id + v bounds
    assert(rows.forall(_.getAs[Seq[org.apache.spark.sql.Row]]("stats")
      .map(_.getString(0)).toSet === Set("id", "v")))
  }
}
