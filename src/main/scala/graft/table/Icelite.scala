package graft.table

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** "Icelite": a from-scratch Iceberg-style snapshot table layer (no Iceberg
  * runtime in the sandbox — SURVEY.md §7.0). Provides what the north rule
  * requires: checkpointed, resumable batch stages with per-partition lineage
  * and metrics.
  *
  * Layout (local FS; on a cluster this would be an object store — the
  * rename-based commit maps to a conditional PUT of the pointer object):
  * {{{
  * <table>/
  *   data/<snapshotUuid>/part-*.parquet             -- unbucketed data files
  *   data/<snapshotUuid>/__bucket=<b>/part-*.parquet -- PK-hash-bucketed files
  *   meta/snapshot-<id>.json                        -- manifest: file entries
  *   _CURRENT                                       -- atomic pointer
  * }}}
  *
  * Commit protocol: write data to a fresh uuid dir → write the manifest →
  * atomically rename `_CURRENT.tmp` over `_CURRENT`. Readers resolve
  * `_CURRENT` then read only files listed in the manifest, so a crashed
  * half-written commit is invisible (reference precedent: semaphore files
  * `.cogfin` in package_setsm.py:395-438 and the `--check` verification of
  * index_setsm.py:1179-1197).
  *
  * Lineage is PER DATA FILE (rows + xor-of-hash checksum — the Iceberg
  * manifest-entry analog; a Spark partition id is ephemeral, the written
  * file IS the durable partition). File-level lineage is what lets
  * [[merge]] carry untouched files into the next snapshot verbatim with
  * their lineage intact, so upsert IO is O(batch), not O(table).
  *
  * Resume: [[Pipeline.stage]] skips a stage whose table already has a
  * committed snapshot for the same input fingerprint — the Spark analog of
  * the reference's "expected outputs exist" incomplete-task skip
  * (package_setsm.py:160-174).
  */
object Icelite {

  /** One immutable data file: its PK-hash bucket (-1 = unbucketed) and
    * lineage (row count + order-independent xor-of-row-hash checksum). */
  case class FileEntry(path: String, bucket: Int, rows: Long, checksum: Long)

  case class Snapshot(id: Long, uuid: String, files: Seq[FileEntry], rowCount: Long,
                      inputFingerprint: String, nBuckets: Int) {
    def filePaths: Seq[String] = files.map(_.path)
  }

  private def metaDir(table: String): Path = Paths.get(table, "meta")
  private def currentPtr(table: String): Path = Paths.get(table, "_CURRENT")

  def currentSnapshotId(table: String): Option[Long] = {
    val p = currentPtr(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Read a snapshot manifest (JSON is hand-rolled: no JSON lib needed for
    * this fixed shape).
    */
  def readManifest(table: String, id: Long): Snapshot = {
    val txt = Files.readString(metaDir(table).resolve(s"snapshot-$id.json"))
    def field(k: String): String = {
      val m = (s""""$k"\\s*:\\s*("([^"]*)"|[0-9-]+)""").r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"manifest missing $k"))
      Option(m.group(2)).getOrElse(m.group(1))
    }
    val files = """\{"path":"([^"]*)","bucket":(-?\d+),"rows":(\d+),"checksum":(-?\d+)\}""".r
      .findAllMatchIn(txt)
      .map(m => FileEntry(m.group(1), m.group(2).toInt, m.group(3).toLong, m.group(4).toLong))
      .toSeq
    // nBuckets absent in pre-bucketing manifests ⇒ 0 (unbucketed layout);
    // merge onto such a snapshot takes the full re-bucketing rewrite path
    val nBuckets = """"nBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(0)
    Snapshot(field("id").toLong, field("uuid"), files, field("rowCount").toLong,
      field("inputFingerprint"), nBuckets)
  }

  /** Per-file lineage of freshly written parquet under `dataDir`: one scan,
    * grouped by physical file. `dataCols` is the logical schema (the
    * `__bucket` partition directory column is layout, not data).
    */
  private def fileLineage(spark: SparkSession, dataDir: Path,
                          dataCols: Seq[String]): Seq[FileEntry] = {
    val written = spark.read.parquet(dataDir.toString)
    val bucketRe = """__bucket=(\d+)""".r
    written
      .withColumn("__file", input_file_name())
      // order-independent checksum; bit_xor never overflows (ANSI mode is on
      // by default in Spark 4 and sum(long) would throw)
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"),
        bit_xor(xxhash64(dataCols.map(col): _*)).as("checksum"))
      .collect()
      .map { r =>
        val path = new java.net.URI(r.getString(0)).getPath
        val bucket = bucketRe.findFirstMatchIn(path).map(_.group(1).toInt).getOrElse(-1)
        FileEntry(path, bucket, r.getLong(1), r.getLong(2))
      }.toSeq.sortBy(_.path)
  }

  /** Write `df` into a fresh uuid data dir (bucketed by `__bucket` when the
    * column is present) and return its per-file lineage entries.
    */
  private def writeData(spark: SparkSession, df: DataFrame, table: String): (String, Seq[FileEntry]) = {
    val uuid = UUID.randomUUID().toString
    val dataDir = Paths.get(table, "data", uuid)
    val bucketed = df.columns.contains("__bucket")
    if (bucketed)
      // co-locate each bucket into one task before the partitioned write:
      // without it every task writes a file per bucket value it holds
      // (#tasks × #buckets files per merge — file-count rot at scale);
      // with it a bucket is one file (modulo benign hash collisions)
      df.repartition(col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket").parquet(dataDir.toString)
    else
      df.write.mode("overwrite").parquet(dataDir.toString)
    val dataCols = df.columns.filterNot(_ == "__bucket").toSeq
    val ls = Files.list(dataDir)
    val hasData = try ls.iterator().asScala.exists(p =>
      p.toString.endsWith(".parquet") || Files.isDirectory(p)) finally ls.close()
    val entries =
      if (hasData) fileLineage(spark, dataDir, dataCols)
      else Seq.empty // empty write: only _SUCCESS
    (uuid, entries)
  }

  /** The commit section: id allocation + manifest + pointer swap, serialized
    * by an OS file lock so two concurrent committers can neither compute the
    * same id nor drop each other's committed snapshot (on an object store
    * this whole section maps to a conditional PUT of the pointer).
    * `expectedBase`: when Some(base), commit only if the current snapshot id
    * still equals `base` (optimistic concurrency for [[merge]]) — returns
    * None on a lost race so the caller can recompute from the new base.
    * Manifests are written CREATE_NEW: ids never overwrite.
    */
  private def commitEntries(table: String, uuid: String, entries: Seq[FileEntry],
                            inputFingerprint: String, nBuckets: Int,
                            expectedBase: Option[Option[Long]]): Option[Snapshot] = {
    Files.createDirectories(metaDir(table))
    val rowCount = entries.map(_.rows).sum
    val lockCh = FileChannel.open(Paths.get(table, "_LOCK"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      val cur = currentSnapshotId(table)
      expectedBase match {
        case Some(base) if base != cur => return None // lost the race
        case _ =>
      }
      var id = cur.getOrElse(0L) + 1
      var written = false
      while (!written) {
        val manifest = manifestJson(id, uuid, rowCount, inputFingerprint, nBuckets, entries)
        try {
          Files.writeString(metaDir(table).resolve(s"snapshot-$id.json"),
            manifest, StandardOpenOption.CREATE_NEW)
          written = true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => id += 1
        }
      }
      // atomic pointer swap — the actual commit
      val tmp = Paths.get(table, s"_CURRENT.tmp.$uuid")
      Files.writeString(tmp, id.toString)
      Files.move(tmp, currentPtr(table), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      Some(Snapshot(id, uuid, entries, rowCount, inputFingerprint, nBuckets))
    } finally {
      lock.release(); lockCh.close()
    }
  }

  /** Commit a DataFrame as the table's next snapshot (full overwrite of the
    * logical content; previous snapshots stay readable via their manifests).
    */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             inputFingerprint: String = ""): Snapshot = {
    val (uuid, entries) = writeData(spark, df, table)
    commitEntries(table, uuid, entries, inputFingerprint, 0, None).get
  }

  private def manifestJson(id: Long, uuid: String, rowCount: Long,
                           inputFingerprint: String, nBuckets: Int,
                           entries: Seq[FileEntry]): String = {
    val fileArr = entries.map(f =>
      s"""{"path":"${f.path}","bucket":${f.bucket},"rows":${f.rows},"checksum":${f.checksum}}""")
      .mkString("[", ",", "]")
    s"""{"id":$id,"uuid":"$uuid","rowCount":$rowCount,
       |"inputFingerprint":"$inputFingerprint",
       |"nBuckets":$nBuckets,
       |"files":$fileArr}""".stripMargin
  }

  /** S17 — MERGE-style idempotent upsert commit (the snapshot-table analog of
    * `INSERT … ON CONFLICT DO UPDATE`,
    * /root/reference/extract_stac_metadata.py:133-198): dedup the incoming
    * batch on its primary key, drop current-snapshot rows whose PK collides
    * (incoming wins — DO UPDATE), union, and commit as the next snapshot.
    *
    * O(batch), not O(table): data files are hash-bucketed by PK
    * (`pmod(hash(pk…), nBuckets)` → `__bucket=<b>` directories). A merge
    * rewrites ONLY the buckets the incoming batch touches; every other
    * file entry is carried into the new manifest verbatim (path + lineage),
    * exactly like Iceberg merge-on-read compaction carries untouched data
    * files. The reference's `ON CONFLICT` touches only conflicting rows;
    * at 100 TB a daily metadata upsert must not rewrite 100 TB.
    *
    * Idempotent: re-running the same merge converges to the same row set
    * (modulo snapshot id), and a crash before the pointer swap leaves the
    * previous snapshot intact. Concurrency-safe: the row set is computed
    * against a base snapshot and committed only if that base is still
    * current (checked under the commit lock); a lost race recomputes from
    * the winner's snapshot instead of silently dropping its upserts.
    *
    * `nBuckets` fixes the bucket layout at table creation; merging with a
    * different value triggers a one-time full re-bucketing rewrite.
    */
  def merge(spark: SparkSession, df: DataFrame, table: String,
            pkCols: Seq[String], inputFingerprint: String = "",
            nBuckets: Int = 32): Snapshot = {
    require(!df.columns.contains("__bucket"), "__bucket is a reserved column")
    val bucketOf = pmod(hash(pkCols.map(col): _*), lit(nBuckets))
    val incoming = df.dropDuplicates(pkCols).withColumn("__bucket", bucketOf)
      .localCheckpoint() // the batch is re-scanned per attempt; pin it
    val touched = incoming.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet // ≤ nBuckets values — driver-safe

    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      val baseId = currentSnapshotId(table)
      val (carried, toMerge): (Seq[FileEntry], DataFrame) = baseId match {
        case None => (Seq.empty, incoming)
        case Some(id) =>
          val base = readManifest(table, id)
          if (base.nBuckets == nBuckets) {
            val carry = base.files.filterNot(f => touched(f.bucket))
            val hot = base.files.filter(f => touched(f.bucket))
            val baseRows =
              if (hot.isEmpty) None
              else Some(spark.read.parquet(hot.map(_.path): _*).withColumn("__bucket", bucketOf))
            val merged = baseRows match {
              case Some(b) => b
                .join(incoming.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")
                .unionByName(incoming)
              case None => incoming
            }
            (carry, merged)
          } else if (base.files.isEmpty) {
            // zero-file base (a committed empty frame): nothing to carry
            (Seq.empty, incoming)
          } else {
            // bucket-layout change (or legacy unbucketed snapshot): full rewrite
            val all = spark.read.parquet(base.filePaths: _*).withColumn("__bucket", bucketOf)
              .join(incoming.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")
              .unionByName(incoming)
            (Seq.empty, all)
          }
      }
      // safe to stream from the current snapshot: data is written to a fresh
      // uuid dir, so the plan's input files are never overwritten mid-scan
      val (uuid, newEntries) = writeData(spark, toMerge, table)
      commitEntries(table, uuid, carried ++ newEntries, inputFingerprint,
        nBuckets, Some(baseId)) match {
        case Some(snap) => return snap
        case None => // base advanced under us: drop the orphan write, recompute
          deleteRecursively(Paths.get(table, "data", uuid))
      }
    }
    throw new IllegalStateException(s"merge on $table lost ${attempt} commit races")
  }

  /** Read the current snapshot's rows (only manifest-listed files — uncommitted
    * data dirs are invisible).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val id = currentSnapshotId(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    readAt(spark, table, id)
  }

  /** Time travel: read snapshot `id` as of its commit (Iceberg
    * `VERSION AS OF` analog). Any still-retained manifest id works — data
    * files are immutable and carried entries keep old snapshots readable
    * until [[expireSnapshots]] drops them.
    */
  def readAt(spark: SparkSession, table: String, id: Long): DataFrame = {
    val snap = readManifest(table, id)
    if (snap.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(snap.filePaths: _*)
  }

  /** Lineage verification: recompute the snapshot's content fingerprint from
    * its data files and compare against the manifest's per-file lineage.
    * Row hashes xor-combine associatively, so the check is independent of
    * how a re-read re-partitions the files: total rows must equal the
    * manifest rowCount and the global xor of row hashes must equal the xor
    * of the recorded per-file checksums. Detects any lost/duplicated/
    * altered row in a committed snapshot (bit-flip, truncated file, manual
    * tampering) without needing the original partitioning.
    */
  def verifyLineage(spark: SparkSession, table: String): Boolean = {
    val id = currentSnapshotId(table).getOrElse(return false)
    val snap = readManifest(table, id)
    if (snap.files.isEmpty) return snap.rowCount == 0
    val df = spark.read.parquet(snap.filePaths: _*)
    val row = df.agg(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(df.columns.map(col): _*)).as("x")).head()
    val expectedXor = snap.files.map(_.checksum).foldLeft(0L)(_ ^ _)
    // a committed empty DataFrame still writes a schema-only part file:
    // files non-empty, zero rows, and bit_xor over zero rows is NULL —
    // compare the xor only when rows exist
    if (row.getLong(0) == 0L) snap.rowCount == 0L
    else row.getLong(0) == snap.rowCount && row.getLong(1) == expectedXor
  }

  /** The reference's `--check` verification (J11, index_setsm.py:1179-1197):
    * read back the committed snapshot and anti-join both directions on the
    * record-id column; any diff ⇒ failure.
    */
  def check(spark: SparkSession, df: DataFrame, table: String, idCol: String): Long = {
    val back = read(spark, table).select(idCol)
    val fwd = df.select(idCol)
    fwd.join(back, Seq(idCol), "left_anti").count() +
      back.join(fwd, Seq(idCol), "left_anti").count()
  }

  /** Iceberg `expire_snapshots` analog: keep the newest `retain` snapshot
    * manifests, delete older manifests, then garbage-collect every data file
    * (and empty dir) no retained manifest references — including orphans
    * from crashed commits and lost merge races. Maintenance operation: must
    * not run concurrently with an in-flight writer (a fresh uuid dir whose
    * manifest is not yet written would look orphaned — the standard Iceberg
    * caveat). Returns (manifests deleted, data files deleted).
    */
  def expireSnapshots(table: String, retain: Int = 2): (Int, Int) = {
    require(retain >= 1, "must retain at least the current snapshot")
    val cur = currentSnapshotId(table).getOrElse(return (0, 0))
    val manifestRe = """snapshot-(\d+)\.json""".r
    val metaLs = Files.list(metaDir(table))
    val ids = try metaLs.iterator().asScala
      .flatMap(p => manifestRe.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .toSeq.sorted
      finally metaLs.close()
    val (expired, kept) = ids.partition(_ <= cur - retain)
    // canonicalize BOTH sides: manifest paths come from input_file_name()
    // (absolute, normalized) while the walk below is prefixed by however the
    // caller spelled `table` — a raw-string compare on a relative table path
    // would see every live file as unreferenced and GC the whole table
    def canon(p: Path): String = p.toAbsolutePath.normalize.toString
    val referenced: Set[String] =
      kept.flatMap(id => readManifest(table, id).filePaths)
        .map(f => canon(Paths.get(f))).toSet
    expired.foreach(id => Files.delete(metaDir(table).resolve(s"snapshot-$id.json")))
    // GC: delete unreferenced files under data/, then prune empty dirs
    val dataRoot = Paths.get(table, "data")
    var deleted = 0
    if (Files.isDirectory(dataRoot)) {
      // keep a referenced file's Hadoop .crc sidecar; _SUCCESS markers and
      // everything else unreferenced goes
      def keep(p: Path): Boolean = {
        val name = p.getFileName.toString
        referenced.contains(canon(p)) ||
          (name.startsWith(".") && name.endsWith(".crc") &&
            referenced.contains(canon(p.getParent.resolve(name.drop(1).dropRight(4)))))
      }
      val walk = Files.walk(dataRoot)
      try {
        walk.iterator().asScala.filter(Files.isRegularFile(_)).toSeq.foreach { p =>
          if (!keep(p)) { Files.delete(p); deleted += 1 }
        }
      } finally walk.close()
      pruneEmptyDirs(dataRoot)
    }
    (expired.size, deleted)
  }

  private def pruneEmptyDirs(root: Path): Unit = {
    val walk = Files.walk(root)
    val dirs = try walk.iterator().asScala.filter(Files.isDirectory(_)).toSeq
               finally walk.close()
    dirs.sortBy(-_.getNameCount).foreach { d =>
      if (d != root) {
        val ls = Files.list(d)
        val empty = try !ls.iterator().hasNext finally ls.close()
        if (empty) Files.delete(d)
      }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    }
  }
}

/** Multi-stage resumable pipeline over Icelite tables. */
class Pipeline(spark: SparkSession, root: String) {

  /** Run (or skip) a stage: if `table` already has a snapshot whose input
    * fingerprint matches, return its data without recomputation — the
    * kill-and-resume semantics of SURVEY.md §7.2 step 8.
    */
  def stage(name: String, inputFingerprint: String)(body: => DataFrame): DataFrame = {
    val table = s"$root/$name"
    Icelite.currentSnapshotId(table) match {
      case Some(id) if Icelite.readManifest(table, id).inputFingerprint == inputFingerprint =>
        Icelite.read(spark, table)
      case _ =>
        Icelite.commit(spark, body, table, inputFingerprint)
        Icelite.read(spark, table)
    }
  }
}
