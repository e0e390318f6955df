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
  *   data/<snapshotUuid>/part-*.parquet     -- immutable data files
  *   meta/snapshot-<id>.json                -- manifest: files, counts, lineage
  *   _CURRENT                               -- atomic pointer: current snapshot id
  * }}}
  *
  * Commit protocol: write data to a fresh uuid dir → write the manifest →
  * atomically rename `_CURRENT.tmp` over `_CURRENT`. Readers resolve
  * `_CURRENT` then read only files listed in the manifest, so a crashed
  * half-written commit is invisible (reference precedent: semaphore files
  * `.cogfin` in package_setsm.py:395-438 and the `--check` verification of
  * index_setsm.py:1179-1197).
  *
  * Resume: [[Pipeline.stage]] skips a stage whose table already has a
  * committed snapshot for the same input fingerprint — the Spark analog of
  * the reference's "expected outputs exist" incomplete-task skip
  * (package_setsm.py:160-174).
  */
object Icelite {

  case class Snapshot(id: Long, uuid: String, files: Seq[String], rowCount: Long,
                      inputFingerprint: String, partitions: Seq[PartitionLineage])
  case class PartitionLineage(partitionId: Int, rows: Long, checksum: Long)

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
    val files = """"files"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt).get
      .group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    val parts = """\{"pid":(\d+),"rows":(\d+),"checksum":(-?\d+)\}""".r
      .findAllMatchIn(txt)
      .map(m => PartitionLineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
      .toSeq
    Snapshot(field("id").toLong, field("uuid"), files, field("rowCount").toLong,
      field("inputFingerprint"), parts)
  }

  /** Commit a DataFrame as the table's next snapshot. Returns the snapshot.
    *
    * Per-partition lineage (row count + xor-of-hash checksum) is computed in
    * the same pass that writes the data (one extra narrow aggregation), so a
    * resumed run can verify partition equality without re-reading data.
    */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             inputFingerprint: String = ""): Snapshot = {
    val uuid = UUID.randomUUID().toString
    val dataDir = Paths.get(table, "data", uuid)
    Files.createDirectories(metaDir(table))

    df.write.mode("overwrite").parquet(dataDir.toString)

    // lineage from the files just written (stable regardless of write path)
    val written = spark.read.parquet(dataDir.toString)
    val lineage = written
      .withColumn("__pid", spark_partition_id())
      .withColumn("__h", xxhash64(written.columns.map(col): _*))
      .groupBy("__pid")
      .agg(count(lit(1)).as("rows"),
        // order-independent checksum; bit_xor never overflows (ANSI mode
        // is on by default in Spark 4 and sum(long) would throw)
        bit_xor(col("__h")).as("checksum"))
      .collect()
      .map(r => PartitionLineage(r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val rowCount = lineage.map(_.rows).sum

    val files = Files.list(dataDir).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted

    // Commit section: id allocation + manifest + pointer swap are serialized
    // by an OS file lock so two concurrent committers can neither compute
    // the same id nor drop each other's committed snapshot (on an object
    // store this whole section maps to a conditional PUT of the pointer).
    // The manifest is additionally written CREATE_NEW: ids never overwrite.
    val lockCh = FileChannel.open(Paths.get(table, "_LOCK"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      var id = currentSnapshotId(table).getOrElse(0L) + 1
      var written = false
      while (!written) {
        val manifest = manifestJson(id, uuid, rowCount, inputFingerprint, files, lineage)
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
      Snapshot(id, uuid, files, rowCount, inputFingerprint, lineage)
    } finally {
      lock.release(); lockCh.close()
    }
  }

  private def manifestJson(id: Long, uuid: String, rowCount: Long,
                           inputFingerprint: String, files: Seq[String],
                           lineage: Seq[PartitionLineage]): String = {
    val fileArr = files.map(f => s""""$f"""").mkString("[", ",", "]")
    val partArr = lineage.map(p =>
      s"""{"pid":${p.partitionId},"rows":${p.rows},"checksum":${p.checksum}}""")
      .mkString("[", ",", "]")
    s"""{"id":$id,"uuid":"$uuid","rowCount":$rowCount,
       |"inputFingerprint":"$inputFingerprint",
       |"files":$fileArr,
       |"partitions":$partArr}""".stripMargin
  }

  /** S17 — MERGE-style idempotent upsert commit (the snapshot-table analog of
    * `INSERT … ON CONFLICT DO UPDATE`,
    * /root/reference/extract_stac_metadata.py:133-198): dedup the incoming
    * batch on its primary key, drop current-snapshot rows whose PK collides
    * (incoming wins — DO UPDATE), union, and commit as the next snapshot.
    *
    * Idempotent: re-running the same merge converges to the same row set
    * (modulo snapshot id), and a crash before the pointer swap leaves the
    * previous snapshot intact (half-written data dirs are invisible to
    * readers — commit protocol above).
    *
    * Scale: one anti-join on the PK (both sides shuffle once on the key);
    * the base side at 100 TB would be partition-pruned by PK range in a real
    * object-store layout — here the semantics are what matters.
    */
  def merge(spark: SparkSession, df: DataFrame, table: String,
            pkCols: Seq[String], inputFingerprint: String = ""): Snapshot = {
    val incoming = df.dropDuplicates(pkCols)
    val merged = currentSnapshotId(table) match {
      case Some(_) =>
        read(spark, table)
          .join(incoming.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")
          .unionByName(incoming)
      case None => incoming
    }
    // safe to stream from the current snapshot: commit() writes to a fresh
    // uuid dir, so the plan's input files are never overwritten mid-scan
    commit(spark, merged, table, inputFingerprint)
  }

  /** Read the current snapshot's rows (only manifest-listed files — uncommitted
    * data dirs are invisible).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val id = currentSnapshotId(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val snap = readManifest(table, id)
    if (snap.files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(snap.files: _*)
  }

  /** Lineage verification: recompute the snapshot's content fingerprint from
    * its data files and compare against the manifest's per-partition lineage.
    * Row hashes xor-combine associatively, so the check is independent of
    * how a re-read re-partitions the files: total rows must equal the
    * manifest rowCount and the global xor of row hashes must equal the xor
    * of the recorded per-partition checksums. Detects any lost/duplicated/
    * altered row in a committed snapshot (bit-flip, truncated file, manual
    * tampering) without needing the original partitioning.
    */
  def verifyLineage(spark: SparkSession, table: String): Boolean = {
    val id = currentSnapshotId(table).getOrElse(return false)
    val snap = readManifest(table, id)
    if (snap.files.isEmpty) return snap.rowCount == 0
    val df = spark.read.parquet(snap.files: _*)
    val row = df.agg(
      count(lit(1)).as("n"),
      bit_xor(xxhash64(df.columns.map(col): _*)).as("x")).head()
    val expectedXor = snap.partitions.map(_.checksum).foldLeft(0L)(_ ^ _)
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
