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
  *   data/<snapshotUuid>/part-*.parquet                 -- unsliced data files
  *   data/<snapshotUuid>/__slice=<mod>_<res>/part-*.parquet -- PK-hash slices
  *   meta/snapshot-<id>.json                            -- manifest: file entries
  *   _CURRENT                                           -- atomic pointer
  * }}}
  *
  * Commit protocol: write data to a fresh uuid dir → write the manifest →
  * atomically rename `_CURRENT.tmp` over `_CURRENT`. Readers resolve
  * `_CURRENT` then read only files listed in the manifest, so a crashed
  * half-written commit is invisible (reference precedent: semaphore files
  * `.cogfin` in package_setsm.py:395-438 and the `--check` verification of
  * index_setsm.py:1179-1197).
  *
  * Data files are SELF-DESCRIBING HASH SLICES: a file tagged (mod, res)
  * holds only rows whose PK hash h satisfies `pmod(h, mod) == res`
  * (mod = 0 marks an unsliced file from a full-overwrite [[commit]]). The
  * slice tag is a claim over hash space, not a partition: claims may
  * overlap and need not cover — correctness rests on (a) every row in a
  * file satisfies its file's claim (maintained by construction) and (b) a
  * [[merge]] rewrites EVERY file whose claim intersects the batch's hashes,
  * so a PK collision can never hide in a carried file. Slices let both
  * merge IO *and file size* stay O(batch): a merge rewrites only
  * intersecting files and writes its output at a modulus chosen so no file
  * exceeds `maxRowsPerFile` — at 100 TB a daily metadata upsert rewrites a
  * few bounded files, never a 3 TB bucket (the round-3 layout's one file
  * per fixed bucket grew without bound).
  *
  * Lineage is PER DATA FILE (rows + xor-of-hash checksum — the Iceberg
  * manifest-entry analog; a Spark partition id is ephemeral, the written
  * file IS the durable partition). File-level lineage is what lets
  * [[merge]] carry untouched files into the next snapshot verbatim with
  * their lineage intact.
  *
  * Resume: [[Pipeline.stage]] skips a stage whose table already has a
  * committed snapshot for the same input fingerprint — the Spark analog of
  * the reference's "expected outputs exist" incomplete-task skip
  * (package_setsm.py:160-174).
  */
object Icelite {

  /** Default size bound for one data file, in rows (the lineage unit; byte
    * size tracks rows for a fixed schema). */
  val DefaultMaxRowsPerFile: Long = 4000000L

  /** Zone-map width caps: stats cover the first MaxStatsCols eligible
    * (numeric/string) top-level columns, string bounds truncated to
    * StatsTruncateLen chars — manifests must stay O(files), not O(data). */
  val MaxStatsCols = 16
  val StatsTruncateLen = 24

  /** One immutable data file and its hash-slice claim: holds only rows with
    * `pmod(hash(pk…), mod) == res`; mod = 0 ⇒ unsliced (full-overwrite
    * commit, no claim). Lineage = row count + order-independent
    * xor-of-row-hash checksum.
    *
    * `stats` are per-column zone maps (min, max) — the Iceberg
    * `lower_bounds`/`upper_bounds` manifest-entry analog — for the first
    * [[MaxStatsCols]] numeric/string top-level columns; [[readWhere]] prunes
    * files whose range is disjoint from a predicate BEFORE the scan, so a
    * time- or id-ranged query over a 100 TB table opens only the files that
    * can match. String bounds are truncated to [[StatsTruncateLen]] chars
    * (lower bound: plain prefix; upper bound: prefix with the last kept char
    * incremented — a valid upper bound, exactly Iceberg's truncate(16)
    * transform) so a manifest never carries page-sized values. Absent stats
    * (older manifests, dropped bounds) simply mean "never pruned".
    */
  case class FileEntry(path: String, mod: Int, res: Int, rows: Long, checksum: Long,
                       stats: Map[String, (String, String)] = Map.empty)

  /** One manifest-list entry: a content-addressed segment file holding a
    * bucket's [[FileEntry]] list, plus the LIST-LEVEL pruning metadata — its
    * row sum and per-column zone maps aggregated over its entries (a column
    * is bounded only when EVERY entry bounds it; aggregation order follows
    * the schema type, numeric for numeric columns, UTF-8 for strings — the
    * same orders the prune-time compare uses). `rows = -1` marks a legacy
    * plain-name ref (pre-stats manifest): no list-level pruning, full read.
    */
  case class SegmentRef(name: String, rows: Long,
                        stats: Map[String, (String, String)] = Map.empty)

  /** `bucketSpec` records the PK columns (comma-joined, order-sensitive) the
    * slice hashes were computed from; a merge with a different PK spec must
    * not trust the slice claims (it takes the full-rewrite path). */
  case class Snapshot(id: Long, uuid: String, files: Seq[FileEntry], rowCount: Long,
                      inputFingerprint: String, nBuckets: Int, bucketSpec: String,
                      schemaJson: String = "") {
    def filePaths: Seq[String] = files.map(_.path)
  }

  /** Typed empty frame from the manifest's persisted schema — a zero-file
    * snapshot (committed empty DataFrame) must still read back with its
    * columns, or every downstream `.select`/`.filter` breaks only on the
    * empty case. Falls back to a schemaless empty frame for pre-schema
    * manifests. */
  private def emptyTyped(spark: SparkSession, snap: Snapshot): DataFrame =
    if (snap.schemaJson.isEmpty) spark.emptyDataFrame
    else emptyTypedJson(spark, snap.schemaJson)

  /** Column reference by EXACT name: `col("a.b")` parses the dot as nested
    * field access and fails on a legal flat column named `a.b`; backtick
    * quoting (with doubled backticks) resolves the literal name. Every place
    * Icelite turns a user schema's column NAMES back into Columns goes
    * through this. */
  private def qcol(name: String): org.apache.spark.sql.Column =
    col("`" + name.replace("`", "``") + "`")

  private def metaDir(table: String): Path = Paths.get(table, "meta")
  private def currentPtr(table: String): Path = Paths.get(table, "_CURRENT")

  /** Critical-section guard shared by the commit path and [[expireSnapshots]]:
    * a per-table JVM monitor (java.nio file locks are per-process — two
    * threads of one JVM would throw OverlappingFileLockException) wrapping an
    * OS file lock (cross-process). On an object store this maps to the
    * conditional-PUT the pointer swap already models. */
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withTableLock[T](table: String)(body: => T): T = {
    val key = Paths.get(table).toAbsolutePath.normalize.toString
    val monitor = tableLocks.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      val lockCh = FileChannel.open(Paths.get(table, "_LOCK"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = lockCh.lock()
        try body finally lock.release()
      } finally lockCh.close()
    }
  }

  /** Free a localCheckpoint's blocks after the merge commits or throws —
    * repeated merges in a long-running job (e.g. a streaming foreachBatch
    * upsert loop) would otherwise accumulate blocks for the session's life. */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    graft.Session.freeLocalCheckpoint(df)

  def currentSnapshotId(table: String): Option[Long] = {
    val p = currentPtr(table)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Read a snapshot manifest (JSON is hand-rolled: no JSON lib needed for
    * this fixed shape). Accepts the current slice format and the round-3
    * bucket format (`"bucket":b` ⇒ slice (nBuckets, b); -1 ⇒ unsliced).
    * Anything older that yields rows without file entries is a corrupt or
    * unsupported manifest and FAILS LOUDLY — proceeding would read the
    * table as empty, a merge would drop every existing row, and GC would
    * delete live data.
    */
  // stats KEYS AND VALUES are base64 in the current `stats64` form (the
  // alphabet has no '"' '{' '}'), so the entry and inner-pair regexes stay
  // exact on arbitrary column names and data values; the earlier `stats`
  // form (raw keys, b64 values) still parses for manifests written before
  // the key encoding
  private val statPair = """"([^"]*)":\["([A-Za-z0-9+/=]*)","([A-Za-z0-9+/=]*)"\]""".r
  private def parseStats(s: String, keyB64: Boolean): Map[String, (String, String)] =
    if (s == null || s.isEmpty) Map.empty
    else statPair.findAllMatchIn(s)
      .map(m => (if (keyB64) b64dec(m.group(1)) else m.group(1))
        -> (b64dec(m.group(2)), b64dec(m.group(3)))).toMap

  private def parseEntries(txt: String, nBuckets: Int): Seq[FileEntry] = {
    val sliceFiles = """\{"path":"([^"]*)","mod":(\d+),"res":(\d+),"rows":(\d+),"checksum":(-?\d+)(?:,"stats(64)?":\{([^}]*)\})?\}""".r
      .findAllMatchIn(txt)
      .map(m => FileEntry(m.group(1), m.group(2).toInt, m.group(3).toInt,
        m.group(4).toLong, m.group(5).toLong,
        parseStats(m.group(7), m.group(6) != null)))
      .toSeq
    if (sliceFiles.nonEmpty) sliceFiles
    else """\{"path":"([^"]*)","bucket":(-?\d+),"rows":(\d+),"checksum":(-?\d+)\}""".r
      .findAllMatchIn(txt)
      .map { m =>
        val b = m.group(2).toInt
        if (b >= 0) FileEntry(m.group(1), nBuckets, b, m.group(3).toLong, m.group(4).toLong)
        else FileEntry(m.group(1), 0, 0, m.group(3).toLong, m.group(4).toLong)
      }.toSeq
  }

  private def manifestField(txt: String, k: String): String = {
    val m = (s""""$k"\\s*:\\s*("([^"]*)"|[0-9-]+)""").r.findFirstMatchIn(txt)
      .getOrElse(throw new IllegalStateException(s"manifest missing $k"))
    Option(m.group(2)).getOrElse(m.group(1))
  }
  private def manifestOpt(txt: String, k: String, default: String): String =
    (s""""$k"\\s*:\\s*("([^"]*)"|[0-9-]+)""").r.findFirstMatchIn(txt)
      .map(m => Option(m.group(2)).getOrElse(m.group(1))).getOrElse(default)

  def readManifest(table: String, id: Long): Snapshot = {
    val txt = Files.readString(metaDir(table).resolve(s"snapshot-$id.json"))
    def field(k: String): String = manifestField(txt, k)
    def opt(k: String, default: String): String = manifestOpt(txt, k, default)
    val nBuckets = opt("nBuckets", "0").toInt
    // segmented manifest (the Iceberg manifest-list analog): file entries
    // live in content-addressed segment files referenced by name; a round-4
    // inline manifest (entries embedded) still parses
    val refs = segmentRefs(txt)
    val files =
      if (refs.nonEmpty)
        refs.flatMap(seg => parseEntries(
          Files.readString(metaDir(table).resolve(seg.name)), nBuckets))
      else parseEntries(txt, nBuckets)
    val rowCount = field("rowCount").toLong
    // cross-check the commit-time invariant rowCount == Σ entry rows: a
    // truncated segment (or an unparseable legacy manifest) yields a
    // partial-but-nonempty entry list that files.isEmpty alone would miss —
    // proceeding would silently drop a bucket's rows and let GC delete its
    // live files
    if (rowCount != files.map(_.rows).sum)
      throw new IllegalStateException(
        s"manifest snapshot-$id.json of $table claims $rowCount rows but its " +
          s"parseable file entries sum to ${files.map(_.rows).sum} " +
          s"(${files.size} entries) — unsupported/corrupt manifest or segment; " +
          "refusing to read a partial table")
    val schemaJson = opt("schemaJson", "") match {
      case "" => ""
      case b64 => b64dec(b64)
    }
    Snapshot(field("id").toLong, field("uuid"), files, rowCount,
      field("inputFingerprint"), nBuckets, opt("bucketSpec", ""), schemaJson)
  }

  /** The segment refs a manifest's raw JSON references (shared by the read
    * path, list-level pruning, and segment GC — a divergence here would GC
    * live metadata). Current form: objects with name + rows + aggregated
    * stats; a pre-stats manifest's plain name array parses as refs with
    * `rows = -1` (no list-level pruning, full read). The inner regexes stay
    * exact because segment names and b64 stats carry no `]` or `}`. */
  private def segmentRefs(manifestTxt: String): Seq[SegmentRef] = {
    // the segments array is the manifest's LAST field (manifestJson) — match
    // greedily to the closing `]}`: the object form's stats64 pairs contain
    // `]` characters, so a first-`]` match would truncate the array
    val inner = """"segments"\s*:\s*\[([\s\S]*)\]\s*\}\s*$""".r.findFirstMatchIn(manifestTxt)
      .map(_.group(1)).getOrElse(return Seq.empty)
    val objRe = """\{"name":"([^"]+)","rows":(\d+)(?:,"stats64":\{([^}]*)\})?\}""".r
    val objs = objRe.findAllMatchIn(inner)
      .map(m => SegmentRef(m.group(1), m.group(2).toLong,
        parseStats(m.group(3), keyB64 = true))).toSeq
    if (objs.nonEmpty) objs
    else """"([^"]+)"""".r.findAllMatchIn(inner)
      .map(m => SegmentRef(m.group(1), -1L)).toSeq
  }

  /** Per-file lineage of freshly written parquet under `dataDir`: one scan,
    * grouped by physical file. `dataCols` is the logical schema (the
    * `__slice` partition directory column is layout, not data).
    */
  private def fileLineage(spark: SparkSession, dataDir: Path,
                          dataCols: Seq[String]): Seq[FileEntry] = {
    val written = spark.read.parquet(dataDir.toString)
    val sliceRe = """__slice=(\d+)_(\d+)""".r
    // zone maps ride the same single pass as the checksum (min/max are
    // map-side-combinable — the stats cost nothing beyond the scan the
    // lineage already pays)
    val statCols = statsEligible(written.schema)
    val statAggs = statCols.flatMap { case (c, kind) =>
      // Float columns collect their bounds THROUGH double: the stored string
      // is then the shortest repr of the exact binary value, so the
      // BigDecimal compare in [[pruneFiles]] is order-isomorphic with the
      // scan filter's float→double upcast. Storing the float's own shortest
      // repr would let a double query bound land in the sub-ulp gap between
      // the repr and the exact value and prune a file the filter keeps.
      val base = if (kind == StatFloat) qcol(c).cast("double") else qcol(c)
      Seq(min(base).cast("string").as(s"__mn_$c"),
          max(base).cast("string").as(s"__mx_$c"))
    }
    written
      .withColumn("__file", input_file_name())
      // order-independent checksum; bit_xor never overflows (ANSI mode is on
      // by default in Spark 4 and sum(long) would throw)
      .groupBy("__file")
      .agg(count(lit(1)).as("rows"),
        (bit_xor(xxhash64(dataCols.map(qcol): _*)).as("checksum") +: statAggs): _*)
      .collect()
      .map { r =>
        val path = new java.net.URI(r.getString(0)).getPath
        val (mod, res) = sliceRe.findFirstMatchIn(path)
          .map(m => (m.group(1).toInt, m.group(2).toInt)).getOrElse((0, 0))
        val stats = statCols.zipWithIndex.flatMap { case ((c, kind), i) =>
          val (mn, mx) = (r.getString(3 + 2 * i), r.getString(3 + 2 * i + 1))
          if (mn == null || mx == null) None // all-null column: no bounds
          // truncation is a STRING-ordering transform — numeric string forms
          // are kept whole (a truncated "1.23E15" would corrupt the numeric
          // compare at prune time; numeric casts are bounded-length anyway)
          else if (kind == StatString) truncateBounds(mn, mx).map(c -> _)
          else Some(c -> (mn, mx))
        }.toMap
        FileEntry(path, mod, res, r.getLong(1), r.getLong(2), stats)
      }.toSeq.sortBy(_.path)
  }

  private val StatString = 0
  private val StatNumeric = 1
  private val StatFloat = 2 // single-precision: bounds collected via double

  /** Top-level columns eligible for zone maps: numeric or string, first
    * [[MaxStatsCols]] in schema order. (Timestamps/dates are excluded: their
    * string casts aren't order-faithful across precisions — callers range on
    * epoch columns, which are numeric.) */
  private def statsEligible(
      schema: org.apache.spark.sql.types.StructType): Seq[(String, Int)] = {
    import org.apache.spark.sql.types._
    schema.fields.iterator
      .filter(f => f.name != "__slice")
      .collect {
        case f if f.dataType == StringType => (f.name, StatString)
        case f if f.dataType == FloatType => (f.name, StatFloat)
        case f if f.dataType.isInstanceOf[NumericType] => (f.name, StatNumeric)
      }
      .take(MaxStatsCols).toSeq
  }

  /** Iceberg truncate-transform bounds: values longer than
    * [[StatsTruncateLen]] become (prefix(min), prefix(max) with its last CODE
    * POINT incremented). All transforms stay in code-point space — a
    * UTF-16-unit truncation could split a surrogate pair and an incremented
    * unit could be a lone surrogate, which `getBytes("UTF-8")` mangles to
    * `?` on the manifest round-trip, silently shrinking the stored upper
    * bound below real file values (unsound pruning). Cutting at a pair
    * boundary and skipping the surrogate gap keeps the bound a valid string
    * that is strictly greater in code-point (= UTF-8-byte = Spark UTF8String)
    * order. Returns None when no valid upper bound exists (every kept code
    * point is already U+10FFFF) — no stats beats wrong stats. */
  private[graft] def truncateBounds(mn: String, mx: String): Option[(String, String)] = {
    // longest prefix of ≤ StatsTruncateLen UTF-16 units ending on a code
    // point boundary (a prefix is ≤ the original in byte order, so cutting
    // the LOWER bound is always sound)
    def cut(s: String): String =
      if (s.length <= StatsTruncateLen) s
      else s.substring(0,
        if (Character.isHighSurrogate(s.charAt(StatsTruncateLen - 1))) StatsTruncateLen - 1
        else StatsTruncateLen)
    val lo = cut(mn)
    if (mx.length <= StatsTruncateLen) Some((lo, mx))
    else {
      // drop trailing U+10FFFF code points (nothing above them), then bump
      // the last remaining code point past the surrogate gap if needed
      var p = cut(mx)
      while (p.nonEmpty && p.codePointBefore(p.length) >= Character.MAX_CODE_POINT)
        p = p.substring(0, p.length - Character.charCount(p.codePointBefore(p.length)))
      if (p.isEmpty) None
      else {
        val cp = p.codePointBefore(p.length)
        val bumped = if (cp + 1 >= Character.MIN_SURROGATE && cp + 1 <= Character.MAX_SURROGATE)
          Character.MAX_SURROGATE + 1 else cp + 1
        Some((lo, p.substring(0, p.length - Character.charCount(cp))
          + new String(Character.toChars(bumped))))
      }
    }
  }

  private def inflightMarker(table: String, uuid: String): Path =
    Paths.get(table, "_inflight", uuid)

  /** Write `df` into a fresh uuid data dir (slice-partitioned when the
    * `__slice` column is present) and return its per-file lineage entries.
    * An `_inflight/<uuid>` marker brackets the write so [[expireSnapshots]]
    * never GCs a live writer's files no matter how long the Spark job runs
    * (the orphan grace window alone cannot protect a write slower than the
    * grace); the caller clears the marker after commit or abort, and a
    * crashed writer's marker ages out under the inflight TTL.
    */
  private def writeData(spark: SparkSession, df: DataFrame, table: String,
                        uuid: String = UUID.randomUUID().toString): (String, Seq[FileEntry], String) = {
    val marker = inflightMarker(table, uuid)
    Files.createDirectories(marker.getParent)
    Files.writeString(marker, "")
    val dataDir = Paths.get(table, "data", uuid)
    val sliced = df.columns.contains("__slice")
    if (sliced)
      // co-locate each slice into one task before the partitioned write:
      // without it every task writes a file per slice value it holds
      // (#tasks × #slices files per merge — file-count rot at scale);
      // with it a slice is one file
      df.repartition(col("__slice"))
        .write.mode("overwrite").partitionBy("__slice").parquet(dataDir.toString)
    else
      df.write.mode("overwrite").parquet(dataDir.toString)
    val dataCols = df.columns.filterNot(_ == "__slice").toSeq
    val ls = Files.list(dataDir)
    val hasData = try ls.iterator().asScala.exists(p =>
      p.toString.endsWith(".parquet") || Files.isDirectory(p)) finally ls.close()
    val entries =
      if (hasData) fileLineage(spark, dataDir, dataCols)
      else Seq.empty // empty write: only _SUCCESS
    val schemaJson = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(_.name == "__slice")).json
    (uuid, entries, schemaJson)
  }

  /** The commit section: id allocation + manifest + pointer swap, serialized
    * by [[withTableLock]] so two concurrent committers can neither compute
    * the same id nor drop each other's committed snapshot.
    * `expectedBase`: when Some(base), commit only if the current snapshot id
    * still equals `base` (optimistic concurrency for [[merge]]) — returns
    * None on a lost race so the caller can recompute from the new base.
    * Manifests are written CREATE_NEW: ids never overwrite.
    */
  private def commitEntries(table: String, uuid: String, entries: Seq[FileEntry],
                            inputFingerprint: String, nBuckets: Int, bucketSpec: String,
                            schemaJson: String,
                            expectedBase: Option[Option[Long]]): Option[Snapshot] = {
    Files.createDirectories(metaDir(table))
    val rowCount = entries.map(_.rows).sum
    withTableLock(table) {
      val cur = currentSnapshotId(table)
      expectedBase match {
        case Some(base) if base != cur => return None // lost the race
        case _ =>
      }
      val segments = writeSegments(table, entries, nBuckets, schemaJson)
      var id = cur.getOrElse(0L) + 1
      var written = false
      while (!written) {
        val manifest = manifestJson(id, uuid, rowCount, inputFingerprint, nBuckets,
          bucketSpec, schemaJson, segments)
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
      Files.deleteIfExists(inflightMarker(table, uuid)) // write is now durable
      Some(Snapshot(id, uuid, entries, rowCount, inputFingerprint, nBuckets, bucketSpec,
        schemaJson))
    }
  }

  /** Commit a DataFrame as the table's next snapshot (full overwrite of the
    * logical content; previous snapshots stay readable via their manifests).
    */
  def commit(spark: SparkSession, df: DataFrame, table: String,
             inputFingerprint: String = ""): Snapshot = {
    val (uuid, entries, schemaJson) = writeData(spark, df, table)
    commitEntries(table, uuid, entries, inputFingerprint, 0, "", schemaJson, None).get
  }

  private def b64enc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64dec(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  // keys are b64 like the values: a column named with JSON structural
  // chars must not corrupt the hand-rolled grammar (sorted by RAW name so
  // the serialized body — and a segment's content-address — is deterministic)
  private def stats64Json(stats: Map[String, (String, String)]): String =
    if (stats.isEmpty) ""
    else stats.toSeq.sortBy(_._1)
      .map { case (c, (lo, hi)) => s""""${b64enc(c)}":["${b64enc(lo)}","${b64enc(hi)}"]""" }
      .mkString(""","stats64":{""", ",", "}")

  private def entryJson(f: FileEntry): String =
    s"""{"path":"${f.path}","mod":${f.mod},"res":${f.res},"rows":${f.rows},"checksum":${f.checksum}${stats64Json(f.stats)}}"""

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => "%02x".format(b)).mkString

  /** Write (or reuse) the CONTENT-ADDRESSED manifest segments for `entries`,
    * one per base bucket, returning their file names. This is the Iceberg
    * manifest-list analog that keeps commit METADATA O(changed buckets): a
    * merge touching two slices reproduces identical segment bodies for every
    * untouched bucket, which hash to the already-existing segment files —
    * zero writes — while an inline file list would rewrite O(table-files)
    * JSON on every commit (hundreds of MB at the ~10^6-file design point).
    * Must run under the table lock: segment GC in [[expireSnapshots]] keeps
    * only segments referenced by retained manifests, and an unlocked fresh
    * segment (manifest not yet written) would look unreferenced.
    */
  private def writeSegments(table: String, entries: Seq[FileEntry],
                            nBuckets: Int, schemaJson: String): Seq[SegmentRef] = {
    val base = math.max(1, nBuckets)
    val numericCols = numericColsOf(schemaJson)
    val eligibleCols = eligibleColsOf(schemaJson)
    // Sliced (hash-claim) entries segment BY BASE BUCKET: the grouping is
    // stable across merges, so untouched buckets content-address to the same
    // segment file (commit metadata O(changed buckets)). Their aggregated
    // zone maps rarely prune (hash is uniform over the PK), which is fine —
    // reuse is their job. UNSLICED entries (a clustered full-overwrite
    // commit: the ANN index, a time-ordered event log) segment into ~√n
    // path-sorted chunks instead of one flat list: path order follows the
    // writer's partition order, so each chunk's aggregated bounds are tight
    // and [[planScan]] prunes whole chunks at the list level — a balanced
    // O(√n)-refs-per-manifest, O(√n)-entries-per-segment hierarchy at any n.
    val (sliced, unsliced) = entries.partition(_.mod > 0)
    val slicedGroups = sliced.groupBy(_.res % base).toSeq.sortBy(_._1).map(_._2)
    val unslicedGroups = {
      val sorted = unsliced.sortBy(_.path)
      if (sorted.isEmpty) Seq.empty
      else {
        val chunk = math.max(1,
          math.ceil(sorted.size / math.ceil(math.sqrt(sorted.size.toDouble))).toInt)
        sorted.grouped(chunk).toSeq
      }
    }
    (slicedGroups ++ unslicedGroups)
      .map { fs =>
        val sorted = fs.sortBy(_.path)
        val body = sorted.map(entryJson).mkString("[", ",\n", "]")
        // full 128-bit content hash: this name IS the identity reuse trusts
        // blindly (Files.exists ⇒ skip write), and a collision would commit
        // a manifest pointing at another bucket-state's entries — don't thin
        // the birthday margin to 64 bits to save 16 filename chars
        val name = s"segment-${md5hex(body)}.json"
        val p = metaDir(table).resolve(name)
        if (!Files.exists(p)) {
          try Files.writeString(p, body, StandardOpenOption.CREATE_NEW)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
        }
        SegmentRef(name, sorted.map(_.rows).sum,
          aggBounds(sorted, numericCols, eligibleCols))
      }
  }

  /** Columns whose stored bounds order NUMERICALLY (from the persisted
    * schema); everything else orders as UTF-8 strings. The aggregation order
    * must match the order [[pruneFiles]]-style compares use at read time, or
    * a list-level bound could be tighter than its segment's values. */
  private def numericColsOf(schemaJson: String): Set[String] =
    if (schemaJson.isEmpty) Set.empty
    else try {
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
        }.toSet
    } catch { case scala.util.control.NonFatal(_) => Set.empty }

  /** Columns stats-eligible under the persisted schema (same type rules as
    * [[statsEligible]]: string or numeric). An empty/unparseable schema
    * yields the empty set — no list-level stats, never unsound pruning. */
  private def eligibleColsOf(schemaJson: String): Set[String] =
    if (schemaJson.isEmpty) Set.empty
    else try {
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fields.collect {
          case f if f.dataType == org.apache.spark.sql.types.StringType ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
        }.toSet
    } catch { case scala.util.control.NonFatal(_) => Set.empty }

  /** Per-column zone map over a segment's entries: a column is bounded only
    * when every entry bounds it (one stat-less file makes the segment's
    * content unknowable for that column — absent stats = never pruned, same
    * contract as the file level). Numeric columns aggregate by numeric value
    * but keep the ORIGINAL bound strings (re-rendering could round);
    * unparseable numeric bounds (NaN/Infinity) drop the column.
    *
    * Only columns stats-eligible under the CURRENT schema aggregate
    * (`eligibleCols`): merge-kept entries can carry stats for a column that
    * was since dropped or re-typed, and aggregating such a column as UTF-8
    * while a reader compares its bounds numerically could unsoundly prune a
    * segment (silent row loss). Absent list-level stats are always safe. */
  private def aggBounds(fs: Seq[FileEntry], numericCols: Set[String],
                        eligibleCols: Set[String]): Map[String, (String, String)] = {
    if (fs.isEmpty) return Map.empty
    val cols = fs.map(_.stats.keySet).reduce(_ intersect _)
      .intersect(eligibleCols)
    cols.iterator.flatMap { c =>
      val bs = fs.map(_.stats(c))
      if (numericCols(c))
        try Some(c -> (bs.minBy(b => BigDecimal(b._1))._1,
                       bs.maxBy(b => BigDecimal(b._2))._2))
        catch { case _: NumberFormatException => None }
      else Some(c -> (bs.map(_._1).reduce((a, b) => if (utf8Lt(a, b)) a else b),
                      bs.map(_._2).reduce((a, b) => if (utf8Lt(a, b)) b else a)))
    }.toMap
  }

  private def manifestJson(id: Long, uuid: String, rowCount: Long,
                           inputFingerprint: String, nBuckets: Int, bucketSpec: String,
                           schemaJson: String, segments: Seq[SegmentRef]): String = {
    val segJson = segments
      .map(s => s"""{"name":"${s.name}","rows":${s.rows}${stats64Json(s.stats)}}""")
      .mkString("[", ",", "]")
    s"""{"id":$id,"uuid":"$uuid","rowCount":$rowCount,
       |"inputFingerprint":"$inputFingerprint",
       |"nBuckets":$nBuckets,
       |"bucketSpec":"$bucketSpec",
       |"schemaJson":"${b64enc(schemaJson)}",
       |"segments":$segJson}""".stripMargin
  }

  /** Smallest `base · 2^d` with `est / it ≤ maxRows` — the modulus for a
    * rewrite of ~`est` rows spread UNIFORMLY over hash space. */
  private def uniformModulus(base: Int, est: Long, maxRows: Long): Int = {
    var m = math.max(1, base)
    while (est / m > maxRows) m *= 2
    m
  }

  /** Smallest `baseMod · 2^j` at which a file of `rows` rows CONCENTRATED in
    * one baseMod-residue splits below `maxRows` per output file (each
    * doubling of the modulus halves the file's rows). */
  private def concentratedModulus(baseMod: Int, rows: Long, maxRows: Long): Int = {
    var m = math.max(1, baseMod)
    var perFile = rows
    while (perFile > maxRows) { m *= 2; perFile = (perFile + 1) / 2 }
    m
  }

  /** The file indices of `files` whose hash-slice claim intersects the
    * incoming batch (plus every unsliced file — no claim to prune on).
    * One distributed aggregation: the batch's distinct (mod, res) residues
    * per distinct modulus, equi-joined against the (small) file-entry list —
    * the collected result is ≤ #files rows, never #batch rows.
    */
  private def touchedFiles(spark: SparkSession, incoming: DataFrame,
                           files: Seq[FileEntry]): Set[Int] = {
    val mods = files.map(_.mod).filter(_ > 0).distinct
    val unsliced = files.zipWithIndex.collect { case (f, i) if f.mod == 0 => i }.toSet
    if (mods.isEmpty) return unsliced
    import spark.implicits._
    val pairs = incoming.select(explode(array(mods.map(m =>
        struct(lit(m).as("m"), pmod(col("__h"), lit(m)).as("r"))): _*)).as("p"))
      .select(col("p.m").as("m"), col("p.r").as("r")).distinct()
    val fileDf = files.zipWithIndex
      .collect { case (f, i) if f.mod > 0 => (f.mod, f.res, i) }
      .toDF("m", "r", "idx")
    val hit = pairs.join(fileDf, Seq("m", "r")).select("idx")
      .collect().map(_.getInt(0)).toSet
    unsliced ++ hit
  }

  /** S17 — MERGE-style idempotent upsert commit (the snapshot-table analog of
    * `INSERT … ON CONFLICT DO UPDATE`,
    * /root/reference/extract_stac_metadata.py:133-198): dedup the incoming
    * batch on its primary key, drop current-snapshot rows whose PK collides
    * (incoming wins — DO UPDATE), union, and commit as the next snapshot.
    *
    * O(batch) in BOTH IO and file size: data files carry hash-slice claims
    * (see object scaladoc), so the merge reads and rewrites ONLY the files
    * whose claim intersects the batch's PK hashes; every other file entry is
    * carried into the new manifest verbatim (path + lineage), exactly like
    * Iceberg carries untouched data files. The rewrite is written at a
    * modulus `nBuckets · 2^d` sized so no output file exceeds
    * `maxRowsPerFile` — slices refine as the table grows instead of fattening
    * a fixed bucket (the reference's `ON CONFLICT` touches only conflicting
    * rows; at 100 TB a daily metadata upsert must not rewrite 100 TB, nor
    * leave 3 TB files behind).
    *
    * Idempotent: re-running the same merge converges to the same row set
    * (modulo snapshot id), and a crash before the pointer swap leaves the
    * previous snapshot intact. Concurrency-safe: the row set is computed
    * against a base snapshot and committed only if that base is still
    * current (checked under the table lock); a lost race recomputes from
    * the winner's snapshot instead of silently dropping its upserts.
    *
    * The slice hash is over `pkCols` in order; the spec is persisted in the
    * manifest and checked — merging with different PK columns (or a
    * different `nBuckets` base, or onto an unsliced [[commit]] snapshot)
    * takes a one-time full re-slicing rewrite rather than trusting claims
    * computed under a different key.
    */
  def merge(spark: SparkSession, df: DataFrame, table: String,
            pkCols: Seq[String], inputFingerprint: String = "",
            nBuckets: Int = 32, maxRowsPerFile: Long = DefaultMaxRowsPerFile): Snapshot = {
    require(!df.columns.contains("__slice") && !df.columns.contains("__h"),
      "__slice and __h are reserved columns")
    val spec = pkCols.mkString(",")
    val hcol = pmod(hash(pkCols.map(qcol): _*), lit(Int.MaxValue))
    // the batch is re-scanned per attempt (and per touched-slice probe); pin it
    val incoming = df.dropDuplicates(pkCols).withColumn("__h", hcol).localCheckpoint()
    try {
      val nIncoming = incoming.count()
      var attempt = 0
      while (attempt < 8) {
        attempt += 1
        val baseId = currentSnapshotId(table)
        val attemptUuid = UUID.randomUUID().toString
        try {
        val (carried, toMerge, estRows, atLeastMod): (Seq[FileEntry], DataFrame, Long, Int) =
          baseId match {
            case None => (Seq.empty, incoming, nIncoming, 1)
            case Some(id) =>
              val base = readManifest(table, id)
              if (base.files.isEmpty) {
                // zero-file base (a committed empty frame): nothing to carry
                (Seq.empty, incoming, nIncoming, 1)
              } else if (base.bucketSpec == spec && base.nBuckets == nBuckets) {
                // slice-granular path: rewrite only claim-intersecting files
                val touched = touchedFiles(spark, incoming, base.files)
                val (hotIdx, carryIdx) = base.files.indices.partition(touched)
                val hot = hotIdx.map(base.files)
                val carry = carryIdx.map(base.files)
                val merged =
                  if (hot.isEmpty) incoming
                  else spark.read.parquet(hot.map(_.path): _*)
                    .join(incoming.select(pkCols.map(qcol): _*).distinct(), pkCols, "left_anti")
                    .withColumn("__h", hcol)
                    .unionByName(incoming)
                // a hot slice's surviving rows stay concentrated in its
                // claim region (m/f.mod residues of the output modulus), so
                // the output must be at least each hot file's concentrated
                // split point — the uniform estimate alone would leave a
                // fat slice's rows in one oversized output file
                val hotFloor = (1 +: hot.map(f =>
                  concentratedModulus(f.mod, f.rows, maxRowsPerFile))).max
                (carry, merged, hot.map(_.rows).sum + nIncoming, hotFloor)
              } else {
                // PK-spec / bucket-base change, or unsliced commit() snapshot:
                // claims computed under a different key are untrustworthy —
                // full re-slicing rewrite
                val all = spark.read.parquet(base.filePaths: _*)
                  .join(incoming.select(pkCols.map(qcol): _*).distinct(), pkCols, "left_anti")
                  .withColumn("__h", hcol)
                  .unionByName(incoming)
                (Seq.empty, all, base.rowCount + nIncoming, 1)
              }
          }
        // output modulus: nBuckets·2^d sized to the rewrite set (not the
        // table), floored at every hot file's concentrated split point; the
        // bound is approximate (hot + uniform parts can stack to ~2×) —
        // [[compact]] enforces it strictly
        val m = math.max(uniformModulus(nBuckets, estRows, maxRowsPerFile), atLeastMod)
        val sliced = toMerge
          .withColumn("__slice", concat_ws("_", lit(m), pmod(col("__h"), lit(m))))
          // a USING join puts the key columns first — restore the caller's
          // column order so every data file shares one schema layout
          .select(df.columns.map(qcol) :+ col("__slice"): _*)
        // safe to stream from the current snapshot: data is written to a fresh
        // uuid dir, so the plan's input files are never overwritten mid-scan
        val (uuid, newEntries, schemaJson) = writeData(spark, sliced, table, attemptUuid)
        commitEntries(table, uuid, carried ++ newEntries, inputFingerprint,
          nBuckets, spec, schemaJson, Some(baseId)) match {
          case Some(snap) => return snap
          case None => // base advanced under us: drop the orphan write, recompute
            deleteRecursively(Paths.get(table, "data", uuid))
            Files.deleteIfExists(inflightMarker(table, uuid))
        }
        } catch {
          // a lost-race base's files can be GC'd (expire retains only the
          // newest snapshots) while this attempt is still scanning them —
          // the resulting read failure means "stale base", not "bad data";
          // retry from the advanced snapshot instead of failing the upsert.
          // Only non-fatal errors, only when the base demonstrably moved, and
          // never without dropping the attempt's half-written data + marker
          // (the marker would otherwise shield the orphan from GC for a day).
          case scala.util.control.NonFatal(e) if currentSnapshotId(table) != baseId =>
            deleteRecursively(Paths.get(table, "data", attemptUuid))
            Files.deleteIfExists(inflightMarker(table, attemptUuid))
            System.err.println(s"[icelite] merge attempt $attempt on $table " +
              s"read a superseded base ($baseId): ${e.getMessage}; retrying")
        }
      }
      throw new IllegalStateException(s"merge on $table lost 8 commit races")
    } finally freeLocalCheckpoint(incoming)
  }

  /** Maintenance: rewrite data files violating the size bound — split files
    * over `maxRowsPerFile` to a finer slice modulus, and coalesce sibling
    * slice pairs ((2p, r), (2p, r+p)) whose combined rows fit in half the
    * bound back to their parent (p, r) (shrink-deletes leave slivers).
    * Untouched files carry verbatim; the commit is optimistic against
    * concurrent merges. Returns (filesRewritten, filesInNewSnapshot) —
    * (0, current file count) when nothing violates the bound.
    *
    * The Iceberg `rewrite_data_files` analog; at 100 TB this runs as a
    * background job and each group rewrite is an independent bounded task.
    */
  def compact(spark: SparkSession, table: String,
              maxRowsPerFile: Long = DefaultMaxRowsPerFile): (Int, Int) = {
    // iterate to a fixed point: one split pass halves an oversized file's
    // rows at least once but hash skew can leave a residue still over the
    // bound, and sibling coalescing may enable further coalescing a level
    // up. Terminates: splits strictly shrink per-file rows, coalesces
    // strictly shrink the modulus (floored at nBuckets), and a split's
    // children can never re-coalesce (their sum exceeds the bound).
    var total = 0
    var last = compactPass(spark, table, maxRowsPerFile)
    while (last._1 > 0) {
      total += last._1
      last = compactPass(spark, table, maxRowsPerFile)
    }
    (total, last._2)
  }

  private def compactPass(spark: SparkSession, table: String,
                          maxRowsPerFile: Long): (Int, Int) = {
    var attempt = 0
    while (attempt < 8) {
      attempt += 1
      val baseId = currentSnapshotId(table).getOrElse(return (0, 0))
      val base = readManifest(table, baseId)
      if (base.bucketSpec.isEmpty)
        throw new IllegalStateException(
          s"compact($table): table has no PK slice spec (written by commit(), " +
            "not merge()) — re-slice it with a merge first")
      val pkCols = base.bucketSpec.split(",").toSeq
      val hcol = pmod(hash(pkCols.map(qcol): _*), lit(Int.MaxValue))
      val baseM = math.max(1, base.nBuckets)

      val oversized = base.files.filter(_.rows > maxRowsPerFile)
      val smallSiblings: Seq[Seq[FileEntry]] = base.files
        .filter(f => f.mod > baseM && f.mod % 2 == 0 && f.rows <= maxRowsPerFile)
        .groupBy(f => (f.mod, f.res % (f.mod / 2)))
        .values.toSeq
        .filter(g => g.size == 2 && g.map(_.rows).sum <= maxRowsPerFile / 2)
      val groups: Seq[(Seq[FileEntry], Int)] =
        oversized.map(f => (Seq(f), concentratedModulus(f.mod, f.rows, maxRowsPerFile))) ++
          smallSiblings.map(g => (g, g.head.mod / 2))
      if (groups.isEmpty) return (0, base.files.size)

      val rewriting = groups.flatMap(_._1).map(_.path).toSet
      val carried = base.files.filterNot(f => rewriting(f.path))
      val rewritten = groups.map { case (fs, target) =>
        spark.read.parquet(fs.map(_.path): _*)
          .withColumn("__h", hcol)
          .withColumn("__slice", concat_ws("_", lit(target), pmod(col("__h"), lit(target))))
          .drop("__h")
      }.reduce(_ unionByName _)
      val (uuid, newEntries, schemaJson) = writeData(spark, rewritten, table)
      commitEntries(table, uuid, carried ++ newEntries, base.inputFingerprint,
        base.nBuckets, base.bucketSpec, schemaJson, Some(Some(baseId))) match {
        case Some(snap) => return (rewriting.size, snap.files.size)
        case None =>
          deleteRecursively(Paths.get(table, "data", uuid))
          Files.deleteIfExists(inflightMarker(table, uuid))
      }
    }
    throw new IllegalStateException(s"compact on $table lost 8 commit races")
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
    if (snap.files.isEmpty) emptyTyped(spark, snap)
    else spark.read.parquet(snap.filePaths: _*)
  }

  /** Roll the table back to a retained snapshot (the Iceberg
    * `rollback_to_snapshot` analog): an O(1) pointer swap under the table
    * lock — data files and manifests are immutable, so nothing is copied and
    * the rolled-past snapshots stay readable (and recoverable by rolling
    * forward again) until [[expireSnapshots]] ages them out relative to the
    * NEW current id. The next commit allocates past any existing manifest id
    * (CREATE_NEW loop), so rolled-past ids are never overwritten.
    */
  def rollback(table: String, id: Long): Snapshot = {
    val snap = readManifest(table, id) // throws when missing/expired/corrupt
    withTableLock(table) {
      val tmp = Paths.get(table, s"_CURRENT.tmp.rollback-$id")
      Files.writeString(tmp, id.toString)
      Files.move(tmp, currentPtr(table), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    snap
  }

  /** The table's file-level metadata as a DataFrame (the Iceberg `.files`
    * metadata-table analog): one row per data file with its slice claim,
    * lineage, and zone-map bounds — driver-side manifest only, no data IO.
    * The observability surface a 100 TB operator actually queries: file-size
    * skew, slice refinement depth, stats coverage.
    */
  def filesDf(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val id = currentSnapshotId(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    readManifest(table, id).files
      .map(f => (f.path, f.mod, f.res, f.rows, f.checksum,
        f.stats.map { case (c, (lo, hi)) => (c, lo, hi) }.toSeq.sortBy(_._1)))
      .toDF("path", "mod", "res", "rows", "checksum", "stats")
  }

  /** The table's snapshot history as a DataFrame (the Iceberg `.snapshots`
    * metadata-table analog): one row per RETAINED manifest with its row
    * count, file count, slice config, fingerprint, and whether it is the
    * current pointer target — the audit surface for rollback decisions and
    * retention tuning. Driver-side manifest reads only, no data IO.
    */
  def historyDf(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val cur = currentSnapshotId(table)
    val idRe = """snapshot-(\d+)\.json""".r
    val ls = Files.list(metaDir(table))
    val ids = try ls.iterator().asScala
      .flatMap(p => idRe.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .toSeq.sorted finally ls.close()
    ids.map { id =>
      val s = readManifest(table, id)
      (id, s.rowCount, s.files.size, s.nBuckets, s.bucketSpec,
        s.inputFingerprint, cur.contains(id))
    }.toDF("id", "row_count", "n_files", "n_buckets", "bucket_spec",
      "input_fingerprint", "is_current")
  }

  /** Manifest-level data skipping (the Iceberg scan-planning analog): read
    * only the files whose zone map can intersect `[lo, hi]` on `column`,
    * with the exact range filter applied on top (stats pruning is an IO
    * optimization, never a semantics change — files without stats are always
    * read). Parquet row-group stats prune WITHIN a file only after its footer
    * is opened; manifest stats prune the file list on the driver before the
    * scan is even planned, which at the 10^6-file design point is the
    * difference between listing/opening every file and touching only the
    * matching ones.
    */
  def readWhere(spark: SparkSession, table: String, column: String,
                lo: Any, hi: Any): DataFrame =
    readWhereAll(spark, table, Seq((column, lo, hi)))

  /** Conjunctive multi-range scan planning: a file survives only if EVERY
    * range can intersect its zone map (ranges on stat-less columns never
    * prune). The exact conjunction is applied on top, so this is still an
    * IO optimization, never a semantics change — e.g. a (time range ∧ id
    * range) query over a table clustered by either column opens only the
    * doubly-matching files.
    */
  def readWhereAll(spark: SparkSession, table: String,
                   ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "readWhereAll needs at least one range")
    val id = currentSnapshotId(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val (keep, schemaJson, fallback) = planScan(table, id, ranges)
    val base =
      if (keep.isEmpty)
        // everything pruned: preserve the schema metadata-only when the
        // manifest carries it (no footer open), else via an empty scan
        if (schemaJson.nonEmpty) emptyTypedJson(spark, schemaJson)
        else fallback() match {
          case Seq() => spark.emptyDataFrame
          case fs => spark.read.parquet(fs.head.path).where(lit(false))
        }
      else spark.read.parquet(keep.map(_.path): _*)
    ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.where(qcol(c) >= lit(lo) && qcol(c) <= lit(hi))
    }
  }

  /** Scan planning: the surviving file entries for a conjunctive range set,
    * pruning at BOTH metadata levels — whole manifest segments whose
    * aggregated zone map excludes a range are never even read (the Iceberg
    * manifest-list partition-summary analog; at the 10^6-file design point
    * this is the difference between parsing every segment's entry list on
    * the driver and opening only the matching buckets' segments), then
    * per-file zone maps within the surviving segments. Returns (kept files,
    * persisted schema JSON, fallback thunk yielding the FULL file list for
    * schema recovery). Legacy manifests (inline entries or plain-name refs)
    * skip the list level. Integrity: when pruning skips segments the
    * rowCount==Σrows invariant is enforced at the LIST level (Σ ref rows)
    * plus per parsed segment, so a truncated segment still fails loudly.
    */
  private def planScan(table: String, id: Long, ranges: Seq[(String, Any, Any)])
      : (Seq[FileEntry], String, () => Seq[FileEntry]) = {
    val txt = Files.readString(metaDir(table).resolve(s"snapshot-$id.json"))
    val refs = segmentRefs(txt)
    val schemaJson = manifestOpt(txt, "schemaJson", "") match {
      case "" => ""
      case b64 => b64dec(b64)
    }
    if (refs.isEmpty || refs.exists(_.rows < 0)) {
      // inline or legacy manifest: no list level to prune — full parse
      val snap = readManifest(table, id)
      val keep = ranges.foldLeft(snap.files) { case (fs, (c, lo, hi)) =>
        pruneFiles(fs, c, lo, hi) }
      (keep, snap.schemaJson, () => snap.files)
    } else {
      val rowCount = manifestField(txt, "rowCount").toLong
      if (rowCount != refs.map(_.rows).sum)
        throw new IllegalStateException(
          s"manifest snapshot-$id.json of $table claims $rowCount rows but its " +
            s"segment refs sum to ${refs.map(_.rows).sum} — corrupt manifest list")
      val nBuckets = manifestOpt(txt, "nBuckets", "0").toInt
      val liveRefs = refs.filter(r => ranges.forall { case (c, lo, hi) =>
        r.stats.get(c).forall { case (mn, mx) => boundsOverlap(mn, mx, lo, hi) } })
      val files = liveRefs.flatMap { r =>
        val es = parseEntries(Files.readString(metaDir(table).resolve(r.name)), nBuckets)
        if (es.map(_.rows).sum != r.rows)
          throw new IllegalStateException(
            s"segment ${r.name} of $table claims ${r.rows} rows but its entries " +
              s"sum to ${es.map(_.rows).sum} — corrupt segment")
        es
      }
      val keep = ranges.foldLeft(files) { case (fs, (c, lo, hi)) =>
        pruneFiles(fs, c, lo, hi) }
      (keep, schemaJson, () => readManifest(table, id).files)
    }
  }

  private def emptyTypedJson(spark: SparkSession, schemaJson: String): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The manifest-pruning half of [[readWhere]], exposed for tests and scan
    * metrics: the files whose stats cannot exclude `[lo, hi]` on `column`.
    * Bounds compare numerically when the caller's bounds are numbers (stats
    * strings that don't parse — NaN/Infinity — disable pruning for that
    * file), lexically for strings (sound with truncated bounds: the stored
    * upper bound is ≥ every value in the file by construction).
    */
  def pruneFiles(files: Seq[FileEntry], column: String,
                 lo: Any, hi: Any): Seq[FileEntry] =
    files.filter(_.stats.get(column).forall { case (mn, mx) =>
      boundsOverlap(mn, mx, lo, hi) })

  /** Can stored bounds [mn, mx] intersect the query range [lo, hi]?
    * Numeric when the caller's bounds are numbers (unparseable stored
    * bounds — NaN/Infinity — disable pruning), UTF-8-lexical otherwise.
    * Shared by the file level and the manifest-list level so the two prune
    * tiers can never disagree on ordering. */
  private def boundsOverlap(mn: String, mx: String, lo: Any, hi: Any): Boolean =
    if (lo.isInstanceOf[Number] && hi.isInstanceOf[Number]) {
      try !(BigDecimal(mx) < BigDecimal(lo.toString) ||
            BigDecimal(mn) > BigDecimal(hi.toString))
      catch { case _: NumberFormatException => true }
    } else !(utf8Lt(mx, lo.toString) || utf8Lt(hi.toString, mn))

  /** Unsigned UTF-8-byte comparison — Spark's UTF8String (and so its string
    * min/max and filter) ordering, which differs from Java's UTF-16
    * `compareTo` once supplementary characters are involved (surrogate units
    * 0xD800-0xDFFF sort below U+E000..U+FFFF in UTF-16 but the code points
    * they encode sort ABOVE all of them). Pruning with `compareTo` against
    * Spark-computed min/max could wrongly drop files; all string bound
    * comparisons go through this instead. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Incremental snapshot diff (the Iceberg changelog-scan analog): the rows
    * inserted / updated / deleted between two retained snapshots, tagged in
    * a `__change` column (`insert` / `update` post-image / `delete`
    * pre-image). IO is O(changed slices), not O(table): only the data files
    * the two manifests do NOT share are read ([[merge]] carries untouched
    * files by identical path, so shared files cannot contain a changed row),
    * and rows that merely MOVED files with identical content (slice splits,
    * [[compact]] rewrites) hash-cancel and are emitted as nothing. This is
    * what lets a downstream training pipeline consume a daily metadata
    * upsert as a delta instead of re-reading 100 TB.
    */
  def diffSnapshots(spark: SparkSession, table: String, fromId: Long, toId: Long,
                    pkCols: Seq[String]): DataFrame = {
    val a = readManifest(table, fromId)
    val b = readManifest(table, toId)
    val aPaths = (a.files.toSet -- b.files.toSet).map(_.path).toSeq.sorted
    val bPaths = (b.files.toSet -- a.files.toSet).map(_.path).toSeq.sorted
    val schemaSource =
      if (bPaths.nonEmpty) spark.read.parquet(bPaths: _*)
      else if (aPaths.nonEmpty) spark.read.parquet(aPaths: _*)
      // identical manifests / empty table: no changed rows, but the result
      // must still carry the pk + __change schema or a downstream
      // .filter(col("__change") === ...) breaks only on the no-change case.
      // The manifest's persisted schema keeps this path METADATA-ONLY (the
      // "IO is O(changed slices)" contract: zero changed slices, zero file
      // opens); parquet footers are only a pre-schemaJson-manifest fallback.
      else if (b.schemaJson.nonEmpty) emptyTyped(spark, b)
      else if (b.files.nonEmpty) spark.read.parquet(b.files.head.path)
      else if (a.files.nonEmpty) spark.read.parquet(a.files.head.path)
      else return spark.emptyDataFrame // pre-schema manifest of an empty table
    val cols = schemaSource.columns.toSeq
    def side(paths: Seq[String], tag: String): DataFrame = {
      val df = if (paths.nonEmpty) spark.read.parquet(paths: _*)
               else spark.createDataFrame(
                 new java.util.ArrayList[org.apache.spark.sql.Row](), schemaSource.schema)
      df.select(pkCols.map(qcol) ++ Seq(
        struct(cols.map(qcol): _*).as(s"__row_$tag"),
        xxhash64(cols.map(qcol): _*).as(s"__h_$tag")): _*)
    }
    val joined = side(aPaths, "old").join(side(bPaths, "new"), pkCols, "full_outer")
    val change = when(col("__h_new").isNull, lit("delete"))
      .when(col("__h_old").isNull, lit("insert"))
      .when(col("__h_old") =!= col("__h_new"), lit("update"))
    val image = when(col("__h_new").isNull, col("__row_old")).otherwise(col("__row_new"))
    joined
      .withColumn("__change", change)
      .filter(col("__change").isNotNull) // unchanged rows that moved files
      .select(cols.map(c => image.getField(c).as(c)) :+ col("__change"): _*)
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
      bit_xor(xxhash64(df.columns.map(qcol): _*)).as("x")).head()
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
    * manifests, delete older manifests, then garbage-collect data files no
    * retained manifest references. Runs under the same table lock as the
    * commit section, so it can never interleave with a pointer swap or
    * manifest write. Files referenced by the just-expired manifests are
    * known-dead and deleted unconditionally; UNKNOWN orphans (a data dir
    * with no manifest — possibly an in-flight writer that has not committed
    * yet) are deleted only once older than `orphanGraceMs`, which closes
    * the classic expire-vs-writer race without coordinating with writers.
    * Returns (manifests deleted, data files deleted).
    */
  def expireSnapshots(table: String, retain: Int = 2,
                      orphanGraceMs: Long = 3600000L,
                      inflightTtlMs: Long = 86400000L): (Int, Int) = {
    require(retain >= 1, "must retain at least the current snapshot")
    if (currentSnapshotId(table).isEmpty) return (0, 0)
    withTableLock(table) {
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
      val knownDead: Set[String] =
        expired.flatMap(id => readManifest(table, id).filePaths)
          .map(f => canon(Paths.get(f))).toSet -- referenced
      // segment GC: keep only manifest segments some retained snapshot
      // references (content-addressing shares segments across snapshots)
      val keptSegs: Set[String] = kept.flatMap { id =>
        segmentRefs(Files.readString(metaDir(table).resolve(s"snapshot-$id.json")))
          .map(_.name)
      }.toSet
      expired.foreach(id => Files.delete(metaDir(table).resolve(s"snapshot-$id.json")))
      val segLs = Files.list(metaDir(table))
      try segLs.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("segment-") &&
          !keptSegs.contains(p.getFileName.toString))
        .foreach(Files.deleteIfExists(_))
      finally segLs.close()
      // GC: delete unreferenced files under data/, then prune empty dirs
      val dataRoot = Paths.get(table, "data")
      var deleted = 0
      if (Files.isDirectory(dataRoot)) {
        // a .crc sidecar follows its data file's fate
        def inSet(s: Set[String])(p: Path): Boolean = {
          val name = p.getFileName.toString
          s.contains(canon(p)) ||
            (name.startsWith(".") && name.endsWith(".crc") &&
              s.contains(canon(p.getParent.resolve(name.drop(1).dropRight(4)))))
        }
        val now = System.currentTimeMillis()
        // live-writer protection: a data dir whose _inflight/<uuid> marker is
        // younger than the TTL belongs to a write still in progress — the
        // grace window alone cannot protect a Spark job slower than the
        // grace. Stale markers (crashed writers) age out and are removed.
        val inflightDir = Paths.get(table, "_inflight")
        val liveUuids: Set[String] =
          if (!Files.isDirectory(inflightDir)) Set.empty
          else {
            val ls = Files.list(inflightDir)
            val markers = try ls.iterator().asScala.toSeq finally ls.close()
            markers.flatMap { m =>
              if (now - Files.getLastModifiedTime(m).toMillis > inflightTtlMs) {
                Files.deleteIfExists(m); None
              } else Some(m.getFileName.toString)
            }.toSet
          }
        def inLiveWrite(p: Path): Boolean = {
          val rel = dataRoot.relativize(p)
          rel.getNameCount > 0 && liveUuids.contains(rel.getName(0).toString)
        }
        val walk = Files.walk(dataRoot)
        try {
          walk.iterator().asScala.filter(Files.isRegularFile(_)).toSeq.foreach { p =>
            if (!inSet(referenced)(p) && !inLiveWrite(p)) {
              val dead = inSet(knownDead)(p) ||
                now - Files.getLastModifiedTime(p).toMillis > orphanGraceMs
              if (dead) { Files.delete(p); deleted += 1 }
            }
          }
        } finally walk.close()
        pruneEmptyDirs(dataRoot)
      }
      (expired.size, deleted)
    }
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
