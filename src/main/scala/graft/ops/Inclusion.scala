package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P5 — the packaging file-inclusion predicate, and P2 — the record
  * completeness predicate, as pure boolean column expressions.
  *
  * P5 reproduces `check_file_inclusion` of /root/reference/lib/utils.py:502-553
  * exactly: a sequence of suffix-set rules where LATER rules override earlier
  * ones (the reference reassigns `move_file`), guarded by overlap-prefix
  * membership, plus the pair-shapefile side rule. Flags are plan-time
  * booleans, so disabled rules constant-fold out of the generated plan.
  */
object Inclusion {

  /** Suffix sets from /root/reference/lib/utils.py:162-207. */
  val DelivSuffixes: Seq[String] = Seq(
    "-DEM.prj", "-DEM.tif", "-DRG.tif", "-IntersectionErr.tif",
    "-GoodPixelMap.tif", "-stereo.default", "-PC.laz", "-PC.las", ".geojson",
    "_dem.tif", "_ortho.tif", "_matchtag.tif", "_meta.txt")
  val ShpSuffixes: Seq[String] = Seq(".shp", ".shx", ".prj", ".dbf")
  val PcSuffixes: Seq[String] = Seq("-PC.tif", "-PC-center.txt")
  val FltrSuffixes: Seq[String] = Seq("_fltr-DEM.tif", "_fltr-DEM.prj")
  val LogSuffixes: Seq[String] = Seq(
    "-log-point2dem", "-log-stereo_corr", "-log-stereo_pprc",
    "-log-stereo_fltr", "-log-stereo_rfne", "-log-stereo_tri")
  val DemsOnlySuffixes: Seq[String] =
    Seq("-DEM.tif", "-DEM.prj", ".geojson", "_dem.tif", "_meta.txt")

  /** The include/exclude flag set (reference arg defaults are all false). */
  case class Flags(includePc: Boolean = false, includeLogs: Boolean = false,
                   includeFltr: Boolean = false, excludeDrg: Boolean = false,
                   excludeErr: Boolean = false, demsOnly: Boolean = false,
                   tarOnly: Boolean = false)

  private def endsAny(f: Column, suffixes: Seq[String]): Column =
    suffixes.map(s => f.endsWith(s)).reduce(_ || _)

  /** `check_file_inclusion(f, pairname, overlap_prefix, args)` as a boolean
    * column. Rule order matches the reference line-for-line (later rules
    * override earlier ones).
    */
  def checkFileInclusion(f: Column, pairname: Column, overlapPrefix: Column,
                         flags: Flags): Column = {
    // ---- inside the overlap-prefix branch (lib/utils.py:506-545)
    var m: Column = lit(false)
    m = when(endsAny(f, DelivSuffixes), lit(true)).otherwise(m)
    m = when(endsAny(f, FltrSuffixes), lit(false)).otherwise(m)
    if (flags.includePc)
      m = when(endsAny(f, PcSuffixes), lit(true)).otherwise(m)
    if (flags.includeLogs)
      m = when(endsAny(f, LogSuffixes), lit(true)).otherwise(m)
    if (flags.includeFltr)
      m = when(endsAny(f, FltrSuffixes), lit(true)).otherwise(m)
    if (flags.excludeDrg)
      m = when(endsAny(f, Seq("-DRG.tif", "_ortho.tif")), lit(false)).otherwise(m)
    if (flags.excludeErr)
      m = when(f.endsWith("-IntersectionErr.tif"), lit(false)).otherwise(m)
    if (flags.demsOnly) {
      m = when(endsAny(f, DemsOnlySuffixes), lit(true)).otherwise(lit(false))
      m = when(endsAny(f, FltrSuffixes), lit(flags.includeFltr)).otherwise(m)
    }
    if (flags.tarOnly)
      m = when(f.endsWith(".tar"), lit(true)).otherwise(lit(false))

    var move: Column = when(f.contains(overlapPrefix), m).otherwise(lit(false))

    // ---- pair-shapefile side rule (lib/utils.py:548-551)
    if (!flags.demsOnly)
      move = when(endsAny(f, ShpSuffixes) && f.contains(pairname)
        && !f.contains("-DEM"), lit(true)).otherwise(move)
    move
  }

  /** P2 — completeness predicate (/root/reference/lib/dem.py:211-245) over
    * per-record file-size arrays (null element = file missing):
    *   - at least one DEM variant must exist, and any present DEM must be
    *     non-empty;
    *   - every required file must exist and be non-empty;
    *   - optional files may be missing but must be non-empty when present.
    * Metadata-scale predicate — HOF lambdas are fine here.
    */
  def isComplete(demSizes: Column, reqSizes: Column, optSizes: Column): Column = {
    val demExists = exists(demSizes, s => s.isNotNull)
    val demNonEmpty = forall(demSizes, s => s.isNull || s > 0)
    val reqOk = forall(reqSizes, s => s.isNotNull && s > 0)
    val optOk = forall(optSizes, s => s.isNull || s > 0)
    demExists && demNonEmpty && reqOk && optOk
  }
}
