package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** The reference's declared fixed-width attribute schemas, materialized as
  * Spark `StructType`s with width/precision/long-name metadata — the
  * "tables" a consumer of the reference's index layers sees
  * (`/root/reference/lib/utils.py:226-455`, `StandardAttribute(fname,
  * fname_long, ftype, fwidth, fprecision)` namedtuples).
  *
  * Field lists are reproduced name-for-name and in DECLARED ORDER (the
  * reference writes layers in list order, `index_setsm.py:568-578`); OGR
  * types map to Spark types as String→StringType, Real→DoubleType,
  * Integer→IntegerType, DateTime→TimestampType, Date→DateType,
  * Boolean-subtyped Integer→BooleanType (`index_setsm.py:575-578` sets the
  * OFSTBoolean subtype on integer fields).
  *
  * Width enforcement: the reference SKIPS rows whose string value exceeds
  * the declared width (`index_setsm.py:1103-1113`); the Spark analog is
  * [[graft.jobs.IndexJob.validateWidths]], which since round 5 can be
  * driven straight off these declarations via [[widthMap]].
  */
object Schemas {

  /** One declared attribute: the StandardAttribute namedtuple's shape. */
  case class FieldDef(name: String, longName: String, dataType: DataType,
                      width: Int, precision: Int)

  private def S(n: String, w: Int, ln: String = "") = FieldDef(n, ln, StringType, w, 0)
  private def R(n: String, ln: String = "") = FieldDef(n, ln, DoubleType, 0, 0)
  private def I(n: String, ln: String = "") = FieldDef(n, ln, IntegerType, 8, 8)
  private def T(n: String, w: Int = 32, ln: String = "") = FieldDef(n, ln, TimestampType, w, 0)
  private def D(n: String, ln: String = "") = FieldDef(n, ln, DateType, 0, 0)
  private def B(n: String, ln: String = "") = FieldDef(n, ln, BooleanType, 0, 0)

  /** DEM_ATTRIBUTE_DEFINITIONS (strip layer, 46 cols) —
    * lib/utils.py:230-293 BASIC + :289-296 tail. */
  val strip: Seq[FieldDef] = Seq(
    S("DEM_ID", 254), S("STRIPDEMID", 254), S("PAIRNAME", 64),
    S("SENSOR1", 8), S("SENSOR2", 8),
    T("ACQDATE1"), T("ACQDATE2"), T("AVGACQTM1"), T("AVGACQTM2"),
    S("CATALOGID1", 32), S("CATALOGID2", 32),
    R("CENT_LAT"), R("CENT_LON"), S("GEOCELL", 10), S("REGION", 64),
    I("EPSG"), S("PROJ4", 100), R("ND_VALUE"), R("DEM_RES"),
    T("CR_DATE"), S("ALGM_VER", 32), S("S2S_VER", 32),
    B("IS_LSF"), B("IS_XTRACK"),
    B("EDGEMASK"), B("WATERMASK"), B("CLOUDMASK"),
    R("MASK_DENS"), R("VALID_DENS"), R("VALID_AREA"), R("VALID_PERC"),
    R("WATER_AREA"), R("WATER_PERC"), R("CLOUD_AREA"), R("CLOUD_PERC"),
    R("AVGCONVANG"), R("AVG_HT_ACC"), R("AVG_SUNEL1"), R("AVG_SUNEL2"),
    R("RMSE"),
    S("LOCATION", 512),
    R("FILESZ_DEM"), R("FILESZ_MT"), R("FILESZ_OR"), R("FILESZ_OR2"),
    T("INDEX_DATE"))

  /** DEM_ATTRIBUTE_DEFINITIONS_REGISTRATION (deprecated strip extras) —
    * lib/utils.py:279-286. */
  val stripRegistration: Seq[FieldDef] = Seq(
    S("REG_SRC", 20), R("DX"), R("DY"), R("DZ"), I("NUM_GCPS"), R("MEANRESZ"))

  /** DEM_ATTRIBUTE_DEFINITIONS_RELEASE (public strip release, 31 cols) —
    * lib/utils.py:297-329; long names are the release layer's public
    * aliases (e.g. VALID_DENS → VALID_AREA_MATCHTAG_DENSITY). */
  val stripRelease: Seq[FieldDef] = Seq(
    S("DEM_ID", 254), S("PAIRNAME", 64), S("STRIPDEMID", 254),
    S("SENSOR1", 8), S("SENSOR2", 8),
    S("CATALOGID1", 32), S("CATALOGID2", 32),
    T("ACQDATE1"), T("ACQDATE2"),
    R("GSD"), I("EPSG"), S("SETSM_VER", 32), S("S2S_VER", 32),
    T("CR_DATE", 32, "CREATIONDATE"), S("GEOCELL", 10),
    B("IS_LSF"), B("IS_XTRACK"),
    R("VALID_DENS", "VALID_AREA_MATCHTAG_DENSITY"),
    R("VALID_AREA", "VALID_AREA_SQKM"),
    R("VALID_PERC", "VALID_AREA_PERCENT"),
    R("WATER_AREA", "WATER_AREA_SQKM"),
    R("WATER_PERC", "WATER_AREA_PERCENT"),
    R("CLOUD_AREA", "CLOUD_AREA_SQKM"),
    R("CLOUD_PERC", "CLOUD_AREA_PERCENT"),
    R("AVGCONVANG", "AVG_CONVERGENCE_ANGLE"),
    R("AVG_HT_ACC", "AVG_EXPECTED_HEIGHT_ACCURACY"),
    R("AVG_SUNEL1", "AVG_SUN_ELEV1"),
    R("AVG_SUNEL2", "AVG_SUN_ELEV2"),
    R("RMSE"),
    S("FILEURL", 254), S("S3URL", 254))

  /** SCENE_ATTRIBUTE_DEFINITIONS (scene layer, 35 cols) —
    * lib/utils.py:333-380 BASIC + :372-381 tail. Scene DateTime fields are
    * declared width 0 in the reference. */
  val scene: Seq[FieldDef] = Seq(
    S("SCENEDEMID", 254), S("STRIPDEMID", 254), S("STATUS", 8),
    S("PAIRNAME", 64), S("SENSOR1", 8), S("SENSOR2", 8),
    T("ACQDATE1", 0), T("ACQDATE2", 0),
    S("CATALOGID1", 32), S("CATALOGID2", 32),
    S("SCENE1", 100), S("SCENE2", 100),
    T("GEN_TIME1", 0), T("GEN_TIME2", 0),
    R("CENT_LAT"), R("CENT_LON"), S("REGION", 64),
    I("EPSG"), S("PROJ4", 100), R("ND_VALUE"), R("DEM_RES"),
    T("CR_DATE", 0), S("ALGM_VER", 32), I("PROD_VER"),
    B("HAS_LSF"), B("HAS_NONLSF"), B("IS_XTRACK"), B("IS_DSP"),
    S("LOCATION", 512),
    R("FILESZ_DEM"), R("FILESZ_LSF"), R("FILESZ_MT"), R("FILESZ_OR"),
    R("FILESZ_OR2"),
    T("INDEX_DATE", 0))

  /** TILE_DEM_ATTRIBUTE_DEFINITIONS (mosaic tile layer, 12 cols) —
    * lib/utils.py:383-404. */
  val tile: Seq[FieldDef] = Seq(
    S("DEM_ID", 80), S("TILE", 20), S("SUPERTILE", 50),
    I("EPSG"), R("ND_VALUE"), R("DEM_RES"), T("CR_DATE", 0),
    R("DENSITY"), I("NUM_COMP"),
    S("LOCATION", 512), R("FILESZ_DEM"), T("INDEX_DATE", 0))

  /** TILE_DEM_ATTRIBUTE_DEFINITIONS_REGISTRATION — lib/utils.py:392-396. */
  val tileRegistration: Seq[FieldDef] = Seq(
    S("REG_SRC", 20), I("NUM_GCPS"), R("MEANRESZ"))

  /** TILE_DEM_ATTRIBUTE_DEFINITIONS_RELEASE (11 cols) —
    * lib/utils.py:406-418. CR_DATE is OFTDate (not DateTime) here. */
  val tileRelease: Seq[FieldDef] = Seq(
    S("DEM_ID", 100), S("TILE", 50), S("SUPERTILE", 50),
    R("GSD"), I("EPSG"),
    S("RELEASEVER", 20, "RELEASE_VER"),
    D("CR_DATE", "CREATIONDATE"),
    R("DATA_PERC", "DATA_PERCENT"),
    I("NUM_COMP", "NUM_COMPONENTS"),
    S("FILEURL", 254), S("S3URL", 254))

  /** OVERLAP_FILE_ATTRIBUTE_DEFINITIONS (ASP job bookkeeping, 26 cols =
    * 3 basic + 23 additional) — lib/utils.py:420-455. STATUS is a width-2
    * integer and CR_DATE a STRING in this family. */
  val overlap: Seq[FieldDef] = Seq(
    S("OVERLAP", 254), S("PAIRNAME", 64),
    FieldDef("STATUS", "", IntegerType, 2, 0),
    S("MODE", 16), S("CATALOGID1", 32), S("CATALOGID2", 32),
    R("CENT_LAT"), R("CENT_LON"), I("EPSG"), R("EXT_AREA"),
    R("ND_AREA"), R("ND_PERC"), R("ND_VALUE"), R("DEM_RES"), R("PC_RES"),
    S("ASPVERSION", 64), S("ASPBUILDID", 16),
    FieldDef("C_SEEDMODE", "", IntegerType, 8, 0),
    FieldDef("C_TIMEOUT", "", IntegerType, 8, 0),
    FieldDef("REFN_MTHD", "", IntegerType, 8, 0),
    S("ALIGN_MTHD", 64), S("HOST", 32), S("SEED_DEM", 512),
    S("CR_DATE", 32), R("RUNTIME"), S("DEM_NAME", 254))

  /** All families by layer name (the reference's mode switch,
    * index_setsm.py:540-542). */
  val families: Map[String, Seq[FieldDef]] = Map(
    "scene" -> scene, "strip" -> strip, "strip_release" -> stripRelease,
    "tile" -> tile, "tile_release" -> tileRelease, "overlap" -> overlap)

  /** The declared field list as a StructType, width/precision/long-name in
    * field metadata, declared order preserved. Everything nullable (the
    * reference writes None for absent attributes, index_setsm.py:1103). */
  def structType(fields: Seq[FieldDef]): StructType =
    StructType(fields.map { f =>
      val mb = new MetadataBuilder()
        .putLong("width", f.width.toLong)
        .putLong("precision", f.precision.toLong)
      if (f.longName.nonEmpty) mb.putString("long_name", f.longName)
      StructField(f.name, f.dataType, nullable = true, mb.build())
    })

  /** String-field width map for the skip-too-wide validation
    * (index_setsm.py:1103-1113 skips only string overflows — numeric widths
    * are display metadata). Derivable from either the FieldDef list or a
    * metadata-carrying StructType. */
  def widthMap(fields: Seq[FieldDef]): Map[String, Int] =
    fields.collect { case f if f.dataType == StringType && f.width > 0 =>
      f.name -> f.width
    }.toMap

  def widthMap(schema: StructType): Map[String, Int] =
    schema.fields.collect {
      case f if f.dataType == StringType && f.metadata.contains("width") &&
        f.metadata.getLong("width") > 0 =>
        f.name -> f.metadata.getLong("width").toInt
    }.toMap

  /** Release-layer rename map: declared name → public long name where one
    * is declared (the write-time mapping of index_setsm.py:568-570). */
  def longNames(fields: Seq[FieldDef]): Map[String, String] =
    fields.collect { case f if f.longName.nonEmpty => f.name -> f.longName }.toMap

  /** Project an arbitrary frame onto a declared family: declared columns in
    * DECLARED ORDER, source columns matched case-insensitively and CAST to
    * the declared type, absent attributes emitted as typed NULLs (the
    * reference writes None for attributes a record lacks,
    * index_setsm.py:1095-1103). Width/precision/long-name ride along as
    * field metadata, so a consumer porting a reference index reader sees the
    * exact declared layer schema. Pure narrow projection — no shuffle, and
    * unreferenced source columns prune out of the scan.
    */
  def conform(df: DataFrame, fields: Seq[FieldDef]): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val target = structType(fields)
    val cols: Seq[Column] = fields.zip(target.fields).map { case (f, sf) =>
      val base = byLower.get(f.name.toLowerCase) match {
        case Some(src) => col(src).cast(f.dataType)
        case None => lit(null).cast(f.dataType)
      }
      base.as(f.name, sf.metadata)
    }
    df.select(cols: _*)
  }

  /** The public release projection: conform + rename to the declared long
    * names where one exists (VALID_DENS → VALID_AREA_MATCHTAG_DENSITY etc,
    * the write-time aliasing of index_setsm.py:568-570). */
  def toRelease(df: DataFrame, fields: Seq[FieldDef]): DataFrame = {
    val renames = longNames(fields)
    val conformed = conform(df, fields)
    conformed.select(fields.map { f =>
      col(f.name).as(renames.getOrElse(f.name, f.name))
    }: _*)
  }
}
