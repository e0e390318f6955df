package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** P11 + U5 — release-format field conversion for strip records
  * (/root/reference/index_setsm.py:1030-1071 with the field sets of
  * lib/utils.py:230-327): rename the general attribute names to their
  * release names FIRST (a rename overwrites an existing target — strips'
  * ACQDATE1/2 become the average acquisition times), then drop every field
  * in the set difference `fields(DEM_ATTRIBUTE_DEFINITIONS) −
  * fields(DEM_ATTRIBUTE_DEFINITIONS_RELEASE)` — computed, not hardcoded,
  * exactly like the reference (U5 schema set-difference drop).
  *
  * Pure projection: a narrow, shuffle-free rename/drop at any scale.
  */
object ReleaseFields {

  /** DEM_ATTRIBUTE_DEFINITIONS field names (lib/utils.py:230-293). */
  val StripFields: Seq[String] = Seq(
    "DEM_ID", "STRIPDEMID", "PAIRNAME", "SENSOR1", "SENSOR2", "ACQDATE1",
    "ACQDATE2", "AVGACQTM1", "AVGACQTM2", "CATALOGID1", "CATALOGID2",
    "CENT_LAT", "CENT_LON", "GEOCELL", "REGION", "EPSG", "PROJ4", "ND_VALUE",
    "DEM_RES", "CR_DATE", "ALGM_VER", "S2S_VER", "IS_LSF", "IS_XTRACK",
    "EDGEMASK", "WATERMASK", "CLOUDMASK", "MASK_DENS", "VALID_DENS",
    "VALID_AREA", "VALID_PERC", "WATER_AREA", "WATER_PERC", "CLOUD_AREA",
    "CLOUD_PERC", "AVGCONVANG", "AVG_HT_ACC", "AVG_SUNEL1", "AVG_SUNEL2",
    "RMSE", "LOCATION", "FILESZ_DEM", "FILESZ_MT", "FILESZ_OR", "FILESZ_OR2",
    "INDEX_DATE")

  /** DEM_ATTRIBUTE_DEFINITIONS_RELEASE field names (lib/utils.py:295-327). */
  val StripReleaseFields: Seq[String] = Seq(
    "DEM_ID", "PAIRNAME", "STRIPDEMID", "SENSOR1", "SENSOR2", "CATALOGID1",
    "CATALOGID2", "ACQDATE1", "ACQDATE2", "GSD", "EPSG", "SETSM_VER",
    "S2S_VER", "CR_DATE", "GEOCELL", "IS_LSF", "IS_XTRACK", "VALID_DENS",
    "VALID_AREA", "VALID_PERC", "WATER_AREA", "WATER_PERC", "CLOUD_AREA",
    "CLOUD_PERC", "AVGCONVANG", "AVG_HT_ACC", "AVG_SUNEL1", "AVG_SUNEL2",
    "RMSE", "FILEURL", "S3URL")

  /** tile_to_general_attrib_name (index_setsm.py:1035-1042): release name ←
    * general name. REL_VER and DENSITY are tile-mode sources; a strip frame
    * simply lacks them and the rename is skipped (`if gname in attrib_map`).
    */
  val RenameMap: Seq[(String, String)] = Seq(
    "GSD" -> "DEM_RES", "RELEASEVER" -> "REL_VER", "DATA_PERC" -> "DENSITY",
    "ACQDATE1" -> "AVGACQTM1", "ACQDATE2" -> "AVGACQTM2",
    "SETSM_VER" -> "ALGM_VER")

  /** U5 drop list — the sorted set difference (index_setsm.py:1060-1063). */
  val StripRemoveFields: Seq[String] =
    (StripFields.toSet -- StripReleaseFields.toSet).toSeq.sorted

  /** Apply the full conversion to a strip-mode record frame. */
  def toRelease(df: DataFrame): DataFrame = {
    var out = df
    RenameMap.foreach { case (tname, gname) =>
      if (out.columns.contains(gname))
        out = out.withColumn(tname, col(gname)).drop(gname)
    }
    out.drop(StripRemoveFields.filter(out.columns.contains): _*)
  }
}
