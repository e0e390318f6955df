package graft

import org.apache.spark.sql.functions._
import graft.ops.Inclusion
import graft.ops.Inclusion.Flags

/** P5 truth table — replicates /root/reference/tests/test_utils.py:74-365
  * case-for-case (the file lists and flag combos ARE the spec). Each case
  * evaluates the predicate as a column over the fixture file set and compares
  * the selected set against the reference's expected `files_to_move`.
  */
class InclusionSpec extends SparkSpec {
  import spark.implicits._

  private val aspPairname = "WV01_20120422_102001001AE38C00_102001001B0AAD00"
  private val aspStripFiles = Seq(
    s"$aspPairname-DEM.tif", s"$aspPairname-PC.tif", s"$aspPairname-PC-center.txt",
    s"$aspPairname-PC.las", s"$aspPairname-PC.laz", s"$aspPairname-GoodPixelMap.tif",
    s"$aspPairname-DEM.prj", s"$aspPairname-DRG.tif", s"$aspPairname-IntersectionErr.tif",
    s"${aspPairname}_fltr-DEM.tif", s"${aspPairname}_fltr-DEM.prj",
    s"$aspPairname.geojson", s"$aspPairname-stereo.default",
    s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj",
    s"$aspPairname-log-stereo_corr")

  private val scenePrefix =
    "WV01_20120422153705_102001001AE38C00_12APR22153705-P1BS-052895840020_01_P001_" +
      "WV01_20120422153618_102001001B0AAD00_12APR22153618-P1BS-052895834010_01_P001"
  private val aspSceneFiles = Seq(
    s"$scenePrefix-DEM.tif", s"$scenePrefix-PC.tif", s"$scenePrefix-PC-center.txt",
    s"$scenePrefix-PC.las", s"$scenePrefix-PC.laz", s"$scenePrefix-GoodPixelMap.tif",
    s"$scenePrefix-DEM.prj", s"$scenePrefix-DRG.tif", s"$scenePrefix-IntersectionErr.tif",
    s"${scenePrefix}_fltr-DEM.tif", s"${scenePrefix}_fltr-DEM.prj",
    s"$scenePrefix.geojson", s"$scenePrefix-stereo.default", s"$scenePrefix-log-stereo_corr",
    s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj")

  private val setsmPairname = "WV01_20080830_1020010003561200_1020010004712300"
  private val setsmPrefix = s"SETSM_${setsmPairname}_seg1_8m"
  private val setsmStripFiles = Seq(
    s"$setsmPrefix" + "_dem.geom", s"$setsmPrefix" + "_dem.tif",
    s"$setsmPrefix" + "_matchtag.tif", s"$setsmPrefix" + "_matchtag_browse.tif",
    s"$setsmPrefix" + "_ortho.tif", s"$setsmPrefix" + "_ortho_8bit.tif",
    s"$setsmPrefix" + "_meta.txt")

  private def selected(files: Seq[String], pairname: String,
                       overlapPrefix: String, flags: Flags): Set[String] = {
    val df = files.toDF("f")
    df.filter(Inclusion.checkFileInclusion(col("f"), lit(pairname),
        lit(overlapPrefix), flags))
      .as[String].collect().toSet
  }

  test("asp strip, defaults (test_utils.py:74-98)") {
    val expect = Set(
      s"$aspPairname-DEM.tif", s"$aspPairname-PC.las", s"$aspPairname-PC.laz",
      s"$aspPairname-GoodPixelMap.tif", s"$aspPairname-DEM.prj",
      s"$aspPairname-DRG.tif", s"$aspPairname-IntersectionErr.tif",
      s"$aspPairname.geojson", s"$aspPairname-stereo.default",
      s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj")
    assert(selected(aspStripFiles, aspPairname, aspPairname, Flags()) === expect)
  }

  test("asp strip, include all (pc+logs+fltr)") {
    val expect = Set(
      s"$aspPairname-DEM.tif", s"$aspPairname-PC.tif", s"$aspPairname-PC-center.txt",
      s"$aspPairname-PC.las", s"$aspPairname-PC.laz", s"$aspPairname-GoodPixelMap.tif",
      s"$aspPairname-DEM.prj", s"$aspPairname-DRG.tif", s"$aspPairname-IntersectionErr.tif",
      s"${aspPairname}_fltr-DEM.tif", s"${aspPairname}_fltr-DEM.prj",
      s"$aspPairname.geojson", s"$aspPairname-stereo.default",
      s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj",
      s"$aspPairname-log-stereo_corr")
    assert(selected(aspStripFiles, aspPairname, aspPairname,
      Flags(includePc = true, includeLogs = true, includeFltr = true)) === expect)
  }

  test("asp strip, exclude drg and err") {
    val expect = Set(
      s"$aspPairname-DEM.tif", s"$aspPairname-PC.las", s"$aspPairname-PC.laz",
      s"$aspPairname-GoodPixelMap.tif", s"$aspPairname-DEM.prj",
      s"$aspPairname.geojson", s"$aspPairname-stereo.default",
      s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj")
    assert(selected(aspStripFiles, aspPairname, aspPairname,
      Flags(excludeDrg = true, excludeErr = true)) === expect)
  }

  test("asp strip, dems only") {
    val expect = Set(
      s"$aspPairname-DEM.tif", s"$aspPairname-DEM.prj", s"$aspPairname.geojson")
    assert(selected(aspStripFiles, aspPairname, aspPairname,
      Flags(demsOnly = true)) === expect)
  }

  test("asp strip, dems only + include fltr") {
    val expect = Set(
      s"$aspPairname-DEM.tif", s"$aspPairname-DEM.prj", s"$aspPairname.geojson",
      s"${aspPairname}_fltr-DEM.tif", s"${aspPairname}_fltr-DEM.prj")
    assert(selected(aspStripFiles, aspPairname, aspPairname,
      Flags(demsOnly = true, includeFltr = true)) === expect)
  }

  test("asp scene, defaults (overlap prefix != pairname)") {
    val expect = Set(
      s"$scenePrefix-DEM.tif", s"$scenePrefix-PC.las", s"$scenePrefix-PC.laz",
      s"$scenePrefix-GoodPixelMap.tif", s"$scenePrefix-DEM.prj",
      s"$scenePrefix-DRG.tif", s"$scenePrefix-IntersectionErr.tif",
      s"$scenePrefix.geojson", s"$scenePrefix-stereo.default",
      s"$aspPairname.shp", s"$aspPairname.dbf", s"$aspPairname.shx", s"$aspPairname.prj")
    assert(selected(aspSceneFiles, aspPairname, scenePrefix, Flags()) === expect)
  }

  test("asp scene, include all") {
    val expect = aspSceneFiles.toSet // every fixture file selected
    assert(selected(aspSceneFiles, aspPairname, scenePrefix,
      Flags(includePc = true, includeLogs = true, includeFltr = true)) === expect)
  }

  test("asp scene, dems only") {
    val expect = Set(
      s"$scenePrefix-DEM.tif", s"$scenePrefix-DEM.prj", s"$scenePrefix.geojson")
    assert(selected(aspSceneFiles, aspPairname, scenePrefix,
      Flags(demsOnly = true)) === expect)
  }

  test("asp scene, dems only + include fltr") {
    val expect = Set(
      s"$scenePrefix-DEM.tif", s"$scenePrefix-DEM.prj", s"$scenePrefix.geojson",
      s"${scenePrefix}_fltr-DEM.tif", s"${scenePrefix}_fltr-DEM.prj")
    assert(selected(aspSceneFiles, aspPairname, scenePrefix,
      Flags(demsOnly = true, includeFltr = true)) === expect)
  }

  test("setsm strip, prefix mismatch selects nothing (test_copy_setsm)") {
    // the reference's overlap prefix '..._1_8m' does not occur in the
    // fixture's '_seg1_8m' names, so nothing moves
    val prefix = s"SETSM_${setsmPairname}_1_8m"
    assert(selected(setsmStripFiles, setsmPairname, prefix, Flags()) === Set.empty)
  }

  test("setsm strip, exclude drg drops ortho") {
    val expect = Set(
      s"$setsmPrefix" + "_dem.tif", s"$setsmPrefix" + "_matchtag.tif",
      s"$setsmPrefix" + "_meta.txt")
    assert(selected(setsmStripFiles, setsmPairname, setsmPrefix,
      Flags(excludeDrg = true)) === expect)
  }

  test("setsm strip, dems only") {
    val expect = Set(s"$setsmPrefix" + "_dem.tif", s"$setsmPrefix" + "_meta.txt")
    assert(selected(setsmStripFiles, setsmPairname, setsmPrefix,
      Flags(demsOnly = true)) === expect)
  }

  test("tar only") {
    val files = Seq(s"$aspPairname.tar", s"$aspPairname-DEM.tif", "other.tar")
    assert(selected(files, aspPairname, aspPairname, Flags(tarOnly = true))
      === Set(s"$aspPairname.tar"))
  }

  test("completeness predicate (P2, lib/dem.py:211-245)") {
    val rows = Seq(
      // (dem sizes, req sizes, opt sizes, expected)
      (Seq[java.lang.Long](10L, null, 5L), Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](null), true),
      (Seq[java.lang.Long](null, null, null), Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](null), false), // no dem
      (Seq[java.lang.Long](0L, null, null), Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](null), false),  // empty dem
      (Seq[java.lang.Long](10L, null, null), Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](null), false), // missing req
      (Seq[java.lang.Long](10L, null, null), Seq[java.lang.Long](1L, 0L, 3L), Seq[java.lang.Long](null), false),   // empty req
      (Seq[java.lang.Long](10L, null, null), Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](0L), false),     // empty opt
      (Seq[java.lang.Long](10L, null, null), Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](7L), true))
      .toDF("dem", "req", "opt", "expected")
    val got = rows.withColumn("got",
      Inclusion.isComplete(col("dem"), col("req"), col("opt")))
    assert(got.filter(col("got") =!= col("expected")).count() === 0)
  }
}
