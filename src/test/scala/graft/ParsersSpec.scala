package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.{MetaParsers, Versions}

class ParsersSpec extends AnyFunSuite {

  test("scene meta parser: key=value with Output Projection remainder (S7)") {
    val txt =
      """Image_1=WV02_x.tif
        |Scene_GSD=0.5
        |Output Projection='+proj=stere +lat_0=90 +lon_0=-45'
        |junk line without equals
        |""".stripMargin
    val m = MetaParsers.parseSceneMeta(txt)
    assert(m("Image_1") === "WV02_x.tif")
    assert(m("Output Projection") === "'+proj=stere +lat_0=90 +lon_0=-45'")
    assert(m.size === 3)
  }

  test("strip meta parser: header + alignment rows + per-scene blocks (S6)") {
    val txt =
      """Strip Metadata (v4.1)
        |Strip projection (proj4): '+proj=stere'
        |Strip Footprint Vertices
        |X: 1 2 3
        |Y: 4 5 6
        |
        |SC1_scene.tif 0.05 -0.01 0.02
        |SC2_scene.tif 0.10 0.03 -0.04
        |
        |Scene Metadata
        |
        |scene 1=SC1.tif
        |Image_1_Sun_Elevation=35.2
        |Output Projection='+proj=stere +k=1'
        |scene 2=SC2.tif
        |Image_1_Sun_Elevation=40.0
        |""".stripMargin
    val m = MetaParsers.parseStripMeta(txt)
    assert(m.header("s2s_version") === "4.1")
    assert(m.header("Strip projection (proj4)") === "'+proj=stere'")
    assert(m.header("X") === "1 2 3")
    assert(m.alignment("SC1_scene") === Seq("0.05", "-0.01", "0.02"))
    assert(m.alignment("SC2_scene") === Seq("0.10", "0.03", "-0.04"))
    assert(m.scenes.size === 2)
    assert(m.scenes(0)("scene_name") === "SC1")
    assert(m.scenes(0)("Image_1_Sun_Elevation") === "35.2")
    assert(m.scenes(0)("Output Projection") === "'+proj=stere +k=1'")
    assert(m.scenes(1)("scene_name") === "SC2")
    // multi-separator lines are SKIPPED like the reference's ValueError path
    // (dem.py:1503-1506 header, 1527-1530 scenes) — not first-separator-split
    val m2 = MetaParsers.parseStripMeta(
      "A: B: C\nGood: v\nScene Metadata\nscene 1=S.tif\nbad=a=b\nok=1\n")
    assert(!m2.header.contains("A"))
    assert(m2.header("Good") === "v")
    assert(!m2.scenes(0).contains("bad"))
    assert(m2.scenes(0)("ok") === "1")
    // a 'Strip Metadata' line that defeats the anchored version regex raises
    // (dem.py:1516-1520); a versionless title is fine (group = None)
    intercept[IllegalArgumentException] {
      MetaParsers.parseStripMeta("old Strip Metadata\n")
    }
    assert(!MetaParsers.parseStripMeta("Strip Metadata\n").header.contains("s2s_version"))
  }

  test("mdf parser: BEGIN_GROUP/END_GROUP nesting to underscore paths (S8)") {
    val txt =
      """BEGIN_GROUP = BAND_C
        |  ULLon = -55.1;
        |  BEGIN_GROUP = SUB
        |    val = "quoted";
        |  END_GROUP = SUB
        |END_GROUP = BAND_C
        |version = "29.1";
        |""".stripMargin
    val m = MetaParsers.parseMdf(txt)
    assert(m("BAND_C_ULLon") === "-55.1")
    assert(m("BAND_C_SUB_val") === "quoted")
    assert(m("version") === "29.1")
  }

  test("reg.txt parser (S9)") {
    val txt =
      """Registration Dataset: x
        |Translation Vector (dz,dx,dy)(m)= -0.58, 1.2, -3.4
        |# GCPs=123
        |Mean Vertical Residual (m)=0.04
        |""".stripMargin
    val m = MetaParsers.parseReg(txt)
    assert(m("dz") === -0.58 && m("dx") === 1.2 && m("dy") === -3.4)
    assert(m("num_gcps") === 123.0)
    assert(m("mean_resid_z") === 0.04)
  }

  test("filename grammars match the reference's fixture ids (P1)") {
    val sceneId = "WV02_20190419_103001008C4B0400_103001008EC59A00_" +
      "504480338050_01_P001_504480340100_01_P001_2_meta.txt"
    val m = MetaParsers.Patterns.scene.findFirstMatchIn(sceneId)
    assert(m.isDefined)
    assert(m.get.group("sensor") === "WV02")
    assert(m.get.group("catid1") === "103001008C4B0400")
    assert(m.get.group("res") === "2")

    val stripFile = "SETSM_s2s041_WV01_20140402_102001002C6AFA00_102001002D8B3100_2m_lsf_seg1_dem.tif"
    val sm = MetaParsers.Patterns.strip.findFirstMatchIn(stripFile)
    assert(sm.isDefined)
    assert(sm.get.group("relversion") === "s2s041")
    assert(sm.get.group("pairname") === "WV01_20140402_102001002C6AFA00_102001002D8B3100")
    assert(sm.get.group("res") === "2m")
    assert(sm.get.group("partnum").equalsIgnoreCase("seg1"))

    for (t <- Seq("33_11_2m_v3.0_dem.tif", "59_57_1_1_2m_v4.1_dem.tif",
                  "utm34n_60_06_2_2_2m_v4.1_dem.tif")) {
      assert(MetaParsers.Patterns.tile.findFirstMatchIn(t).isDefined, t)
    }
    val tm = MetaParsers.Patterns.tile.findFirstMatchIn("utm34n_60_06_2_2_2m_v4.1_dem.tif").get
    assert(tm.group("scheme") === "utm34n")
    assert(tm.group("tile") === "60_06")
    assert(tm.group("subtile") === "2_2")
  }

  test("asp_strip_pattern group-for-group (lib/dem.py:99-104, AspDem :1652-1663)") {
    // with resolution suffix (optional `_?` + `res` groups both present)
    val withRes = "WV01_20140402_102001002C6AFA00_102001002D8B3100_8m-dem.tif"
    val m = MetaParsers.Patterns.asp.findFirstMatchIn(withRes)
    assert(m.isDefined)
    assert(m.get.group("pairname") === "WV01_20140402_102001002C6AFA00_102001002D8B3100")
    assert(m.get.group("sensor") === "WV01")
    assert(m.get.group("timestamp") === "20140402")
    assert(m.get.group("catid1") === "102001002C6AFA00")
    assert(m.get.group("catid2") === "102001002D8B3100")
    assert(m.get.group("res") === "8m")

    // without resolution (AspDem's plain `<pairname>-dem.tif` form)
    val noRes = "GE01_20200101_0000000000000001_000000000000000A-dem.jpg"
    val n = MetaParsers.Patterns.asp.findFirstMatchIn(noRes)
    assert(n.isDefined)
    assert(n.get.group("sensor") === "GE01")
    assert(n.get.group("res") === null)

    // rejects: 15-char catid, non-dem suffix, setsm strip name
    for (bad <- Seq(
      "WV01_20140402_102001002C6AFA0_102001002D8B3100_8m-dem.tif",
      "WV01_20140402_102001002C6AFA00_102001002D8B3100_8m-ortho.tif",
      "SETSM_s2s041_WV01_20140402_102001002C6AFA00_102001002D8B3100_2m_lsf_seg1_dem.tif"))
      assert(MetaParsers.Patterns.asp.findFirstMatchIn(bad).isEmpty, bad)
  }

  test("xtrack sensor detection (lib/dem.py:123,268)") {
    assert(MetaParsers.Patterns.isXtrack("W1W2"))
    assert(MetaParsers.Patterns.isXtrack("g1q2"))
    assert(!MetaParsers.Patterns.isXtrack("WV02"))
  }

  test("semver2verkey zero-padding (lib/dem.py:2287-2295)") {
    assert(Versions.semverToVerkey("SETSM 4.3.11") === "v040311")
    assert(Versions.semverToVerkey("4.2") === "v040200")
    assert(Versions.semverToVerkey("3") === "v030000")
    // string order == semver order
    assert(Versions.semverToVerkey("4.10.0") > Versions.semverToVerkey("4.2.9"))
  }

  test("s2s release mapping (lib/dem.py:1252-1264)") {
    assert(Versions.s2sToRelease("4.1") === "s2s041")
    assert(Versions.s2sToRelease("4") === "s2s040")
    assert(Versions.s2sToRelease("10.3") === "s2s103")
    intercept[IllegalArgumentException](Versions.s2sToRelease("4.1.2"))
  }
}
