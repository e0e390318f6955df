package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Schemas
import graft.pages.Ladder

/** Differential checks of the declared fixed-width schema families
  * (graft.model.Schemas ← /root/reference/lib/utils.py:226-455): declared
  * sizes, conform() producing the declared layer schema name-for-name and in
  * order, width validation driven off the declarations, and the release
  * long-name aliasing.
  */
class SchemasSpec extends SparkSpec {

  test("family sizes match the reference's declaration blocks") {
    assert(Schemas.scene.size === 35)          // lib/utils.py:333-380
    assert(Schemas.strip.size === 46)          // lib/utils.py:230-296
    assert(Schemas.stripRegistration.size === 6)
    assert(Schemas.stripRelease.size === 31)   // lib/utils.py:297-329
    assert(Schemas.tile.size === 12)           // lib/utils.py:383-404
    assert(Schemas.tileRegistration.size === 3)
    assert(Schemas.tileRelease.size === 11)    // lib/utils.py:406-418
    assert(Schemas.overlap.size === 26)        // lib/utils.py:420-455
    assert(Schemas.families.keySet ===
      Set("scene", "strip", "strip_release", "tile", "tile_release", "overlap"))
  }

  test("conform emits the declared scene layer: names, order, types, metadata") {
    val out = Schemas.conform(Ladder.scenes(spark, Sf), Schemas.scene)
    val declared = Schemas.structType(Schemas.scene)
    // name-for-name in declared order
    assert(out.schema.fields.map(_.name).toSeq ===
      declared.fields.map(_.name).toSeq)
    // declared types (present source columns cast, absent ones typed null)
    assert(out.schema.fields.map(_.dataType).toSeq ===
      declared.fields.map(_.dataType).toSeq)
    // width/precision ride along as field metadata
    val loc = out.schema("LOCATION")
    assert(loc.metadata.getLong("width") === 512L)
    val epsg = out.schema("EPSG")
    assert(epsg.metadata.getLong("width") === 8L &&
      epsg.metadata.getLong("precision") === 8L)
    // values survive the projection: source scenedemid → SCENEDEMID
    val row = out.select("SCENEDEMID", "STATUS", "IS_DSP").na.drop(Seq("SCENEDEMID")).head()
    assert(row.getString(0).startsWith("SC"))
    assert(row.isNullAt(1)) // absent attribute = typed NULL
  }

  test("width validation driven from the declared metadata (P6)") {
    import spark.implicits._
    // GEOCELL is declared width 10 (strip family): an 11-char value is skipped
    val df = Seq(("a", "n00e000"), ("b", "n00e000tooo")).toDF("DEM_ID", "GEOCELL")
    val kept = jobs.IndexJob.validateWidths(df, Schemas.strip).collect()
    assert(kept.map(_.getString(0)).toSeq === Seq("a"))
    // widthMap from a metadata-carrying StructType round-trips the FieldDefs
    assert(Schemas.widthMap(Schemas.structType(Schemas.strip)) ===
      Schemas.widthMap(Schemas.strip))
    // numeric widths are display metadata, not validation targets
    assert(!Schemas.widthMap(Schemas.strip).contains("EPSG"))
  }

  test("release projection renames to the declared public long names") {
    import spark.implicits._
    val df = Seq((0.5, "SD1", "2024-01-01 00:00:00")).toDF("VALID_DENS", "DEM_ID", "CR_DATE")
    val out = Schemas.toRelease(df, Schemas.stripRelease)
    val names = out.schema.fields.map(_.name).toSet
    assert(names.contains("VALID_AREA_MATCHTAG_DENSITY")) // VALID_DENS alias
    assert(names.contains("CREATIONDATE"))                // CR_DATE alias
    assert(!names.contains("VALID_DENS"))
    assert(names.contains("RMSE")) // un-aliased fields keep the short name
    assert(out.select("VALID_AREA_MATCHTAG_DENSITY").head().getDouble(0) === 0.5)
    // tile release: CR_DATE is OFTDate here, not DateTime (lib/utils.py:413)
    val tr = Schemas.structType(Schemas.tileRelease)
    assert(tr("CR_DATE").dataType === DateType)
    assert(Schemas.structType(Schemas.stripRelease)("CR_DATE").dataType === TimestampType)
  }

  test("conform is a narrow projection (no shuffle in the plan)") {
    val out = Schemas.conform(Ladder.scenes(spark, Sf), Schemas.scene)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
