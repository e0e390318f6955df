package graft

import org.apache.spark.sql.functions._
import graft.jobs.IndexJob
import graft.pages.Pages

/** Differential test (SURVEY.md §5(c), mirroring the reference's
  * meta.txt-vs-mdf equivalence, tests/test_index.py:642-700): the index
  * built from the `text` column and the index built from decoding the
  * `html` binary column must be field-for-field identical.
  */
class DifferentialSpec extends SparkSpec {

  test("fields from scene-meta format == fields from mdf format (two source formats)") {
    // the reference's strongest parser oracle: the same record rendered as
    // scene meta.txt and as an mdf IMD doc must parse to identical fields
    // (tests/test_index.py:642-700 asserts this for whole index runs)
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val k = col("o_orderkey")
    val satId = concat(lit("WV0"), (lit(1) + k % 3).cast("string"))
    val sunEl = (k % 90).cast("string")
    val metaText = concat(lit("satId="), satId, lit("\nmeanSunEl="), sunEl)
    val mdfText = concat(
      lit("BEGIN_GROUP = IMAGE_1\n  satId = \""), satId,
      lit("\";\n  meanSunEl = "), sunEl, lit(";\nEND_GROUP = IMAGE_1"))
    val fromMeta = o.select(k.as("okey"),
      graft.parse.MetaParsers.sceneMetaUdf(metaText).as("m"))
      .select(col("okey"), try_element_at(col("m"), lit("satId")).as("sat_id"),
        try_element_at(col("m"), lit("meanSunEl")).as("sun_el"))
    val fromMdf = o.select(k.as("okey"),
      graft.parse.MetaParsers.mdfUdf(mdfText).as("m"))
      .select(col("okey"), try_element_at(col("m"), lit("IMAGE_1_satId")).as("sat_id"),
        try_element_at(col("m"), lit("IMAGE_1_meanSunEl")).as("sun_el"))
    assert(fromMeta.exceptAll(fromMdf).count() === 0)
    assert(fromMdf.exceptAll(fromMeta).count() === 0)
    assert(fromMeta.count() > 0)
  }

  test("index rows from text == index rows from decoded html (two encodings)") {
    val fromText = Pages.fromDocuments(spark, Sf)
    // second encoding: reconstruct text by stripping the html wrapper
    val fromHtml = fromText
      .withColumn("text", regexp_replace(decode(col("html"), "UTF-8"),
        "^<html><body>|</body></html>$", ""))
    val a = IndexJob.indexRows(fromText).drop("index_date")
    val b = IndexJob.indexRows(fromHtml).drop("index_date")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() > 0)
  }
}
