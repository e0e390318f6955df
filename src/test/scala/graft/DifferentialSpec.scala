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
