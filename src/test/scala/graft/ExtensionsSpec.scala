package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text access to the engine's expressions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_* functions are callable from SQL") {
    // extensions apply only when a session is BUILT; clear the shared test
    // session pointers so getOrCreate constructs a fresh session (reusing
    // the context), then restore
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT graft_cell_at(12.5d, 51.5d, 8) AS cell,
          |       graft_st_contains(array(0d,0d, 10d,0d, 10d,10d, 0d,10d), 5d, 5d) AS pip,
          |       graft_tile_id(-45.0d, 75.0d) AS tile,
          |       graft_dot_longs(array(1L,2L,3L), array(4L,5L,6L)) AS dot
          |""".stripMargin).collect()(0)
      assert(row.getLong(0) === graft.cells.Cells.cellAt(12.5, 51.5, 8))
      assert(row.getBoolean(1))
      assert(row.getString(2) === graft.cells.Cells.tileId(-45.0, 75.0))
      assert(row.getLong(3) === 32L)
    } finally {
      // do not stop (context shared with the other suites); restore pointers
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
