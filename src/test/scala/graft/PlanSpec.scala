package graft

import org.apache.spark.sql.functions._
import graft.pages.Pages
import graft.ops.PipJoin

/** Physical-plan assertions: the optimizations the engine is designed
  * around must actually appear in the plan (SURVEY.md §4), so a regression
  * that silently de-optimizes a hot path fails the build.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan prunes columns (ReadSchema) for narrow projections") {
    val df = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .filter(col("l_quantity") > 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey") && plan.contains("l_quantity"))
    assert(!plan.contains("l_extendedprice"), "untouched columns must not be read")
  }

  test("filters push down to the parquet scan (PushedFilters)") {
    val df = spark.read.parquet(s"$Sf/lineitem.parquet")
      .filter(col("l_quantity") > 10)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"expected pushed filter in:\n$scan")
  }

  test("PIP join broadcasts the polygon side") {
    val pts = Pages.fromDocuments(spark, Sf)
    val tiles = Pages.tiles(spark).withColumn("ring",
      PipJoin.rectRing(col("x0"), col("y0"), col("x1"), col("y1")))
    val joined = PipJoin.join(pts, tiles, "doc_id", "lon", "lat", "tile_name", "ring")
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"PIP join must be a broadcast hash join, got:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("region join (J1) broadcasts the dim side") {
    val q = SparkEntry.queries("q_region_join")(spark, Sf)
    assert(planOf(q).contains("BroadcastHashJoin"))
  }

  test("geocell aggregation is a partial+final hash aggregate over one exchange") {
    val q = SparkEntry.queries("q_geocell_counts")(spark, Sf)
    val plan = planOf(q)
    // AQE wraps the plan (isFinalPlan=false before execution); assert the
    // partial-aggregate structure instead of the codegen wrapper
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial_count"), "map-side partial aggregation expected")
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("canonicalization windows use a single shuffle per stage (no joins)") {
    val q = SparkEntry.queries("q_canonical_scene")(spark, Sf)
    val plan = planOf(q)
    assert(!plan.contains("Join"), "window form must not reintroduce self-joins")
  }
}
