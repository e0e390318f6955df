package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cells.Cells
import graft.ops.PipJoin
import graft.pages.Pages

/** North-rule scaling evidence (BASELINE.json): the same spatial-join +
  * tiling job at two parallelism levels (local[8] vs local[32] — the sandbox
  * stand-in for N vs 4N executors) on identical input; reports rows/sec +
  * tiles/sec at both and efficiency = throughput(32) / (4 × throughput(8)).
  *
  * Methodology: the input is materialized once (setup, untimed) as a
  * many-file parquet table — sf0.1 ships as a single-rowgroup file, i.e. one
  * scan split, which is a fixture artifact a 100 TB table doesn't have.
  * Each level runs the job 3×; the minimum is reported (the sandbox shares
  * the host with bursty neighbors, so min = least-interference estimate).
  */
object ScalingBench {

  /** Materialize the replicated geocoded page table (setup, untimed). */
  def materialize(spark: SparkSession, sfDir: String, rep: Int, path: String): Long = {
    val li = Pages.fromLineitem(spark, sfDir).select("page_id").repartition(128)
    val pages = li.crossJoin(spark.range(0, rep).toDF("rep"))
      .select((col("page_id") * rep + col("rep")).as("page_id"))
    val h1 = (col("page_id") * 48271L + 11L) % 2147483647L
    val h2 = (h1 * 48271L + 17L) % 2147483647L
    val geo = pages
      .withColumn("lonm", (h1 % 360000L - 180000L).cast("long"))
      .withColumn("latm", (h2 % 170000L - 85000L).cast("long"))
      .withColumn("lon", col("lonm") / 1000.0)
      .withColumn("lat", col("latm") / 1000.0)
    geo.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).count()
  }

  /** Headline spatial job over the materialized table: PIP shelve into
    * tiles → per-tile aggregate.
    */
  def headlinePlan(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val geo = spark.read.parquet(path)
    val tiles = Pages.tiles(spark).withColumn("ring",
      PipJoin.rectRing(col("x0"), col("y0"), col("x1"), col("y1")))
    val shelved = PipJoin.shelve(geo, tiles, "page_id", "lon", "lat", "tile_name", "ring")
      .withColumn("geocell", Cells.geocellCol(col("lon"), col("lat")))
    shelved.groupBy("tile_name")
      .agg(count(lit(1)).as("n"), countDistinct(col("geocell")).as("n_cells"))
  }

  def headline(spark: SparkSession, path: String): Long =
    headlinePlan(spark, path).count()

  /** Compute-bound variant: adds the real polar-stereo/UTM tile projection
    * per row (trig-heavy). The simple pipeline is DRAM-bandwidth-bound on a
    * single socket — a limit a multi-node cluster does not share (each
    * executor brings its own memory channels) — so this variant shows the
    * engine's scaling when compute dominates, as it does for the reference's
    * actual tiling math.
    */
  def headlineComputePlan(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val geo = spark.read.parquet(path)
    val tiles = Pages.tiles(spark).withColumn("ring",
      PipJoin.rectRing(col("x0"), col("y0"), col("x1"), col("y1")))
    val shelved = PipJoin.shelve(geo, tiles, "page_id", "lon", "lat", "tile_name", "ring")
    graft.ops.Tiling.withTileId(shelved)
      .groupBy("tile_name")
      .agg(count(lit(1)).as("n"), countDistinct(col("tile_id")).as("n_tiles"))
  }

  def timeAt(cores: Int, path: String, compute: Boolean = false): (Double, Long) = {
    val spark = Session.local(cores, s"graft-scaling-$cores")
    try {
      // plan once (a production job plans once per submit); time executions
      val df = if (compute) headlineComputePlan(spark, path) else headlinePlan(spark, path)
      df.count() // JIT + codegen warmup
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val tiles = df.count()
        ((System.nanoTime() - t0) / 1e9, tiles)
      }
      System.err.println(f"[scaling] cores=$cores raw=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      runs.minBy(_._1)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    val path = s"/tmp/graft_scaling_pages_$rep"
    val setup = Session.local(32, "graft-scaling-setup")
    // reuse an existing materialization (identical input is the point); sync
    // so dirty page-cache flushes don't bleed into the first timed run
    val rows = try {
      if (new java.io.File(s"$path/_SUCCESS").exists())
        setup.read.parquet(path).count()
      else materialize(setup, sfDir, rep, path)
    } finally setup.stop()
    Runtime.getRuntime.exec(Array("sync")).waitFor()
    val compute = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("compute")
    val (t8, tiles) = timeAt(8, path, compute)
    val (t32, _) = timeAt(32, path, compute)
    val thr8 = rows / t8
    val thr32 = rows / t32
    val eff = thr32 / (4.0 * thr8)
    val mode = if (compute) "compute" else "simple"
    println(f"""{"metric":"scaling","mode":"$mode","sf":"$sfDir","rows":$rows,"tiles":$tiles,"t8_sec":$t8%.3f,"t32_sec":$t32%.3f,"rows_per_sec_8":$thr8%.0f,"rows_per_sec_32":$thr32%.0f,"efficiency":$eff%.3f}""")
    println(f"| $mode $sfDir x$rep | $rows | $tiles | $t8%.2f | $t32%.2f | $thr8%.0f | $thr32%.0f | $eff%.3f |")
  }
}
