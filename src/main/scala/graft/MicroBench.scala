package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.cells.Cells
import graft.pages.Pages

/** Focused A/B micro-benchmarks (same interleaved-minimum methodology as
  * ScalingBench — single runs on this host vary up to 3×, so each form runs
  * `Rounds` times alternating and the MINIMUM is reported).
  *
  * Current subject: the geocell kernel expression vs the old concat/lpad
  * column tree in an aggregation key (round-2 VERDICT asked for a re-measure
  * after q_geocell_counts / q_li_geocell_counts moved together right after
  * the kernel switch).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "4").toInt
    val spark = Session.local(cpus, "graft-micro")

    def pages = Pages.fromLineitem(spark, sfDir)
    def timeOf(geocell: Column): Double = {
      val t0 = System.nanoTime()
      pages.withColumn("geocell", geocell)
        .groupBy("geocell").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // one untimed warmup per form (codegen/JIT is charged to neither)
    timeOf(Cells.geocellCol(col("lon"), col("lat")))
    timeOf(Cells.geocellColumnForm(col("lon"), col("lat")))
    val times = (1 to rounds).map { _ =>
      val k = timeOf(Cells.geocellCol(col("lon"), col("lat")))
      val c = timeOf(Cells.geocellColumnForm(col("lon"), col("lat")))
      (k, c)
    }
    val kMin = times.map(_._1).min
    val cMin = times.map(_._2).min
    val pairs = times.map { case (k, c) => f"[$k%.3f,$c%.3f]" }.mkString("[", ",", "]")
    println(s"""{"metric":"geocell_ab","kernel_min":$kMin,"column_min":$cMin,""" +
      s""""rounds":$rounds,"pairs":$pairs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
