package graft

import java.nio.file.{Files, Paths}

/** Round-6 plan evidence: dump `.explain("formatted")` for the named queries
  * to `<outDir>/<query>_<suffix>.txt` — run once at the round-5 baseline
  * (suffix `before`) and once after the optimization (suffix `after`) so the
  * judge can check plan-shape claims (Exchange count, join strategy,
  * PushedFilters) against committed files.
  *
  * Usage: runMain graft.PlanDumpR06 <outDir> <suffix> <query> [query ...]
  * (empty query list = the round-6 touched set).
  */
object PlanDumpR06 {
  val TouchedSet: Seq[String] = Seq(
    "q_jaccard_pairs", "q_boilerplate", "q_corpus_select", "q_dedup_keep",
    "q_dedup_clusters", "q_stac_assembly", "q_stac_union", "q_item_fetch",
    "q_lsh_pairs_banded", "q_pip_shelve", "q_pip_left", "q_reg_parse",
    "q_reg_apply", "q_strip_meta_parse", "q_staging_dedup", "q_scene_all",
    "q_strip_master_all", "q_canonical_strip", "q_salted_join", "q_knn")

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = args.drop(1).headOption.getOrElse("after")
    val names = if (args.length > 2) args.drop(2).toSeq else TouchedSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Session.local(4, "graft-plandump-r06")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute once so AQE finalizes the plan
      df.write.mode("overwrite").format("noop").save()
      val formatted = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
      val txt = df.queryExecution.explainString(formatted) +
        "\n\n== Executed (AQE final) ==\n" +
        df.queryExecution.executedPlan.toString
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
