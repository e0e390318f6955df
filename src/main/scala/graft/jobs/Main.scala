package graft.jobs

import org.apache.spark.sql.functions._
import graft.{Session, SparkEntry}
import graft.ops.{KnnJoin, PipJoin, StacDocs, Tiling}
import graft.pages.Pages
import graft.table.Icelite

/** spark-submit entry points (north rule: "jobs run via spark-submit ...
  * checkpoint to snapshots ... resumable"). Each subcommand reads the driver
  * tables under `sfDir` and commits its output as an Icelite snapshot under
  * `outRoot/<job>`, so a re-run resumes/verifies rather than recomputing.
  *
  * Usage: spark-submit --class graft.jobs.Main <jar> <job> <sfDir> <outRoot>
  *   job ∈ index | shelve | tile | knn | stacdocs | stacmeta
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: <index|shelve|tile|knn|stacdocs|stacmeta> <sfDir> <outRoot>")
    val Array(job, sfDir, outRoot) = args.take(3)
    val spark = Session.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, s"graft-$job")
    try {
      job match {
        case "index" =>
          val (rows, diff) = IndexJob.run(spark, sfDir, s"$outRoot/index_job")
          println(s"""{"job":"index","rows":$rows,"check_diff":$diff}""")
        case "shelve" =>
          val pts = Pages.fromDocuments(spark, sfDir)
          val tiles = Pages.tiles(spark).withColumn("ring",
            PipJoin.rectRing(col("x0"), col("y0"), col("x1"), col("y1")))
          // J2 skip metrics surfaced in the job result (the reference warns
          // and counts 0-match / multi-match skips, lib/utils.py:694-702)
          val obs = org.apache.spark.sql.Observation("shelve_job_metrics")
          val shelved = PipJoin.shelve(pts, tiles, "doc_id", "lon", "lat",
            "tile_name", "ring", observer = Some(obs))
          val snap = Icelite.commit(spark, shelved, s"$outRoot/shelved", s"shelve:$sfDir")
          val m = obs.get
          println(s"""{"job":"shelve","rows":${snap.rowCount},""" +
            s""""skip_nomatch":${m("skip_nomatch")},"skip_multi":${m("skip_multi")}}""")
        case "tile" =>
          val stats = Tiling.coverageStats(Pages.fromDocuments(spark, sfDir))
          val snap = Icelite.commit(spark, stats, s"$outRoot/tile_stats", s"tile:$sfDir")
          println(s"""{"job":"tile","tiles":${snap.rowCount}}""")
        case "knn" =>
          val pts = Pages.fromDocuments(spark, sfDir)
          // density-auto-picked level (override: GRAFT_KNN_LEVEL)
          val knn = KnnJoin.knnAuto(spark, pts, pts, "doc_id", "doc_id", k = 5)
          val snap = Icelite.commit(spark, knn, s"$outRoot/knn", s"knn:$sfDir")
          println(s"""{"job":"knn","rows":${snap.rowCount}}""")
        case "stacdocs" =>
          val docs = StacDocs.itemDocs(Pages.fromDocuments(spark, sfDir))
          val snap = Icelite.commit(spark, docs, s"$outRoot/stac_items", s"stac:$sfDir")
          val tree = StacDocs.treeRollup(Pages.fromDocuments(spark, sfDir))
          Icelite.commit(spark, tree, s"$outRoot/stac_tree", s"stac:$sfDir")
          println(s"""{"job":"stacdocs","items":${snap.rowCount}}""")
        case "stacmeta" =>
          // extract_stac_metadata.py's flow: batched asset-info rows UPSERTED
          // into the metadata table (INSERT ... ON CONFLICT DO UPDATE →
          // Icelite.merge on the (collection, item_id, asset_key) PK).
          // Re-running the job converges instead of duplicating.
          val assets = graft.pages.Ladder.assetInfo(spark, sfDir)
          val snap = Icelite.merge(spark, assets, s"$outRoot/stac_asset_info",
            Seq("collection", "item_id", "asset_key"), s"stacmeta:$sfDir")
          println(s"""{"job":"stacmeta","rows":${snap.rowCount},"snapshot":${snap.id}}""")
        case other => sys.error(s"unknown job $other")
      }
    } finally spark.stop()
  }
}
