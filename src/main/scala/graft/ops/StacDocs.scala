package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.cells.Cells

/** STAC-analog static catalog assembly (SURVEY.md §2.4 A12, §2.3 J9,
  * /root/reference/build_stac_items.py + build_stac_tree.py + lib/stac.py).
  *
  * Items live at `domain/kind/release/res/geocell/item.json` (the key scheme
  * of lib/stac.py:84-105); the catalog tree rolls bbox/count extents up the
  * geocell → resolution → release → kind → domain levels — a ROLLUP
  * aggregation (build_stac_tree.py:206-258).
  */
object StacDocs {

  /** Per-item JSON document over geocoded pages. Only string/integer fields
    * go into the JSON so the doc is byte-reproducible across engines.
    */
  def itemDocs(pages: DataFrame, domain: String = "webdem",
               kind: String = "strips", release: String = "s2s041",
               res: String = "2m"): DataFrame = {
    val geocell = Cells.geocellCol(col("lon"), col("lat"))
    pages.select(
      col("doc_id"),
      concat_ws("/", lit(domain), lit(kind), lit(release), lit(res),
        geocell, concat(col("doc_id").cast("string"), lit(".json"))).as("item_key"),
      to_json(struct(
        col("url").as("id"),
        lit("Feature").as("type"),
        geocell.as("geocell"),
        col("lonm").as("lonm"),
        col("latm").as("latm"),
        col("lang").as("lang"))).as("doc"))
  }

  /** Catalog tree extents: hierarchical rollup of bbox + item count over the
    * full key hierarchy (A12; build_stac_tree.py merge_bbox semantics =
    * elementwise min/max).
    */
  def treeRollup(pages: DataFrame, domain: String = "webdem",
                 kind: String = "strips", release: String = "s2s041",
                 res: String = "2m"): DataFrame =
    pages
      .withColumn("domain", lit(domain)).withColumn("kind", lit(kind))
      .withColumn("release", lit(release)).withColumn("res", lit(res))
      .withColumn("geocell", Cells.geocellCol(col("lon"), col("lat")))
      .rollup("domain", "kind", "release", "res", "geocell")
      .agg(count(lit(1)).as("n_items"),
        min(col("lonm")).as("x0"), min(col("latm")).as("y0"),
        max(col("lonm")).as("x1"), max(col("latm")).as("y1"))
}
