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

  /** J9 — the real STAC item assembly: multi-way composite-key left joins
    * mirroring /root/reference/sql/create_view_stac_strip_item.sql:2-30,
    * 134-158, 307-319:
    *
    *   canonical_strips (release rows, license='public', collection =
    *     '{project}-strips-s2s041-2m', item_id = dem_id)
    *   ⟕ strip_dem_all  USING (dem_id, stripdemid)   -- NOT dem_id alone:
    *     dem_id is not unique in strip_dem_all (the view's own NOTE)
    *   ⟕ asset-info filtered asset_key='dem'  USING (collection, item_id)
    *   ⟕ href parts (links CTE)               USING (collection, item_id)
    *
    * The doc holds only strings/longs so Spark's and DuckDB's to_json
    * byte-agree. All joins are composite-key equi-joins; none is broadcast —
    * every side has item cardinality at scale, so they stay shuffle hash
    * joins on the same key.
    */
  def itemAssembly(release: DataFrame, stripAll: DataFrame,
                   assetInfo: DataFrame): DataFrame = {
    val canonical = release.filter(col("license") === "public")
      .select(concat(col("project"), lit("-strips-s2s041-2m")).as("collection"),
        col("dem_id").as("item_id"), col("dem_id"), col("stripdemid"))
    // href_parts (the reference's links CTE chain): link paths need the
    // geocell from strip_dem_all. The reference materializes href_parts as
    // its own canonical⟕strip_dem_all join and joins it BACK on the
    // (collection, item_id) key because its links/assets CTEs reuse the
    // derived fields many times; here self_href is consumed exactly once, so
    // it computes INLINE from the main join's own geocell — same rows (the
    // join-back key (collection, item_id) ⇐ the unique dem_id of the release
    // row, per the view's own NOTE, re-attaches precisely the geocell this
    // row already carries) and one less shuffle join, with the strip_dem_all
    // subtree (scan + anti-join + union) evaluated once instead of twice.
    // Round 6 (guide §2.4): before this, q_stac_assembly planned 2
    // evaluations of stripAll and 4 joins; oracle hash unchanged.
    val selfHref = concat(concat_ws("/",
      lit("https://opendata.example.org"),
      element_at(split(col("collection"), "-"), 1), // domain
      element_at(split(col("collection"), "-"), 2), // kind
      element_at(split(col("collection"), "-"), 3), // release version
      element_at(split(col("collection"), "-"), 4), // resolution
      col("geocell"), col("item_id")), lit(".json"))
    val primaryAsset = assetInfo.filter(col("asset_key") === "dem")
      .select(col("collection"), col("item_id"), col("gsd"), col("proj_code"))
    canonical
      .join(stripAll, Seq("dem_id", "stripdemid"), "left")
      .join(primaryAsset, Seq("collection", "item_id"), "left")
      .withColumn("self_href", selfHref)
      .select(col("collection"), col("item_id"),
        to_json(struct(
          col("item_id").as("id"),
          lit("Feature").as("type"),
          col("collection").as("collection"),
          col("geocell").as("geocell"),
          col("pairname").as("pairname"),
          col("stripdemid").as("stripdemid"),
          col("s2s_ver").as("s2s_version"),
          col("status").as("status"),
          coalesce(col("gsd"), lit(-1L)).as("gsd"),
          coalesce(col("proj_code"), lit("")).as("proj_code"),
          col("self_href").as("self_href"))).as("doc"))
  }

  /** Mosaic-analog items (one per geocell) with the same output schema as
    * [[itemAssembly]] — the second branch of the U3 static-item union
    * (create_mat_view_stac_static_item.sql:1-6).
    */
  def mosaicDocs(pages: DataFrame, domain: String = "webdem"): DataFrame = {
    val geocell = Cells.geocellCol(col("lon"), col("lat"))
    pages.withColumn("geocell", geocell)
      .groupBy("geocell")
      .agg(count(lit(1)).as("n_items"), min(col("lonm")).as("x0"))
      .select(lit(s"$domain-mosaics-v4.1-2m").as("collection"),
        col("geocell").as("item_id"),
        to_json(struct(
          col("geocell").as("id"),
          lit("Feature").as("type"),
          lit(s"$domain-mosaics-v4.1-2m").as("collection"),
          col("n_items").as("n_items"),
          col("x0").as("x0"))).as("doc"))
  }

  /** U3 — stac_static_item: strip items UNION ALL mosaic items. */
  def staticItems(stripItems: DataFrame, mosaicItems: DataFrame): DataFrame =
    stripItems.unionByName(mosaicItems)

  /** O1 + O2 — deterministic catalog children: per geocell catalog, the
    * sorted distinct child item list (build_stac_items.py:114 /
    * build_stac_tree.py:110 sort order), capped to the first `cap` entries.
    */
  def orderedChildren(pages: DataFrame, cap: Int = 5): DataFrame = {
    val geocell = Cells.geocellCol(col("lon"), col("lat"))
    pages.withColumn("geocell", geocell)
      .groupBy("geocell")
      .agg(count(lit(1)).as("n_children"),
        array_join(slice(array_sort(collect_set(col("url"))), 1, cap), ",")
          .as("first_children"))
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
