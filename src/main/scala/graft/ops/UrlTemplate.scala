package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P10 — generic URL template substitution: the reference's release-URL
  * placeholder replace chain (`<project>/<type>/<version>/<resolution>/
  * <group>/<dem_id>` against a user-supplied template,
  * /root/reference/index_setsm.py:1072-1091, package_setsm.py:530-547),
  * as a pure column expression (codegen `replace` chain, no UDF — a narrow
  * per-row map at 100 TB).
  */
object UrlTemplate {

  /** utils.PROJECTS (lib/utils.py:155-159): pretty project names used by the
    * FILEURL variant; the S3URL variant substitutes the raw key. */
  val Projects: Map[String, String] = Map(
    "arcticdem" -> "ArcticDEM",
    "rema" -> "REMA",
    "earthdem" -> "EarthDEM")

  /** dem_type_folder_lookup (index_setsm.py:83-86). */
  val DemTypeFolder: Map[String, String] = Map(
    "strip" -> "strips",
    "tile" -> "mosaics")

  /** The reference's substitution order (index_setsm.py:1072-1078). Order is
    * part of the spec: a value containing a later placeholder (e.g. a group
    * named `<dem_id>`) would itself be substituted by the remaining chain,
    * exactly as Python's sequential `.replace` does. */
  val PlaceholderOrder: Seq[String] = Seq(
    "project", "type", "version", "resolution", "group", "dem_id")

  /** `utils.PROJECTS[project]` as a column: unknown project key raises, the
    * KeyError the reference would throw — a silent NULL would concat away. */
  def prettyProject(project: Column): Column =
    Projects.foldLeft(Option.empty[Column]) {
      case (None, (k, v)) => Some(when(project === k, lit(v)))
      case (Some(e), (k, v)) => Some(e.when(project === k, lit(v)))
    }.get.otherwise(raise_error(concat(lit("unknown project: "), project)))

  /** Apply the `<placeholder>` replace chain of `values` to `template`, in
    * the reference's order. Placeholders absent from `values` pass through
    * verbatim (the reference only replaces the six it knows). */
  def urlTemplate(template: Column, values: Map[String, Column]): Column =
    PlaceholderOrder.filter(values.contains).foldLeft(template)((acc, k) =>
      replace(acc, lit(s"<$k>"), values(k)))

  /** FILEURL (index_setsm.py:1072-1080): pretty project + type folder. */
  def fileUrl(template: Column, project: Column, mode: String, version: Column,
              resolution: Column, group: Column, demId: Column): Column =
    urlTemplate(template, Map(
      "project" -> prettyProject(project),
      "type" -> lit(DemTypeFolder(mode)),
      "version" -> version,
      "resolution" -> resolution,
      "group" -> group,
      "dem_id" -> demId))

  /** S3URL (index_setsm.py:1082-1090): raw project key + type folder. */
  def s3Url(template: Column, project: Column, mode: String, version: Column,
            resolution: Column, group: Column, demId: Column): Column =
    urlTemplate(template, Map(
      "project" -> project,
      "type" -> lit(DemTypeFolder(mode)),
      "version" -> version,
      "resolution" -> resolution,
      "group" -> group,
      "dem_id" -> demId))
}
