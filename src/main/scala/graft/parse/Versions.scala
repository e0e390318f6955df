package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Version-key encodings whose exact formats the canonicalization rules
  * depend on (SURVEY.md §7.4 "non-standard semantics to preserve exactly").
  */
object Versions {

  /** semver2verkey (/root/reference/lib/dem.py:2287-2295): 'SETSM 4.3.11' /
    * '4.3' → 'v040311' / 'v040300'. Zero-padded so STRING max == semver max.
    */
  def semverToVerkey(semver: String): String = {
    val parts = semver.replace("SETSM ", "").split("\\.")
    val vl = Array(0, 0, 0)
    parts.take(3).zipWithIndex.foreach { case (p, i) => vl(i) = p.toInt }
    f"v${vl(0)}%02d${vl(1)}%02d${vl(2)}%02d"
  }

  /** Pad to 2 but never truncate — Spark `lpad` truncates strings longer
    * than the target, whereas the reference's `{:02d}` only pads, so a
    * 3-digit component must pass through unchanged.
    */
  private def pad2(c: Column): Column =
    when(length(c) >= 2, c).otherwise(lpad(c, 2, "0"))

  /** Column form of [[semverToVerkey]] — pure expressions, codegen-friendly. */
  def verkeyCol(semver: Column): Column = {
    val clean = regexp_replace(semver, "^SETSM ", "")
    val p = split(clean, "\\.")
    concat(lit("v"),
      pad2(coalesce(try_element_at(p, lit(1)), lit("0"))),
      pad2(coalesce(try_element_at(p, lit(2)), lit("0"))),
      pad2(coalesce(try_element_at(p, lit(3)), lit("0"))))
  }

  /** s2s → release version (/root/reference/lib/dem.py:1252-1264):
    * '4.1' → 's2s041'; major ≤ 99, minor ≤ 9, missing minor = 0.
    */
  def s2sToRelease(s2s: String): String = {
    val (maj, min) = s2s.split("\\.") match {
      case Array(a) => (a, "0")
      case Array(a, b) => (a, b)
      case _ => throw new IllegalArgumentException(
        s"s2s version breaks '[major].[minor]' format: $s2s")
    }
    require(maj.toInt <= 99 && min.toInt <= 9,
      s"s2s version out of range (major<=99, minor<=9): $s2s")
    f"s2s${maj.toInt}%02d$min"
  }

  def s2sReleaseCol(s2s: Column): Column = {
    val p = split(s2s, "\\.")
    concat(lit("s2s"),
      pad2(try_element_at(p, lit(1))),
      coalesce(try_element_at(p, lit(2)), lit("0")))
  }
}
