package graft.cells

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Axial-coordinate hexagonal grid over the equirectangular lon/lat plane —
  * the engine's H3-analog ring-expandable cell scheme (`cell_hex`).
  *
  * DIVERGENCE from canonical H3 (documented per SURVEY.md §7.0): H3's
  * icosahedral aperture-7 wire format is out of scope; kNN-style search only
  * needs (a) point→cell assignment where the cell center is the nearest
  * center (cube rounding gives exactly that), and (b) ring-k adjacency —
  * both provided here. Pointy-top hexes, axial (q, r) coordinates packed
  * into a long.
  */
object HexGrid {

  private val Sqrt3 = math.sqrt(3.0)

  /** Round half away from zero (SQL ROUND semantics: -0.5 → -1). Scala's
    * `math.round` rounds half toward +∞ (-0.5 → 0), which diverges from the
    * column/oracle path on exact tie points — reachable despite the
    * irrational factors (e.g. qf = -0.5 at lon=0, lat=3, s=2 because IEEE
    * (1.0/3.0)*3.0 == 1.0), so the scalar path must match SQL exactly.
    */
  private def roundHalfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Axial coords of the hex containing (x, y) for hex size (circumradius)
    * `s` — cube rounding, so the assigned hex center is the nearest center.
    */
  def axialAt(x: Double, y: Double, s: Double): (Long, Long) = {
    val qf = (Sqrt3 / 3.0 * x - 1.0 / 3.0 * y) / s
    val rf = (2.0 / 3.0 * y) / s
    // cube rounding (half-away-from-zero, matching hexCol / the SQL oracle)
    val xf = qf; val zf = rf; val yf = -xf - zf
    var rx = roundHalfAway(xf); var ry = roundHalfAway(yf); var rz = roundHalfAway(zf)
    val dx = math.abs(rx - xf); val dy = math.abs(ry - yf); val dz = math.abs(rz - zf)
    if (dx > dy && dx > dz) rx = -ry - rz
    else if (dy > dz) ry = -rx - rz
    else rz = -rx - ry
    (rx, rz)
  }

  /** Center of the hex at axial (q, r). */
  def center(q: Long, r: Long, s: Double): (Double, Double) =
    (s * (Sqrt3 * q + Sqrt3 / 2.0 * r), s * 1.5 * r)

  /** Pack axial coords into a single long id (q, r ∈ [-2^30, 2^30)). */
  def hexId(q: Long, r: Long): Long = ((q + (1L << 30)) << 32) | (r + (1L << 30))
  def hexQR(id: Long): (Long, Long) = ((id >> 32) - (1L << 30), (id & 0xFFFFFFFFL) - (1L << 30))

  def hexAt(x: Double, y: Double, s: Double): Long = {
    val (q, r) = axialAt(x, y, s)
    hexId(q, r)
  }

  /** Pure-column form of [[hexAt]] — the scalar math is plain arithmetic so
    * no UDF is needed (encoder-serialization-free, codegen-fused). IEEE op
    * order mirrors [[axialAt]] and the DuckDB oracle exactly. Exact-half
    * rounding ties ARE reachable (see [[roundHalfAway]]); all three paths
    * (Scala, Spark `round`, DuckDB `round`) round half away from zero.
    */
  def hexCol(lon: Column, lat: Column, s: Double): Column = {
    val qf = (lit(Sqrt3) / 3.0 * lon - lit(1.0) / 3.0 * lat) / s
    val rf = (lit(2.0) / 3.0 * lat) / s
    val yf = -qf - rf
    val rx0 = round(qf).cast("long")
    val ry0 = round(yf).cast("long")
    val rz0 = round(rf).cast("long")
    val dx = abs(rx0 - qf); val dy = abs(ry0 - yf); val dz = abs(rz0 - rf)
    val cond1 = dx > dy && dx > dz
    val rx = when(cond1, -ry0 - rz0).otherwise(rx0)
    val rz = when(!cond1 && !(dy > dz), -rx0 - ry0).otherwise(rz0)
    (rx + (1L << 30)) * (1L << 32) + (rz + (1L << 30))
  }

  private val Directions = Array((1L, 0L), (1L, -1L), (0L, -1L), (-1L, 0L), (-1L, 1L), (0L, 1L))

  /** Hexes at exactly hex-grid distance k (6k cells for k >= 1). */
  def ringK(id: Long, k: Int): Array[Long] = {
    if (k == 0) return Array(id)
    val (cq, cr) = hexQR(id)
    val out = new Array[Long](6 * k)
    var q = cq + Directions(4)._1 * k
    var r = cr + Directions(4)._2 * k
    var idx = 0
    var d = 0
    while (d < 6) {
      var step = 0
      while (step < k) {
        out(idx) = hexId(q, r); idx += 1
        q += Directions(d)._1; r += Directions(d)._2
        step += 1
      }
      d += 1
    }
    out
  }

  def diskK(id: Long, k: Int): Array[Long] =
    (0 to k).flatMap(ringK(id, _)).toArray

  /** Hex-grid (cube) distance between two cells. */
  def hexDistance(a: Long, b: Long): Long = {
    val (aq, ar) = hexQR(a); val (bq, br) = hexQR(b)
    (math.abs(aq - bq) + math.abs(ar - br) + math.abs(aq + ar - bq - br)) / 2
  }
}
