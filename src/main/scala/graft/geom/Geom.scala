package graft.geom

/** From-scratch planar geometry kernel (no JTS/Sedona jar in /opt/spark/jars).
  *
  * Semantics reproduce the reference's OGR usage:
  *   - ring area / centroid: standard shoelace (OGR `Centroid`, reference
  *     /root/reference/lib/dem.py:738,853)
  *   - point-in-polygon: ray casting, boundary counts as inside (OGR
  *     `Intersects` between a point and a polygon is true on the boundary;
  *     reference /root/reference/lib/utils.py:690)
  *   - antimeridian split: same point-binning + y-interpolation algorithm as
  *     /root/reference/lib/utils.py:755-838 (`getWrappedGeometry`)
  *
  * Rings are `Array[Double]` of interleaved x0,y0,x1,y1,... with the first
  * point NOT repeated at the end (closure is implicit). This flat layout maps
  * 1:1 onto Spark `ArrayType(DoubleType)` columns with zero wrapper objects.
  */
object Geom {

  /** Signed shoelace area of an implicit-closed ring. CCW > 0. */
  def signedArea(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var a = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      a += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    a / 2.0
  }

  def area(ring: Array[Double]): Double = math.abs(signedArea(ring))

  /** Area-weighted centroid (degenerate rings fall back to vertex mean). */
  def centroid(ring: Array[Double]): (Double, Double) = {
    val n = ring.length / 2
    val a = signedArea(ring)
    if (math.abs(a) < 1e-30) {
      var sx = 0.0; var sy = 0.0; var i = 0
      while (i < n) { sx += ring(2 * i); sy += ring(2 * i + 1); i += 1 }
      (sx / n, sy / n)
    } else {
      var cx = 0.0; var cy = 0.0; var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val cross = ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
        cx += (ring(2 * i) + ring(2 * j)) * cross
        cy += (ring(2 * i + 1) + ring(2 * j + 1)) * cross
        i += 1
      }
      (cx / (6.0 * a), cy / (6.0 * a))
    }
  }

  /** Ray-cast point-in-polygon; points exactly on an edge or vertex are IN. */
  def contains(ring: Array[Double], px: Double, py: Double): Boolean = {
    val n = ring.length / 2
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      // boundary check: point on segment (i,j)?
      val cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
      if (cross == 0.0 &&
          px >= math.min(xi, xj) && px <= math.max(xi, xj) &&
          py >= math.min(yi, yj) && py <= math.max(yi, yj)) return true
      // standard even-odd crossing test
      if ((yi > py) != (yj > py)) {
        val xCross = xi + (py - yi) / (yj - yi) * (xj - xi)
        if (px < xCross) inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Axis-aligned bounding box (minx, miny, maxx, maxy). */
  def bbox(ring: Array[Double]): (Double, Double, Double, Double) = {
    var minx = Double.MaxValue; var miny = Double.MaxValue
    var maxx = Double.MinValue; var maxy = Double.MinValue
    var i = 0
    while (i < ring.length / 2) {
      val x = ring(2 * i); val y = ring(2 * i + 1)
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
      i += 1
    }
    (minx, miny, maxx, maxy)
  }

  /** True when every vertex of the axis-aligned box [x0,x1]x[y0,y1] lies
    * inside the ring AND no ring edge crosses the box — used for the
    * interior-cell fast path of the PIP join (skip per-point ray casts when
    * the covering cell is wholly inside the polygon).
    * Conservative: may return false for contained boxes, never true for
    * non-contained ones.
    */
  def containsBox(ring: Array[Double], x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
    if (!contains(ring, x0, y0) || !contains(ring, x1, y0) ||
        !contains(ring, x0, y1) || !contains(ring, x1, y1)) return false
    // reject if any edge of the ring intersects the box interior
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (segmentIntersectsBox(ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1), x0, y0, x1, y1))
        return false
      i += 1
    }
    true
  }

  /** Segment vs closed box overlap test (liang-barsky style clipping). */
  private def segmentIntersectsBox(ax: Double, ay: Double, bx: Double, by: Double,
                                   x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
    var t0 = 0.0; var t1 = 1.0
    val dx = bx - ax; val dy = by - ay
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) return false; if (r > t0) t0 = r }
        else { if (r < t0) return false; if (r < t1) t1 = r }
        true
      }
    }
    clip(-dx, ax - x0) && clip(dx, x1 - ax) && clip(-dy, ay - y0) && clip(dy, y1 - ay) && t0 <= t1
  }

  /** Antimeridian split, reproducing /root/reference/lib/utils.py:755-838:
    * vertices binned west (<0) / east (>=0); each sign-crossing segment gets
    * an interpolated vertex at x=±180; returns 1-2 rings.
    * Input ring must be implicit-closed (no repeated last point).
    */
  def splitAntimeridian(ring: Array[Double]): Seq[Array[Double]] = {
    val n = ring.length / 2
    val west = scala.collection.mutable.ArrayBuffer[Double]()
    val east = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val j = (i + 1) % n
      val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
      if (x1 < 0.0) { west += x1; west += y1 } else { east += x1; east += y1 }
      if (math.signum(x1) != math.signum(x2)) {
        // y where the segment crosses x=180 (x<0 shifted by +360)
        val p1x = if (x1 < 0) x1 + 360.0 else x1
        val p2x = if (x2 < 0) x2 + 360.0 else x2
        val rise = y2 - y1
        val run = p2x - p1x
        val runPrime = 180.0 - p1x
        val y3 = runPrime * rise / run + y1
        west += -180.0; west += y3
        east += 180.0; east += y3
      }
      i += 1
    }
    Seq(west.toArray, east.toArray).filter(_.nonEmpty)
  }

  /** Does the polygon "cross" the antimeridian per the reference's heuristic
    * (lon span > 180 means corner coords wrapped;
    * /root/reference/index_setsm.py:1009-1026 applies getWrappedGeometry when
    * the geom spans the 180 line).
    */
  def crossesAntimeridian(ring: Array[Double]): Boolean = {
    val (minx, _, maxx, _) = bbox(ring)
    maxx - minx > 180.0
  }
}
