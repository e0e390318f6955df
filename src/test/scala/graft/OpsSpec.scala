package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.geom.Geom
import graft.ops.{Canonical, KnnJoin, PipJoin}
import graft.pages.Pages

/** Operator-vs-brute-force oracles (SURVEY.md §5(e)): PIP join and kNN must
  * produce exactly the rows a naive in-memory scan produces, including the
  * 0/>1-match skip rules and the antimeridian wrap.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic point cloud incl. hot cluster + antimeridian band
  private def points(n: Int): Seq[(Long, Double, Double)] = {
    (0L until n).map { i =>
      val h1 = (i * 48271 + 11) % 2147483647L
      val h2 = (h1 * 48271 + 17) % 2147483647L
      val lon = (h1 % 360000L) / 1000.0 - 180.0
      val lat = (h2 % 170000L) / 1000.0 - 85.0
      (i, lon, lat)
    }
  }

  // general (non-rectangular) polygons: triangles + a concave L + one
  // antimeridian-adjacent sliver
  private val polys: Seq[(String, Array[Double])] = Seq(
    "tri_a" -> Array(-10.0, -10.0, 30.0, -5.0, 5.0, 25.0),
    "tri_b" -> Array(20.0, 10.0, 60.0, 15.0, 40.0, 45.0),
    "tri_a2" -> Array(-9.0, -9.0, 31.0, -4.0, 6.0, 26.0), // tri_a shifted: heavy overlap -> >1-match skips
    "lshape" -> Array(-60.0, -60.0, -20.0, -60.0, -20.0, -40.0, -40.0, -40.0, -40.0, -20.0, -60.0, -20.0),
    "east_sliver" -> Array(170.0, 50.0, 179.9, 50.0, 179.9, 70.0, 170.0, 70.0),
    "polar" -> Array(-120.0, 80.0, -60.0, 80.0, -60.0, 89.0, -120.0, 89.0))

  test("PIP join equals brute-force nested loop on general polygons") {
    val pts = points(3000).toDF("pid", "lon", "lat")
    val pl = polys.map { case (n, r) => (n, r.toSeq) }.toDF("poly_id", "ring")
    val got = PipJoin.join(pts, pl, "pid", "lon", "lat", "poly_id", "ring", level = 6)
      .select("pid", "poly_id").as[(Long, String)].collect().toSet
    val expected = (for {
      (pid, lon, lat) <- points(3000)
      (name, ring) <- polys
      if Geom.contains(ring, lon, lat)
    } yield (pid, name)).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must actually produce matches")
  }

  test("PIP shelve enforces the exactly-one rule (lib/utils.py:694-702)") {
    val pts = points(3000).toDF("pid", "lon", "lat")
    val pl = polys.map { case (n, r) => (n, r.toSeq) }.toDF("poly_id", "ring")
    val got = PipJoin.shelve(pts, pl, "pid", "lon", "lat", "poly_id", "ring", level = 6)
      .select("pid", "poly_id").as[(Long, String)].collect()
    val matchesPerPoint = (for {
      (pid, lon, lat) <- points(3000)
      (name, ring) <- polys
      if Geom.contains(ring, lon, lat)
    } yield (pid, name)).groupBy(_._1)
    val expected = matchesPerPoint.filter(_._2.size == 1).values.flatten.toSet
    assert(got.toSet === expected)
    assert(got.length === got.map(_._1).distinct.length, "one tile per point")
    // the overlap between tri_a and tri_b must have produced >1-match skips
    val multi = matchesPerPoint.count(_._2.size > 1)
    assert(multi > 0, "fixture must exercise the >1-match skip branch")
  }

  test("pickCoverLevel tracks polygon extent: fine for slivers, coarse for continents") {
    // tiny parcels (~0.01°): the finest capped level — cells stay selective
    val tiny = (0 until 50).map { i =>
      val x = i * 3.0 - 75.0; val y = i * 1.5 - 37.0
      (s"t$i", Seq(x, y, x + 0.01, y, x + 0.01, y + 0.01, x, y + 0.01))
    }.toDF("poly_id", "ring")
    assert(PipJoin.pickCoverLevel(tiny, "ring") === 14)
    // planet-scale polygons: a coarse level — finer would explode the cover
    val planet = Seq(
      ("west", Seq(-170.0, -70.0, -10.0, -70.0, -10.0, 70.0, -170.0, 70.0)),
      ("east", Seq(10.0, -70.0, 170.0, -70.0, 170.0, 70.0, 10.0, 70.0))
    ).toDF("poly_id", "ring")
    val coarse = PipJoin.pickCoverLevel(planet, "ring")
    assert(coarse <= 3, s"continent-scale polys must pick a coarse level, got $coarse")
    // the estimate bound holds at the picked level for the median poly
    val cw = 360.0 / (1L << coarse); val ch = 180.0 / (1L << coarse)
    assert((160.0 / cw + 2) * (140.0 / ch + 2) <= 24.0)
    // no polygons at all: the safe default
    assert(PipJoin.pickCoverLevel(tiny.where(lit(false)), "ring") === 6)
    // AutoLevel sentinel flows through join and stays exact
    val pts = points(500).toDF("pid", "lon", "lat")
    val pl = polys.map { case (n, r) => (n, r.toSeq) }.toDF("poly_id", "ring")
    val auto = PipJoin.join(pts, pl, "pid", "lon", "lat", "poly_id", "ring",
        level = PipJoin.AutoLevel)
      .select("pid", "poly_id").as[(Long, String)].collect().toSet
    val fixed = PipJoin.join(pts, pl, "pid", "lon", "lat", "poly_id", "ring", level = 6)
      .select("pid", "poly_id").as[(Long, String)].collect().toSet
    assert(auto === fixed)
  }

  test("shelve observes the J2 skip metrics (0-match / multi-match counts)") {
    val pts = points(3000).toDF("pid", "lon", "lat")
    val pl = polys.map { case (n, r) => (n, r.toSeq) }.toDF("poly_id", "ring")
    val obs = org.apache.spark.sql.Observation("shelve_obs")
    val shelved = PipJoin.shelve(pts, pl, "pid", "lon", "lat", "poly_id", "ring",
      level = 6, observer = Some(obs))
    val nShelved = shelved.count()
    // ground truth from the brute-force scan
    val matchCounts = points(3000).map { case (pid, lon, lat) =>
      polys.count { case (_, ring) => Geom.contains(ring, lon, lat) }
    }
    val m = obs.get
    assert(m("n_shelved") === matchCounts.count(_ == 1).toLong)
    assert(m("n_shelved") === nShelved)
    assert(m("skip_nomatch") === matchCounts.count(_ == 0).toLong)
    assert(m("skip_multi") === matchCounts.count(_ > 1).toLong)
    assert(m("skip_multi").asInstanceOf[Long] > 0, "fixture must exercise multi-match")
    assert(m("skip_nomatch").asInstanceOf[Long] > 0, "fixture must exercise 0-match")
  }

  test("kNN join equals brute force incl. lon wrap (k=3)") {
    // 400 points; includes near-antimeridian pairs via the modular spread
    val n = 400
    val ptsSeq = points(n).map { case (i, lon, lat) =>
      (i, math.round(lon * 1000), math.round(lat * 1000)) }
    val pts = ptsSeq.toDF("id", "lonm", "latm")
    val got = KnnJoin.knn(spark, pts, pts, "id", "id", k = 3, level = 4, maxRounds = 20)
      .select("query_id", "neighbor_id", "dist2", "rn")
      .as[(Long, Long, Long, Int)].collect().toSet
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long = {
      val adlon = math.abs(a._2 - b._2)
      val dlon = math.min(adlon, 360000 - adlon)
      val dlat = a._3 - b._3
      dlon * dlon + dlat * dlat
    }
    val expected = (for (q <- ptsSeq) yield {
      ptsSeq.filter(_._1 != q._1)
        .map(p => (p._1, d2(q, p)))
        .sortBy(t => (t._2, t._1))
        .take(3).zipWithIndex
        .map { case ((nid, d), idx) => (q._1, nid, d, idx + 1) }
    }).flatten.toSet
    assert(got === expected)
  }

  test("kNN ring escalation at a small level: no wrapped-cell duplicates") {
    // level=3 -> 8 cells per lon axis; bruteThreshold=0 disables the brute
    // short-circuit so rounds 2+ actually run up to the radius cap. Sparse
    // points near the antimeridian force multi-round escalation — before the
    // radius cap, wrapped ring cells re-joined the same candidate and
    // row_number assigned two ranks to one neighbor.
    val ptsSeq = (0L until 40L).map { i =>
      val h1 = (i * 48271 + 11) % 2147483647L
      val h2 = (h1 * 48271 + 17) % 2147483647L
      val lonm = if (i % 4 == 0) 179000L + (h1 % 2000) - 1000L // antimeridian band
                 else h1 % 360000L - 180000L
      (i, lonm, h2 % 170000L - 85000L)
    }
    val pts = ptsSeq.toDF("id", "lonm", "latm")
    val got = KnnJoin.knn(spark, pts, pts, "id", "id", k = 3, level = 3,
        maxRounds = 6, bruteThreshold = 0L)
      .select("query_id", "neighbor_id", "dist2", "rn")
      .as[(Long, Long, Long, Int)].collect()
    // no (query, neighbor) pair may appear twice
    assert(got.length === got.map(t => (t._1, t._2)).distinct.length)
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)): Long = {
      val adlon = math.abs(a._2 - b._2)
      val dlon = math.min(adlon, 360000 - adlon)
      val dlat = a._3 - b._3
      dlon * dlon + dlat * dlat
    }
    val expected = (for (q <- ptsSeq) yield {
      ptsSeq.filter(_._1 != q._1)
        .map(p => (p._1, d2(q, p)))
        .sortBy(t => (t._2, t._1))
        .take(3).zipWithIndex
        .map { case ((nid, d), idx) => (q._1, nid, d, idx + 1) }
    }).flatten.toSet
    assert(got.toSet === expected)
  }

  test("kNN non-self join keeps a neighbor whose id equals the query id") {
    val qs = Seq((1L, 10000L, 10000L), (2L, 20000L, 20000L)).toDF("id", "lonm", "latm")
    val ps = Seq((1L, 10100L, 10000L), (9L, 10200L, 10000L)).toDF("id", "lonm", "latm")
    val got = KnnJoin.knn(spark, qs, ps, "id", "id", k = 2, level = 4, maxRounds = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // query 1 must keep point 1 (distinct datasets — not a self match)
    assert(got.contains((1L, 1L)) && got.contains((1L, 9L)))
  }

  test("pickLevel chooses a finer level for the skewed page cloud, and kNN stays exact") {
    val pts = graft.pages.Pages.fromLineitem(spark, "/root/testdata/sf0.01")
      .select(col("page_id").as("id"), col("lonm"), col("latm"))
    // 20% of ~60k points sit in two 1-degree cells; a coarse level would put
    // thousands of points in one cell
    val level = KnnJoin.pickLevel(pts, targetMaxPerCell = 256, sampleFraction = 0.2)
    assert(level >= 8, s"skewed cloud must push the level finer, got $level")
    // the picked level still yields exact results on a small subset
    val sub = pts.filter(col("id") < 2000).localCheckpoint()
    val got = KnnJoin.knn(spark, sub, sub, "id", "id", k = 2, level = level,
        maxRounds = 12)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val rows = sub.select("id", "lonm", "latm").as[(Long, Long, Long)].collect()
    val distinctIds = rows.map(_._1).distinct.length
    assert(got.length === distinctIds * 2)
  }

  test("pickLevel falls back to the coarsest level on an empty sample") {
    val tiny = Seq((1L, 1000L, 1000L), (2L, 2000L, 2000L)).toDF("id", "lonm", "latm")
    // sample fraction so small the sample is (almost surely) empty — must not
    // NPE on the NULL max aggregate, must return the first candidate
    val level = KnnJoin.pickLevel(tiny, sampleFraction = 1e-9)
    assert(level === 2)
  }

  test("pickLevel escapes past the fixed candidate ceiling when every level <= 14 is ineligible") {
    // 24 480 points: a 12x12 integer-millidegree grid x 170 copies. Cell
    // sizes: level 14 ~ 11 mdeg (whole cluster in ~1 cell, occ ~ 24k),
    // level 16 ~ 2.75 mdeg (up to 3x3 grid positions/cell -> occ ~ 1530 >
    // 1024), level 18 ~ 0.69 mdeg (< 1 mdeg quantum -> occ = 170 dupes,
    // eligible). The pre-round-4 ladder stopped at 14 and fell back to an
    // ineligible level — the quadratic hot-cell case at the design point.
    val dense = for {
      x <- 0 until 12; y <- 0 until 12; c <- 0 until 170
    } yield ((x * 12 + y) * 170L + c, 10000L + x, 20000L + y)
    val pts = dense.toDF("id", "lonm", "latm")
    val level = KnnJoin.pickLevel(pts, sampleFraction = 1.0)
    assert(level > 14, s"pick must escape the fixed ladder, got $level")
    assert(level <= graft.cells.Cells.MaxLevel)
  }

  test("knnAuto picks the level itself and stays exact (entry-point wiring)") {
    val pts = Seq((1L, 10000L, 10000L), (2L, 10100L, 10000L), (3L, 50000L, 40000L))
      .toDF("id", "lonm", "latm").localCheckpoint()
    val got = KnnJoin.knnAuto(spark, pts, pts, "id", "id", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("kNN self-heals on hot cells (skewed cluster)") {
    // 200 points all inside one 1-degree cell + 10 sparse outliers
    val hot = (0L until 200L).map { i =>
      val h = (i * 48271 + 3) % 997
      (i, 12000L + h, 51000L + (h * 7) % 997)
    }
    val sparse = (200L until 210L).map(i => (i, -170000L + i * 1000, -80000L + i * 500))
    val all = (hot ++ sparse).toDF("id", "lonm", "latm")
    val got = KnnJoin.knn(spark, all, all, "id", "id", k = 2, level = 6, maxRounds = 40)
    assert(got.count() === 210 * 2)
  }

  test("canonical scene: zero-padded verkey makes string max = semver max (J3)") {
    val rows = Seq(
      // same pair+res, versions v030402 < v040002 < v040311: keep only last
      ("s1", "PAIR_2m_v030402", false, "/a"),
      ("s2", "PAIR_2m_v040002", false, "/b"),
      ("s3", "PAIR_2m_v040311", false, "/c"),
      ("s4", "PAIR_2m_v040311", false, "/d"), // same max version, both kept
      // dsp rows are dropped even if they are the group max
      ("s5", "PAIR_8m_v050000", true, "/e"),
      ("s6", "PAIR_8m_v040000", false, "/f"))
      .toDF("scenedemid", "stripdemid", "is_dsp", "location")
    val got = Canonical.sceneMaster(rows)
      .select("scenedemid").as[String].collect().toSet
    assert(got === Set("s3", "s4", "s6"))
  }

  test("canonical strip: s2s int-array ordering prefers 4.10 over 4.2 (J8)") {
    val rows = Seq(
      // one nover group, two versions; v2 wins stage 1
      ("d1", "P_2m_v030402", "4.2", false),
      ("d2", "P_2m_v040311", "4.2", false),
      ("d3", "P_2m_v040311", "4.10", true),  // 4.10 > 4.2 numerically
      ("d4", "P_2m_v040311", "4.10", false), // non-LSF preferred
      ("d5", "P_2m_v040311", "3", false))
      .toDF("dem_id", "stripdemid", "s2s_ver", "is_lsf")
    val got = Canonical.stripMaster(rows).select("dem_id").as[String].collect().toSet
    assert(got === Set("d4"))
  }

  test("staging dedup: anti-join + min(location||index_date) tie-break (J5)") {
    val tape = Seq(("sc1", "st1", false, "/t", "2024-01-01"))
      .toDF("scenedemid", "stripdemid", "is_dsp", "location", "index_date")
    val staging = Seq(
      ("sc1", "st1", false, "/x", "2024-01-02"), // on tape -> dropped
      ("sc2", "st1", false, "/b", "2024-01-03"), // novel, two locations
      ("sc2", "st1", false, "/a", "2024-01-03"), // min(location||date) wins
      ("sc3", "st2", true, "/z", "2024-01-04"))
      .toDF("scenedemid", "stripdemid", "is_dsp", "location", "index_date")
    val got = Canonical.stagingDedup(staging, tape)
      .select("scenedemid", "location").as[(String, String)].collect().toSet
    assert(got === Set(("sc2", "/a"), ("sc3", "/z")))
  }

  test("byte-identical text per url end-to-end (input_hint invariant)") {
    val pages = Pages.fromDocuments(spark, Sf)
    // round-trip text through the full page derivation + html wrapper and
    // compare digests against the raw source column
    val src = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("src_sha"))
    val roundtrip = pages.select(col("doc_id"),
      sha2(col("text"), 256).as("page_sha"),
      // text embedded in html must decode back byte-identically
      sha2(regexp_replace(decode(col("html"), "UTF-8"),
        "^<html><body>|</body></html>$", ""), 256).as("html_sha"))
    val joined = src.join(roundtrip, "doc_id")
      .filter(col("src_sha") =!= col("page_sha") || col("src_sha") =!= col("html_sha"))
    assert(joined.count() === 0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
