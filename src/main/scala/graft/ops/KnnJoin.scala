package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cells.Cells

/** Exact k-nearest-neighbor self/join via expanding cell-ring search
  * (the graft operator of BASELINE.json north_star; reference precedent is
  * the single-cell centroid lookup of /root/reference/lib/utils.py:676-702).
  *
  * Distance: squared euclidean in integer millidegrees with longitude wrap
  * (`dlon = min(|Δ|, 360000-|Δ|)`), exact 64-bit integer math so the DuckDB
  * oracle reproduces results bit-for-bit. Ties break on neighbor id.
  *
  * Algorithm (distributed, driver only steers the ring radius):
  *   1. Both sides are bucketed to quadkey cells at `level`.
  *   2. Round r: each *unsatisfied* query explodes to its ring-r cells
  *      (disk for r=1) and equi-joins candidate points on cell id — the theta
  *      join never materializes; everything is a hash join on a long key.
  *   3. Per query keep the best k seen so far (window top-k).
  *   4. A query finishes when it has ≥ k candidates AND its k-th distance is
  *      ≤ (r · cellHeight)² — points in any unexplored cell (Chebyshev cell
  *      distance > r) are at least r·cellHeight away, so no better neighbor
  *      exists outside the searched disk.
  *   5. Only unfinished queries escalate to r+1: the expensive side shrinks
  *      geometrically each round (dense cells finish at r=1).
  *
  * At 100 TB: each round is one shuffle of the *remaining* queries keyed by
  * cell; candidates are co-partitioned by the same key. Hot cells satisfy k
  * in the first round (dense ⇒ near neighbors), so skew self-heals; AQE
  * skew-split covers the residue.
  */
object KnnJoin {

  private val diskUdf = udf((cell: Long, r: Int) => Cells.diskK(cell, r))
  private val ringUdf = udf((cell: Long, r: Int) => Cells.ringK(cell, r))
  private val cellAtUdf = udf((lon: Double, lat: Double, level: Int) => Cells.cellAt(lon, lat, level))

  /** Squared lon-wrapped millidegree distance as a column expression. */
  def dist2(lonm1: org.apache.spark.sql.Column, latm1: org.apache.spark.sql.Column,
            lonm2: org.apache.spark.sql.Column, latm2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val adlon = abs(lonm1 - lonm2)
    val dlon = least(adlon, lit(360000L) - adlon)
    val dlat = latm1 - latm2
    dlon * dlon + dlat * dlat
  }

  /** kNN of `queries` against `points`, both (id, lonm, latm) in integer
    * millidegrees. Self-join when `queries eq points` (self matches with
    * identical id are excluded). Returns
    * (query_id, neighbor_id, dist2, rn) with rn ∈ [1, k].
    */
  def knn(spark: SparkSession, queries: DataFrame, points: DataFrame,
          qId: String, pId: String, k: Int, level: Int = 6,
          maxRounds: Int = 12): DataFrame = {
    import spark.implicits._
    val cellH = 180000L >> level // cell height in millidegrees (lat axis)

    val pts = points
      .select(col(pId).as("neighbor_id"), col("lonm").as("p_lonm"), col("latm").as("p_latm"))
      .withColumn("__pcell", cellAtUdf(col("p_lonm") / 1000.0, col("p_latm") / 1000.0, lit(level)))
      .cache()
    pts.count() // materialize once; probed every round

    var remaining = queries
      .select(col(qId).as("query_id"), col("lonm").as("q_lonm"), col("latm").as("q_latm"))
      .withColumn("__qcell", cellAtUdf(col("q_lonm") / 1000.0, col("q_latm") / 1000.0, lit(level)))
    var acc: DataFrame = null // best-k so far for finished queries
    var carry: DataFrame = null // candidates of unfinished queries
    var r = 1
    var done = false

    while (!done && r <= maxRounds) {
      // cells newly explored this round (disk for round 1, ring r after)
      val cellsCol = if (r == 1) diskUdf(col("__qcell"), lit(1)) else ringUdf(col("__qcell"), lit(r))
      val probes = remaining.withColumn("__cell", explode(cellsCol))
      val fresh = probes.join(pts, col("__cell") === col("__pcell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("q_lonm"), col("q_latm"), col("__qcell"),
          col("neighbor_id"),
          dist2(col("q_lonm"), col("q_latm"), col("p_lonm"), col("p_latm")).as("d2"))
      val cand0 = if (carry == null) fresh else carry.unionByName(fresh)
      val w = Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
      val topk = cand0
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
      // termination bound: k-th distance within the guaranteed-searched radius
      val bound = lit((r * cellH) * (r * cellH))
      val stats = topk.groupBy("query_id", "q_lonm", "q_latm", "__qcell")
        .agg(count(lit(1)).as("nc"), max(col("d2")).as("kth"))
        .withColumn("__done", col("nc") >= k && col("kth") <= bound)
        .cache()
      val finishedQ = stats.filter(col("__done")).select("query_id")
      val unfinishedQ = stats.filter(!col("__done"))
        .select("query_id", "q_lonm", "q_latm", "__qcell")
      val finished = topk.join(broadcast(finishedQ), "query_id")
        .select("query_id", "neighbor_id", "d2", "rn")
      acc = if (acc == null) finished else acc.unionByName(finished)
      val nLeft = unfinishedQ.limit(1).count()
      if (nLeft == 0) done = true
      else {
        remaining = unfinishedQ
        carry = topk.join(broadcast(unfinishedQ.select("query_id")), "query_id")
          .select("query_id", "q_lonm", "q_latm", "__qcell", "neighbor_id", "d2")
          .localCheckpoint(eager = false)
      }
      r += 1
    }
    // any still-unfinished queries after maxRounds: emit best found so far
    val leftover = if (done || carry == null) Seq.empty[(Long, Long, Long, Int)].toDF(
      "query_id", "neighbor_id", "d2", "rn")
    else {
      val w = Window.partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
      carry.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("query_id", "neighbor_id", "d2", "rn")
    }
    val out = if (acc == null) leftover else acc.unionByName(leftover)
    out.select(col("query_id"), col("neighbor_id"), col("d2").as("dist2"), col("rn"))
  }
}
