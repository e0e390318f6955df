// Lives under org.apache.spark.sql to access the private[sql] Column<->Expression
// bridge (the standard SparkSessionExtensions-library pattern).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import graft.cells.Cells
import graft.geom.Geom

/** Catalyst-native cell/geometry expressions with whole-stage codegen — the
  * promotion path of SURVEY.md §4 item 4 (UDF → `Expression` with
  * `doGenCode`). A Scala UDF pays encoder serialization per row and blocks
  * codegen fusion; these generate a static call inline in the stage's
  * generated Java, so cell encoding fuses with the surrounding projection
  * (the "vectorized batched encoder" intent of the north star: the batch is
  * the whole-stage-codegen loop over columnar parquet batches).
  *
  * Input types are guaranteed by the Column builders (explicit casts) rather
  * than ExpectsInputTypes (private[sql] in Spark 4).
  */
/** Static kernels referenced from generated code. A TOP-LEVEL object so
  * Scala emits static forwarders — Janino compiles the generated Java call
  * `GraftKernels.cellAt(...)` against those; a nested object has no statics
  * and the stage silently falls back to interpreted execution.
  */
object GraftKernels {
    def cellAt(lon: Double, lat: Double, level: Int): Long = Cells.cellAt(lon, lat, level)
    /** Allocation-free ray cast directly over ArrayData (no double[] copy —
      * a copy per row at tens of millions of rows/sec is pure GC pressure).
      * Same semantics as [[graft.geom.Geom.contains]] (boundary = inside).
      */
    def pip(ring: ArrayData, px: Double, py: Double): Boolean = {
      val n = ring.numElements() / 2
      var inside = false
      var i = 0
      while (i < n) {
        val j = if (i + 1 == n) 0 else i + 1
        val xi = ring.getDouble(2 * i); val yi = ring.getDouble(2 * i + 1)
        val xj = ring.getDouble(2 * j); val yj = ring.getDouble(2 * j + 1)
        val cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
        if (cross == 0.0 &&
            px >= math.min(xi, xj) && px <= math.max(xi, xj) &&
            py >= math.min(yi, yj) && py <= math.max(yi, yj)) return true
        if ((yi > py) != (yj > py)) {
          val xCross = xi + (py - yi) / (yj - yi) * (xj - xi)
          if (px < xCross) inside = !inside
        }
        i += 1
      }
      inside
    }

    /** Reference tile id (polar-stereo/UTM 100 km supertile + quartertile,
      * lib/dem.py:106-112) — projection trig inlined in codegen. */
    def tileId(lon: Double, lat: Double): org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.fromString(Cells.tileId(lon, lat))

    /** Cover cells of a flat ring as array<struct<cell:bigint, interior:boolean>>
      * (interior=true ⇒ points in the cell need no exact PIP test). Backs the
      * PipJoinRewrite optimizer rule's Generate node.
      */
    def coverCells(ring: ArrayData, level: Int): ArrayData = {
      val n = ring.numElements()
      val arr = new Array[Double](n)
      var i = 0
      while (i < n) { arr(i) = ring.getDouble(i); i += 1 }
      val cover = Cells.coverRing(arr, level)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        cover.map { case (c, in) =>
          org.apache.spark.sql.catalyst.InternalRow(c, in)
        })
    }

    /** Cells at Chebyshev grid distance in (lo, hi] of `cell` — the ring
      * slab one kNN escalation round explores ([[Cells.ringK]] per ring,
      * de-duplicated across the slab for the wrapped-longitude edge). A
      * kernel, not a Scala UDF: the slab expands per REMAINING query per
      * round, and the UDF form paid encoder serialization on that loop path.
      */
    def ringRange(cell: Long, lo: Int, hi: Int): ArrayData = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var k = lo + 1
      while (k <= hi) { out ++= Cells.ringK(cell, k); k += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.distinct.toArray)
    }

    /** Per-record reprojection roundtrip residual: forward to the row's
      * region CRS (polar stereo 3413/3031 or UTM), inverse back, return the
      * |Δlon|+|Δlat| residual — the per-record geometry-transform work the
      * reference does on every indexed item (index_setsm.py:986-1030
      * reprojects each footprint). Used by the compute-dense bench mode.
      */
    def projRoundtripErr(lon: Double, lat: Double): Double = {
      val epsg =
        if (lat >= 50.0) 3413
        else if (lat <= -50.0) 3031
        else graft.crs.Proj.utmEpsg(lon, lat)
      val (x, y) = graft.crs.Proj.forward(lon, lat, epsg)
      val (lon2, lat2) = graft.crs.Proj.inverse(x, y, epsg)
      math.abs(graft.crs.Proj.normLon(lon2) - graft.crs.Proj.normLon(lon)) +
        math.abs(lat2 - lat)
    }

    /** Geocell (lib/dem.py:747-752) as ONE static call. The pure-column
      * concat/lpad form is semantically identical but is a sizeable Catalyst
      * tree: pushed-down join-key null checks inline such trees several
      * times into Filter conditions, where codegen performs no
      * subexpression elimination (measured 6× the whole query's cost on a
      * salted join). A kernel call keeps every copy cheap.
      *
      * Digits are written directly into a 7-byte buffer — the scalar
      * `f"%02d"` path goes through java.util.Formatter and measured ~1.7×
      * slower than even the column tree in a plain aggregation key
      * (BENCH.md round-3 geocell A/B). Falls back to the formatter for
      * out-of-range coordinates (pad-never-truncate semantics there).
      */
    def geocell(lon: Double, lat: Double): org.apache.spark.unsafe.types.UTF8String = {
      val latN = math.abs(math.floor(lat)).toInt
      val lonN = math.abs(math.floor(lon)).toInt
      if (latN > 99 || lonN > 999) // {:02d}/{:03d} only pad, never truncate
        return org.apache.spark.unsafe.types.UTF8String.fromString(Cells.geocell(lon, lat))
      val b = new Array[Byte](7)
      b(0) = if (lat >= 0) 'n' else 's'
      b(1) = ('0' + latN / 10).toByte
      b(2) = ('0' + latN % 10).toByte
      b(3) = if (lon >= 0) 'e' else 'w'
      b(4) = ('0' + lonN / 100).toByte
      b(5) = ('0' + lonN / 10 % 10).toByte
      b(6) = ('0' + lonN % 10).toByte
      org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
    }

    /** Exact dot product of two equal-length long arrays (integer-quantized
      * embeddings) — allocation-free. */
    def dotLongs(a: ArrayData, b: ArrayData): Long = {
      val n = a.numElements()
      var acc = 0L
      var i = 0
      while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
      acc
    }

    /** Exactly-one-tile pick over (pid, ring, interior) candidate structs. */
    def shelvePick(cands: ArrayData, px: Double, py: Double): org.apache.spark.unsafe.types.UTF8String = {
      var picked: org.apache.spark.unsafe.types.UTF8String = null
      var hits = 0
      var i = 0
      val n = cands.numElements()
      while (i < n && hits < 2) {
        val row = cands.getStruct(i, 3)
        val in = row.getBoolean(2) || pip(row.getArray(1), px, py)
        if (in) { hits += 1; picked = row.getUTF8String(0) }
        i += 1
      }
      if (hits == 1) picked else null
    }

    /** [[shelvePick]] plus the match count, in ONE candidate pass: returns
      * struct(pid: pid-if-exactly-one-else-null, n: total matches). The count
      * feeds the J2 skip metrics (the reference warns and reports ALL
      * overlapping tiles, lib/utils.py:694-702, so no early exit at 2).
      */
    def shelvePickN(cands: ArrayData, px: Double, py: Double): org.apache.spark.sql.catalyst.InternalRow = {
      var picked: org.apache.spark.unsafe.types.UTF8String = null
      var hits = 0
      var i = 0
      val n = cands.numElements()
      while (i < n) {
        val row = cands.getStruct(i, 3)
        val in = row.getBoolean(2) || pip(row.getArray(1), px, py)
        if (in) { hits += 1; picked = row.getUTF8String(0) }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](if (hits == 1) picked else null, hits))
    }
}

object CellExpressions {

  private val K = "org.apache.spark.sql.graft.GraftKernels"
  private val Kernels = GraftKernels

  case class CellAt(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = first.nullable || second.nullable || third.nullable
    override protected def nullSafeEval(lon: Any, lat: Any, level: Any): Any =
      Kernels.cellAt(lon.asInstanceOf[Double], lat.asInstanceOf[Double], level.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lon, lat, level) =>
        s"${ev.value} = $K.cellAt($lon, $lat, $level);")
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): CellAt =
      copy(first = f, second = s, third = t)
  }

  /** Exact ray-cast PIP as a codegen expression over a flat-ring array. */
  case class PipContains(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = first.nullable || second.nullable || third.nullable
    override protected def nullSafeEval(ring: Any, px: Any, py: Any): Any =
      Kernels.pip(ring.asInstanceOf[ArrayData],
        px.asInstanceOf[Double], py.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ring, px, py) =>
        s"${ev.value} = $K.pip($ring, $px, $py);")
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PipContains =
      copy(first = f, second = s, third = t)
  }

  /** One-pass exactly-one-tile pick (J2 shelve rule) over a per-cell
    * candidate array of structs (pid string, ring array<double>, interior
    * boolean): returns the single containing tile's pid, or null when 0 or
    * >1 tiles contain the point. A single codegen expression instead of a
    * higher-order filter lambda (HOFs like ArrayFilter are CodegenFallback —
    * measured ~1.8x slower on the 77M-row bench).
    */
  case class ShelvePick(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(cands: Any, px: Any, py: Any): Any =
      Kernels.shelvePick(cands.asInstanceOf[ArrayData],
        px.asInstanceOf[Double], py.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = nullSafeCodeGen(ctx, ev, (cands, px, py) =>
        s"""${ev.value} = $K.shelvePick($cands, $px, $py);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin)
      res
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ShelvePick =
      copy(first = f, second = s, third = t)
  }

  /** [[ShelvePick]] + match count in one candidate pass, as a struct
    * (pid: STRING nullable, n: INT). Materialized into its own projection by
    * [[graft.ops.PipJoin.shelve]] so the plan carries exactly ONE call site —
    * field extraction above it touches only the struct attribute.
    */
  case class ShelvePickN(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def nullable: Boolean = first.nullable || second.nullable || third.nullable
    override protected def nullSafeEval(cands: Any, px: Any, py: Any): Any =
      Kernels.shelvePickN(cands.asInstanceOf[ArrayData],
        px.asInstanceOf[Double], py.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (cands, px, py) =>
        s"${ev.value} = $K.shelvePickN($cands, $px, $py);")
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ShelvePickN =
      copy(first = f, second = s, third = t)
  }

  /** Reference supertile/quartertile id via the real CRS projection. */
  case class TileIdExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(lon: Any, lat: Any): Any =
      Kernels.tileId(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lon, lat) => s"${ev.value} = $K.tileId($lon, $lat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): TileIdExpr =
      copy(left = l, right = r)
  }

  /** Cover cells of a ring at a level — the generator input of the
    * PipJoinRewrite rule. */
  case class CoverCells(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("interior", BooleanType, nullable = false))),
      containsNull = false)
    override protected def nullSafeEval(ring: Any, level: Any): Any =
      Kernels.coverCells(ring.asInstanceOf[ArrayData], level.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ring, level) =>
        s"${ev.value} = $K.coverCells($ring, $level);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CoverCells =
      copy(left = l, right = r)
  }

  def cover_cells(ring: Column, level: Int): Column =
    ExpressionUtils.column(CoverCells(
      ExpressionUtils.expression(ring), ExpressionUtils.expression(lit(level))))

  /** Reprojection roundtrip residual via the static kernel. */
  case class ProjRoundtripErr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(lon: Any, lat: Any): Any =
      Kernels.projRoundtripErr(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lon, lat) => s"${ev.value} = $K.projRoundtripErr($lon, $lat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ProjRoundtripErr =
      copy(left = l, right = r)
  }

  /** Geocell string via the static kernel (see GraftKernels.geocell). */
  case class GeocellExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(lon: Any, lat: Any): Any =
      Kernels.geocell(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lon, lat) => s"${ev.value} = $K.geocell($lon, $lat);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): GeocellExpr =
      copy(left = l, right = r)
  }

  /** Integer dot product of two array<long> columns, codegen-fused. */
  case class DotLongs(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = left.nullable || right.nullable
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dotLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $K.dotLongs($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLongs =
      copy(left = l, right = r)
  }

  def dot_longs(a: Column, b: Column): Column =
    ExpressionUtils.column(DotLongs(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def proj_roundtrip_err(lon: Column, lat: Column): Column =
    ExpressionUtils.column(ProjRoundtripErr(
      ExpressionUtils.expression(lon.cast("double")),
      ExpressionUtils.expression(lat.cast("double"))))

  def geocell_expr(lon: Column, lat: Column): Column =
    ExpressionUtils.column(GeocellExpr(
      ExpressionUtils.expression(lon.cast("double")),
      ExpressionUtils.expression(lat.cast("double"))))

  def tile_id(lon: Column, lat: Column): Column =
    ExpressionUtils.column(TileIdExpr(
      ExpressionUtils.expression(lon.cast("double")),
      ExpressionUtils.expression(lat.cast("double"))))

  def shelve_pick(cands: Column, px: Column, py: Column): Column =
    ExpressionUtils.column(ShelvePick(
      ExpressionUtils.expression(cands),
      ExpressionUtils.expression(px.cast("double")),
      ExpressionUtils.expression(py.cast("double"))))

  def shelve_pick_n(cands: Column, px: Column, py: Column): Column =
    ExpressionUtils.column(ShelvePickN(
      ExpressionUtils.expression(cands),
      ExpressionUtils.expression(px.cast("double")),
      ExpressionUtils.expression(py.cast("double"))))

  /** Ring slab (Chebyshev cell distance in (lo, hi]) as array<long> — the
    * per-round explode source of [[graft.ops.KnnJoin.knn]]. */
  case class RingRange(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = first.nullable || second.nullable || third.nullable
    override protected def nullSafeEval(cell: Any, lo: Any, hi: Any): Any =
      Kernels.ringRange(cell.asInstanceOf[Long], lo.asInstanceOf[Int], hi.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (cell, lo, hi) =>
        s"${ev.value} = $K.ringRange($cell, $lo, $hi);")
    override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): RingRange =
      copy(first = f, second = s, third = t)
  }

  def ring_range(cell: Column, lo: Column, hi: Column): Column =
    ExpressionUtils.column(RingRange(
      ExpressionUtils.expression(cell.cast("long")),
      ExpressionUtils.expression(lo.cast("int")),
      ExpressionUtils.expression(hi.cast("int"))))

  /** Column API: cell id at a quadkey level — codegen-fused, no UDF. */
  def cell_at(lon: Column, lat: Column, level: Int): Column =
    ExpressionUtils.column(CellAt(
      ExpressionUtils.expression(lon.cast("double")),
      ExpressionUtils.expression(lat.cast("double")),
      ExpressionUtils.expression(lit(level))))

  /** Column API: exact PIP over a flat ring (array<double>) column. */
  def st_contains(ring: Column, px: Column, py: Column): Column =
    ExpressionUtils.column(PipContains(
      ExpressionUtils.expression(ring),
      ExpressionUtils.expression(px.cast("double")),
      ExpressionUtils.expression(py.cast("double"))))
}
