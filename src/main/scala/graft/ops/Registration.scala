package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registration application (apply_setsm_registration.py:182-258): apply the
  * parsed reg.txt translation vector (dz, dx, dy) to a raster's placement —
  * the geotransform origin shifts by (dx, dy) and the extent is rebuilt from
  * the shifted origin, while dz adds to the DEM values (`gdal_calc A + dz`).
  * The GDAL warp itself is out of engine scope; the engine-side effect is
  * the footprint/extent/value-shift column math below (a pure narrow map —
  * zero shuffle at 100 TB).
  */
object Registration {

  /** Shifted extent, exactly the reference's arithmetic
    * (apply_setsm_registration.py:200-210):
    * {{{
    * minx = origin_x + dx            maxy = origin_y + dy
    * maxx = minx + xsize · px        miny = maxy + ysize · py   (py < 0)
    * }}}
    * Returns a struct (minx, miny, maxx, maxy).
    */
  def shiftedExtent(originX: Column, originY: Column, dx: Column, dy: Column,
                    xsize: Column, ysize: Column, px: Column, py: Column): Column = {
    val minx = originX + dx
    val maxy = originY + dy
    val maxx = minx + xsize * px
    val miny = maxy + ysize * py
    struct(minx.as("minx"), miny.as("miny"), maxx.as("maxx"), maxy.as("maxy"))
  }

  /** The z side of the registration: DEM values shift by +dz
    * (apply_setsm_registration.py:252). */
  def shiftedZ(z: Column, dz: Column): Column = z + dz
}
