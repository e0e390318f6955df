package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 — text-file path-list source
  * (/root/reference/shelve_setsm_strips_simple.py:104-114,
  * package_setsm.py:124-129): `src` may be
  *   - a directory → recursive scan for suffix-matched files,
  *   - a single suffix-matched file → itself,
  *   - a `.txt`/`.csv` list whose lines are paths (files or directories,
  *     each directory expanded by the same suffix scan).
  *
  * Discovery is metadata-scale driver work in the reference too (its walk
  * generator); the returned DataFrame of paths is what fans out to
  * executors. Blank lines and `#` comments are skipped; duplicates removed
  * (U4, package_setsm.py:142).
  */
object PathList {

  /** S1 — both depth bounds of the reference walk (lib/walk.py:26-27):
    * a file at depth d (files directly under `dir` are d = 1) is kept only
    * when minDepth <= d <= maxDepth.
    */
  private def scanDir(dir: String, suffix: String, maxDepth: Int,
                      minDepth: Int = 0): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.walk(root, maxDepth)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(suffix) &&
          root.relativize(p).getNameCount >= minDepth)
        .map(_.toString).toVector
      finally s.close()
    }
  }

  /** Expand `src` to a one-column DataFrame of distinct file paths. */
  def expand(spark: SparkSession, src: String, suffix: String,
             maxDepth: Int = 16, minDepth: Int = 0): DataFrame = {
    val paths: Seq[String] =
      if (Files.isDirectory(Paths.get(src))) scanDir(src, suffix, maxDepth, minDepth)
      else if (src.endsWith(".txt") || src.endsWith(".csv")) {
        Files.readAllLines(Paths.get(src)).asScala.toSeq
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .flatMap { line =>
            if (Files.isDirectory(Paths.get(line))) scanDir(line, suffix, maxDepth, minDepth)
            else if (line.endsWith(suffix)) Seq(line)
            else Seq.empty
          }
      } else if (src.endsWith(suffix)) Seq(src)
      else Seq.empty
    import spark.implicits._
    paths.toDF("path").distinct()
  }
}
