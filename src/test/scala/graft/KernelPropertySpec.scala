package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.GraftTextKernels
import graft.table.Icelite

/** Seeded property coverage for the round-4 kernels: zone-map string-bound
  * transforms (must be sound in Spark's UTF-8 order across the surrogate
  * split) and the repetition-counts kernel (vs a naive reference).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def prop(n: Int)(f: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(4242)
    (1 to n).foreach(_ => f(rnd))
  }

  /** Random strings spanning the UTF-16/UTF-8 ordering split: ASCII, BMP
    * just below the surrogate range, BMP private-use above it, and non-BMP
    * (surrogate-pair-encoded) emoji. */
  private def randStr(rnd: scala.util.Random): String = {
    val sb = new StringBuilder
    (1 to rnd.nextInt(40)).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 => sb.append(('a' + rnd.nextInt(26)).toChar)
        case 1 => sb.append((0xD700 + rnd.nextInt(0xFF)).toChar)
        case 2 => sb.append((0xE000 + rnd.nextInt(0x100)).toChar)
        case _ => sb.appendAll(Character.toChars(0x1F300 + rnd.nextInt(0x100)))
      }
    }
    sb.toString
  }

  test("utf8Lt is exactly code-point order on valid strings") {
    prop(3000) { rnd =>
      val a = randStr(rnd); val b = randStr(rnd)
      val ai = a.codePoints().toArray; val bi = b.codePoints().toArray
      var i = 0; var r = 0
      val n = math.min(ai.length, bi.length)
      while (i < n && r == 0) { r = Integer.compare(ai(i), bi(i)); i += 1 }
      if (r == 0) r = Integer.compare(ai.length, bi.length)
      assert(Icelite.utf8Lt(a, b) === (r < 0), s"[$a] vs [$b]")
    }
  }

  test("truncateBounds: lo <= min, hi >= max in UTF-8 order; bounds are valid bounded strings") {
    prop(3000) { rnd =>
      val mn = randStr(rnd); val mx = randStr(rnd)
      Icelite.truncateBounds(mn, mx) match {
        case Some((lo, hi)) =>
          assert(!Icelite.utf8Lt(mn, lo), s"lower bound must not exceed min: [$lo] > [$mn]")
          assert(!Icelite.utf8Lt(hi, mx), s"upper bound must cover max: [$hi] < [$mx]")
          Seq(lo, hi).foreach { bnd =>
            // valid string (no stranded surrogate): survives UTF-8 roundtrip
            assert(new String(bnd.getBytes("UTF-8"), "UTF-8") === bnd)
            // bounded width (+1: a BMP->astral increment may add a unit)
            assert(bnd.length <= Icelite.StatsTruncateLen + 1)
          }
        case None =>
          // only legal when mx needs truncation but every kept code point
          // is already the maximum
          assert(mx.length > Icelite.StatsTruncateLen)
      }
    }
  }

  test("repetitionCounts equals a naive reference on random token arrays") {
    val vocab = Vector("a", "b", "ab", "ba", "ccc", "", "éé")
    prop(1500) { rnd =>
      val toks = Vector.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      val arr = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val got = GraftTextKernels.repetitionCounts(arr).toLongArray().toSeq
      val t = toks.filter(_.nonEmpty)
      val n = t.size
      val uniMax = if (n > 0) t.groupBy(identity).map(_._2.size).max else 0
      val bi = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toVector
      val biMax = if (bi.nonEmpty) bi.groupBy(identity).map(_._2.size).max else 0
      val want = Seq(n.toLong, t.distinct.size.toLong, uniMax.toLong,
        math.max(0, n - 1).toLong, biMax.toLong)
      assert(got === want, s"tokens: $toks")
    }
  }

  test("regexpGroups is group-for-group regexp_extract (first match, '' for misses)") {
    // the q_asp_index one-pass extraction must agree with java.util.regex's
    // own per-group answers — including optional groups that did not
    // participate ('' like regexp_extract) and whole-string non-matches
    val pat = java.util.regex.Pattern.compile(
      graft.parse.MetaParsers.Patterns.asp.pattern.pattern())
    val inputs = Seq(
      "WV01_20240115_0000000000000042_0000000000000294_3m-dem.tif", // full match
      "WV02_20240103_0000000000000007_0000000000000049-dem.tif",    // optional res absent
      "not-a-dem-name.txt",                                         // no match
      "")                                                           // empty
    inputs.foreach { s =>
      val got = GraftTextKernels
        .regexpGroups(pat, UTF8String.fromString(s))
      val m = pat.matcher(s)
      val want: Seq[String] =
        if (m.find()) (1 to m.groupCount()).map(i => Option(m.group(i)).getOrElse(""))
        else Seq.fill(m.groupCount())("")
      assert(got.numElements() === want.size)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq === want, s"input: '$s'")
    }
  }
}
