package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property checks for the custom Catalyst expressions,
  * evaluated directly (interpreted path; codegen agreement is covered by
  * FunctionsSpec and every gate query). Seeded generators keep every run
  * identical — a failure reproduces by seed, never flakes.
  */
class ExpressionPropertySpec extends AnyFunSuite {

  private val Cases = 200

  private def doubleArray(r: scala.util.Random, n: Int): Array[Double] =
    Array.fill(n)((r.nextDouble() - 0.5) * math.pow(10, r.nextInt(6) - 3))

  test("graft_dot equals the sequential fold on random vectors") {
    val r = new scala.util.Random(0xD07)
    (1 to Cases).foreach { _ =>
      val n = r.nextInt(65)
      val a = doubleArray(r, n); val b = doubleArray(r, n)
      val e = functions.DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType)))
      var exp = 0.0
      var i = 0
      while (i < n) { exp += a(i) * b(i); i += 1 }
      // bit-exact, not approximate: same fold order must give same bits
      assert(java.lang.Double.doubleToLongBits(e.eval(null).asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(exp))
    }
  }

  private def randomString(r: scala.util.Random): String = {
    val sb = new StringBuilder
    (0 until r.nextInt(40)).foreach { _ =>
      r.nextInt(6) match {
        case 0 => sb.append(('a' + r.nextInt(26)).toChar)
        case 1 => sb.append(' ')
        case 2 => sb.append((0x80 + r.nextInt(0x500)).toChar)      // Latin/Greek/Cyrillic
        case 3 => sb.append((0x4e00 + r.nextInt(0x100)).toChar)    // CJK
        case 4 => sb.appendAll(Character.toChars(0x1F600 + r.nextInt(0x50))) // surrogate pair
        case 5 => sb.append((0x300 + r.nextInt(0x20)).toChar)      // combining mark
      }
    }
    sb.toString
  }

  test("graft_isect_count equals set-intersection size on random sorted arrays") {
    val r = new scala.util.Random(0x15EC7)
    (1 to Cases).foreach { _ =>
      // distinct sorted arrays (the adjacency-list contract)
      val a = Array.fill(r.nextInt(60))(r.nextInt(80).toLong).distinct.sorted
      val b = Array.fill(r.nextInt(60))(r.nextInt(80).toLong).distinct.sorted
      val e = functions.SortedIntersectCount(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType)))
      assert(e.eval(null).asInstanceOf[Long] ===
        a.toSet.intersect(b.toSet).size.toLong)
    }
    // empty sides
    val empty = Literal.create(Array.empty[Long], ArrayType(LongType))
    val one = Literal.create(Array(1L, 2L), ArrayType(LongType))
    assert(functions.SortedIntersectCount(empty, one).eval(null) === 0L)
    assert(functions.SortedIntersectCount(one, empty).eval(null) === 0L)
  }

  test("graft_char_stats equals a codepoint-histogram replay on random unicode") {
    val r = new scala.util.Random(0xC5A7)
    (1 to Cases).foreach { _ =>
      val s = randomString(r)
      val e = functions.CharStats(
        Literal.create(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
      val row = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val cps = s.codePoints().toArray
      if (cps.isEmpty) {
        assert(row.getLong(0) === 0L && row.getLong(1) === 0L)
        assert(row.isNullAt(2) && row.getLong(3) === 0L)
      } else {
        val hist = cps.groupBy(identity).map { case (c, g) => (c, g.length.toLong) }
        val (topC, topN) = hist.toSeq.minBy { case (c, n) => (-n, c) }
        assert(row.getLong(0) === cps.length.toLong)
        assert(row.getLong(1) === hist.size.toLong)
        assert(row.getUTF8String(2).toString ===
          new String(Character.toChars(topC)))
        assert(row.getLong(3) === topN)
      }
    }
  }

  test("graft_polyhash folds codepoints with mod at every step, result in [0, mod)") {
    val r = new scala.util.Random(0xB0B)
    val (seed, mult, mod) = (7L, 31L, 1000000007L)
    (1 to Cases).foreach { _ =>
      val s = randomString(r)
      val e = functions.PolyHash(Literal.create(UTF8String.fromString(s)), seed, mult, mod)
      var acc = seed
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * mult + cp) % mod
        i += Character.charCount(cp)
      }
      val got = e.eval(null).asInstanceOf[Long]
      assert(got == acc)
      assert(got >= 0 && got < mod)
    }
  }

  test("graft_minhash is token-order and duplicate invariant, element-wise minimal") {
    val r = new scala.util.Random(0x517)
    val p = 2038074743L
    val a = Array.fill(8)(1 + r.nextLong(p - 1))
    val b = Array.fill(8)(r.nextLong(p))
    (1 to Cases).foreach { _ =>
      val tokens = Array.fill(1 + r.nextInt(30))(r.nextLong(1L << 40))
      def sig(ts: Array[Long]): Seq[Long] = {
        val e = functions.MinHashSig(
          Literal.create(ts, ArrayType(LongType)), a, b, p)
        e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      }
      val base = sig(tokens)
      // set semantics: shuffling and duplicating tokens changes nothing
      val shuffled = r.shuffle(tokens.toSeq).toArray
      assert(sig(shuffled) == base)
      assert(sig(tokens ++ tokens.take(1 + r.nextInt(tokens.length))) == base)
      // each element is the documented per-permutation minimum
      base.zipWithIndex.foreach { case (v, i) =>
        assert(v == tokens.map(x => Math.floorMod(a(i) * x + b(i), p)).min)
      }
    }
  }

  test("graft_nfc and graft_strip_accents match java.text.Normalizer on random text") {
    val r = new scala.util.Random(0x11FC)
    (1 to Cases).foreach { _ =>
      val s = randomString(r)
      val nfc = functions.NfcNormalize(Literal.create(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[UTF8String].toString
      assert(nfc == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      val stripped = functions.StripAccents(Literal.create(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[UTF8String].toString
      val exp = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
        .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
      assert(stripped == exp)
    }
  }

  test("graft_shingles equals sliding n-grams of the space-split words") {
    val r = new scala.util.Random(0x5417)
    (1 to Cases).foreach { _ =>
      val words = Array.fill(r.nextInt(20))("w" + r.nextInt(6))
      val text = words.mkString(" ")
      val n = 1 + r.nextInt(4)
      val e = functions.WordShingles(
        Literal.create(UTF8String.fromString(text)), n)
      val got = e.eval(null).asInstanceOf[ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val split = text.split(' ') // split semantics, incl. the empty-text case
      val exp =
        if (split.length < n) Seq.empty
        else split.sliding(n).map(_.mkString(" ")).toSeq.distinct
      assert(got == exp, s"text='$text' n=$n")
    }
  }
}
