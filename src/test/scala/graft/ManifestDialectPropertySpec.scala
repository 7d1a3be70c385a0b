package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized round trip of the manifest CSV dialect (pure functions —
  * `ManifestSink.csvField` encode, `ManifestDialect.splitCsv` decode):
  * for ANY record of nullable strings, encoding to one line and parsing
  * back yields the record, with the dialect's two documented
  * normalizations: NULL and "" both read back as NULL (Spark CSV
  * default), and the encoded line NEVER contains a raw CR/LF (the
  * one-record-per-physical-line invariant the line-wise reader and the
  * byte-range splits depend on). Seeded generator (the
  * ExpressionPropertySpec convention): failures reproduce, never flake. */
class ManifestDialectPropertySpec extends AnyFunSuite {

  private val Tricky: Array[String] = Array(
    ",", "\"", "\\", "\n", "\r", "\r\n", "\\n", "\\r", "\\\"",
    " ", "\t", "é", "✓", "𐐷" /* supplementary codepoint */,
    "a", "B", "7", "", "plain word")

  test("encode -> one physical line -> decode is the identity (mod NULL norm)") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 2000) {
      val nFields = 1 + rnd.nextInt(6)
      val fields: List[String] = List.fill(nFields) {
        rnd.nextInt(10) match {
          case 0 => null
          case 1 => ""
          case _ =>
            val n = rnd.nextInt(12)
            (0 until n).map(_ => Tricky(rnd.nextInt(Tricky.length))).mkString
        }
      }
      val line = fields
        .map(f => if (f == null) "" else graft.sources.ManifestSink.csvField(f))
        .mkString(",")
      assert(!line.contains('\n') && !line.contains('\r'),
        s"encoded line leaks a raw CR/LF: ${line.getBytes("UTF-8").toSeq}")
      val back = graft.sources.ManifestDialect.splitCsv(line).toList
      val expected = fields.map(f => if (f == null || f.isEmpty) null else f)
      assert(back == expected,
        s"round trip diverged for $fields -> [$line] -> $back")
    }
  }
}
