package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pins the load-bearing claim of q409's oracle design: the DP in
  * [[graft.functions.UnigramViterbi]] picks EXACTLY the segmentation a
  * full enumeration picks under the (cost, npieces, cutmask) total
  * order — for randomized vocabs and words. */
class UnigramViterbiSpec extends AnyFunSuite {

  private def enumerate(
      w: String, costs: Map[String, Int], maxLen: Int): Seq[(Long, Long, Long, List[String])] = {
    def go(pos: Int): Seq[(Long, Long, Long, List[String])] =
      if (pos == w.length) Seq((0L, 0L, 0L, Nil))
      else (1 to math.min(maxLen, w.length - pos)).flatMap { l =>
        val piece = w.substring(pos, pos + l)
        costs.get(piece) match {
          case None => Nil
          case Some(c) =>
            val bit = if (pos + l < w.length) 1L << (pos + l) else 0L
            go(pos + l).map { case (cost, np, mask, ps) =>
              (cost + c, np + 1, mask + bit, piece :: ps)
            }
        }
      }
    go(0)
  }

  test("DP winner equals the enumeration minimum on 500 random cases") {
    val rnd = new scala.util.Random(42)
    var nonTrivial = 0
    (1 to 500).foreach { i =>
      val alphabet = "abc"
      val wordLen = 1 + rnd.nextInt(9)
      val w = Array.fill(wordLen)(alphabet(rnd.nextInt(3))).mkString
      // all single chars (guaranteed segmentability) + random multis
      val singles = alphabet.map(c => c.toString -> (1 + rnd.nextInt(60)))
      val multis = (1 to 6).map { _ =>
        val l = 2 + rnd.nextInt(2)
        Array.fill(l)(alphabet(rnd.nextInt(3))).mkString -> (1 + rnd.nextInt(60))
      }
      val costs = (singles ++ multis).toMap
      val vocab = costs.toArray
      val expr = graft.functions.UnigramViterbi(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          w, org.apache.spark.sql.types.StringType),
        vocab)
      val got = expr.segment(UTF8String.fromString(w))
      val all = enumerate(w, costs, 3)
      assert(all.nonEmpty, s"case $i: unsegmentable $w")
      if (all.length > 1) nonTrivial += 1
      val best = all.min(Ordering.by[(Long, Long, Long, List[String]), (Long, Long, Long)](
        t => (t._1, t._2, t._3)))
      val gotPieces = (0 until got.numElements())
        .map(j => got.getUTF8String(j).toString).toList
      assert(gotPieces == best._4,
        s"case $i: word $w costs $costs dp=$gotPieces enum=${best._4}")
      assert(gotPieces.mkString == w)
    }
    assert(nonTrivial > 300, s"only $nonTrivial multi-choice cases — weak test")
  }

  test("unsegmentable word returns null") {
    val expr = graft.functions.UnigramViterbi(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "x", org.apache.spark.sql.types.StringType),
      Array("a" -> 1))
    assert(expr.segment(UTF8String.fromString("xa")) == null)
  }
}
