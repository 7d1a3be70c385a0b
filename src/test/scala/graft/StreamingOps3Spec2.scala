package graft

import org.scalatest.funsuite.AnyFunSuite

/** q337 streaming funnel automaton. */
class StreamingOps3Spec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q337 streaming automaton equals the q324 batch regex per " +
    "(user, day)") {
    val stream = SparkEntry.queries("q337_stream_funnel_automaton")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    val batch = SparkEntry.queries("q324_sequence_pattern_match")(
      spark, dir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(stream === batch,
      s"streaming/batch divergence (${stream.size} vs ${batch.size} keys)")
    assert(stream.valuesIterator.exists(_._2 > 0),
      "fixture must contain funnel matches")
  }

  test("q337 DFA is the regex: agreement on exhaustive short strings") {
    // every string over {c,e,p,s,v} up to length 6: DFA count must
    // equal the non-overlapping regex count
    val pat = "v[cv]*p".r
    val alpha = "cepsv"
    def dfaCount(s: String): Long = {
      var phase = 0; var n = 0L
      s.foreach { c =>
        phase = (phase, c) match {
          case (0, 'v') => 1
          case (0, _) => 0
          case (1, 'p') => n += 1; 0
          case (1, 'c') | (1, 'v') => 1
          case (1, _) => 0
        }
      }
      n
    }
    def all(len: Int): Iterator[String] =
      if (len == 0) Iterator("")
      else all(len - 1).flatMap(s => alpha.map(c => s + c))
    (0 to 6).foreach { len =>
      all(len).foreach { s =>
        assert(dfaCount(s) === pat.findAllIn(s).size.toLong,
          s"DFA/regex disagreement on '$s'")
      }
    }
  }
}
