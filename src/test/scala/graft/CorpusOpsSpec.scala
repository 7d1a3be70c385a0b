package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the corpus-prep operators (values are
  * oracle-checked by the driver; these pin the properties the oracle
  * comparison can't see from a single run). */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q389 redacts the injected contact line in every document") {
    val rows = SparkEntry.queries("q389_pii_redact")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, s"doc ${r.getLong(0)}: no email redacted")
      assert(r.getInt(2) >= 1, s"doc ${r.getLong(0)}: no phone redacted")
    }
  }

  test("q390 packing respects the budget and bin contiguity per lang") {
    val rows = SparkEntry.queries("q390_context_packing")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val sorted = docs.sortBy(_._2)
      var prevBin = 0
      var prevFill = 0
      sorted.foreach { case (_, id, nTok, bin, fill) =>
        assert(bin == prevBin || bin == prevBin + 1,
          s"$lang/$id: bins must advance by at most 1")
        if (bin == prevBin) {
          assert(fill == prevFill + nTok, s"$lang/$id: fill must accumulate")
          assert(fill <= 512, s"$lang/$id: shared bin over budget")
        } else {
          assert(fill == nTok, s"$lang/$id: new bin starts at its own size")
          // a doc only opens a new bin if it did not fit the previous one
          assert(prevFill + nTok > 512 || prevBin == 0,
            s"$lang/$id: opened a new bin despite fitting")
        }
        prevBin = bin; prevFill = fill
      }
    }
  }

  test("q388 BPE training returns well-formed, reproducible merges") {
    val m1 = SparkEntry.queries("q388_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m1.length == 8)
    assert(m1.map(_._1).toSeq == (1 to 8))
    m1.foreach { case (step, l, rr, merged, n) =>
      assert(merged == l + rr, s"step $step: merged must be lft+rgt")
      assert(n > 0)
    }
    // deterministic: a second run learns the identical table
    val m2 = SparkEntry.queries("q388_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m1.toSeq == m2.toSeq)
  }
}
