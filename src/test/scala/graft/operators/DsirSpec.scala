package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dsir]] — importance-resampling selection: weight direction on a
  * planted two-domain corpus, an independent driver reference for the
  * frozen micro-nat algebra, the zero-gram contract, and the top-k
  * selection boundary.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // target domain: legal-ish boilerplate; raw noise: digit soup. Target
  // membership is declared (is_tgt), not inferred from content.
  private lazy val corpus = Seq(
    (0L, true, "the party of the first part shall indemnify the party"),
    (1L, true, "the party of the second part shall hold harmless"),
    (2L, false, "the party of the first part shall indemnify everyone"),
    (3L, false, "9x7 q2z 8w1 v5k 3j6 p0m 4h8 r2t"),
    (4L, false, "zz9 yy8 xx7 ww6 vv5 uu4 tt3 ss2"),
    (5L, false, "")
  ).toDF("doc_id", "is_tgt", "text")

  test("direction: a target-like raw doc outranks digit soup") {
    val w = CacheScope.scoped {
      Dsir.importanceWeights(corpus, col("is_tgt"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(w(2L) > w(3L) && w(2L) > w(4L),
      s"target-like doc 2 (${w(2L)}) must beat noise (${w(3L)}, ${w(4L)})")
  }

  test("matches an independent driver reference (hash included)") {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    def buckets(s: String): Seq[Int] = {
      val t = norm(s)
      if (t.codePointCount(0, t.length) < 4) Nil
      else {
        val cps = t.toSeq.map(_.toString) // ASCII fixture: 1 char = 1 cp
        (0 to cps.length - 4).map { i =>
          val bytes = cps.slice(i, i + 4).mkString.getBytes("UTF-8")
          var h = 0xcbf29ce484222325L
          bytes.foreach { bt => h ^= (bt & 0xffL); h *= 0x100000001b3L }
          (graft.functions.expr.TextHashOps.fmix64(h) & 1023L).toInt
        }
      }
    }
    val rows = corpus.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    val all = rows.flatMap { case (id, t, s) => buckets(s).map(b => (id, t, b)) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (ctot, rtot) = (all.count(_._2).toLong, all.size.toLong)
    def sc(b: Int): Long = math.round((math.log(ct.getOrElse(b, 0L) + 1.0)
      - math.log(ctot + 1024.0) - math.log(cr(b) + 1.0) + math.log(rtot + 1024.0)) * 1e6)
    val want = rows.map { case (id, _, s) =>
      val bs = buckets(s)
      id -> ((bs.size.toLong, bs.map(sc).sum))
    }.toMap
    val got = CacheScope.scoped {
      Dsir.importanceWeights(corpus, col("is_tgt"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    assert(got == want)
  }

  test("zero-gram docs carry (0, 0) and lose deterministically, never vanish") {
    val out = CacheScope.scoped {
      Dsir.selectTop(corpus, col("is_tgt"), fraction = 0.5)
        .orderBy("doc_id").collect()
    }
    assert(out.length == 6, "every input doc present")
    val blank = out.find(_.getLong(0) == 5L).get
    assert(blank.getLong(1) == 0L && blank.getLong(2) == 0L)
  }

  test("selection is exactly the top ceil(fraction*N) by (weight desc, id)") {
    val out = CacheScope.scoped {
      Dsir.selectTop(corpus, col("is_tgt"), fraction = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    }
    val ranked = out.sortBy { case (id, w, _) => (-w, id) }
    val k = math.ceil(0.5 * out.length).toInt
    val wantSel = ranked.take(k).map(_._1).toSet
    out.foreach { case (id, _, sel) =>
      assert(sel == wantSel.contains(id), s"doc $id")
    }
  }

  test("threshold flagging == take-ordered flagging at every k, ties included") {
    // duplicated texts ⇒ identical weights crossing the boundary: the
    // id tie-break must pick the SMALLEST ids at the cutoff weight
    val tied = Seq(
      (10L, true, "the party of the first part shall indemnify the party"),
      (11L, false, "copy of a copy of a copy sits here verbatim."),
      (12L, false, "copy of a copy of a copy sits here verbatim."),
      (13L, false, "copy of a copy of a copy sits here verbatim."),
      (14L, false, "copy of a copy of a copy sits here verbatim."),
      (15L, false, "9x7 q2z 8w1 v5k 3j6 p0m 4h8 r2t"),
      (16L, false, "")
    ).toDF("doc_id", "is_tgt", "text")
    CacheScope.scoped {
      val w = Dsir.importanceWeights(tied, col("is_tgt"))
      (1L to 7L).foreach { k =>
        val a = Dsir.flagByThreshold(w, k).collect()
          .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
        val b = Dsir.flagTop(w, k).collect()
          .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
        assert(a == b, s"k=$k: threshold $a vs take-ordered $b")
        assert(a.values.count(identity) == k.toInt, s"k=$k selects exactly k")
      }
    }
  }

  test("the threshold selection plan has no take-ordered / limit / global sort") {
    // the only single-partition exchange allowed anywhere in the DSIR
    // chain is the dim-bounded 1-row totals aggregate; the SELECTION
    // itself must be a map-side comparison — no limit, no sort
    CacheScope.scoped {
      val plan = Dsir.selectTop(corpus, col("is_tgt"), fraction = 0.5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("TakeOrderedAndProject"), plan)
      assert(!plan.contains("GlobalLimit"), plan)
      assert(!plan.contains("CollectLimit"), plan)
      assert(!plan.contains("Sort "), plan)
    }
  }

  test("flagTop (the bounded-k path) fails fast past Int.MaxValue instead of wrapping") {
    val w = Dsir.importanceWeights(corpus, col("is_tgt"))
    intercept[IllegalArgumentException] {
      Dsir.flagTop(w, Int.MaxValue.toLong + 1)
    }
  }
}
