package graft.operators

import graft.SparkTestBase

/** [[UnigramLm]] — hand-computed NLL on a tiny corpus, the filter
  * direction (rare-token docs score higher), invariance under
  * duplication-consistent scoring, the head/tail de-skew split
  * (execution strategy only — results identical at any `headVocab`),
  * and zero-token-doc emission.
  */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  private def scores(rows: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    UnigramLm.scoreDocs(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("hand-computed NLL: cf {a:3,b:1,c:1}, N=5") {
    val got = scores(Seq((1L, "a a b"), (2L, "a c")))
    // doc1: ln5 - (2 ln3 + ln1)/3 ; doc2: ln5 - (ln3 + ln1)/2
    val d1 = math.log(5) - (2 * math.log(3)) / 3
    val d2 = math.log(5) - math.log(3) / 2
    assert(got(1L)._1 === 3L)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(1L)._2 - d1) < 1e-6)
    assert(math.abs(got(2L)._2 - d2) < 1e-6)
  }

  test("filter direction: a rare-token doc scores above a common-token doc") {
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat")) ++
      Seq((100L, "zxqv flrm qwpt jklz"))
    val got = scores(corpus)
    assert(got(100L)._2 > got(1L)._2 + 1.0,
      s"gibberish ${got(100L)._2} should score far above prose ${got(1L)._2}")
  }

  test("identical docs score identically; normalization folds case/whitespace") {
    val got = scores(Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other text")))
    assert(got(1L) === got(2L))
  }

  test("head/tail split is pure execution strategy: headVocab=2 (forced tail) " +
      "== headVocab=all (pure broadcast)") {
    val docs = Seq((1L, "a a b c d"), (2L, "a b e f"), (3L, "c c g a"),
      (4L, "h i j"), (5L, "a b c")).toDF("doc_id", "text")
    def run(hv: Int) = UnigramLm.scoreDocs(docs, headVocab = hv)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(2) === run(1 << 16))
  }

  test("the head join is broadcast (the de-skew invariant: occurrence rows " +
      "must not shuffle by token for head-vocabulary tokens)") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val phys = UnigramLm.scoreDocs(docs).queryExecution.executedPlan.toString
    assert(phys.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("token")),
      s"head-vocab scoring join must be a broadcast hash join on token:\n$phys")
  }

  private def bigramScores(rows: Seq[(Long, String)], hv: Int = 1 << 16): Map[Long, (Long, Double)] =
    UnigramLm.scoreDocsBigram(rows.toDF("doc_id", "text"), headVocab = hv)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))))
      .toMap

  test("bigram: hand-computed NLL with BOS context and add-one smoothing") {
    // corpus: "a b" / "a c". V=3 {a,b,c}. bcf: ("",a)=2, (a,b)=1, (a,c)=1;
    // ctx: ""=2, a=2.
    // doc1 = [ln((2+3)/(2+1)) + ln((2+3)/(1+1))]/2 ; doc2 same by symmetry
    val got = bigramScores(Seq((1L, "a b"), (2L, "a c")))
    val expected = (math.log(5.0 / 3.0) + math.log(5.0 / 2.0)) / 2
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - expected) < 1e-6)
    assert(math.abs(got(2L)._2 - expected) < 1e-6)
  }

  test("bigram catches scrambled word order where the unigram cannot") {
    // 20 copies of ordered prose + one doc with the SAME unigram
    // distribution in scrambled order: identical unigram NLL by
    // construction, but its transitions are unseen and pay the
    // add-one penalty under the bigram
    val prose = "the cat sat on the mat"
    val scrambled = "mat the on sat cat the"
    val corpus = (1L to 20L).map(i => (i, prose)) :+ (100L, scrambled)
    val uni = scores(corpus)
    assert(math.abs(uni(100L)._2 - uni(1L)._2) < 1e-9,
      "unigram is order-blind by construction")
    val bi = bigramScores(corpus)
    assert(bi(100L)._2 > bi(1L)._2 + 0.5,
      s"scrambled ${bi(100L)._2} must score above prose ${bi(1L)._2} under bigram")
  }

  test("bigram head/tail split is pure execution strategy (forced tail == pure broadcast)") {
    val rows = Seq((1L, "a a b c d"), (2L, "a b e f"), (3L, "c c g a"),
      (4L, "h i j"), (5L, "a b c"), (6L, ""))
    def run(hv: Int) = UnigramLm.scoreDocsBigram(rows.toDF("doc_id", "text"), headVocab = hv)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(run(2) === run(1 << 16))
  }

  test("bigram zero-token docs are emitted with n_tokens=0 and NULL nll") {
    val rows = UnigramLm.scoreDocsBigram(
        Seq((1L, "real text here"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) === 0L && rows(2).isNullAt(2))
    assert(rows(0).getLong(1) === 3L && !rows(0).isNullAt(2))
  }

  /** Independent interpolated-KN reference over collected counts. */
  private def knReference(
      rows: Seq[(Long, String)], d: Double = 0.75): Map[Long, (Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val bigrams = rows.flatMap { case (id, t) =>
      val ts = toks(t)
      ts.zip("" +: ts).map { case (cur, prev) => (id, prev, cur) }
    }
    val bcf = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toDouble).toMap
    val ctx = bcf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = bcf.groupBy(_._1._1).view.mapValues(_.size.toDouble).toMap
    val n1c = bcf.groupBy(_._1._2).view.mapValues(_.size.toDouble).toMap
    val bt = bcf.size.toDouble
    rows.map { case (id, t) =>
      val ts = toks(t)
      if (ts.isEmpty) id -> ((0L, Double.NaN))
      else {
        val nll = ts.zip("" +: ts).map { case (cur, prev) =>
          val p = math.max(bcf((prev, cur)) - d, 0.0) / ctx(prev) +
            (d * n1p(prev) / ctx(prev)) * (n1c(cur) / bt)
          -math.log(p)
        }
        id -> ((ts.size.toLong, nll.sum / nll.size))
      }
    }.toMap
  }

  /** Independent three-level interpolated-KN reference (Chen & Goodman):
    * raw counts at trigram order, continuation counts below.
    */
  private def kn3Reference(
      rows: Seq[(Long, String)], d: Double = 0.75): Map[Long, (Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    val tris = rows.flatMap { case (_, t) =>
      val ts = toks(t)
      ts.indices.map { i =>
        (if (i >= 2) ts(i - 2) else "", if (i >= 1) ts(i - 1) else "", ts(i))
      }
    }
    val tcf = tris.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ctx3 = tcf.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.values.sum).toMap
    val n1p3 = tcf.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.size.toDouble).toMap
    val c2 = tcf.keys.toSeq.map(k => (k._2, k._3)).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap // N1+(·p1 cur)
    val cmid = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pmid = c2.groupBy(_._1._1).view.mapValues(_.size.toDouble).toMap
    val c1 = c2.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val bt = c2.size.toDouble
    rows.map { case (id, t) =>
      val ts = toks(t)
      if (ts.isEmpty) id -> ((0L, Double.NaN))
      else {
        val nll = ts.indices.map { i =>
          val (p2, p1, cur) =
            (if (i >= 2) ts(i - 2) else "", if (i >= 1) ts(i - 1) else "", ts(i))
          val pmid = math.max(c2((p1, cur)) - d, 0.0) / cmid(p1) +
            (d * n1pmid(p1) / cmid(p1)) * (c1(cur) / bt)
          val p = math.max(tcf((p2, p1, cur)) - d, 0.0) / ctx3((p2, p1)) +
            (d * n1p3((p2, p1)) / ctx3((p2, p1))) * pmid
          -math.log(p)
        }
        id -> ((ts.size.toLong, nll.sum / nll.size))
      }
    }.toMap
  }

  test("trigram kneser-ney matches an independent three-level reference") {
    val rows = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "san francisco is far from here"),
      (4L, "a cat and a dog and a bird"), (5L, "the cat sat"),
      (6L, "the cat sat on the mat"))
    val got = UnigramLm.scoreDocsKneserNeyTrigram(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ref = kn3Reference(rows)
    rows.foreach { case (id, _) =>
      assert(got(id)._1 == ref(id)._1, s"n_tokens doc $id")
      assert(math.abs(got(id)._2 - ref(id)._2) < 1e-6,
        s"doc $id: got ${got(id)._2} vs ref ${ref(id)._2}")
    }
  }

  test("trigram kneser-ney: a seen trigram path scores below a novel recombination") {
    // both docs use only seen BIGRAMS, but doc 20's exact trigrams are
    // novel recombinations — only an order-3 model separates them
    val corpus = Seq(
      (1L, "x a b c y"), (2L, "x a b c y"), (3L, "z a b q y"), (4L, "w b c k"),
      (10L, "x a b c y"),  // the seen path
      (20L, "z a b c k"))  // bigrams (z,a)(a,b)(b,c)(c,k) all seen; trigrams novel
    val got = UnigramLm.scoreDocsKneserNeyTrigram(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10L) < got(20L),
      s"seen path ${got(10L)} must score below novel recombination ${got(20L)}")
  }

  test("trigram kneser-ney head/tail split is pure execution strategy (forced tail == broadcast)") {
    val rows = Seq((1L, "a b a b c"), (2L, "b c a a b"), (3L, "c a b b a"))
      .toDF("doc_id", "text")
    val full = UnigramLm.scoreDocsKneserNeyTrigram(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val forcedTail = UnigramLm.scoreDocsKneserNeyTrigram(rows, headVocab = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full === forcedTail)
  }

  test("trigram kneser-ney zero-token docs are emitted with n_tokens=0 and NULL nll") {
    val rows = UnigramLm.scoreDocsKneserNeyTrigram(
        Seq((1L, "real text here"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) === 0L && rows(2).isNullAt(2))
    assert(rows(0).getLong(1) === 3L && !rows(0).isNullAt(2))
  }

  test("kneser-ney matches an independent reference on a mixed corpus") {
    val rows = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "san francisco is far from here"),
      (4L, "a cat and a dog and a bird"), (5L, "the cat sat"))
    val got = UnigramLm.scoreDocsKneserNey(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ref = knReference(rows)
    rows.foreach { case (id, _) =>
      assert(got(id)._1 == ref(id)._1, s"n_tokens doc $id")
      assert(math.abs(got(id)._2 - ref(id)._2) < 1e-6,
        s"doc $id: got ${got(id)._2} vs ref ${ref(id)._2}")
    }
  }

  test("kneser-ney continuation insight: versatile continuation beats " +
      "fixed collocation at equal bigram count") {
    // 'b' follows 4 distinct contexts; 'z' follows only 'q'. The pairs
    // (x b) and (q z) each occur once with ctx(x)=ctx(q), so add-one
    // scores them EQUAL — KN's continuation count must make the
    // versatile 'b' strictly cheaper than the collocation-bound 'z'.
    val rows = Seq(
      (1L, "u b"), (2L, "v b"), (3L, "w b"),
      (4L, "x b"), (5L, "q z"))
    val kn = UnigramLm.scoreDocsKneserNey(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn(4L) < kn(5L),
      s"versatile-continuation doc ${kn(4L)} should beat collocation doc ${kn(5L)}")
    val addOne = UnigramLm.scoreDocsBigram(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(addOne(4L) == addOne(5L),
      "add-one cannot distinguish these by construction — if it can, the fixture broke")
  }

  test("kneser-ney head/tail split is pure execution strategy (forced tail == broadcast)") {
    val rows = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat here"),
      (3L, "a cat and a dog"))
    val a = UnigramLm.scoreDocsKneserNey(rows.toDF("doc_id", "text"), headVocab = 2)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = UnigramLm.scoreDocsKneserNey(rows.toDF("doc_id", "text"), headVocab = 1 << 16)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("kneser-ney zero-token docs are emitted with n_tokens=0 and NULL nll") {
    val rows = UnigramLm.scoreDocsKneserNey(
        Seq((1L, "real text here"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) === 0L && rows(2).isNullAt(2))
    assert(rows(0).getLong(1) === 3L && !rows(0).isNullAt(2))
  }

  test("zero-token docs are emitted with n_tokens=0 and NULL nll") {
    val rows = UnigramLm.scoreDocs(
        Seq((1L, "real text here"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) === 0L && rows(2).isNullAt(2))
    assert(rows(0).getLong(1) === 3L && !rows(0).isNullAt(2))
  }

  /** Independent FOUR-level interpolated-KN reference: raw counts at
    * 4-gram order, continuation counts telescoping below.
    */
  private def kn4Reference(
      rows: Seq[(Long, String)], d: Double = 0.75): Map[Long, (Long, Double)] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    def ctxAt(ts: Seq[String], i: Int, k: Int): String =
      if (i >= k) ts(i - k) else ""
    val quads = rows.flatMap { case (_, t) =>
      val ts = toks(t)
      ts.indices.map(i => (ctxAt(ts, i, 3), ctxAt(ts, i, 2), ctxAt(ts, i, 1), ts(i)))
    }
    val qcf = quads.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ctx4 = qcf.groupBy(k => (k._1._1, k._1._2, k._1._3)).view.mapValues(_.values.sum).toMap
    val n1p4 = qcf.groupBy(k => (k._1._1, k._1._2, k._1._3)).view.mapValues(_.size.toDouble).toMap
    val c3 = qcf.keys.toSeq.map(k => (k._2, k._3, k._4)).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap // N1+(·p2 p1 cur)
    val cmid3 = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.values.sum).toMap
    val n1pmid3 = c3.groupBy(k => (k._1._1, k._1._2)).view.mapValues(_.size.toDouble).toMap
    val c2 = c3.keys.toSeq.map(k => (k._2, k._3)).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap // N1+(·p1 cur) over trigram types
    val cmid2 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1pmid2 = c2.groupBy(_._1._1).view.mapValues(_.size.toDouble).toMap
    val c1 = c2.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val bt = c2.size.toDouble
    rows.map { case (id, t) =>
      val ts = toks(t)
      if (ts.isEmpty) id -> ((0L, Double.NaN))
      else {
        val nll = ts.indices.map { i =>
          val (p3, p2, p1, cur) =
            (ctxAt(ts, i, 3), ctxAt(ts, i, 2), ctxAt(ts, i, 1), ts(i))
          val plow = math.max(c2((p1, cur)) - d, 0.0) / cmid2(p1) +
            (d * n1pmid2(p1) / cmid2(p1)) * (c1(cur) / bt)
          val pmid = math.max(c3((p2, p1, cur)) - d, 0.0) / cmid3((p2, p1)) +
            (d * n1pmid3((p2, p1)) / cmid3((p2, p1))) * plow
          val p = math.max(qcf((p3, p2, p1, cur)) - d, 0.0) / ctx4((p3, p2, p1)) +
            (d * n1p4((p3, p2, p1)) / ctx4((p3, p2, p1))) * pmid
          -math.log(p)
        }
        id -> ((ts.size.toLong, nll.sum / nll.size))
      }
    }.toMap
  }

  test("4-gram kneser-ney matches an independent four-level reference") {
    val rows = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"),
      (3L, "san francisco is far from here today"),
      (4L, "a cat and a dog and a bird"), (5L, "the cat sat"),
      (6L, "the cat sat on the mat"), (7L, "the cat sat on a rug"))
    val got = UnigramLm.scoreDocsKneserNey4gram(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ref = kn4Reference(rows)
    rows.foreach { case (id, _) =>
      assert(got(id)._1 == ref(id)._1, s"n_tokens doc $id")
      assert(math.abs(got(id)._2 - ref(id)._2) < 1e-6,
        s"doc $id: got ${got(id)._2} vs ref ${ref(id)._2}")
    }
  }

  test("4-gram kneser-ney: a seen 4-gram path scores below a novel " +
      "recombination whose trigrams are all seen") {
    // both test docs use only SEEN trigrams; doc 20's exact 4-grams are
    // novel recombinations — only an order-4 model separates them
    val corpus = Seq(
      (1L, "v w x y z"), (2L, "v w x y z"), (3L, "u w x y t"), (4L, "s x y z r"),
      (10L, "v w x y z"),  // the seen path
      (20L, "u w x y z"))  // trigrams (u,w,x)(w,x,y)(x,y,z) all seen; 4-grams novel
    val got = UnigramLm.scoreDocsKneserNey4gram(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10L) < got(20L),
      s"seen path ${got(10L)} must score below novel recombination ${got(20L)}")
  }

  test("4-gram kneser-ney head/tail split is pure execution strategy " +
      "(forced tail == broadcast)") {
    val rows = Seq((1L, "a b a b c d"), (2L, "b c a a b d"), (3L, "c a b b a"))
      .toDF("doc_id", "text")
    val full = UnigramLm.scoreDocsKneserNey4gram(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val forcedTail = UnigramLm.scoreDocsKneserNey4gram(rows, headVocab = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full === forcedTail)
  }

  test("4-gram kneser-ney zero-token docs are emitted with n_tokens=0 and NULL nll") {
    val rows = UnigramLm.scoreDocsKneserNey4gram(
        Seq((1L, "real text here now"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
    assert(rows(2).getLong(1) === 0L && rows(2).isNullAt(2))
    assert(rows(0).getLong(1) === 4L && !rows(0).isNullAt(2))
  }
}
