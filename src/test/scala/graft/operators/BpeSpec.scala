package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.expr.BpeFunctions

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // "ab" dominates, then "abc"; freq ties break on pair order
  private val corpus = Seq(
    ("abc", 10L), ("abd", 6L), ("ab", 4L), ("xyz", 2L))

  test("train learns merges in frequency order with deterministic tie-breaks") {
    val m = Bpe.train(corpus, numMerges = 3)
    // pair counts round 1: (a,b)=20, (b,c)=10, (b,d)=6, (x,y)=2, (y,z)=2
    // round 2 (after ab): (ab,c)=10, (ab,d)=6, (x,y)=2, (y,z)=2
    // round 3: (ab,d)=6
    assert(m.merges == Seq(("a", "b"), ("ab", "c"), ("ab", "d")))
    assert(m.alphabet == Seq("a", "b", "c", "d", "x", "y", "z"))
    // ids: alphabet 1..7 sorted, then merge outputs 8..10 in rank order
    assert(m.vocab.toMap == Map(
      "a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L, "x" -> 5L, "y" -> 6L,
      "z" -> 7L, "ab" -> 8L, "abc" -> 9L, "abd" -> 10L))
  }

  test("train is input-order invariant") {
    val m1 = Bpe.train(corpus, 3)
    val m2 = Bpe.train(corpus.reverse, 3)
    assert(m1 == m2)
  }

  test("trainDistributed == driver trainer exactly, on the gate corpus's word table") {
    // the real corpus shape: word frequencies aggregated from documents
    // text, NOT the toy fixture — merges, alphabet, vocab, and ids must
    // be equal element-for-element, and partitioning must not matter
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wf = docs
      .select(explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val driver = Bpe.train(
      wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges = 30)
    val dist1 = Bpe.trainDistributed(wf.repartition(1), numMerges = 30)
    val dist16 = Bpe.trainDistributed(wf.repartition(16), numMerges = 30)
    assert(dist1 == driver, "single-partition distributed training diverged from the driver trainer")
    assert(dist16 == driver, "16-partition distributed training diverged from the driver trainer")
    assert(dist1.vocab == driver.vocab && dist1.alphabet == driver.alphabet)
  }

  test("trainDistributed matches the driver trainer on the tie-break fixture too") {
    val wf = corpus.toDF("w", "f")
    val m = Bpe.trainDistributed(wf.repartition(3), numMerges = 3)
    assert(m == Bpe.train(corpus, 3))
  }

  test("save/load round-trips a model exactly (merges in rank order, ids stable)") {
    val m = Bpe.train(corpus, 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    Bpe.save(spark, m, dir)
    val back = Bpe.load(spark, dir)
    assert(back == m)
    assert(back.vocab == m.vocab && back.alphabet == m.alphabet)
  }

  test("encode applies merges in rank order; pieces concatenate back to the word") {
    val m = Bpe.train(corpus, 3)
    assert(Bpe.encode("abcab", m.ranks).toSeq == Seq("abc", "ab"))
    assert(Bpe.encode("abdabc", m.ranks).toSeq == Seq("abd", "abc"))
    // untrained pair sequences stay characters
    assert(Bpe.encode("xyz", m.ranks).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encode("", m.ranks).toSeq == Seq.empty)
    // concat-invariance on arbitrary words (incl. OOV chars)
    for (w <- Seq("abcab", "zzzab", "qqq", "a", "dcba"))
      assert(Bpe.encode(w, m.ranks).mkString == w)
  }

  test("compiled kernel == reference encoder; OOV pieces map to id 0") {
    val m = Bpe.train(corpus, 3)
    val words = Seq("abcab", "abdabc", "xyz", "", "a", "qqab", "dcba")
    val viaExpr = words.toDF("w")
      .select(col("w"), BpeFunctions.bpeEncode(col("w"), m).as("p"))
      .select(col("w"), col("p"), BpeFunctions.bpeIds(col("p"), m).as("ids"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Long](2)))
    viaExpr.foreach { case (w, pieces, ids) =>
      assert(pieces == Bpe.encode(w, m.ranks).toSeq, s"kernel mismatch on '$w'")
      assert(ids == pieces.map(p => m.vocab.toMap.getOrElse(p, 0L)),
        s"ids mismatch on '$w'")
    }
    // 'q' is not in the training alphabet -> OOV id 0
    val q = viaExpr.find(_._1 == "qqab").get
    assert(q._3.take(2) == Seq(0L, 0L) && q._3.last > 0L)
  }
}
