package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.functions.expr.HashFunctions.{minhashSignature, rollingFingerprint, simhash64}
import graft.functions.expr.VectorFunctions.cosineSim
import graft.functions.expr.ZOrderFunctions.zValue

/** The SQL registration surface: every builder in
  * [[GraftExtensions.functions]] must produce the SAME expression the
  * Column API produces (checked value-for-value through spark.sql), and
  * non-literal structural args must fail loudly.
  */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.registerAll(spark)

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox jumps over the lazy cat")
  ).toDF("doc_id", "text")

  test("every function description registers and resolves") {
    registered
    for ((ident, _, _) <- GraftExtensions.functions) {
      assert(spark.catalog.functionExists(ident.funcName),
        s"${ident.funcName} did not register")
    }
  }

  test("scalar kernels: SQL call == Column API call") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
               graft_simhash64(split(text, ' ')) AS sh,
               graft_minhash(split(text, ' '), 8, 42) AS mh,
               graft_rolling_fingerprint(split(text, ' '), 3) AS fp,
               graft_zvalue(doc_id, doc_id + 1, 8) AS z
        FROM ext_docs ORDER BY doc_id""")
    val viaCol = docs.select(col("doc_id"),
        simhash64(split(col("text"), " ")).as("sh"),
        minhashSignature(split(col("text"), " "), k = 8, seed = 42L).as("mh"),
        rollingFingerprint(split(col("text"), " "), window = 3).as("fp"),
        zValue(col("doc_id"), col("doc_id") + 1, bitsPer = 8).as("z"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq == viaCol.collect().toSeq)
  }

  test("vector kernels through SQL") {
    registered
    val r = spark.sql(
      """SELECT round(graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS c1,
               round(graft_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)), 6) AS c0,
               graft_dot(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS d""").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 23.0) < 1e-9)
    // parity with the Column API on real data
    val a = array(lit(0.5f), lit(0.5f)); val b = array(lit(0.25f), lit(0.75f))
    val viaCol = spark.range(1).select(cosineSim(a, b).as("c")).head().getDouble(0)
    val viaSql = spark.sql(
      "SELECT graft_cosine(array(0.5F, 0.5F), array(0.25F, 0.75F)) AS c")
      .head().getDouble(0)
    assert(viaSql == viaCol)
  }

  test("aggregates work from SQL with GROUP BY (analyzer wraps the bare function)") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val top = spark.sql(
      """SELECT graft_bounded_topk(struct(CAST(doc_id AS DOUBLE), doc_id), 2) AS t
        FROM ext_docs""").head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(1)) == Seq(3L, 2L)) // best-first by score desc
    // 26 tokens, capacity 8: anything with freq > 26/9 ≈ 2.9 is
    // guaranteed to survive — that's exactly "the" (freq 4)
    val mg = spark.sql(
      """SELECT graft_mg_summary(tok, 8) AS s
        FROM (SELECT explode(split(text, ' ')) AS tok FROM ext_docs)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.nonEmpty && mg.size <= 8)
    assert(mg.map(_.getString(0)).contains("the"))
  }

  test("structural args must be integer literals — loud failure otherwise") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash(split(text, ' '), doc_id, 42) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("integer literal")
      || Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }

  test("config-time injection path: the extensions class injects without error") {
    // The shared test session predates the config, so exercise the
    // injection API against a fresh SparkSessionExtensions directly —
    // the same object Spark hands the class at session build.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }

  test("txtable() TVF: the transactional table reads from pure SQL, with " +
      "version'd time travel") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("txtvf").toString
    import graft.sources.TxTable
    TxTable.append(spark, dir,
      (0L until 10L).map(i => (i, i * 2)).toDF("id", "v"), statsCols = Seq("id"))
    TxTable.append(spark, dir,
      (10L until 20L).map(i => (i, i * 2)).toDF("id", "v"), statsCols = Seq("id"))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM txtable('$dir')")
      .head().getLong(0) == 20L)
    // time travel through the second literal argument
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM txtable('$dir', 1)")
      .head().getLong(0) == 10L)
    // a plain SQL WHERE over the stats column answers exactly (the
    // pruning itself is pinned by TxFileIndexSpec — same read path)
    assert(spark.sql(
        s"SELECT id FROM txtable('$dir') WHERE id BETWEEN 3 AND 5 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
  }

  test("txtable() TVF time-travels by TIMESTAMP through the in-commit " +
      "clock (TIMESTAMP AS OF from pure SQL)") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("txtvft").toString
    import graft.sources.TxTable
    TxTable.append(spark, dir, (0L until 10L).map(i => (i, i)).toDF("id", "v"))
    TxTable.append(spark, dir, (10L until 20L).map(i => (i, i)).toDF("id", "v"))
    val ts1 = TxTable.history(spark, dir).filter(col("version") === 1L)
      .head().getLong(1)
    val litTs = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
        s"SELECT COUNT(*) AS n FROM txtable('$dir', TIMESTAMP '$litTs')")
      .head().getLong(0) == 10L,
      "the cut at v1's own commit timestamp must read exactly v1")
    // before retained history: informative failure, not a wrong answer
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM txtable('$dir', TIMESTAMP '1999-01-01 00:00:00')")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("predates")), e.getMessage)
  }

  test("txtable() TVF on a fully-deleted table returns a TYPED empty " +
      "frame, matching the Scala snapshot (r16 advice)") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("txtvfe").toString
    import graft.sources.TxTable
    import org.apache.spark.sql.functions.col
    TxTable.append(spark, dir, (0L until 4L).map(i => (i, i)).toDF("id", "v"))
    TxTable.delete(spark, dir, col("id") >= 0L) // empty live set
    val got = spark.sql(s"SELECT * FROM txtable('$dir')")
    assert(got.columns.toSeq == Seq("id", "v"),
      "the tracked schema action must type the empty read")
    assert(got.count() == 0L)
  }

  test("txtable_changes() TVF: the per-version change feed from pure SQL") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("txtvfc").toString
    import graft.sources.TxTable
    import org.apache.spark.sql.functions.col
    TxTable.append(spark, dir, (0L until 6L).map(i => (i, i)).toDF("id", "v"))
    TxTable.delete(spark, dir, col("id") < 2L)
    val got = spark.sql(
        s"""SELECT _commit_version, _change_type, COUNT(*) AS n
           FROM txtable_changes('$dir', 0, 2)
           GROUP BY 1, 2 ORDER BY 1, 2""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "insert", 6L), (2L, "delete", 2L)))
  }

  test("txgroup() TVF reads one member table of a transaction group, " +
      "with version'd time travel") {
    registered
    val dir = java.nio.file.Files.createTempDirectory("txgtvf").toString
    import graft.sources.TxGroup
    TxGroup.appendMany(spark, dir, Seq(
      "a" -> (0L until 4L).map(i => (i, i)).toDF("id", "v"),
      "b" -> Seq((0L, "x")).toDF("id", "tag")))
    TxGroup.appendMany(spark, dir, Seq(
      "a" -> (4L until 6L).map(i => (i, i)).toDF("id", "v"),
      "b" -> Seq((1L, "y")).toDF("id", "tag")))
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM txgroup('$dir', 'a')")
      .head().getLong(0) == 6L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM txgroup('$dir', 'b', 1)")
      .head().getLong(0) == 1L)
    // TIMESTAMP AS OF at v1's own commit clock — every member table
    // cuts on the ONE shared log clock
    val ts1 = graft.sources.TxTable.history(spark, dir)
      .filter(col("version") === 1L).head().getLong(1)
    val litTs = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ts1), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
        s"SELECT COUNT(*) AS n FROM txgroup('$dir', 'a', TIMESTAMP '$litTs')")
      .head().getLong(0) == 4L)
  }

  test("TVF arguments must be literals — loud failure otherwise") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM txtable(CONCAT('/no', 'pe'), 1)").collect()
    }
    assert(e.getMessage.contains("string literal")
      || Option(e.getCause).exists(_.getMessage.contains("string literal")))
  }
}
