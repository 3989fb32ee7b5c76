package graft.star

import org.apache.spark.sql.functions._
import org.scalatest.Tag

import graft.SparkTestBase

object E2E extends Tag("graft.E2E")

/** Golden-SCALE end-to-end test: the reference's de-facto spec is its
  * golden run log (/root/reference/logs/etl_pipeline.log:6,39-57 —
  * 378,661 raw rows, 4 dropped for null name, dims 3,169/6/170, fact
  * 378,657). The 13-row fixture exercises semantics; this test exercises
  * the same invariant SHAPES at the reference's real row count, on a
  * synthetic CSV whose construction plants exactly those cardinalities:
  *
  *   - ID 0..378,660 (378,661 raw rows)
  *   - name null on exactly 4 ids (the dropna path), commas in names
  *     (quoted-field path)
  *   - launch dates cycle over 3,169 distinct days (Dim_Date)
  *   - 6 states in roughly the golden distribution (Dim_State)
  *   - (main, sub) categories cycle over 17x10 co-prime moduli
  *     => exactly 170 distinct pairs (Dim_Category)
  */
class GoldenScaleE2ESpec extends SparkTestBase {

  private val RawRows = 378661L
  private val NullNameIds = Seq(1000L, 2000L, 3000L, 4000L)
  private val DistinctDates = 3169
  private val DistinctCategories = 170 // lcm(17, 10)

  test("pipeline reproduces the golden log's stage shapes at 378,661 rows", E2E) {
    import spark.implicits._

    val workDir = new java.io.File("target/tmp/golden-e2e")
    org.apache.commons.io.FileUtils.deleteQuietly(workDir)
    val csvDir = s"${workDir.getPath}/raw_csv"
    val outDir = s"${workDir.getPath}/warehouse"

    // ---- generate the raw CSV distributedly (deterministic in id) ----
    val states = typedlit(Seq("failed", "successful", "canceled", "undefined", "live", "suspended"))
    val perMille = $"id" % 1000
    val launchedDate = date_add(to_date(lit("2009-01-01")), ($"id" % DistinctDates).cast("int"))
    spark.range(RawRows)
      .select(
        $"id".as("ID"),
        when($"id".isin(NullNameIds: _*), lit(null).cast("string"))
          .otherwise(concat(lit("Project "), $"id", lit(", phase "), $"id" % 3))
          .as("name"),
        concat(lit("Sub"), $"id" % 10).as("category"),
        concat(lit("Main"), $"id" % 17).as("main_category"),
        lit("USD").as("currency"),
        date_format(date_add(launchedDate, ($"id" % 60 + 1).cast("int")), "yyyy-MM-dd")
          .as("deadline"),
        round($"id" % 90000 * 1.5, 2).as("goal"),
        concat(date_format(launchedDate, "yyyy-MM-dd"),
          format_string(" %02d:%02d:%02d",
            $"id" % 24, $"id" % 60, $"id" % 60)).as("launched"),
        round($"id" % 80000 * 1.1, 2).as("pledged"),
        element_at(states,
          (when(perMille < 522, 0).when(perMille < 876, 1).when(perMille < 978, 2)
            .when(perMille < 988, 3).when(perMille < 995, 4).otherwise(5) + 1)
            .cast("int")).as("state"),
        ($"id" % 5000).as("backers"),
        lit("US").as("country"),
        when($"id" % 97 === 0, lit(null).cast("double"))
          .otherwise(round($"id" % 80000 * 1.1, 2)).as("usd pledged"),
        round($"id" % 80000 * 1.12, 2).as("usd_pledged_real"),
        round($"id" % 90000 * 1.55, 2).as("usd_goal_real"))
      .coalesce(4)
      .write.option("header", true).option("quote", "\"").option("escape", "\"")
      .csv(csvDir)

    // ---- run the full pipeline (extract -> transform -> star -> sink) ----
    val raw = graft.etl.Extract.campaignsCsv(spark, csvDir)
    assert(raw.count() == RawRows, "raw row count (log:6)")

    val campaigns = graft.etl.Transform.campaigns(raw)
    val transformed = campaigns.count()
    assert(transformed == RawRows - NullNameIds.length,
      "4 rows dropped for null name (log:39-40)")
    assert(campaigns.columns.length == 13, "13-column transform output (log:40)")

    val counts = StarBuilder.runPipeline(spark, csvDir, outDir)
    assert(counts("Dim_Date") == DistinctDates, "Dim_Date cardinality (log:51)")
    assert(counts("Dim_State") == 6, "Dim_State cardinality (log:53)")
    assert(counts("Dim_Category") == DistinctCategories, "Dim_Category cardinality (log:55)")
    assert(counts("Fact_Campaigns") == transformed, "fact rows = transformed rows (log:57)")

    // ---- FK integrity: every fact key resolves (0 orphans) ----
    val fact = spark.read.parquet(s"$outDir/Fact_Campaigns")
    val orphans = fact.filter(
      $"state_key".isNull || $"category_key".isNull || $"launched_date_key".isNull).count()
    assert(orphans == 0L, "all three FK joins resolve for every fact row")

    // fact joined back through the dims loses no rows (referential closure)
    val dimState = spark.read.parquet(s"$outDir/Dim_State")
    val dimCat = spark.read.parquet(s"$outDir/Dim_Category")
    val dimDate = spark.read.parquet(s"$outDir/Dim_Date")
    val closed = fact
      .join(dimState, "state_key")
      .join(dimCat, "category_key")
      .join(dimDate, fact("launched_date_key") === dimDate("date_key"))
      .count()
    assert(closed == transformed, "joining through all dims preserves every fact row")

    // success_flag semantics at scale: flag=1 iff state='successful'
    val flags = campaigns.groupBy("success_flag").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val successful = campaigns.filter($"state" === "successful").count()
    assert(flags(1) == successful && flags(0) == transformed - successful,
      "success_flag partitions the rows exactly (log:43-45)")

    org.apache.commons.io.FileUtils.deleteQuietly(workDir)
  }
}
