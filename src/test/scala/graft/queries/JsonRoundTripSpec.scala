package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** q146's chain on hostile inputs: the escape-needing characters must
  * survive to_json -> from_json byte-for-byte, and JSONPath extraction
  * must agree with the parsed struct.
  */
class JsonRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  test("quote/backslash/unicode survive the to_json -> from_json round trip") {
    val hostile = Seq(
      (1L, "pl\"ain"), (2L, "back\\slash"), (3L, "unié中"),
      (4L, "tab\tnewline\n"), (5L, "")
    ).toDF("id", "s")
    val back = hostile
      .select(col("id"), col("s"),
        from_json(to_json(struct(col("s").as("v"))), "v STRING",
          Map.empty[String, String]).as("p"))
      .select(col("id"), (col("p.v") === col("s")).as("ok"), col("p.v"), col("s"))
      .collect()
    assert(back.forall(_.getBoolean(1)),
      back.filterNot(_.getBoolean(1)).mkString("; "))
  }

  test("get_json_object agrees with parsed dotted access on nested fields") {
    val df = Seq((7L, "de", "srcX")).toDF("doc_id", "lang", "source")
    val js = to_json(struct(
      struct(col("lang").as("lang"), col("source").as("src")).as("meta")))
    val r = df.select(js.as("js"))
      .select(get_json_object(col("js"), "$.meta.src").as("a"),
        from_json(col("js"), "meta STRUCT<lang: STRING, src: STRING>",
          Map.empty[String, String]).getField("meta").getField("src").as("b"))
      .collect()(0)
    assert(r.getString(0) == "srcX" && r.getString(1) == "srcX")
  }
}
