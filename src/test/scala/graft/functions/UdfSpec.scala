package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scala UDF registration (§2.12): supported as the escape hatch, but the
  * engine's stance is functions-first — a UDF is an opaque box to Catalyst
  * (no codegen, no pushdown through it, boxing per row), so hot paths use
  * built-ins or custom expressions (CosineSimilarity, TextSketches).
  */
class UdfSpec extends SparkSpec {

  import spark.implicits._

  test("registered Scala UDF is callable from SQL and the Column API") {
    val slug = (s: String) =>
      if (s == null) null else s.trim.toLowerCase.replaceAll("[^a-z0-9]+", "-")
    spark.udf.register("slugify", slug)
    assert(spark.sql("SELECT slugify('Hello,  World!') AS s").head().getString(0)
      === "hello-world-")
    val df = Seq("Graft Engine", "A/B Test").toDF("t")
      .select(call_udf("slugify", col("t")).as("s"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("graft-engine", "a-b-test"))
  }

  test("UDF output agrees with the built-in equivalent where one exists") {
    spark.udf.register("my_upper", (s: String) => if (s == null) null else s.toUpperCase)
    val df = Seq("mixed Case", "x").toDF("t")
      .select(call_udf("my_upper", col("t")).as("u"), upper(col("t")).as("b"))
    assert(df.filter(col("u") =!= col("b")).isEmpty)
  }
}
