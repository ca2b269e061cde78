package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer vectors for the JaroWinkler expression (the classic
  * record-linkage test pairs, values cross-checked bitwise against DuckDB's
  * jaro_winkler_similarity), plus a DataFrame run exercising the codegen
  * path.
  */
class StringSimilaritySpec extends SparkSpec {

  private val vectors = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("hello", "hallo", 0.88),
    ("Brand#13", "Brand#31", 0.975),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("a", "", 0.0),
    // identical wins over empty: 1.0 here, where DuckDB's empty guard
    // precedes its equality check and yields 0.0 — the catalog oracle
    // replays this contract with an explicit CASE (fuzz seed 13)
    ("", "", 1.0),
    ("CRATE economy", "CRATE standard", 0.6794871794871794),
    ("PROMO burnished", "PROMO brushed", 0.9579487179487179),
    // non-ASCII: DuckDB's jaro_winkler_similarity works over UTF-8 BYTES
    // (probed: 'née'/'nee' = 0.75, the byte-window answer; code points
    // would give 0.8) — the kernel must match on these too (review r9)
    ("née", "nee", 0.75),
    ("café menu", "cafe menu", 0.8982407407407408),
    ("🚀ab", "ab", 0.0))

  test("kernel matches the reference vectors bitwise") {
    vectors.foreach { case (a, b, want) =>
      assert(JaroWinkler.compute(a, b) === want, s"($a, $b)")
    }
    // symmetry
    vectors.foreach { case (a, b, _) =>
      assert(JaroWinkler.compute(a, b) === JaroWinkler.compute(b, a))
    }
  }

  test("expression evaluates through the DataFrame codegen path") {
    import spark.implicits._
    val got = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(StringSimilarity.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq === vectors.map(_._3))
  }
}
