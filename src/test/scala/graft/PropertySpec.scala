package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over generated mini-facts (SURVEY.md §5 item 3):
  * aggregation-idiom equivalence, union additivity, incentive law.
  * Raw ScalaCheck generators driven by fixed seeds (scalatestplus isn't in
  * the offline cache), so failures are reproducible.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private val rowGen = for {
    key <- Gen.choose(1, 5)
    month <- Gen.oneOf("2023-01", "2023-02", "2023-03")
    cents <- Gen.choose(1L, 100000L)
  } yield (key, month, cents / 100.0)

  private val tableGen = Gen.listOfN(60, rowGen)

  private def samples(n: Int): Seq[List[(Int, String, Double)]] =
    (1 to n).map(i => tableGen.apply(Gen.Parameters.default, Seed(42L + i)).get)

  test("∀ data: groupBy-sum ≡ window-sum + distinct (the reference's idiom)") {
    samples(5).foreach { rows =>
      val df = rows.toDF("key", "month", "amount")
      val grouped = df.groupBy($"key", $"month")
        .agg(functions.Cols.moneySum($"amount").as("total"))
      val windowed = df
        .withColumn("total",
          sum($"amount".cast(DecimalType(18, 2)))
            .over(Window.partitionBy($"key", $"month")).cast(DoubleType))
        .select($"key", $"month", $"total").distinct()
      assert(grouped.exceptAll(windowed).isEmpty && windowed.exceptAll(grouped).isEmpty)
    }
  }

  test("∀ data: union row-count additivity with the empty seed") {
    samples(3).sliding(2).foreach { case Seq(a, b) =>
      val dfA = a.toDF("key", "month", "amount")
      val dfB = b.toDF("key", "month", "amount")
      val seeded = io.Sources.empty(spark, dfA.schema).union(dfA).union(dfB)
      assert(seeded.count() === (a.size + b.size).toLong)
    }
  }

  test("∀ data: moneySum is identical under any repartitioning") {
    samples(3).foreach { rows =>
      val df = rows.toDF("key", "month", "amount")
      def total(d: org.apache.spark.sql.DataFrame): Double =
        d.agg(functions.Cols.moneySum($"amount")).head().getDouble(0)
      val one = total(df.coalesce(1))
      assert(total(df.repartition(17)) === one)
      assert(total(df.repartition($"key")) === one)
    }
  }

  test("∀ data: rank-1 incentive = 1% of the group max, others zero") {
    samples(5).foreach { rows =>
      val totals = rows.toDF("store_id", "sales_month", "x")
        .groupBy($"store_id", $"sales_month")
        .agg(functions.Cols.moneySum($"x").as("total_sales"))
        .withColumn("sales_person_id", $"store_id") // degenerate but valid
      val ranked = etl.SalesMart.withIncentive(totals)
      val bad = ranked
        .withColumn("mx", max($"total_sales")
          .over(Window.partitionBy($"store_id", $"sales_month")))
        .filter(
          ($"rnk" === 1 && abs($"incentive" - $"mx" * 0.01) > 1e-9) ||
          ($"rnk" =!= 1 && $"incentive" =!= 0.0))
      assert(bad.isEmpty)
    }
  }
}
