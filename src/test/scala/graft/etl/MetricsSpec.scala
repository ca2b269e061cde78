package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  import spark.implicits._

  test("observed metrics arrive with the action, no extra scan") {
    val df = Seq(
      (Option(1L), 10.0), (Option(2L), -5.0), (None, 3.0), (Option(4L), -1.0)
    ).toDF("k", "amount")
    val (observed, obs) = Metrics.withRowMetrics(df, "ingest", "k",
      violation = Some(col("amount") < 0))
    observed.write.mode("overwrite").format("noop").save()   // the one action
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_keys") === 1L)
    assert(m("n_violations") === 2L)
  }
}
