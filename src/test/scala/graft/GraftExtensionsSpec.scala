package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native cosine expression. Own session
  * (withExtensions must be applied at build time).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is callable from SQL and matches the kernel") {
    // getOrCreate returns any existing default session and would silently
    // drop the extensions — detach it first; the new session still shares
    // the JVM's SparkContext
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      Seq((Array(1f, 2f, 2f), Array(1f, 2f, 2f)), (Array(1f, 0f, 0f), Array(0f, 3f, 0f)))
        .toDF("a", "b").createOrReplaceTempView("vecs")
      val got = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c DESC")
        .as[Double].collect()
      assert(math.abs(got(0) - 1.0) < 1e-12)
      assert(got(1) === 0.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
