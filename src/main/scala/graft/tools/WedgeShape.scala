package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B experiment for commonNeighborScores' wedge expansion (r15 verdict
  * item 2: link_prediction inverse-scales at 32 cores). Variants must be
  * result-identical; timed at the bench SF and core count. Not part of the
  * driver contract.
  */
object WedgeShape {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import org.apache.spark.sql.expressions.Window
    val minCommon = 2; val topK = 20

    def edges(): DataFrame = {
      val b = graft.QueryCatalog.eventsRaw(spark, sfDir)
        .select(graft.QueryCatalog.usBucket("ts_us", 60000000L).as("h"),
          col("event_type"), col("user_id"))
        .distinct()
      b.as("a").join(b.as("b"),
          col("a.h") === col("b.h") && col("a.event_type") === col("b.event_type"))
        .filter(col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("src"), col("b.user_id").as("dst")).distinct()
    }

    def current(): DataFrame =
      graft.ops.Graph.commonNeighborScores(edges(), minCommon, topK)

    // V1: one-pass symmetrization (explode) — sym scans the cache once per
    // consumer instead of twice (union form)
    def v1(): DataFrame = {
      val e = edges().select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sym = e.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("ed"))
        .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val w = Window.orderBy(col("jaccard").desc, col("u"), col("v"))
      val scored = sym.select(col("src").as("u"), col("dst").as("w"))
        .join(sym.select(col("src").as("w"), col("dst").as("v")), "w")
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
        .filter(col("common") >= minCommon)
        .join(e.select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")), Seq("u", "v"), "left_anti")
        .join(deg, col("u") === col("node")).drop("node")
        .withColumnRenamed("deg", "du")
        .join(deg, col("v") === col("node")).drop("node")
        .withColumnRenamed("deg", "dv")
        .withColumn("jaccard", col("common").cast("double")
          / (col("du") + col("dv") - col("common")))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(topK)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("u"), col("v"), col("common"), col("jaccard"))
      val out = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); e.unpersist(); out
    }

    // V2: collect_list center expansion — each wedge pair generated once
    // (i<j inside the neighbor array), no broadcast join for the expansion
    def v2(): DataFrame = {
      val e = edges().select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sym = e.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("ed"))
        .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val w = Window.orderBy(col("jaccard").desc, col("u"), col("v"))
      val scored = sym
        .groupBy(col("src")).agg(collect_list(col("dst")).as("ns"))
        .filter(size(col("ns")) >= 2)
        .select(explode(flatten(transform(col("ns"), x =>
          transform(filter(col("ns"), y => y > x), y => struct(x.as("u"), y.as("v")))))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
        .filter(col("common") >= minCommon)
        .join(e.select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")), Seq("u", "v"), "left_anti")
        .join(deg, col("u") === col("node")).drop("node")
        .withColumnRenamed("deg", "du")
        .join(deg, col("v") === col("node")).drop("node")
        .withColumnRenamed("deg", "dv")
        .withColumn("jaccard", col("common").cast("double")
          / (col("du") + col("dv") - col("common")))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(topK)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("u"), col("v"), col("common"), col("jaccard"))
      val out = scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count(); e.unpersist(); out
    }

    val variants: Seq[(String, () => DataFrame)] =
      Seq(("current", () => current()), ("v1_explode_sym", () => v1()), ("v2_collect_list", () => v2()))

    var ref: Array[String] = null
    for ((name, f) <- variants) {
      // warm
      f().write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val rows = f().collect().map(_.toString).sorted
      spark.catalog.clearCache()
      if (ref == null) ref = rows
      val same = java.util.Arrays.equals(ref.asInstanceOf[Array[AnyRef]], rows.asInstanceOf[Array[AnyRef]])
      System.err.println(f"[wedge] $name%-16s min ${times.min}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")}) rows=${rows.length} identical=$same")
    }
    spark.stop()
  }
}
