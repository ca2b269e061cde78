package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{CosineSimilarity, VectorFunctions}

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("cosine kernel: known values, NaN guards") {
    assert(CosineSimilarity.compute(Array(1f, 0f), Array(1f, 0f)) === 1.0)
    assert(CosineSimilarity.compute(Array(1f, 0f), Array(0f, 1f)) === 0.0)
    assert(math.abs(CosineSimilarity.compute(Array(1f, 1f), Array(1f, 0f))
      - 1.0 / math.sqrt(2)) < 1e-12)
    assert(CosineSimilarity.compute(Array(1f), Array(1f, 2f)).isNaN)
    assert(CosineSimilarity.compute(Array(0f, 0f), Array(1f, 2f)).isNaN)
  }

  test("cosine expression matches kernel through the Column API (codegen path)") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) === 0.0)
  }

  test("brute-force top-k: self is rank 1; ANN results are a subset ranked identically") {
    val embs = Tables(spark, sf(), "embeddings")
    val q = embs.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val brute = Similarity.bruteForceTopK(embs, q, k = 10).collect()
    assert(brute.head.getAs[Long]("vec_id") === 0L) // self-similarity = 1.0
    assert(math.abs(brute.head.getAs[Double]("score") - 1.0) < 1e-9)
    val bruteScores = brute.map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val planes = Similarity.hyperplanes(dim = 64, tables = 8, bitsPerTable = 4)
    val ann = Similarity.annTopK(embs, q, k = 10, planes).collect()
    assert(ann.head.getAs[Long]("vec_id") === 0L) // query always in its own bucket
    // ANN scores agree exactly with brute force wherever ids overlap
    ann.foreach { r =>
      bruteScores.get(r.getLong(0)).foreach(s => assert(math.abs(s - r.getDouble(1)) < 1e-12))
    }
  }

  test("IVF: nprobe=c degenerates to exact brute-force top-k") {
    val embs = Tables(spark, sf(), "embeddings")
    val q = embs.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val index = IVF.train(embs, c = 8, iters = 2)
    assert(index.centroids.size === 8 && index.dim === 64)
    val brute = Similarity.bruteForceTopK(embs, q, k = 10).collect().map(_.getLong(0)).toSeq
    val full = IVF.topK(embs, index, q, k = 10, nprobe = 8).collect().map(_.getLong(0)).toSeq
    assert(full === brute) // probing every cell = exact search
    val probed = IVF.topK(embs, index, q, k = 10, nprobe = 2).collect()
    assert(probed.nonEmpty && probed.head.getLong(0) === 0L) // self survives its own cell
  }

  test("near-dup pairs are symmetric-free, above threshold, deterministic") {
    val embs = Tables(spark, sf(), "embeddings")
    val planes = Similarity.hyperplanes(dim = 64, tables = 8, bitsPerTable = 4)
    val pairs = Similarity.nearDupPairs(embs, threshold = 0.3, planes).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
    // determinism: same run twice, same result
    val again = Similarity.nearDupPairs(embs, threshold = 0.3, planes).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("probing a partitionBy(table_idx, bucket) LSH index prunes partitions") {
    // SCALE.md's claim made executable (VERDICT r3 #7): at 100 TB the
    // bucketed table is written out partitioned by (table_idx, bucket) and
    // a query probes ONLY its own buckets — the probe filter must land in
    // the scan's PartitionFilters, not a post-scan Filter
    val embs = Tables(spark, sf(), "embeddings")
    val planes = Similarity.rademacherPlanes(dim = 64, tables = 4, bitsPerTable = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString + "/index"
    Similarity.withLshBuckets(embs, "embedding", planes)
      .write.partitionBy("table_idx", "bucket").parquet(dir)

    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val probe = planes.zipWithIndex
      .map { case (tp, t) => col("table_idx") === t &&
        col("bucket") === Similarity.bucketOfVector(q, tp) }
      .reduce(_ || _)
    val probed = spark.read.parquet(dir).filter(probe)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("table_idx"),
      s"expected the probe in PartitionFilters:\n$plan")
    // the probe read a strict subset of the index, and the query vector is
    // in every one of its own buckets
    val hits = probed.select("vec_id").collect().map(_.getLong(0))
    assert(hits.count(_ == 0L) === planes.size)
    assert(probed.count() < spark.read.parquet(dir).count())
  }
}
