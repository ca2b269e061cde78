package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Shingling / n-gram helpers shared by the dedup family. All map-only
  * column expressions (higher-order functions) — no shuffle, no UDF: they
  * stay on the executor that read the row, which is what lets signature
  * computation scale linearly over 100 TB of documents.
  */
object Shingles {

  /** Lowercased, whitespace-collapsed text. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column =
    split(normalize(c), " ")

  /** Distinct character k-grams of the normalized text (empty array for
    * strings shorter than k).
    */
  def charShingles(c: Column, k: Int): Column = {
    val n = normalize(c)
    when(length(n) >= k,
      array_distinct(transform(
        sequence(lit(1), length(n) - lit(k - 1)),
        i => substring_index_at(n, i, k))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  private def substring_index_at(s: Column, i: Column, k: Int): Column =
    s.substr(i, lit(k))

  /** Ordered (non-distinct, positional) character k-grams — for winnowing
    * fingerprints where window position matters.
    */
  def charShinglesOrdered(c: Column, k: Int): Column = {
    val n = normalize(c)
    when(length(n) >= k,
      transform(
        sequence(lit(1), length(n) - lit(k - 1)),
        i => substring_index_at(n, i, k)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Distinct word n-grams ("a b c") of the normalized text. */
  def wordNgrams(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      array_distinct(transform(
        sequence(lit(1), size(t) - lit(n - 1)),
        j => concat_ws(" ", slice(t, j, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }
}
