package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Shingling / n-gram helpers shared by the dedup family.
  *
  * PERFORMANCE CONTRACT: the positional builders (charShingles,
  * wordNgrams) reference their input inside a
  * higher-order lambda, and Catalyst re-evaluates the lambda body per array
  * element. Pass a MATERIALIZED column reference (a `withColumn` output),
  * never a raw expression like `normalize(col("text"))` — otherwise the
  * regex/split work silently becomes O(len²) per row (observed: 40s+ vs <2s
  * on 5k docs).
  */
object Shingles {

  /** Lowercased, whitespace-collapsed text. Materialize the result before
    * feeding it to the positional builders below.
    *
    * Case-mapping contract: Spark's `lower` is Unicode FULL lowercasing
    * (Java `toLowerCase`), whose one unconditional multi-char mapping is
    * U+0130 'İ' → "i" + U+0307 (combining dot above). DuckDB's `lower`
    * implements the simple single-char mapping ('İ' → "i"), so every
    * catalog oracle pre-expands `replace(text, 'İ', 'i' || chr(775))`
    * before `lower(...)` to replay the engine's semantics exactly
    * (adversarial-corpus sweep, round 10).
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of a materialized normalized column. */
  def tokensOfNorm(norm: Column): Column = split(norm, " ")

  /** One-row Generate used as a non-duplicating row filter: keeps the row
    * iff `keep(v)` is TRUE, evaluating `v` exactly ONCE per row. The plain
    * spelling — project `v`, then `filter(pred(v))` — gets the predicate
    * pushed below the projection with `v`'s definition substituted in, so
    * everything `v` computes runs TWICE per surviving row (scan-stage
    * filter + projection; guide §4.4, observed for both the sketch kernels
    * pre-r15 and the normalize regex through r15). `explode` over a 0/1-
    * element array is the drop: the optimizer cannot split a Generate, so
    * the expression stays single-evaluation by construction. A row where
    * `keep` evaluates to NULL is dropped (higher-order `filter` keeps only
    * TRUE) — identical to a Filter's null semantics.
    */
  def onceOrDrop(v: Column, keep: Column => Column): Column =
    explode(filter(array(v), e => keep(e)))

  /** Distinct character k-grams of a materialized normalized column. */
  def charShingles(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      array_distinct(transform(
        sequence(lit(1), length(norm) - lit(k - 1)),
        i => norm.substr(i, lit(k)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct word n-grams ("a b c") of a materialized token-array column. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        j => concat_ws(" ", slice(toks, j, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))
}
