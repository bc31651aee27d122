package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokHash

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs, engines, and
  * partitionings; a hash of a stable key is not. A row lands in the `pct`%
  * sample iff `hash60(key) mod 100 < pct` — the same rows forever, on any
  * engine that can take an md5 (the DuckDB oracle reproduces the sample
  * row-for-row). The same construction with mod buckets ≥ 100 gives
  * train/val/test splits that stay disjoint as the corpus grows: a 100 TB
  * pipeline can re-derive membership instead of storing it. Pure
  * projection+filter — codegen'd, no shuffle, scales linearly.
  */
object Sampling {

  /** The `pct`% deterministic sample of `df` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(pmod(tokHash(col(keyCol).cast("string")), lit(100L)) < pct)

  /** Stable split assignment: returns df + a `split` column in
    * {train, val, test} with the given percent weights (must sum ≤ 100;
    * the remainder falls into test). */
  def hashSplit(df: DataFrame, keyCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    val b = pmod(tokHash(col(keyCol).cast("string")), lit(100L))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
