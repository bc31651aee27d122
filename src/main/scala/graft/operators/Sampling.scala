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

  /** Deterministic weighted priority sample: among rows with POSITIVE
    * weight, the k with the smallest `hash60(key) / weight` — heavier
    * rows draw proportionally smaller priorities, so inclusion
    * probability scales with weight, and the sample is a pure function
    * of the keys (reproducible on any engine; the oracle re-derives it).
    * Non-positive weights are excluded up front: a zero weight divides
    * to NULL under Spark's non-ANSI division but +Inf under IEEE engines
    * — the two would sort to OPPOSITE ends, so the guard is a
    * correctness condition, not a nicety. Projection +
    * TakeOrderedAndProject: no shuffle of the data, only per-partition
    * top-k survivors merge. The (priority, key) suffix makes the order
    * total — distinct keys CAN tie on the ratio (h=2/w=2 equals h=1/w=1),
    * the key breaks it. */
  def weightedPrioritySample(df: DataFrame, keyCol: String,
      weightCol: String, k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("priority",
        tokHash(col(keyCol).cast("string")).cast("double") / col(weightCol))
      .orderBy(col("priority"), col(keyCol))
      .limit(k)

  /** Deterministic stratified sample: exactly `k` rows per stratum (fewer
    * when the stratum is smaller), selected by md5-order of the key — the
    * same rows on every run and engine, unlike `sampleBy`'s RNG. One
    * partitioned window (shuffle on the stratum column only); the md5 sort
    * key makes the within-stratum order uniform-pseudorandom, so the k rows
    * are an unbiased fixed-size sample. `rk` is the stable sample rank. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Split-drift QA: total-variation distance between the train and val
    * categorical distributions of `catCol` under the deterministic
    * [[hashSplit]]. TV = ½·Σ|p_train − p_val| over categories — pure
    * rational-count arithmetic plus IEEE divisions/abs, NO logarithms
    * (a KL/ln oracle would hinge on libm agreeing across engines to the
    * last ulp). The category sums fold in sorted order via `aggregate`
    * over a `sort_array`ed struct list, so the double addition order is
    * pinned on both engines. Two aggregations over the corpus, then
    * everything else operates on the |categories|-row table. */
  def splitDrift(df: DataFrame, keyCol: String, catCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    val per = hashSplit(df, keyCol, trainPct, valPct)
      .groupBy(col(catCol).as("cat"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_n"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("val_n"))
    per
      .agg(sum(col("train_n")).as("ttot"), sum(col("val_n")).as("vtot"),
        count(lit(1)).as("n_cats"),
        sort_array(collect_list(struct(col("cat"), col("train_n"), col("val_n"))))
          .as("cats"))
      .select(col("n_cats"),
        when(col("ttot") === 0 || col("vtot") === 0, lit(null).cast("double"))
          .otherwise(lit(0.5) * aggregate(col("cats"), lit(0.0), (acc, x) =>
            acc + abs(x.getField("train_n").cast("double") / col("ttot").cast("double") -
              x.getField("val_n").cast("double") / col("vtot").cast("double"))))
          .as("tv_distance"))
  }

  /** Two-sample chi-square homogeneity of a NUMERIC column between the
    * train and val splits, bucketed at fixed width: the drift-detection
    * twin of [[splitDrift]]'s categorical TV distance. Emits one row
    * per occupied bucket — (bucket, train_n, val_n, chi2_term) with
    * chi2_term = Σ_{cells} (O−E)²/E under the homogeneity model
    * E_cell = rowTotal·colTotal/N — rather than a single pre-summed
    * statistic, so every double is a PER-ROW expression over
    * exactly-converted integer counts in a fixed operation order
    * (engine-exact; a cross-engine sum of doubles would be
    * order-dependent, per-row terms are not). The caller sums the
    * column for the statistic; the per-bucket terms localize WHERE the
    * drift lives, which is the operationally useful part. A split with
    * zero total nulls its terms rather than dividing to NaN.
    *
    * Scale: hash-split projection (no shuffle) → one fixed-width
    * bucket hash agg (map-side partials) → a broadcast single-row
    * totals attach. Bucket cardinality is value-range/width bounded,
    * independent of row count. */
  def chiSquareDrift(df: DataFrame, keyCol: String, valCol: String,
      trainPct: Int, valPct: Int, bucketWidth: Long): DataFrame = {
    val per = hashSplit(df, keyCol, trainPct, valPct)
      .filter(col("split") =!= "test")
      .groupBy(expr(s"CAST($valCol AS BIGINT) div $bucketWidth").as("bucket"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_n"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("val_n"))
    val tot = per.agg(sum(col("train_n")).as("t_tot"), sum(col("val_n")).as("v_tot"))
    val rowD = (col("train_n") + col("val_n")).cast("double")
    val nD = (col("t_tot") + col("v_tot")).cast("double")
    val et = rowD * col("t_tot").cast("double") / nD
    val ev = rowD * col("v_tot").cast("double") / nD
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("train_n"), col("val_n"),
        when(col("t_tot") <= 0L || col("v_tot") <= 0L, lit(null).cast("double"))
          .otherwise(
            (col("train_n").cast("double") - et) *
              (col("train_n").cast("double") - et) / et +
            (col("val_n").cast("double") - ev) *
              (col("val_n").cast("double") - ev) / ev)
          .as("chi2_term"))
      .orderBy(col("bucket"))
  }
}
