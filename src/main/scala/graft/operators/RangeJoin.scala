package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — `right.ts ∈ [left.ts, left.ts + window]` within a
  * key — via time-bucketing, the scale-safe formulation.
  *
  * A naive theta-join degenerates to a per-key nested loop. Instead both
  * sides are assigned to `window`-wide buckets; a left row's interval can
  * only overlap its own bucket and the next one, so exploding left into
  * those 2 buckets and equi-joining on (key, bucket) bounds every
  * comparison to the two adjacent buckets — O(rows·density), one ordinary
  * shuffle, AQE-skew-splittable, no quadratic blowup at any scale. The
  * exact predicate is re-applied after the equi-join.
  */
object RangeJoin {

  /** @param left     probe side: (key, ts micros, payload…)
    * @param right    match side: (key, ts micros, payload…)
    * @param key      equi key column name on both sides
    * @param leftTs   left timestamp column (epoch micros)
    * @param rightTs  right timestamp column (epoch micros)
    * @param windowUs window width in microseconds
    */
  /** Exact floor-division bucket — double-division `floor(col/lit)` can
    * mis-bucket a boundary row near 2^53 and silently lose its pairs; the
    * shared helper divides in decimal with an integral quotient. */
  private def bucketOf(ts: String, windowUs: Long) =
    graft.model.floorDivCol(col(ts), windowUs)

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowUs: Long): DataFrame = {
    val lb = left
      .withColumn("__b0", bucketOf(leftTs, windowUs))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val rb = right
      .withColumn("__bucket", bucketOf(rightTs, windowUs))
    lb.join(rb,
        lb("__bucket") === rb("__bucket") && lb(key) === rb(key) &&
          rb(rightTs) >= lb(leftTs) && rb(rightTs) <= lb(leftTs) + lit(windowUs))
      .drop("__bucket")
  }

  /** INTERVAL × INTERVAL overlap join (the session-vs-incident /
    * concurrency-detection shape): all pairs of CLOSED intervals
    * [start, end] sharing a key that overlap (`a_start <= b_end AND
    * b_start <= a_end`; zero-length point intervals count, touching
    * endpoints count with overlap_us = 0).
    *
    * Scale: both sides replicate to the `bucketUs`-wide grid cells they
    * cover (replication = length/bucketUs + 1 — pick the bucket near the
    * typical interval length), the join is a plain (key, cell) equi-join
    * — shuffle-hash, AQE-skew-splittable, never a nested loop — and the
    * exact predicate re-applies after. Each overlapping pair would match
    * in every shared cell, so a pair is EMITTED only in its first common
    * cell (the one containing overlap_start = max of the two starts,
    * which both sides always cover) — exactly-once output with NO
    * distinct/dedup shuffle.
    *
    * Inputs need columns (key, id, start_us, end_us); rows with
    * end < start are dropped as malformed.
    * Output: (key, a_id, b_id, overlap_start_us, overlap_end_us,
    * overlap_us). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      bucketUs: Long): DataFrame = {
    def cells(df: DataFrame, p: String) = df
      .filter(col("end_us") >= col("start_us"))
      .select(col("key"), col("id").as(s"${p}_id"),
        col("start_us").as(s"${p}_start_us"),
        col("end_us").as(s"${p}_end_us"))
      .withColumn("__cell", explode(sequence(
        graft.model.floorDivCol(col(s"${p}_start_us"), bucketUs),
        graft.model.floorDivCol(col(s"${p}_end_us"), bucketUs))))
    val ov0 = greatest(col("a_start_us"), col("b_start_us"))
    cells(a, "a").join(cells(b, "b"), Seq("key", "__cell"))
      .filter(col("a_start_us") <= col("b_end_us") &&
        col("b_start_us") <= col("a_end_us") &&
        col("__cell") === graft.model.floorDivCol(ov0, bucketUs))
      .select(col("key"), col("a_id"), col("b_id"),
        ov0.as("overlap_start_us"),
        least(col("a_end_us"), col("b_end_us")).as("overlap_end_us"))
      .withColumn("overlap_us",
        col("overlap_end_us") - col("overlap_start_us"))
  }
}
