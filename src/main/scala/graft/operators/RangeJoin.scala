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
}
