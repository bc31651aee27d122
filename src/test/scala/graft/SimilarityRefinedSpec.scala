package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Lloyd-refined IVF centroids: deterministic, monotonically improving the
  * spherical-k-means objective over the seed medoids, and serving through
  * the same zero-shuffle literal-centroid plan. (The refined path is not
  * SQL-oracled — decimal-mean centroids don't reproduce bit-for-bit in
  * DuckDB — so these specs are its correctness gate.)
  */
class SimilarityRefinedSpec extends AnyFunSuite with SparkSpec {

  private def emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  /** Mean cosine to the ASSIGNED centroid — since assignment is the argmax
    * over centroid similarities, this is just avg(array_max(sims)). */
  private def objective(cents: Array[(Long, Array[Double])]): Double = {
    val sims = array(cents.map { case (_, w) =>
      Similarity.cosine(col("embedding").cast("array<double>"), typedlit(w.toSeq))
    }: _*)
    emb.select(avg(array_max(sims))).head().getDouble(0)
  }

  test("Lloyd iterations improve the clustering objective monotonically") {
    val seed = objective(Similarity.ivfSeedCentroids(emb, 8))
    val it2 = objective(Similarity.ivfRefinedCentroids(emb, 8, 2))
    val it4 = objective(Similarity.ivfRefinedCentroids(emb, 8, 4))
    // measured at sf0.001: 0.187 -> 0.255 -> 0.263
    assert(it2 > seed + 0.01, s"seed=$seed it2=$it2")
    assert(it4 >= it2 - 1e-12, s"it2=$it2 it4=$it4")
  }

  test("refined centroids are deterministic across runs") {
    val a = Similarity.ivfRefinedCentroids(emb, 8, 2)
    val b = Similarity.ivfRefinedCentroids(emb, 8, 2)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, wa), (_, wb)) =>
      assert(wa.toSeq == wb.toSeq, "centroid coordinates must be bit-identical")
    }
  }

  test("refined IVF top-k keeps high recall vs brute force and finds the query") {
    val brute = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val refined = Similarity.ivfAnnTopKRefined(emb, 0L, 8, 2, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(refined.contains(0L))
    // measured 10/10 at sf0.001; floor at 7 for robustness
    assert((brute intersect refined).size >= 7,
      s"recall ${(brute intersect refined).size}/10")
  }

  test("refined IVF serving plan is still shuffle-free (literal centroids)") {
    val df = Similarity.ivfAnnTopKRefined(emb, 0L, 8, 2, 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
