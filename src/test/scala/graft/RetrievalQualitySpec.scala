package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Similarity}

/** BM25 retrieval, bigram-LM familiarity, vocab coverage, source
  * diversity, semantic dedup clusters, and ANN recall@k — the round-8
  * additions to the training-data pipeline surface. Each also carries a
  * full DuckDB oracle (q_bm25, q_bigram_lm, q_vocab_coverage,
  * q_source_simpson, q_semantic_clusters, q_ann_recall); these specs pin
  * the invariants the hash compare can't express. */
class RetrievalQualitySpec extends AnyFunSuite with SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)
  private def emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  test("bm25: ranked, bounded, and every hit contains a query term") {
    val terms = Seq("spark", "hash", "window")
    val r = TextAnalysis.bm25(docs, terms, 1.2, 0.75, 20)
      .orderBy(col("rk")).collect()
    assert(r.length <= 20 && r.nonEmpty)
    assert(r.map(_.getAs[Long]("rk")).toSeq == (1L to r.length).toSeq)
    val scores = r.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0.0))
    // hits ⊆ docs containing at least one query term
    val withTerm = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(terms: _*))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(r.map(_.getAs[Long]("doc_id")).forall(withTerm))
  }

  test("bm25: more occurrences of a rarer term outranks fewer of a common one") {
    import spark.implicits._
    // 'rare' appears in 1 of 4 docs, 'base' in all; doc 1 has the rare term
    val d = Seq(
      (1L, "rare base base base"),
      (2L, "base base base base"),
      (3L, "base base base base"),
      (4L, "base base base base")).toDF("doc_id", "text")
    val top = TextAnalysis.bm25(d, Seq("rare", "base"), 1.2, 0.75, 4)
      .orderBy(col("rk")).collect()
    assert(top.head.getAs[Long]("doc_id") == 1L)
  }

  test("bigram familiarity: exact closed-form counts on a tiny corpus") {
    import spark.implicits._
    // d1 bigrams: "a b","b a","a b"; d2: "a b","b c"
    // corpus: "a b"->3, "b a"->1, "b c"->1
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFamiliarity(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Long]("familiarity_sum"),
          x.getAs[Long]("n_novel"), x.getAs[Double]("avg_familiarity"))).toMap
    assert(r(1L) == ((3L, 7L, 1L, 7.0 / 3.0)))
    assert(r(2L) == ((2L, 4L, 1L, 2.0)))
  }

  test("vocab coverage: OOV is exactly the tokens outside the top-V") {
    import spark.implicits._
    val d = Seq(
      ("s1", "x x x y"), // x dominates; V=1 vocab = {x}
      ("s2", "x y z")).map { case (s, t) => (s, t) }
      .toDF("source", "text").withColumn("doc_id", lit(0L))
    val r = TextAnalysis.vocabCoverage(d, 1).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"))).toMap
    assert(r("s1") == ((4L, 1L))) // y is OOV
    assert(r("s2") == ((3L, 2L))) // y, z are OOV
  }

  test("source simpson: closed form on known counts") {
    import spark.implicits._
    // one lang, sources with 1 and 3 docs: 1 - (1+9)/16 = 0.375
    val d = (Seq.fill(1)("sA") ++ Seq.fill(3)("sB")).zipWithIndex
      .map { case (s, i) => (i.toLong, "t", "en", s) }
      .toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.sourceSimpson(d).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Double]("simpson") == 0.375)
  }

  test("semantic clusters: labels are the component minimum and respect every pair") {
    val pairs = Similarity.nearDupPairs(emb, "label", 0.3)
      .select(col("vec_id_1").as("doc_id_1"), col("vec_id_2").as("doc_id_2"))
    val cl = Dedup.dedupClusters(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val lab = cl.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    val ps = pairs.collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")))
    assert(ps.nonEmpty)
    // endpoints of every near-dup pair share a cluster
    assert(ps.forall { case (a, b) => lab(a) == lab(b) })
    // the label IS the minimum member id of its cluster
    lab.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  test("ann recall: k-bounded, in (0,1], and the query always hits itself") {
    val ids = Seq(0L, 1L, 2L)
    val r = Similarity.annRecall(emb, ids, 4, 10).collect()
    assert(r.map(_.getAs[Long]("query_id")).toSet == ids.toSet)
    r.foreach { row =>
      val (ne, nh, rec) = (row.getAs[Long]("n_exact"),
        row.getAs[Long]("n_hits"), row.getAs[Double]("recall"))
      assert(ne == 10L)
      assert(nh >= 1L && nh <= ne) // the query vector is in both top-k sets
      assert(rec == nh.toDouble / ne.toDouble && rec > 0.0 && rec <= 1.0)
    }
  }
}
