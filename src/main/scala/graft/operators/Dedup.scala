package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.{tokHash, P}

/** Deduplication operators for the training-data pipeline surface:
  * exact (content-hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash aggregation on a 128-bit content hash —
  *    partial aggregation collapses duplicates map-side before the shuffle;
  *  - shingling materializes the token array into a projection FIRST:
  *    referencing an inline `split()` tree from inside a lambda re-evaluates
  *    the split per element access (O(tokens²) — measured 13× slower), while
  *    a materialized column is read once per row;
  *  - shingle hashing happens AFTER the explode, in a plain projection:
  *    project expressions are whole-stage-codegen'd, lambdas inside
  *    higher-order functions are interpreted (measured ~8× slower);
  *  - shuffles join/aggregate on 8-byte shingle hashes, never strings;
  *  - MinHash+LSH is the at-scale near-dup plan: candidates come from tiny
  *    (band, bucket) keys; exact verification touches candidates only, so
  *    the corpus² pair space never materializes;
  *  - n-gram Jaccard (exact) joins on individual shingles; frequent shingles
  *    are skew keys — AQE skew-join splitting handles moderate skew, and the
  *    LSH path is the intended plan at full scale.
  */
object Dedup {

  /** 128-bit content hash (hex md5 — identical in DuckDB). */
  def contentHash(c: Column): Column = md5(c)

  /** Exact-duplicate groups: one row per distinct content, with copy count
    * and the kept (minimum) doc_id. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(contentHash(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))

  /** Keep-first exact dedup: the surviving rows themselves
    * (row_number()==1 per content hash, ordered by doc_id). */
  def exactKeepFirst(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    docs
      .withColumn("text_hash", contentHash(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text_hash"))
  }

  /** Distinct n-token shingles from a MATERIALIZED token-array column
    * (empty array below n tokens — matching the SQL guard exactly). */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o + 1))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Exploded (doc_id, shingle-hash) rows: tokens materialized, shingles
    * exploded, then hashed in a codegen'd projection. */
  private def shingleEx(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(shinglesOf(col("toks"), n)).as("g"))
      .select(col("doc_id"), tokHash(col("g")).as("h"))

  /** Per-doc shingle-set sizes (|distinct shingles|). */
  private def sizesOf(ex: DataFrame): DataFrame =
    ex.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))

  private def jaccardOf(pairs: DataFrame, sizes: DataFrame): DataFrame =
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_id_1")
        .withColumnRenamed("n_shingles", "n1"), Seq("doc_id_1"))
      .join(sizes.withColumnRenamed("doc_id", "doc_id_2")
        .withColumnRenamed("n_shingles", "n2"), Seq("doc_id_2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))

  /** All document pairs with n-gram Jaccard ≥ minJaccard. Pairs are found by
    * joining on shared shingle hashes, then scored exactly. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val ex = shingleEx(docs, n)
    val pairs = ex.as("a")
      .join(ex.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("n_common"))
    jaccardOf(pairs, sizesOf(ex))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id_1"), col("doc_id_2"), col("n_common"), col("jaccard"))
  }

  /** MinHash parameters: k universal hash functions (a_i·h + b_i) mod P over
    * 60-bit shingle hashes reduced mod P. Constants are LCG-derived and
    * mirrored verbatim into the oracle SQL. */
  val MinHashK = 16
  def aCoef(i: Int): Long = (1664525L * i + 1013904223L) % P
  def bCoef(i: Int): Long = (22695477L * i + 12345L) % P

  /** MinHash signatures: one row per doc, `sig` = array of k min-hash
    * values — one partial+final hash aggregation (k running minimums),
    * fully codegen'd. */
  def minhashSignatures(docs: DataFrame, n: Int): DataFrame =
    minhashSignaturesFromEx(shingleEx(docs, n))

  private def minhashSignaturesFromEx(ex: DataFrame): DataFrame = {
    val hP = col("h") % lit(P)
    val mins: Seq[Column] = (0 until MinHashK).map(i =>
      min((lit(aCoef(i)) * hP + lit(bCoef(i))) % lit(P)).as(s"mh$i"))
    ex.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until MinHashK).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: band the k-wide signature into bands of 2 rows,
    * bucket-join on (band, bucket_key), emit distinct doc pairs. Only
    * same-bucket docs ever meet — the join key space is tiny vs all pairs. */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val bands = signatures.select(
      col("doc_id"),
      posexplode(array((0 until MinHashK / 2).map(b =>
        col("sig")(2 * b) * lit(P) + col("sig")(2 * b + 1)): _*)))
      .toDF("doc_id", "band", "bucket")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: candidates from LSH buckets, then
    * exact Jaccard verification on the candidates ONLY (semi-join pushes the
    * candidate filter into the pair aggregation) — the full pairwise space
    * never materializes beyond bucket-mates. */
  def minhashLshPairs(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val ex = shingleEx(docs, n)
    val candidates = lshCandidates(minhashSignaturesFromEx(ex))
    // restrict the exploded shingles to docs that appear in ANY candidate
    // pair BEFORE the pair self-join — the (doc_id_1, doc_id_2) semi-join
    // alone cannot be pushed below it, so without this the full
    // shared-shingle pair space would still materialize
    val candDocs = candidates.select(col("doc_id_1").as("doc_id"))
      .unionByName(candidates.select(col("doc_id_2").as("doc_id")))
      .distinct()
    val exC = ex.join(candDocs, Seq("doc_id"), "left_semi")
    val common = exC.as("a")
      .join(exC.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .join(candidates, Seq("doc_id_1", "doc_id_2"), "left_semi")
      .groupBy(col("doc_id_1"), col("doc_id_2"))
      .agg(count(lit(1)).as("n_common"))
    jaccardOf(common, sizesOf(ex))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id_1"), col("doc_id_2"), col("jaccard"))
  }

  /** SimHash near-dup pairs: all doc pairs within `maxHamming` bits of each
    * other. The pair space is corpus² over a 1-column table of longs —
    * trivial at this SF; the at-scale plan buckets on simhash prefixes
    * first (same shape as LSH banding). */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val s = simhash(docs)
    s.as("a")
      .join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id_1"),
        col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** 60-bit SimHash fingerprint: per token-occurrence 60-bit hash, per bit
    * the sign of Σ(±1), assembled back into one bigint. Pure integer math —
    * engine-identical. */
  def simhash(docs: DataFrame): DataFrame = {
    val tokenHashes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), tokHash(col("tok")).as("h"))
    val bitSums = tokenHashes
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      // expr: the Scala shiftright() wrapper only takes a literal shift
      .agg(sum(when(expr("shiftright(h, CAST(j AS INT)) & CAST(1 AS BIGINT)") === 1L, 1L)
        .otherwise(-1L)).as("s"))
    bitSums
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")).otherwise(0L))
        .as("simhash"))
  }
}
