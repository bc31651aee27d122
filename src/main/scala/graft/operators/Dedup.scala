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
  *  - n-gram Jaccard (exact) buckets by shingle hash; frequent shingles are
  *    capped by document frequency (a count-only pre-pass — see
  *    [[ngramJaccardPairs]]) so no posting list, and no in-bucket pair
  *    expansion, ever exceeds the cap. The LSH path remains the intended
  *    plan at full scale.
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

  private def jaccardOf(pairs: DataFrame, sizes: DataFrame): DataFrame =
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_id_1")
        .withColumnRenamed("n_shingles", "n1"), Seq("doc_id_1"))
      .join(sizes.withColumnRenamed("doc_id", "doc_id_2")
        .withColumnRenamed("n_shingles", "n2"), Seq("doc_id_2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))

  /** Default shingle document-frequency cap for [[ngramJaccardPairs]].
    * Shingles occurring in more documents than this are boilerplate
    * (headers, license blocks, navigation chrome — guaranteed in any real
    * crawl): they carry near-zero Jaccard signal but would concentrate a
    * K²/2 pair expansion on a single aggregation row. Dropping them is
    * standard near-dup practice; the dropped-shingle count is observable
    * as the `graft_ngram_df_dropped_shingles` query metric. */
  val DefaultShingleDfCap = 100000L

  /** Name of the query observation reporting how many distinct shingles the
    * DF cap dropped (read it from `QueryExecution.observedMetrics` or a
    * `QueryExecutionListener`). */
  val NgramDfCapMetric = "graft_ngram_df_dropped_shingles"

  /** All document pairs with n-gram Jaccard ≥ minJaccard — exact over the
    * DF-capped shingle universe (shingles present in more than `maxDocFreq`
    * documents are excluded from BOTH the pair discovery and the per-doc
    * sizes, so the Jaccard denominator stays consistent with the numerator).
    *
    * Pair discovery groups the exploded shingles by hash ONCE and emits the
    * in-bucket pair combinations from the collected doc list, instead of
    * self-joining the exploded table (which shuffles it twice and resorts
    * both sides). The pair count is identical — it's the same pair space —
    * but only |distinct shingles| rows carry it through the shuffle.
    *
    * Scale note: the DF pre-pass is a count-only aggregation — map-side
    * partials collapse to one tiny (h, df) row per distinct shingle, so hot
    * shingles are identified WITHOUT materializing their posting lists. A
    * shingle shared by millions of docs therefore never builds a
    * multi-hundred-MB `collect_set` array, and every in-bucket expansion is
    * bounded by maxDocFreq²/2. Cost: one extra corpus shingle pass — the
    * same shape as [[minhashLshPairs]]' verification rescan. The hot set is
    * left unhinted: it is tiny for any sane cap and AQE broadcasts it at
    * runtime, while a pathological cap degrades to a shuffled anti-join
    * instead of OOMing the driver. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
      maxDocFreq: Long = DefaultShingleDfCap,
      // observation names must be unique within one query execution — pass a
      // distinct name when composing several instances into a single plan
      dfCapMetricName: String = NgramDfCapMetric): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    val ex = shingleEx(docs, n)
    // shingleEx emits DISTINCT shingles per doc, so count(1) per hash IS the
    // document frequency
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("h"))
      .observe(dfCapMetricName, count(lit(1)).as("dropped_shingles"))
    val byH = ex.join(hot, Seq("h"), "left_anti")
      .groupBy(col("h"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ds"))
    // sizes derive from the SAME aggregate subtree as the pairs, so the
    // shingle explode + hash + shuffle runs once and the second consumer is
    // a ReusedExchange (the naive `ex.groupBy(doc_id)` sizing re-reads and
    // re-hashes the whole corpus under a different partitioning)
    val sizes = byH.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val pairs = byH
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("doc_id_1"), y.as("doc_id_2")))))).as("p"))
      .groupBy(col("p.doc_id_1").as("doc_id_1"), col("p.doc_id_2").as("doc_id_2"))
      .agg(count(lit(1)).as("n_common"))
    jaccardOf(pairs, sizes)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id_1"), col("doc_id_2"), col("n_common"), col("jaccard"))
  }

  /** EXACT set-similarity join via prefix filtering — every document pair
    * with n-gram Jaccard ≥ tNum/tDen, bit-identical to the brute-force
    * pairwise join, with NO document-frequency cap and no approximation
    * (the PPJoin-family technique; the threshold is an exact rational so
    * the prefix length is pure integer arithmetic).
    *
    * Principle: order each doc's shingles by ascending document frequency
    * (rarest first, ties by hash — one GLOBAL total order). With prefix
    * length `p(x) = |x| − ⌈t/(1+t)·|x|⌉ + 1`, any two sets with
    * J ≥ t share a shingle inside BOTH prefixes: if they didn't, every
    * common shingle would sit in one of the two suffixes, giving
    * `|A∩B| ≤ (⌈t/(1+t)·|A|⌉−1) + (⌈t/(1+t)·|B|⌉−1) < t/(1+t)·(|A|+|B|)`,
    * while J ≥ t forces `|A∩B| ≥ t/(1+t)·(|A|+|B|)` — contradiction.
    * (The symmetric-safe t/(1+t) length, NOT the asymmetric probe length
    * |x|−⌈t·|x|⌉+1 of index-probe formulations, which is only exact when
    * one side indexes a longer prefix.)
    *
    * Scale: candidates come from grouping PREFIX postings by shingle and
    * expanding in-bucket pairs — boilerplate shingles have huge df, rank
    * LAST inside every doc, and so never enter a prefix: the skew space
    * that forces [[ngramJaccardPairs]]' observable DF cap prunes itself
    * here, losslessly. Verification re-shingles CANDIDATE DOCS ONLY
    * (semi-join before the explode) and scores `array_intersect` in a
    * projection — the [[minhashLshPairs]] pattern, O(candidates), never a
    * full shingle self-join. */
  def prefixJaccardPairs(docs: DataFrame, n: Int, tNum: Int,
      tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"need 0 < $tNum/$tDen <= 1")
    val minJ = tNum.toDouble / tDen
    val ex = shingleEx(docs, n)
    val dfs = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // p = sz − ⌈tNum·sz/(tNum+tDen)⌉ + 1, all-integer ceil division
    val den = tNum + tDen
    // r15 (guide §2.4 — don't sort what a hash aggregate can collect):
    // the old Window (row_number + count over doc_id) SHUFFLE-SORTED the
    // entire occurrence-sized (doc, shingle, df) table by (doc_id, df, h)
    // — the single most expensive exchange of this query — then threw
    // away every row outside the prefix. One hash aggregate now gathers
    // each doc's (df, h) list through an UNSORTED exchange, sorts it
    // in-memory (shingle sets are doc-sized), and slice() drops the
    // suffix BEFORE the explode, so suffix rows never leave the
    // aggregate row. rk/sz semantics are identical: rk = 1-based
    // position in the (df, h) order, sz = the doc's total shingle count
    // — equal (df, h) duplicates are indistinguishable, so any tie
    // order yields the same candidate set (the group-max over ub below
    // sees the same multiset either way).
    val prefix = ex.join(dfs, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("sz"), col("sh"))
      .select(col("doc_id"), col("sz"), posexplode(
        expr(s"slice(sh, 1, sz - (($tNum * sz + ${den - 1}) div $den) + 1)")))
      .select(col("doc_id"), col("col.h").as("h"),
        (col("pos") + lit(1)).as("rk"), col("sz"))
    prefixVerify(docs, n, minJ, tNum, tDen, den, prefix)
  }

  /** Candidate expansion + exact verification shared by
    * [[prefixJaccardPairs]] and its dev A/B twin: PPJoin positional +
    * length filters over the prefix postings, then candidates-only
    * re-shingle and exact Jaccard. */
  private def prefixVerify(docs: DataFrame, n: Int, minJ: Double,
      tNum: Int, tDen: Int, den: Int, prefix: DataFrame): DataFrame = {
    // candidate expansion carries (rank, size) so the PPJoin positional
    // and length filters prune BEFORE the verify join — both lossless:
    //  - positional: for the pair's minimum-position shared prefix token
    //    m, every other common token sorts after m (else it would be an
    //    earlier prefix-meeting token), so |A∩B| ≤ 1 + min(szA−rkA(m),
    //    szB−rkB(m)); J ≥ t forces |A∩B| ≥ ⌈t/(1+t)·(szA+szB)⌉ = α.
    //    ubound is max at the min-position meeting token, so max(ubound)
    //    over meeting tokens ≥ α is exactly the m-based test;
    //  - length: J ≤ min(szA,szB)/max(szA,szB), so tDen·min ≥ tNum·max.
    val cand = prefix.groupBy(col("h"))
      .agg(array_sort(collect_set(struct(col("doc_id"), col("rk"), col("sz"))))
        .as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
          struct(x.getField("doc_id").as("doc_id_1"),
            y.getField("doc_id").as("doc_id_2"),
            x.getField("sz").as("sz1"), y.getField("sz").as("sz2"),
            (lit(1L) + least(x.getField("sz") - x.getField("rk"),
              y.getField("sz") - y.getField("rk"))).as("ub"))))))
        .as("p"))
      .select(col("p.doc_id_1").as("doc_id_1"), col("p.doc_id_2").as("doc_id_2"),
        col("p.sz1").as("sz1"), col("p.sz2").as("sz2"), col("p.ub").as("ub"))
      .groupBy(col("doc_id_1"), col("doc_id_2"))
      // sz is functional on the doc id (constant per group): max ≡ the
      // value, chosen over first() for order-independence
      .agg(max(col("ub")).as("max_ub"),
        max(col("sz1")).as("sz1"), max(col("sz2")).as("sz2"))
      .filter(col("max_ub") >=
        expr(s"($tNum * (sz1 + sz2) + ${den - 1}) div $den") &&
        lit(tDen.toLong) * least(col("sz1"), col("sz2")) >=
          lit(tNum.toLong) * greatest(col("sz1"), col("sz2")))
      .select(col("doc_id_1"), col("doc_id_2"))
    val candDocs = cand.select(col("doc_id_1").as("doc_id"))
      .unionByName(cand.select(col("doc_id_2").as("doc_id")))
      .distinct()
    val sets = shingleEx(docs.join(candDocs, Seq("doc_id"), "left_semi"), n)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("h"))).as("hs"))
    // shuffled-hash attach: sorting the candidate side (pairs × two
    // shingle-array payloads) is where a sort-merge join spills at scale;
    // the per-key doc-set build side hashes fine
    cand
      .join(sets.select(col("doc_id").as("doc_id_1"), col("hs").as("hs1"))
        .hint("shuffle_hash"), Seq("doc_id_1"))
      .join(sets.select(col("doc_id").as("doc_id_2"), col("hs").as("hs2"))
        .hint("shuffle_hash"), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long").as("n_common"),
        size(col("hs1")).cast("long").as("n1"),
        size(col("hs2")).cast("long").as("n2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_id_1"), col("doc_id_2"), col("n_common"), col("jaccard"))
  }

  /** Dev-only A/B twin (r15): [[prefixJaccardPairs]] with the PRE-r15
    * WINDOW-ranked prefix derivation (row_number + count over a
    * doc_id window — a full shuffle-SORT of the occurrence-sized
    * shingle table). Kept private for the probe A/B and the
    * branch-equality spec; identical output by construction. */
  private[graft] def prefixJaccardPairsWindowed(docs: DataFrame, n: Int,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"need 0 < $tNum/$tDen <= 1")
    val minJ = tNum.toDouble / tDen
    val ex = shingleEx(docs, n)
    val dfs = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = ex.join(dfs, Seq("h"))
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("h"))))
      .withColumn("sz", count(lit(1)).over(byDoc))
    val den = tNum + tDen
    val prefix = ranked
      .filter(col("rk") <=
        expr(s"sz - (($tNum * sz + ${den - 1}) div $den) + 1"))
      .select(col("doc_id"), col("h"), col("rk"), col("sz"))
    prefixVerify(docs, n, minJ, tNum, tDen, den, prefix)
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
    val candidates = lshCandidates(minhashSignatures(docs, n))
    // exact verification touches CANDIDATE DOCS ONLY: gather each candidate
    // doc's (distinct) shingle-hash set into a sorted array once, attach the
    // two arrays to each candidate pair, and score the intersection in a
    // projection. Unlike a shingle-level self-join, nothing about the
    // frequent-shingle skew space ever enters a shuffle — the verification
    // cost is |candidate pairs| × shingle-set size, the LSH-promised bound.
    val candDocs = candidates.select(col("doc_id_1").as("doc_id"))
      .unionByName(candidates.select(col("doc_id_2").as("doc_id")))
      .distinct()
    // semi-join BEFORE the shingle explode: the corpus is re-shingled and
    // re-hashed only for candidate docs, so this second pass costs
    // O(candidates), not a second O(corpus) — the signature pass is the
    // only full-corpus scan
    val sets = shingleEx(docs.join(candDocs, Seq("doc_id"), "left_semi"), n)
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("h"))).as("hs"))
    candidates
      .join(sets.select(col("doc_id").as("doc_id_1"), col("hs").as("hs1")), Seq("doc_id_1"))
      .join(sets.select(col("doc_id").as("doc_id_2"), col("hs").as("hs2")), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long").as("n_common"),
        size(col("hs1")).cast("long").as("n1"), size(col("hs2")).cast("long").as("n2"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id_1"), col("doc_id_2"), col("jaccard"))
  }

  /** MinHash estimator-quality evaluation — the [[graft.operators
    * .Similarity.annRecall]] twin for the sketch family: for every LSH
    * candidate pair, the signature-ESTIMATED Jaccard (matching
    * components / k, integer-exact numerator) against the TRUE Jaccard
    * from the exact shingle sets, plus the absolute error. This is the
    * measurement that sizes k and the banding before trusting the sketch
    * at scale. Cost: the candidate set only — signatures are already
    * doc-sized, and the exact side reuses the candidates-only
    * verification pattern. */
  def minhashEstimatorEval(docs: DataFrame, n: Int): DataFrame = {
    val sigs = minhashSignatures(docs, n)
    val candidates = lshCandidates(sigs)
    val candDocs = candidates.select(col("doc_id_1").as("doc_id"))
      .unionByName(candidates.select(col("doc_id_2").as("doc_id")))
      .distinct()
    val sets = shingleEx(docs.join(candDocs, Seq("doc_id"), "left_semi"), n)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("h"))).as("hs"))
    candidates
      .join(sigs.select(col("doc_id").as("doc_id_1"), col("sig").as("sig1")), Seq("doc_id_1"))
      .join(sigs.select(col("doc_id").as("doc_id_2"), col("sig").as("sig2")), Seq("doc_id_2"))
      .join(sets.select(col("doc_id").as("doc_id_1"), col("hs").as("hs1")), Seq("doc_id_1"))
      .join(sets.select(col("doc_id").as("doc_id_2"), col("hs").as("hs2")), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"),
        aggregate(zip_with(col("sig1"), col("sig2"),
          (a, b) => when(a === b, 1L).otherwise(0L)), lit(0L), _ + _)
          .as("n_match"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long").as("n_common"),
        size(col("hs1")).cast("long").as("n1"),
        size(col("hs2")).cast("long").as("n2"))
      .withColumn("est_jaccard",
        col("n_match").cast("double") / lit(MinHashK.toDouble))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
      .select(col("doc_id_1"), col("doc_id_2"), col("n_match"),
        col("est_jaccard"), col("jaccard"), col("abs_err"))
  }

  /** SimHash near-dup pairs: all doc pairs within `maxHamming` bits of each
    * other — EXACT, but never materializing the corpus² pair space.
    *
    * Pigeonhole bucketing: split the 60-bit fingerprint into maxHamming+1
    * equal chunks. Two fingerprints within `maxHamming` differing bits must
    * agree EXACTLY on at least one chunk (pigeonhole), so an equi-join on
    * (chunk_index, chunk_value) has 100% recall; candidates are then
    * verified with the true bit_count. At scale this is the same shape as
    * LSH banding but lossless: the join key is a ~(60/(k+1))-bit value, so
    * only near-identical fingerprints ever meet in the shuffle. */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    // maxHamming >= 60 would make the chunk width 0 — every row lands in one
    // (idx, 0) bucket and the equi-join degenerates to a corpus² cross join
    require(maxHamming >= 0 && maxHamming < 60,
      s"maxHamming must be in [0, 60), got $maxHamming")
    val s = simhash(docs)
    val nChunks = maxHamming + 1
    val bits = 60
    val base = bits / nChunks
    val rem = bits % nChunks // first `rem` chunks get one extra bit
    def chunkOf(i: Int): Column = {
      val lo = i * base + math.min(i, rem)
      val w = base + (if (i < rem) 1 else 0)
      expr(s"shiftright(simhash, $lo)").bitwiseAND(lit((1L << w) - 1L))
    }
    val chunks = s.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until nChunks).map(chunkOf): _*)))
      .toDF("doc_id", "simhash", "chunk_idx", "chunk_val")
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id_1"),
        col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can share several chunks
  }

  /** Transitive dedup clusters: connected components over a near-dup pair
    * table; each doc's cluster id is the MIN doc_id reachable through
    * pairs. Iterative min-label propagation: every round joins the current
    * labels to the symmetric edge list and lowers each vertex's label to
    * the min over itself and its neighbors, until a fixpoint. The fixpoint
    * (min doc_id per component) is unique and schedule-independent, so the
    * result is deterministic and matches the oracle's recursive-CTE
    * formulation exactly. Rounds ≈ component diameter (near-dup clusters
    * are shallow); each round is one shuffled join + aggregate; lineage is
    * truncated per round (`localCheckpoint` — on a durable cluster,
    * `checkpoint` to reliable storage instead). */
  /** Edge-count threshold below which [[dedupClusters]] solves the
    * components on the driver (union-find over the collected pair list)
    * instead of the iterative join loop: a few million 16-byte edges are
    * driver-trivial, and near-dup graphs are SPARSE — even a 100 TB corpus
    * usually yields a pair list far below its row count. The distributed
    * loop remains the fallback for genuinely huge pair graphs. */
  val DriverCcMaxEdges = 2000000L

  def dedupClusters(pairs: DataFrame,
      driverMaxEdges: Long = DriverCcMaxEdges): DataFrame = {
    // materialize the (usually expensive) pair computation ONCE, BEFORE the
    // symmetric union — otherwise the upstream near-dup pipeline runs twice
    // (once per union branch), and again every loop round. cache + count is
    // ONE job that both materializes the pairs and sizes the branch choice
    // (an eager localCheckpoint followed by count() paid a second job here)
    val p0 = pairs.select(col("doc_id_1").as("a"), col("doc_id_2").as("b"))
      .cache()
    val nEdges = p0.count()
    // the driver path needs each undirected pair ONCE — collect p0, not the
    // doubled symmetric list
    if (nEdges * 2 <= driverMaxEdges)
      try return driverSideCc(p0) finally p0.unpersist(false)
    // big-graph path: NOW truncate lineage (the loop replans each round,
    // and a cache-evicted block would otherwise replay the whole upstream)
    // serialized storage for the edge-sized checkpoint — same rationale
    // as Graph.ckptEdges: the deserialized default re-expands evicted
    // blocks into object arrays on read-back, which OOMs at big |E|
    val p = p0.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    p0.unpersist(false)
    val edges = p.unionByName(p.select(col("b").as("a"), col("a").as("b")))
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("lab", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val neigh = edges
        .join(labels.select(col("doc_id").as("b"), col("lab").as("nlab")), Seq("b"))
        .groupBy(col("a"))
        .agg(min(col("nlab")).as("min_neigh"))
        .withColumnRenamed("a", "doc_id")
      // pointer jumping: also adopt the label OF my label — contracts label
      // chains so convergence is O(log diameter) rounds, not O(diameter)
      val parent = labels.select(col("doc_id").as("lab"), col("lab").as("plab"))
      val stepped = labels
        .join(neigh, Seq("doc_id"), "left")
        .join(parent, Seq("lab"), "left")
        .select(col("doc_id"), col("lab"),
          least(col("lab"),
            coalesce(col("min_neigh"), col("lab")),
            coalesce(col("plab"), col("lab"))).as("lab2"))
        .localCheckpoint(true)
      changed = stepped.filter(col("lab2") < col("lab")).count()
      // stepped is materialized: the prior round's label blocks are dead
      org.apache.spark.sql.GraftColumnBridge.releaseLocalCheckpoint(labels)
      labels = stepped.select(col("doc_id"), col("lab2").as("lab"))
    }
    labels.select(col("doc_id"), col("lab").as("cluster_id"))
  }

  /** Driver-side union-find (path-halving; roots keyed to the MIN doc_id
    * of the component — identical fixpoint to the distributed loop). */
  private def driverSideCc(edges: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    edges.select(col("a"), col("b")).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min id becomes the root
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val spark = edges.sparkSession
    import spark.implicits._
    parent.keys.toSeq.sorted
      .map(v => (v, find(v)))
      .toDF("doc_id", "cluster_id")
  }

  /** 60-bit SimHash fingerprint: per token-occurrence 60-bit hash, per bit
    * the sign of Σ(±1), assembled back into one bigint. Pure integer math —
    * engine-identical.
    *
    * ONE hash aggregation with 60 conditional-sum columns (all codegen'd):
    * partial aggregation collapses token rows to one 60-long vector per doc
    * map-side, so the only shuffle moves |docs| rows. (The naive bit-explode
    * formulation shuffles 60× the token count twice — measured ~3× slower
    * at sf0.1, and the gap widens with corpus size.) */
  def simhash(docs: DataFrame): DataFrame = {
    val tokenHashes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), tokHash(col("tok")).as("h"))
    val bitSums: Seq[Column] = (0 until 60).map(j =>
      sum(when(expr(s"shiftright(h, $j)").bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$j"))
    tokenHashes
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Candidate-pair cap under which the edit-distance attach path
    * broadcasts the (ids-only) candidate frame: 2 M pairs ≈ 64 MB built —
    * the same conservative scale the driver union-find gate uses. */
  val EditAttachBroadcastGate = 2000000L

  /** Edit-distance near-dup — character-level verification on top of the
    * simhash pigeonhole candidates: a pair survives iff its exact
    * Levenshtein distance is within `maxDist`. The O(len²) DP only ever
    * runs on candidate pairs (never corpus²). Spark's `levenshtein` and
    * the oracle engine's agree exactly (standard unit-cost DP).
    *
    * r14 (the r13 verdict's predicted cliff, confirmed at sf10): the old
    * two bare doc-table attach joins planned as SortMergeJoin — the
    * CORPUS TEXT table shuffled+sorted by doc_id TWICE for a handful of
    * candidate pairs (estimator-blind: the candidate side's size is
    * unknowable statically, and unlike the MinHash verifier there was no
    * semi-join prefilter for AQE to rescue). Now the candidate frame is
    * materialized once (localCheckpoint — small by design, pigeonhole
    * candidates only) which makes its count EXACT; under the gate the
    * attach path broadcasts the id-only frames so the corpus is never
    * shuffled: texts arrive via a broadcast semi-join (candidate texts
    * only) and the pair frame broadcasts into the first attach. Past the
    * gate it degrades to the old shuffled shape (same rows) — degrade,
    * not die, the r13 gate convention. Every branch emits identical
    * rows; the oracle pins them.
    *
    * EAGER (ADVICE r14, semantics note): CONSTRUCTING this DataFrame
    * runs Spark jobs — the candidate frame is checkpointed and counted
    * to decide the attach shape, so the pigeonhole candidate pass
    * executes before any action on the result (a plan-only `explain`
    * of the returned frame still pays it). Gate size: the candidate
    * frame is ID-ONLY (3 longs/row ≈ 24 B), so the 2 M-pair gate bounds
    * the broadcast build at ~64 MB framed — a BYTE bound and the pair
    * bound coincide while the frame stays id-only; anyone widening the
    * candidate schema must re-derive the gate (r14 verdict watch item).
    *
    * FAILURE STORY (r14 verdict #6): `localCheckpoint` truncates
    * lineage — on a durable cluster an executor loss after the
    * checkpoint fails the query instead of recomputing. Set
    * `spark.graft.reliableCheckpoint=<dir>` (sys prop, or the
    * `SPARK_GRAFT_RELIABLE_CHECKPOINT` env) to route this gate's
    * checkpoint through RELIABLE storage (`Dataset.checkpoint` into
    * that directory): same rows, executor-loss-safe, at the cost of one
    * write+read of the (small) candidate frame. Local/default runs keep
    * localCheckpoint — the right trade on a single machine. */
  def editDistancePairs(docs: DataFrame, maxHamming: Int,
      maxDist: Int): DataFrame =
    editDistancePairsGated(docs, maxHamming, maxDist, EditAttachBroadcastGate)

  /** Checkpoint for a SMALL gate-decision frame: reliable when the
    * deployment configured a checkpoint dir (see [[editDistancePairs]]'
    * failure-story note), local otherwise. Both are eager, so the
    * caller's count() reads materialized blocks either way. */
  private def ckptGateFrame(df: DataFrame): DataFrame =
    sys.props.get("spark.graft.reliableCheckpoint")
      .orElse(sys.env.get("SPARK_GRAFT_RELIABLE_CHECKPOINT")) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }

  private[graft] def editDistancePairsGated(docs: DataFrame, maxHamming: Int,
      maxDist: Int, gate: Long): DataFrame = {
    val cand = ckptGateFrame(simhashNearDupPairs(docs, maxHamming))
    val verified =
      if (cand.count() <= gate) {
        val candDocs = cand.select(col("doc_id_1").as("doc_id"))
          .unionByName(cand.select(col("doc_id_2").as("doc_id")))
          .distinct()
        // candidate texts only — the corpus is scanned, never shuffled
        val txts = docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("text"))
        broadcast(cand)
          .join(txts.select(col("doc_id").as("doc_id_1"), col("text").as("t1")),
            "doc_id_1")
          .join(txts.select(col("doc_id").as("doc_id_2"), col("text").as("t2")),
            "doc_id_2")
      } else cand
        .join(docs.select(col("doc_id").as("doc_id_1"), col("text").as("t1")),
          "doc_id_1")
        .join(docs.select(col("doc_id").as("doc_id_2"), col("text").as("t2")),
          "doc_id_2")
    verified
      // threshold form: the DP short-circuits at O(len·maxDist) and
      // returns -1 above the bound (vs O(len²) for the unbounded form)
      .withColumn("edit_dist",
        levenshtein(col("t1"), col("t2"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0)
      .select(col("doc_id_1"), col("doc_id_2"), col("hamming"), col("edit_dist"))
  }

  /** Benchmark decontamination — the eval-leakage scan every training
    * corpus needs: a train document is contaminated iff it shares ANY
    * n-token shingle with the eval corpus. The eval shingle set is
    * distinct-collapsed (it is the small side — benchmark suites are MBs
    * against a TB-scale corpus, so AQE broadcasts it); the train side
    * left-semi-joins on the 8-byte shingle hash and a doc survives once —
    * no pair space, no posting lists, one pass over each corpus. */
  def contaminatedDocs(train: DataFrame, eval: DataFrame, n: Int = 8): DataFrame =
    shingleEx(train, n)
      .join(shingleEx(eval, n).select(col("h")).distinct(), Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()

  /** Canonical-document selection — the pipeline step AFTER clustering:
    * within each near-dup cluster keep exactly one representative, the
    * longest document (ties → smallest doc_id; the deterministic
    * struct-argmax `min(struct(−n_chars, doc_id))`), and report how
    * many members it displaces. The cluster frame is
    * [[dedupClusters]]'s output; sizes join from the documents table on
    * doc_id (dimension-sized broadcast is wrong here — both sides are
    * doc-keyed facts, so it's one co-keyed shuffle). One hash aggregate
    * per cluster — no windows, no pair space. */
  def canonicalDocs(clusters: DataFrame, docs: DataFrame): DataFrame =
    clusters
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("n_chars")).as("neg"), col("doc_id").as("d")))
          .as("top"))
      .select(col("cluster_id"), col("n_members"),
        col("top").getField("d").as("canonical_doc"),
        (-col("top").getField("neg")).as("canonical_chars"),
        (col("n_members") - 1).as("n_dropped"))

  /** Bloom-accelerated decontamination — IDENTICAL answer to
    * [[contaminatedDocs]] (same oracle), but the train-side shingle
    * stream first passes a bloom filter built over the eval shingles,
    * so at 100 TB the expensive shingle semi-join shuffle only carries
    * the (tiny) candidate fraction instead of every train shingle;
    * the exact semi-join afterwards kills the bloom's false positives,
    * which is why the result stays engine-exact. The bloom itself is a
    * FIXED-SIZE artifact (numBits/8 bytes regardless of corpus size —
    * a bounded build, like the IVF centroid literals) delivered as a
    * TORRENT BROADCAST probed by the codegen'd
    * [[graft.functions.BroadcastBloomMightContain]] predicate: no UDF,
    * no broadcast join, evaluated inside the scan's WholeStageCodegen
    * span, and — unlike a plan `Literal` — the bytes move once per
    * executor instead of riding inside every stage's serialized task
    * binary (the same fix [[graft.operators.Graph.closedWedges]] got;
    * at a 100 M-shingle eval set the filter is ~90 MB, far too big to
    * re-copy per task). Bloom membership has NO false negatives, so no
    * contaminated doc can be lost at the prefilter. */
  def bloomContaminatedDocs(train: DataFrame, eval: DataFrame, n: Int = 8,
      expectedShingles: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val evalH = shingleEx(eval, n).select(col("h")).distinct()
    // an empty eval set trivially contaminates nothing
    if (evalH.isEmpty) return train.select(col("doc_id")).filter(lit(false))
    // BloomBuild, not stat.bloomFilter: the built-in clamps to the 8 MB
    // runtime-filter limit, which would silently saturate any eval set
    // past ~7 M shingles (see BloomBuild's scaladoc)
    val bf = graft.functions.BloomBuild
      .overLongColumn(evalH, "h", expectedShingles, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = GraftColumnBridge.column(
      graft.functions.BroadcastBloomMightContain(bc,
        GraftColumnBridge.expression(col("h"))))
    shingleEx(train, n)
      .filter(mightContain)
      .join(evalH, Seq("h"), "left_semi")
      .select(col("doc_id")).distinct()
  }
}
