package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting) over the `documents` table.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions` —
  * no UDFs — so whole-stage codegen spans the full pipeline and the work
  * distributes embarrassingly (per-row, no shuffle until an aggregate).
  *
  * Cross-engine determinism: token hashing uses the first 15 hex chars of
  * md5 (a 60-bit integer both Spark's `conv` and DuckDB's hex cast produce
  * identically); all ratios are single divisions of exact integers.
  */
object TextAnalysis {

  /** Large prime modulus for rolling/minhash arithmetic (fits products in
    * 64-bit: acc,x < P ≈ 2^30 → acc*31+x < 2^35). */
  val P: Long = 1000000007L

  /** 60-bit deterministic token hash: md5 hex prefix → bigint. Identical in
    * DuckDB as `('0x' || substr(md5(t), 1, 15))::BIGINT`. */
  def tokHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens (keeps empty tokens on repeated/trailing separators —
    * same as DuckDB's string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Corpus composition report per source — the mixing table a training
    * pipeline derives sampling weights from: docs, whitespace tokens,
    * chars, and each source's share of the corpus totals. Exact integer
    * sums; the four shares divide exactly-converted integers once. One
    * map-side-partial aggregate; totals attach via a broadcast
    * single-row frame. */
  def corpusMix(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
    val tot = per.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_tokens")).as("t_tokens"), sum(col("n_chars")).as("t_chars"))
    per.crossJoin(broadcast(tot)) // single-row side: fixed-size, safe
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_docs").cast("double") / col("t_docs").cast("double"))
          .as("doc_share"),
        (col("n_tokens").cast("double") / col("t_tokens").cast("double"))
          .as("token_share"),
        (col("n_chars").cast("double") / col("t_chars").cast("double"))
          .as("char_share"))
  }

  /** Per-document surface statistics: char/token counts, distinct tokens,
    * average token length. */
  def textStats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_calc"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"),
      (aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x).cast("double") /
        size(t)).as("avg_token_len"))
  }

  /** BPE-ish token counting: alphabetic runs, digit runs, and single
    * non-alnum symbols — the shape of a byte-pair pretokenizer. Counted by
    * the single-pass codegen [[graft.functions.CharClassCount]] expression
    * rather than `size(regexp_extract_all(...))`: identical counts
    * (spec-pinned against the regex form), zero match-array allocation,
    * and immune to the java.util.regex JIT pathology the r10 growth
    * dissection measured (regex char-class scans ran up to 100× slower
    * inside Generate-bearing jobs — PLANS.md "q_map_funcs"). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      GraftFunctions.char_class_count(col("text"), CharClassCount.AlphaRuns).as("n_alpha"),
      GraftFunctions.char_class_count(col("text"), CharClassCount.DigitRuns).as("n_num"),
      GraftFunctions.char_class_count(col("text"), CharClassCount.Symbols).as("n_sym"))

  /** MapType surface over the token-class counts: build a `map<string,long>`
    * per document, then explode it back to (key, value) rows — the
    * map-functions category of the scalar checklist (construction, explode;
    * `map_keys`/`element_at` are the same machinery). Relationally the
    * output is the UNION-ALL unpivot of [[tokenCount]], which is what the
    * DuckDB oracle mirrors. */
  def mapClassCounts(docs: DataFrame): DataFrame =
    tokenCount(docs)
      .select(col("doc_id"),
        explode(map(
          lit("alpha"), col("n_alpha"),
          lit("num"), col("n_num"),
          lit("sym"), col("n_sym"))))
      .toDF("doc_id", "token_class", "n")

  /** Stopword-count language-ID heuristic: per-language function-word hit
    * counts; prediction = argmax with a fixed preference order on ties. */
  def langId(docs: DataFrame): DataFrame = {
    def hits(pat: String): Column = regexp_count(col("text"), lit(pat))
    val en = hits("\\b(the|a|of|and)\\b")
    val de = hits("\\b(der|die|das|und)\\b")
    val es = hits("\\b(el|los|las|y)\\b")
    val fr = hits("\\b(le|les|et|une)\\b")
    docs.select(
      col("doc_id"), col("lang"),
      en.cast("long").as("en_hits"), de.cast("long").as("de_hits"),
      es.cast("long").as("es_hits"), fr.cast("long").as("fr_hits"),
      when(en >= de && en >= es && en >= fr, lit("en"))
        .when(de >= es && de >= fr, lit("de"))
        .when(es >= fr, lit("es"))
        .otherwise(lit("fr")).as("lang_pred"))
  }

  /** Composite quality score from length/diversity/stopword ratios. All
    * arithmetic is a fixed-order chain of double ops → engine-identical.
    * The 6-decimal rounding is the EXPLICIT floor(x·10⁶ + 0.5)/10⁶ chain
    * (plain IEEE ops) — built-in round(x, 6) implementations disagree by
    * an ulp between engines on boundary inputs (found at sf0.1: Spark's
    * BigDecimal HALF_UP of the exact binary vs DuckDB's scaled-double
    * path), whereas this chain is bit-identical everywhere. x ≥ 0 here,
    * so the +0.5 floor is round-half-up exactly. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val distinctRatio = size(array_distinct(t)).cast("double") / size(t)
    val stopHits = regexp_count(col("text"), lit("\\b(the|a)\\b")).cast("double")
    val rawQuality = distinctRatio * lit(0.5) +
      least(nChars / lit(500.0), lit(1.0)) * lit(0.3) +
      least(stopHits / size(t) * lit(5.0), lit(1.0)) * lit(0.2)
    docs.select(
      col("doc_id"),
      (nTok / nChars).as("tokens_per_char"),
      distinctRatio.as("distinct_ratio"),
      (stopHits / size(t)).as("stopword_ratio"),
      (floor(rawQuality * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
        .as("quality"))
  }

  /** Top-k rarity-weighted terms per document — the TF-IDF shape with a
    * RATIONAL weight: `score = tf · (N+1)/(df+1)` (no transcendental `ln`,
    * whose libm rounding can differ across engines; every op here is an
    * exactly-rounded IEEE multiply/divide over exact integers, so scores are
    * bit-identical everywhere).
    *
    * Scale shape: one token explode feeding two aggregations (tf per
    * (doc, term) and document frequency per term — both collapse map-side),
    * a term-keyed join (AQE broadcasts the vocabulary side when it fits),
    * the singleton corpus count broadcast, and a per-doc ranking window
    * (shuffle keyed on doc_id — no global sort). */
  def topTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n)) // single-row side: fixed-size, hint is safe
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rk"))
  }

  /** Sliding-window document chunking — the context-window preparation step
    * of an LLM data pipeline: each document becomes
    * max(1, ceil((n-overlap)/stride)) chunks of up to `chunkTokens` tokens
    * (the max(1, ·) covers docs of `overlap` or fewer tokens, which still
    * yield their single short chunk), consecutive chunks sharing `overlap`
    * tokens. Pure per-row projection + explode (no shuffle, fully
    * codegen'd); chunk boundaries are deterministic token offsets, so the
    * operation is reproducible and SQL-mirrorable. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // last valid start: n-1-overlap — a chunk starting later is wholly
      // contained in its predecessor (which already reaches the final
      // token), so the start sequence stops there (clamped to start 0 for
      // docs of <= overlap tokens, which keep their single chunk)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - 1 - overlap, lit(0)), lit(stride))))
      .toDF("doc_id", "toks", "chunk_id", "start_tok")
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        concat_ws(" ", slice(col("toks"), col("start_tok") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("toks")) - col("start_tok"), lit(chunkTokens)).cast("long")
          .as("n_chunk_tokens"))
  }

  /** Sequence packing — assign each document to a fixed-token-budget pack,
    * the way pretraining concatenates a shuffled corpus and cuts it into
    * context windows: documents are ordered deterministically (md5 of the
    * id) WITHIN a hash bucket, token counts prefix-summed, and a document's
    * pack is the window containing its start offset. Buckets make the
    * prefix sum a partitioned window (parallel across buckets — no global
    * cumsum); a document may straddle two packs, exactly like concat-and-cut
    * training data. */
  def packSequences(docs: DataFrame, targetTokens: Long, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      pmod(tokHash(col("doc_id").cast("string")), lit(buckets.toLong)).as("bucket"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    base
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        graft.model.floorDivCol(col("end_off") - col("n_tokens"), targetTokens)
          .as("pack_id"))
  }

  /** Exact global heavy hitters: the top-k tokens by total occurrence.
    * Explode → count aggregation (map-side partials collapse the token
    * stream before the shuffle; only |vocabulary| rows move) →
    * TakeOrderedAndProject (per-partition top-k + merge — no global sort).
    * The count-min sketch (spec'd in OperatorInvariantsSpec) is the
    * sublinear streaming alternative; this is the exact form. */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)

  /** Email pattern shared by scrub and count — case-insensitive ((?i) is
    * honored identically by Java regex and RE2), character classes and
    * bounded quantifiers only, so both engines agree on every match. */
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** NANP-style phone pattern (+1-NNN-NNN-NNNN). */
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrubbing — the redaction pass every shipped training corpus goes
    * through: replace emails and phone numbers with typed placeholder
    * tokens and report per-document redaction counts. Pure per-row
    * projection (regexp_replace/regexp_count are codegen'd built-ins):
    * no shuffle, scales linearly with corpus bytes. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** Corpus-wide top-k bigram counts (no per-doc dedup — frequency, not
    * containment; contrast [[graft.operators.Dedup.shinglesOf]] which
    * dedups per document for Jaccard). Explode feeds a count aggregation
    * whose map-side partials collapse the pair stream to |vocabulary²∩data|
    * rows before the shuffle; top-k is TakeOrderedAndProject. */
  def bigramCounts(docs: DataFrame, k: Int): DataFrame =
    docs
      // materialize the token array FIRST: an inline split() referenced
      // from inside the lambda re-evaluates per element access —
      // O(tokens²) (same trap documented in Dedup.shingleEx)
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ",
          element_at(col("toks"), i), element_at(col("toks"), i + 1))))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)

  /** Within-document n-gram repetition score — the boilerplate/spam signal
    * (a doc whose 3-grams repeat heavily is template or keyword-stuffed
    * text): rep_ratio = 1 - distinct/total n-grams. Per-row projection
    * only; the ratio is one exact-int division (engine-identical). */
  def repetitionScore(docs: DataFrame, n: Int = 3): DataFrame = {
    // token array materialized before the lambda touches it (see
    // bigramCounts — inline split() inside a lambda is O(tokens²))
    val ws = col("toks")
    val grams = when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + lit(o + 1))): _*)))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct_grams"))
      .withColumn("rep_ratio",
        when(col("n_grams") > 0,
          (col("n_grams") - col("n_distinct_grams")).cast("double") / col("n_grams"))
          .otherwise(lit(0d)))
  }

  /** Inverted-index postings as FLAT rows: (term, df, rank, doc_id) with
    * doc_ids ranked ascending per term and CAPPED at `maxPostings`.
    * The cap bounds the COLLECTED posting array downstream (rank ≤ cap
    * filters before [[invertedIndex]]'s collect_list, so a hot stopword
    * never buffers an unbounded array) — it does NOT bound the window
    * itself: the count/row_number windows still sort-and-buffer each
    * term's full partition slice in its window task, spilling to disk
    * past memory. df stays exact so the caller knows truncation
    * happened when df > cap. Explode → distinct → one term-keyed
    * shuffle carrying both the ranking and the frequency window. */
  def invertedIndexPostings(docs: DataFrame, minDf: Long,
      maxPostings: Int): DataFrame = {
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .distinct()
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank",
        row_number().over(byTerm.orderBy(col("doc_id"))).cast("long"))
      .filter(col("df") >= minDf && col("rank") <= maxPostings)
      .select(col("term"), col("df"), col("rank"), col("doc_id"))
  }

  /** Inverted-index build — the text-search index shape: term → sorted
    * posting list of containing doc_ids, with exact document frequency.
    * Built over [[invertedIndexPostings]], so the per-term collect is
    * bounded by the cap (≤ maxPostings elements), not by the term's true
    * document frequency. */
  def invertedIndex(docs: DataFrame, minDf: Long,
      maxPostings: Int): DataFrame =
    invertedIndexPostings(docs, minDf, maxPostings)
      .groupBy(col("term"))
      .agg(first(col("df")).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** Character-concentration diversity (Gini-style, log-free): per doc,
    * `1 − Σ cᵢ² / n²` over single-character frequencies — near 1 for
    * varied text, → 0 for one-character junk (padding runs, binary
    * spill, mojibake floods). Deliberately NOT Shannon entropy: `ln()`
    * bit patterns are not guaranteed identical across engines' math
    * libraries, while this is exact integer sums + ONE double division
    * each (the same libm-free trick as the split-drift TV distance).
    * Explode → two hash aggregations, both with map-side partials. */
  def charDiversity(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
      .select(col("doc_id"), col("n").as("n_chars"),
        (lit(1.0) - col("ss").cast("double") /
          (col("n") * col("n")).cast("double")).as("char_diversity"))

  /** Polynomial rolling-hash fingerprint over the token stream:
    * `h = fold(tokens, 0, (acc, t) -> (acc*31 + hash60(t) mod P) mod P)`.
    * Order-sensitive by construction (it is a sequence fingerprint). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      aggregate(
        transform(tokens(col("text")), t => tokHash(t) % lit(P)),
        lit(0L),
        (acc, x) => (acc * lit(31L) + x) % lit(P)).as("fingerprint"))

  /** BM25 ranked retrieval of the top-`k` documents for a fixed bag of
    * query terms — the lexical-retrieval complement of the dense top-k in
    * [[graft.operators.Similarity]].
    *
    * Uses the RATIONAL idf `((N - df) + 0.5) / (df + 0.5)` instead of the
    * textbook `ln` of it: `ln` is not IEEE-correctly-rounded and differs
    * by ulps across math libraries, while +,-,*,/ are exact-rounded
    * everywhere — so this score is bit-identical in any engine that
    * evaluates the same expression tree, and the ranking it induces is the
    * same monotone order as log-BM25 for single-term queries (and the
    * standard log-free variant for multi-term ones). Saturation/length
    * normalization is textbook Robertson:
    * `tf·(k1+1) / (tf + k1·((1-b) + b·dl/avgdl))`.
    *
    * Scale: one token explode + two hash aggregates; the per-term score
    * frame is filtered to the query terms BEFORE the aggregate, so the
    * joined frames are (docs containing a query term)-sized, never
    * corpus×vocab. Corpus totals attach as a broadcast single-row frame;
    * the final top-k is TakeOrderedAndProject (no global sort). */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double, b: Double,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))
    val tf = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("n_tokens").cast("double") / col("n_docs").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val norm = lit(k1) * ((lit(1.0) - lit(b)) +
      lit(b) * (col("dl").cast("double") / avgdl))
    val score = idf *
      ((col("tf").cast("double") * (lit(k1) + lit(1.0))) /
        (col("tf").cast("double") + norm))
    val perTerm = tf
      .join(broadcast(dfq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("dl"), col("term"), score.as("s"))
    // fixed-order pivot + left-to-right sum: a groupBy sum over doubles
    // is order-nondeterministic; max-of-one-per-term then coalesced
    // addition in queryTerms order is bit-stable on every engine
    val termCols = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === lit(t), col("s"))).as(s"s_$i")
    }
    val pivot = perTerm.groupBy(col("doc_id"), col("dl"))
      .agg(termCols.head, termCols.tail: _*)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    pivot.select(col("doc_id"), col("dl"), total.as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("long"))
  }

  /** Corpus-bigram familiarity — an n-gram-LM-style quality score without
    * the cross-library `ln`: for every document, the exact integer sum of
    * the CORPUS frequencies of its bigram occurrences, the count of novel
    * bigrams (corpus frequency 1 ⇒ this document is their only witness),
    * and the mean corpus frequency (one double division of exact longs).
    * Low `avg_familiarity` / high `n_novel` flags gibberish and OCR noise
    * exactly where a smoothed bigram LM would assign high perplexity;
    * integer sums make the score engine-exact (a per-token smoothed
    * probability would sum doubles in shuffle order).
    *
    * Scale: bigram explode → one hash agg for corpus counts → hash join
    * back on the bigram key (AQE broadcasts it when the distinct-bigram
    * frame is small) → per-doc hash agg. No windows, no sorts. */
  def bigramFamiliarity(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ",
            element_at(col("toks"), i), element_at(col("toks"), i + 1))))
          .as("bigram"))
    val corpus = bg.groupBy(col("bigram")).agg(count(lit(1)).as("bg_n"))
    bg.join(corpus, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("bg_n")).as("familiarity_sum"),
        sum(when(col("bg_n") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("avg_familiarity",
        col("familiarity_sum").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Tokenizer-vocabulary coverage planning: take the top-`vocabK` terms
    * by corpus frequency (ties to the lexicographically smaller term) as
    * the vocabulary, then report each source's token volume, OOV token
    * count, and OOV rate — the table that decides whether a vocab size
    * covers every corpus slice or silently shreds one source into
    * unknown-token soup.
    *
    * Scale: the vocab is TakeOrderedAndProject(vocabK) over the term
    * counts (never a global sort) and joins back as a broadcast; the rest
    * is one partial+final hash aggregate over the token stream. */
  def vocabCoverage(docs: DataFrame, vocabK: Int): DataFrame = {
    val tok = docs.select(col("source"), explode(tokens(col("text"))).as("term"))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(vocabK)
      .select(col("term"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Gini–Simpson diversity of sources within each language — the corpus
    * balance check (a language whose documents come from one source is a
    * single-point-of-failure slice): `1 - Σ nᵢ² / N²` with the squared
    * counts summed as exact integers, so the only double op is the final
    * division (engine-exact). Two tiny hash aggregates. */
  def sourceSimpson(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("n") * col("n")).as("sumsq"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        (lit(1.0) - col("sumsq").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("simpson"))
}
