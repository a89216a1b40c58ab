package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftFunctions
import graft.ops.TextOps._

/** Text-analysis operators for training-data curation (SURVEY §7.6):
  * language ID (stopword/CJK heuristic), quality scoring, token counting,
  * document fingerprinting. All pure column expressions over `documents` —
  * per-row, embarrassingly parallel, no shuffles except the fingerprint's
  * shingle aggregate.
  */
object TextAnalysis {

  /** Heuristic language ID: stopword hits per language + CJK character
    * count; highest score wins with a fixed priority order (en, de, es,
    * fr, zh) on ties.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("t")
    val sEn = stopHits(t, StopEn)
    val sDe = stopHits(t, StopDe)
    val sEs = stopHits(t, StopEs)
    val sFr = stopHits(t, StopFr)
    val sZh = size(expr("regexp_extract_all(text, '[\\\\x{4e00}-\\\\x{9fff}]', 0)"))
    val predicted =
      when(sEn >= greatest(sDe, sEs, sFr, sZh), "en")
        .when(sDe >= greatest(sEs, sFr, sZh), "de")
        .when(sEs >= greatest(sFr, sZh), "es")
        .when(sFr >= sZh, "fr")
        .otherwise("zh")
    withTokens(docs).select(col("doc_id"), predicted.as("predicted"), col("lang"))
      .withColumn("is_match", col("predicted") === col("lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length, token stats, stopword/alpha/punctuation
    * ratios, and a blended score — the standard cheap pre-filter before
    * expensive curation stages.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("t")
    withTokens(docs)
      .withColumn("n_chars_", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("sum_tok_len",
        aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("long"))
      .withColumn("stop_hits", stopHits(t, StopEn).cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .select(
        col("doc_id"), col("n_chars_").as("n_chars"), col("n_tokens"),
        round(col("sum_tok_len").cast("double") / col("n_tokens"), 6)
          .as("avg_token_len"),
        round(col("stop_hits").cast("double") / col("n_tokens"), 6)
          .as("stopword_ratio"),
        round(col("n_alpha").cast("double") / col("n_chars_"), 6)
          .as("alpha_ratio"),
        round(
          col("stop_hits").cast("double") / col("n_tokens") * 0.5 +
            col("n_alpha").cast("double") / col("n_chars_") * 0.5, 6)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish subword count (letter
    * runs, single digits, single punctuation marks).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(expr(
        "regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\\\s]', 0)"))
        .cast("long").as("n_subword_tokens"))
      .orderBy("doc_id")

  /** Corpus n-gram statistics: global top-k word bigrams by frequency
    * (with multiplicity — explode + count + TakeOrdered, the canonical
    * "what's in this corpus" profile).
    */
  def ngramStats(docs: DataFrame, k: Int = 20): DataFrame = {
    val t = col("t")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    withTokens(docs)
      .select(explode(bigrams).as("sh"))
      .groupBy("sh")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("sh"))
      .limit(k)
  }

  /** Benchmark decontamination: which corpus documents leak into a
    * (deterministically sampled) eval set? The standard n-gram overlap
    * check — an eval doc is contaminated when a DIFFERENT corpus doc
    * shares at least half of its distinct 8-token shingles. 8-gram
    * windows make the inverted-index join sparse (random 8-token
    * collisions are vanishingly rare; only genuine copies overlap), so
    * candidate pairs track contamination density, not |eval|×|corpus| —
    * the same candidate-generation-first discipline as the dedup family.
    * The eval set is a salted-hash sample (run-stable, growth-stable);
    * in production it would be the actual benchmark table.
    *
    * Returns one row per (eval doc, best-matching other doc): shared
    * count, the eval doc's shingle count, and the contamination verdict.
    */
  /** Distinct 8-token shingles of the tokenized text column `t` —
    * the span unit shared by [[decontaminate]] and [[dupSpans]].
    */
  private def octograms: Column = {
    val t = col("t")
    array_distinct(
      when(size(t) >= 8,
        transform(sequence(lit(0), size(t) - 8),
          i => concat_ws(" ", slice(t, i + 1, lit(8)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Cross-document duplicated-span profile: for every document, how many
    * of its distinct 8-token shingles also occur in at least one OTHER
    * document (the RefinedWeb/C4-style "duplicated span" signal used to
    * gate boilerplate-heavy pages). Two shuffles, both keyed small:
    * shingle-DF by shingle hash (map-side combinable), then the per-doc
    * rollup by doc_id. The ratio is fixed-point parts-per-million integer
    * math so the result is bit-stable across engines.
    *
    * Docs with < 8 tokens have no spans and are absent — at scale they're
    * gated earlier by the length filters (`curation_funnel`).
    */
  def dupSpans(docs: DataFrame): DataFrame = {
    // the decontaminate discipline, applied here too: the tokenize +
    // 8-gram explode feeds TWO consumers (DF aggregate + join back), so
    // materialize it once; and the span is only ever compared for
    // EQUALITY, so 8-byte xxhash64 keys replace ~50-byte strings through
    // the checkpoint and both shuffles (collision odds 2⁻⁶⁴-class, the
    // accepted MinHash-band trade)
    val sh = withTokens(docs)
      .select(col("doc_id"), explode(octograms).as("shs"))
      .select(col("doc_id"), xxhash64(col("shs")).as("sh"))
      .localCheckpoint(false)
    // per-doc distinct shingles => count(1) per shingle IS document freq
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_ppm", expr("(n_dup_spans * 1000000) div n_spans"))
      .orderBy("doc_id")
  }

  def decontaminate(docs: DataFrame, evalBp: Int = 2000,
      minShare: Double = 0.5, maxShingleDf: Int = 64): DataFrame = {
    // The tokenize→8-gram-explode subtree is the expensive part and feeds
    // THREE consumers (hot-DF aggregate, eval side, corpus side of the
    // candidate join); without materialization the lineage re-runs the
    // explode per consumer (the round-4 2.2× regression). localCheckpoint
    // evaluates it once — same discipline as Dedup.cluster's pairs frame.
    // Shingles are narrowed to their xxhash64 BEFORE the checkpoint: the
    // contamination decision only ever compares shingles for equality, so
    // 8-byte longs replace ~50-byte strings through the checkpoint, the
    // DF aggregate, and both sides of the candidate join (the dominant
    // shuffle). A 64-bit collision merging two distinct shingles needs
    // ~2^32 distinct shingles per doc-pair comparison to matter
    // (birthday bound ~1e-7 at 1M shingles) — the same accepted risk as
    // the MinHash band hashes.
    val shAll = withTokens(docs)
      .select(col("doc_id"), explode(octograms).as("shs"))
      .select(col("doc_id"), xxhash64(col("shs")).as("sh"))
      .localCheckpoint()
    // Stop-shingle cap: a genuine-content 8-gram's document frequency is
    // tiny (random 8-token collisions ≈ 0; testdata max DF = 3), but one
    // boilerplate shingle shared by d documents puts d·|eval∩d| candidate
    // pairs in ITS bucket — quadratic in the hot key at 100 TB. Shingles
    // with DF > maxShingleDf carry no contamination signal (they're
    // template text by construction), so drop them from the index on both
    // sides. The hot set is small by its own definition, so this is a
    // broadcast ANTI join — the big shingle table is not re-shuffled.
    // (shAll is per-doc distinct, so count == distinct doc count.)
    val hot = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf)
      .select("sh")
    // (Pinning the anti-joined frame too, or instead, measured no better:
    // 1.87 s / 2.30 s / 2.61 s for shAll-only / both / sh-only on
    // comparable hosts — the explode is the subtree worth paying for.)
    val sh = shAll.join(broadcast(hot), Seq("sh"), "left_anti")
    val ev = sh.filter(
      Sampling.hashBucket(col("doc_id"), "eval") < evalBp)
    val evSizes = ev.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val shared = ev.as("e")
      .join(sh.as("c"), col("e.sh") === col("c.sh") &&
        col("e.doc_id") =!= col("c.doc_id"))
      .groupBy(col("e.doc_id").as("doc_id"),
        col("c.doc_id").as("match_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("n_shared").desc, col("match_doc_id"))
    shared.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(evSizes, "doc_id")
      .select(col("doc_id"), col("match_doc_id"), col("n_shared"),
        col("n_shingles"),
        (col("n_shared") >= col("n_shingles") * minShare)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  /** Bigram-LM document scoring — the statistical stand-in for model-based
    * quality filtering: documents whose word transitions are rare under
    * the corpus's own bigram model (gibberish, boilerplate splices, OCR
    * noise) score low; fluent text scores high.
    *
    * Two corpus passes train the "model" (unigram counts, bigram counts —
    * both plain partial-agg groupBys), then each document's bigrams join
    * their counts and average the conditional probability
    * P(w2|w1) = c(w1,w2)/c(w1). The probability is held in FIXED POINT
    * (ppm, integer `div`) until the final per-doc average, so the score is
    * bit-stable across engines, partitionings, and aggregation orders —
    * the same determinism discipline as the integer PageRank.
    *
    * Scale: token→bigram explode is map-side; the count tables shuffle
    * (bigram, n) pairs; the scoring join shuffles on bigram. Nothing is
    * ever collected; the model tables are data, not driver state.
    */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val t = col("t")
    val bigramArr = when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("w1"),
          element_at(t, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val docBigrams = withTokens(docs)
      .select(col("doc_id"), explode(bigramArr).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = docBigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = docBigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    docBigrams
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .withColumn("p_ppm", expr("(c12 * 1000000) div c1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("p_ppm")).cast("double") / count(lit(1)))
          .as("avg_p_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("avg_p_ppm"), 6).as("avg_p_ppm"))
      .orderBy("doc_id")
  }

  /** Within-document repetition signals (the Gopher/MassiveText
    * repetition filters): per doc, the fraction of word bigrams/trigrams
    * that are duplicates of an earlier identical gram — integer ppm via
    * (n − distinct) · 1e6 div n. High duplicate-gram fractions mark
    * boilerplate/looping text. Everything is per-row array math
    * (transform + array_distinct) — zero shuffle at any corpus size; a
    * 100 TB corpus scores map-side.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val t = col("t")
    def grams(n: Int): Column =
      when(org.apache.spark.sql.functions.size(t) >= n,
        transform(sequence(lit(0), org.apache.spark.sql.functions.size(t) - n),
          i => concat_ws(" ", (0 until n).map(j =>
            element_at(t, (i + j + 1).cast("int"))): _*)))
        .otherwise(array().cast("array<string>"))
    withTokens(docs)
      .select(col("doc_id"), grams(2).as("g2"), grams(3).as("g3"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("g2")).cast("long").as("n2"),
        org.apache.spark.sql.functions.size(array_distinct(col("g2")))
          .cast("long").as("d2"),
        org.apache.spark.sql.functions.size(col("g3")).cast("long").as("n3"),
        org.apache.spark.sql.functions.size(array_distinct(col("g3")))
          .cast("long").as("d3"))
      .select(col("doc_id"), col("n2"), col("n3"),
        expr("CASE WHEN n2 > 0 THEN (n2 - d2) * 1000000 div n2 ELSE 0 END")
          .as("rep2_ppm"),
        expr("CASE WHEN n3 > 0 THEN (n3 - d3) * 1000000 div n3 ELSE 0 END")
          .as("rep3_ppm"))
      .orderBy("doc_id")
  }

  /** Scrubbing/masking: replace curation-flagged tokens (here: the EN
    * stopword list, standing in for a PII lexicon) with a mask token —
    * token-level transform, no regex, embarrassingly parallel.
    */
  def scrub(docs: DataFrame): DataFrame = {
    val t = col("t")
    withTokens(docs)
      .select(
        col("doc_id"),
        substring(concat_ws(" ",
          transform(t, x =>
            when(x.isin(StopEn: _*), lit("<sw>")).otherwise(x))), 1, 120)
          .as("scrubbed_head"),
        stopHits(t, StopEn).cast("long").as("n_masked"))
      .orderBy("doc_id")
  }

  /** Fixed-size token chunking with overlap (size 32, stride 24 ⇒ 8-token
    * overlap): the packing step before tokenizer/embedding stages. Chunk
    * starts are a `sequence(1, len, stride)` — pure per-row expansion, no
    * shuffle; a 100 TB corpus chunks map-side. Output is one row per chunk
    * with its index, text, and token count.
    */
  def chunk(docs: DataFrame, size: Int = 32, stride: Int = 24): DataFrame = {
    val t = col("t")
    val starts = sequence(lit(1), greatest(org.apache.spark.sql.functions.size(t), lit(1)), lit(stride))
    withTokens(docs)
      .select(col("doc_id"),
        posexplode(transform(starts, s => slice(t, s, lit(size))))
          .as(Seq("chunk_idx", "chunk_toks")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        org.apache.spark.sql.functions.size(col("chunk_toks")).cast("long")
          .as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Document fingerprinting: whole-text 128-bit-MD5-mod-1e9 content hash +
    * a rolling-window fingerprint (min over 8-char-gram hashes — the
    * minhash-of-shingles form of a rolling content signature).
    */
  /** BM25 top-k retrieval over the corpus for a self-derived query: the
    * `nTerms` highest-df tokens (ties broken by token text) act as the
    * query terms, every document is scored with the standard BM25 weight
    *   idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    *   idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
    * and the top `topK` documents surface ordered by (rounded score desc,
    * doc_id). Reference analog: none — the postings/tfidf family
    * (text_postings / text_tfidf) builds the index; this is the *search*
    * side of that index.
    *
    * Determinism: the per-document score is a FIXED-ORDER sum — each query
    * term gets a rank (df desc, token asc) and the score adds the ranked
    * weights w1 + w2 + ... explicitly, so engine and oracle fold the same
    * doubles in the same order (a plain SUM over (doc, term) rows would be
    * combiner-order-dependent at the last ulp).
    *
    * Scale: tokens shuffle once to build df (map-side combined); the query
    * frame is `nTerms` rows — broadcast; tf is a broadcast semi-join of the
    * token stream against those terms, so the only data-sized exchange is
    * the (matched-doc × term) aggregate, ∝ hits not corpus; doc lengths
    * reuse the token scan; avgdl rides a 1-row broadcast; the final top-k
    * is TakeOrderedAndProject (no global sort shuffle).
    */
  def bm25TopK(docs: DataFrame, nTerms: Int = 3, topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = withTokens(docs).select(col("doc_id"), explode(col("t")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      avg(col("dl").cast("double")).as("avgdl"))
    val dfr = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val qterms = dfr.orderBy(col("df").desc, col("tok").asc).limit(nTerms)
      .withColumn("qr", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("tok").asc)))
    val tf = toks.join(broadcast(qterms), "tok")
      .groupBy("doc_id", "qr")
      .agg(count(lit(1)).as("tf"), first(col("df")).as("df"))
    val scored = tf
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("w", col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    val ranked = (1 to nTerms).map(r =>
      max(when(col("qr") === r, col("w"))).as(s"w$r"))
    val score = (1 to nTerms)
      .map(r => coalesce(col(s"w$r"), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy("doc_id")
      .agg(ranked.head, (ranked.tail :+ count(lit(1)).as("n_match")): _*)
      .withColumn("score", round(score, 6))
      .select(col("doc_id"), col("score"), col("n_match"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  def fingerprints(docs: DataFrame): DataFrame = {
    val normed = docs.repartition(col("doc_id")).select(col("doc_id"),
      lower(trim(col("text"))).as("txt"))
    val grams = normed.select(col("doc_id"), col("txt"),
      explode(expr(
        "CASE WHEN length(txt) >= 8 THEN sequence(1, length(txt) - 7) ELSE array(1) END"))
        .as("i"))
      .select(col("doc_id"), expr("substring(txt, i, 8)").as("gram"))
    val rolled = grams.groupBy("doc_id")
      .agg(min(GraftFunctions.hash64(col("gram"))).as("fp_rolling"))
    normed
      .select(col("doc_id"),
        GraftFunctions.hashKey(Seq(col("txt"))).as("fp_md5"))
      .join(rolled, "doc_id")
      .orderBy("doc_id")
  }

  /** Tokenizer-fertility census per language: how many whitespace tokens,
    * characters per token, and tokens per document each language costs —
    * the numbers that size a tokenizer's vocabulary and a mixture's
    * per-language token budget (multilingual corpora differ 2-5× in
    * chars/token, so a char-budgeted mix is NOT a token-budgeted mix).
    * One map-side-combinable aggregate over per-row counts; integral ppm
    * ratios (the fixed-point discipline). Output is domain-bounded
    * (one row per language).
    */
  def fertility(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("lang"),
        greatest(expr("CAST(size(t) AS BIGINT)"), lit(1L)).as("n_toks"),
        expr("CAST(aggregate(t, 0L, (a, x) -> a + length(x)) AS BIGINT)")
          .as("tok_chars"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("tok_chars")).as("n_token_chars"),
        sum(col("n_chars")).as("n_text_chars"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("n_token_chars * 1000000L div n_tokens")
          .as("chars_per_token_ppm"),
        expr("n_tokens * 1000000L div n_docs").as("tokens_per_doc_ppm"),
        expr("n_text_chars * 1000000L div n_tokens")
          .as("text_chars_per_token_ppm"))
      .orderBy("lang")
}
