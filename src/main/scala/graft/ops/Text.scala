package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenizing,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (whole-stage-codegen'd, no UDFs) — they run inside the
  * scan projection, so at 100 TB they cost one pass with no shuffle.
  *
  * Everything is engineered to be exactly reproducible in ANSI SQL
  * (integer counts, md5, regex) so the DuckDB oracle can replay it.
  */
object Text {

  /** Whitespace tokens of lowercased text: leading/trailing whitespace
    * stripped, then split on runs of any whitespace — real text has
    * tabs/newlines/multi-space runs, and a single-space split would
    * produce phantom empty tokens for every one of them. Oracle rule:
    * regexp_split_to_array(regexp_replace(lower(text),
    * '^whitespace+|whitespace+$', '', 'g'), 'whitespace+').
    * (See `bpeTokens` for the regex-based pre-tokenizer.)
    */
  def tokens(text: Column): Column =
    split(regexp_replace(lower(text), "^\\s+|\\s+$", ""), "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single
    * punctuation — the classic GPT-2 pre-split shape, minus unicode
    * categories (RE2/Java-portable).
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Word n-gram shingles over whitespace tokens, distinct. Short texts
    * (< n tokens) yield one shingle holding all tokens. One-pass custom
    * expression (graft.functions.TextExpressions) — the equivalent
    * transform/slice/array_join chain pays an interpreted lambda frame
    * per shingle.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextExpressions.wordShingles(tokens(text), n)

  /** Winnowing document fingerprint (rolling-window scheme of
    * Schleimer/Wilkerson/Aiken): hash every character k-gram, take the
    * minimum in each sliding window of `w` positions, dedup and
    * canonically sort. Guarantees any shared substring of length
    * ≥ w+k−1 contributes a shared fingerprint — the classic local
    * dedup/plagiarism sketch.
    *
    * Hashes are md5 hex strings: fixed-length hex compares
    * lexicographically exactly like the number it encodes, so the
    * whole computation is reproducible in ANSI SQL for the oracle.
    * Narrow projection — no shuffle. Single-pass custom expression
    * (graft.functions.TextExpressions.WinnowFingerprint): the HOF
    * formulation re-evaluated the gram-hash array per window element
    * (O(L²) md5s per doc — caught by the sf1 gate).
    */
  def winnowFingerprint(text: Column, k: Int = 16, w: Int = 8): Column =
    graft.functions.TextExpressions.winnowFingerprint(text, k, w)

  /** Canonical text normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Content fingerprint of the normalized text — exact-dup detection
    * robust to case/punctuation/whitespace noise. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  val Stopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "a", "is", "that", "for", "it",
    "on", "was", "with", "as", "at", "be", "this", "are", "or", "an")

  /** Distinct stopwords present (array_intersect = distinct semantics,
    * mirrors SQL list_intersect). */
  def stopwordCount(text: Column): Column =
    size(array_intersect(tokens(text), array(Stopwords.map(lit): _*))).cast("long")

  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Heuristic quality gate — all-integer arithmetic so the oracle
    * reproduces it bit-for-bit: long enough, token-dense, has stopword
    * signal, not punctuation-soup (10× punct < chars).
    */
  def isQuality(text: Column): Column =
    (length(text) >= 100) && (tokenCount(text) >= 15) &&
      (stopwordCount(text) >= 1) && (punctCount(text) * 10 < length(text))

  // ------------------------------------------------------------------
  // Learned quality classifier — the fastText/CCNet shape: hashed
  // unigram+bigram features, a linear integer score, trained by ONE
  // distributed counting pass. Everything is md5/floor-log2 integer
  // arithmetic so the DuckDB oracle replays training AND scoring
  // bit-for-bit (no float anywhere).
  // ------------------------------------------------------------------

  /** Feature buckets of a document: every unigram and adjacent bigram
    * of `tokens(text)`, hashed by the shared md5u32 rule (first 8 md5
    * hex chars as an integer) mod `buckets`. Used by the training
    * pass; scoring runs the same rule inside one loop
    * ([[graft.functions.TextExpressions.HashedNgramScore]]).
    */
  def hashedNgramFeatures(text: Column, buckets: Int): Column = {
    require(buckets > 0, "need at least one bucket")
    def b(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets
    val toks = tokens(text)
    val nbi = greatest(size(toks) - 1, lit(0))
    val uni = transform(toks, t => b(t))
    val bi = zip_with(slice(toks, lit(1), nbi), slice(toks, lit(2), nbi),
      (x, y) => b(concat_ws(" ", x, y)))
    concat(uni, bi)
  }

  /** One-pass distributed training: per-bucket occurrence counts by
    * class, weight = floor-log2(pos+1) − floor-log2(neg+1) — the
    * integer log-odds of a multinomial naive-Bayes / linear filter.
    * One explode + one map-side-combined groupBy over the training
    * docs; the result is bounded by `buckets` (the only collect),
    * never by the corpus. `labelCol` must be 1 (quality) / 0 (junk).
    */
  def trainQualityWeights(train: DataFrame, textCol: String,
                          labelCol: String, buckets: Int = 1024): Array[Long] = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val rows = fanOut(train)
      .select(col(labelCol).cast("long").as("y"),
        explode(hashedNgramFeatures(col(textCol), buckets)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("nn"))
      .select(col("b"), (flog2(col("np") + 1) - flog2(col("nn") + 1)).as("w"))
      .collect()
    val w = new Array[Long](buckets)
    rows.foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    w
  }

  /** Score every document with trained weights: one zero-shuffle scan
    * projection (score = integer sum of bucket weights over all
    * unigram+bigram features), `pred` = score > 0. Weights ride into
    * the expression as a literal array — nothing joins, nothing
    * broadcasts, the filter costs one pass at any corpus size.
    */
  def scoreQuality(docs: DataFrame, idCol: String, textCol: String,
                   weights: Array[Long]): DataFrame =
    fanOut(docs).withColumn("score",
        graft.functions.TextExpressions.hashedNgramScore(
          tokens(col(textCol)), weights))
      .withColumn("pred", (col("score") > 0).cast("long"))

  // ------------------------------------------------------------------
  // Trained language ID (hashed char-ngram one-vs-rest naive Bayes —
  // the fastText-style LID shape; the marker heuristic below stays
  // the zero-shot fallback)
  // ------------------------------------------------------------------

  /** Character 2-/3-gram feature buckets of a document, hashed by the
    * shared md5u32 rule mod `buckets` (oracle-reproducible). The
    * TRAINING side; scoring runs the same windows in one flat loop
    * ([[graft.functions.TextExpressions.HashedCharNgramScores]]). */
  def hashedCharNgramFeatures(text: Column, buckets: Int): Column =
    // one MessageDigest walk per row (round 15) — the HOF formulation
    // (transform(sequence(1, n-1), i => conv(substring(md5(substr)))))
    // evaluated an interpreted expression tree per ngram and was the
    // training pass's whole cost; bucket values and emission order are
    // bit-identical (OpsSpec "hashedCharNgramFeatures expression ≡ the
    // HOF formulation" pins equivalence, incl. astral-plane input)
    graft.functions.TextExpressions.hashedCharNgramBuckets(
      lower(text), buckets)

  private def flog2l(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x) // = len(bin(x)) - 1, x ≥ 1

  /** One-pass multiclass LID training: per-bucket char-ngram counts
    * by language, one-vs-rest integer log-odds weights
    * `w_c(b) = flog2(n_cb + 1) − flog2(total_b − n_cb + 1)` (the
    * [[trainQualityWeights]] rule, per class). One explode + one
    * map-side-combined groupBy over the training docs; the collect is
    * bounded by `buckets × langs.size`, never the corpus. Rows whose
    * `langCol` is outside `langs` are ignored. */
  def trainLangWeights(train: DataFrame, textCol: String, langCol: String,
                       langs: Seq[String],
                       buckets: Int = 512): Array[Array[Long]] = {
    require(langs.nonEmpty && langs.distinct == langs, "distinct langs")
    val cls = langs.zipWithIndex.toMap
    val rows = fanOut(train)
      .select(col(langCol).as("c"),
        explode(hashedCharNgramFeatures(col(textCol), buckets)).as("b"))
      .groupBy("b", "c").agg(count(lit(1)).as("n"))
      .collect()
    val w = Array.fill(langs.size)(new Array[Long](buckets))
    rows.groupBy(_.getLong(0)).foreach { case (b, rs) =>
      val known = rs.filter(r => cls.contains(r.getString(1)))
      val tot = known.map(_.getLong(2)).sum
      if (tot > 0) for ((c, ci) <- cls) {
        val n = known.find(_.getString(1) == c).map(_.getLong(2)).getOrElse(0L)
        w(ci)(b.toInt) = flog2l(n + 1) - flog2l(tot - n + 1)
      }
      // buckets never seen in training keep weight 0 for every class
    }
    w
  }

  /** Classify with trained weights: one zero-shuffle scan projection
    * (per-class integer sums in a single char loop), `pred_lang` =
    * the FIRST maximal class in `langs` order (deterministic,
    * SQL-replicable ties); Han script overrides to "zh" like
    * [[langId]]. Weights ride in as literals — nothing joins. */
  def langIdTrained(docs: DataFrame, textCol: String,
                    weights: Array[Array[Long]],
                    langs: Seq[String]): DataFrame = {
    require(weights.length == langs.length, "one weight array per lang")
    val scored = fanOut(docs).withColumn("__lid_s",
      graft.functions.TextExpressions.hashedCharNgramScores(
        lower(col(textCol)), weights))
    val s = col("__lid_s")
    val pred = langs.indices.init.foldRight(lit(langs.last)) { (i, rest) =>
      when(langs.indices.drop(i + 1).map(j => s(i) >= s(j))
        .reduce(_ && _), langs(i)).otherwise(rest)
    }
    scored.withColumn("pred_lang",
        when(col(textCol).rlike("\\p{IsHan}"), "zh").otherwise(pred))
      .drop("__lid_s")
  }

  // language-ID marker words, distinct-count scored; priority-ordered
  // CASE keeps ties deterministic and SQL-replicable
  private val MarkersEn = Seq("the", "and", "of", "to", "in", "is", "was", "with")
  private val MarkersDe = Seq("und", "der", "die", "das", "ist", "nicht", "ein", "mit")
  private val MarkersFr = Seq("le", "la", "les", "et", "est", "une", "dans", "pour")
  private val MarkersEs = Seq("el", "los", "las", "es", "una", "que", "por", "con")

  private def markerHits(text: Column, markers: Seq[String]): Column =
    size(array_intersect(tokens(text), array(markers.map(lit): _*)))

  /** N-gram/marker heuristic language ID over {en,de,fr,es,zh}:
    * Han script → zh, else the marker-richest language with fixed
    * priority en > de > fr > es on ties.
    */
  def langId(text: Column): Column = {
    val en = markerHits(text, MarkersEn)
    val de = markerHits(text, MarkersDe)
    val fr = markerHits(text, MarkersFr)
    val es = markerHits(text, MarkersEs)
    when(text.rlike("\\p{IsHan}"), "zh")
      .when(en >= greatest(de, fr, es), "en")
      .when(de >= greatest(fr, es), "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Fan a document frame out to the session's full parallelism before
    * a token explode. Parquet packs natural-language text so densely
    * (5-30× compression on real corpora) that Spark's bytes-based
    * split heuristic (`spark.sql.files.maxPartitionBytes`) hands a few
    * tasks the WHOLE corpus's exploded work — the expansion factor of
    * tokenize+explode is 100-5000× the input bytes, which the
    * byte-sized splits cannot see. Measured at sf1: the 6.7 MB
    * documents file became ONE task exploding 35M tokens and
    * docFrequency ran 37× (not ~10×) over sf0.1. A round-robin
    * repartition of the RAW TEXT (compressed-sized, cheap to shuffle)
    * before the explode buys full parallelism for the expansion
    * stage; it is skipped when the scan already has enough partitions
    * — on a real cluster with block-sized files this is a no-op.
    */
  def fanOut(df: DataFrame): DataFrame = {
    // streaming frames can't expose rdd partitioning (and micro-batch
    // sizing is the source's job) — skip, matching the documented
    // already-parallel-enough no-op, so token ops stay stream-composable
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Corpus document frequency: how many documents contain each
    * distinct token. One explode of per-document distinct tokens +
    * one map-side-combined groupBy — the standard vocabulary/DF-table
    * shape at any corpus size.
    */
  def docFrequency(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(docs).select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))

  /** Context-window chunking: split each document into token windows of
    * `size` tokens every `stride` tokens (stride < size ⇒ overlapping
    * windows, the RAG-index choice; stride = size ⇒ disjoint packing,
    * the pretraining choice). The final partial window is kept —
    * dropping tail tokens silently is the classic chunking bug.
    *
    * Narrow explode over codegen'd array expressions — no UDF;
    * output scales as ~n_tokens/stride rows per doc. The input is
    * [[fanOut]]-repartitioned first (dense text parquet otherwise
    * hands one task the whole corpus's window explode — see fanOut);
    * on block-sized cluster files that is a no-op and the stage stays
    * shuffle-free. Integer window arithmetic replays exactly in SQL.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0, "window size must be positive")
    require(stride > 0 && stride <= size,
      "stride must be in [1, size] — a stride past size drops tokens")
    val toks = tokens(col(textCol))
    fanOut(docs)
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("__t")) - 1, lit(0)),
          lit(stride))).as("__start"))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("__t"), col("__start") + 1, lit(size)), " ")
          .as("chunk"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("__t")) - col("__start"))
          .cast("long").as("n_tok"))
  }

  /** Inverted index build: token → sorted posting list of the documents
    * containing it, plus document frequency — the retrieval-index
    * construction step of a search/RAG pipeline.
    *
    * Skew is bounded up front: tokens with df > `maxDf` (stopwords —
    * a SMALL set by construction, though each covers a huge share of
    * rows) are dropped via a broadcast anti-join BEFORE postings are
    * collected, so no reducer ever materializes a corpus-length list.
    * The remaining shape is one shuffle by token with a bounded
    * per-group list. Postings sort numerically inside each group —
    * deterministic output, no global sort.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Long): DataFrame = {
    val pairs = fanOut(docs).select(col(idCol).as("doc"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val block = pairs.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("token")
    pairs.join(broadcast(block), Seq("token"), "left_anti")
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc"))).as("postings"))
  }

  /** Ranked keyword search: top-k documents for a bag-of-words query,
    * scored by integer tf-idf — Σ over query tokens of
    * tf(doc, token) · (N DIV df(token)). The integer idf keeps scores
    * (and therefore ranks and the top-k SET) bit-reproducible across
    * engines; a float log-idf would tie-break on rounding. Ties break
    * on doc id.
    *
    * Scale shape: the corpus explode filters to the query's tokens
    * BEFORE any shuffle (a query is a handful of tokens, so the
    * surviving rows are a sliver of the corpus), then two map-side-
    * combined groupBys, a broadcast join of the tiny per-token df
    * table, and a TakeOrdered top-k (per-partition top-k + single
    * merge — never a global sort).
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 query: String, k: Int): DataFrame = {
    val qTokens = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(qTokens.nonEmpty, "query must contain at least one token")
    val n = docs.count()
    val hits = fanOut(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(col("token").isin(qTokens: _*))
    val tf = hits.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfq = hits.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "token")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * expr(s"$n DIV df")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BM25 ranked retrieval (k1 = 1.2, b = 0.75) in EXACT integer
    * arithmetic — [[searchTopK]]'s tf-idf plus the ingredient it
    * lacks: document-length normalization, the term that stops long
    * documents from winning on raw term count alone.
    *
    * The float formula idf·tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) is
    * replayed exactly in integers: with k1 = 6/5, b = 3/4 and
    * avgdl carried as A = (T·1000) DIV N milli-tokens (T = corpus
    * tokens, N = docs), each term's contribution is
    *   (N DIV df) · ((44·tf·A·1000000) DIV (20·tf·A + 6·A + 18·dl·1000))
    * — the saturating-in-tf, length-penalized BM25 shape with integer
    * idf (same documented divergence from ln-idf as [[searchTopK]]),
    * bit-reproducible across engines. The overflow bound is
    * corpus-size-INDEPENDENT on the ratio term (A is an average doc
    * length, not a corpus total); the idf factor bounds the sum at
    * ~|query|·N·2.2e6, safe in int64 beyond trillion-doc corpora.
    *
    * Scale shape: identical to [[searchTopK]] — filter to query tokens
    * before any shuffle, two map-side-combined groupBys, broadcast df
    * join, TakeOrdered top-k. The corpus stats (N, T) are one bounded
    * single-row aggregate.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int): DataFrame = {
    val qTokens = query.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    require(qTokens.nonEmpty, "query must contain at least one token")
    val base = fanOut(docs).select(col(idCol),
      org.apache.spark.sql.functions.size(tokens(col(textCol)))
        .cast("long").as("dl"),
      tokens(col(textCol)).as("__t"))
    val st = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("t")).head()
    val n = st.getLong(0)
    val t = st.getLong(1)
    val a = t * 1000L / n // avgdl in milli-tokens, integer division
    val hits = base
      .select(col(idCol), col("dl"), explode(col("__t")).as("token"))
      .where(col("token").isin(qTokens: _*))
    val tf = hits.groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfq = hits.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "token")
      .withColumn("contrib", expr(
        s"($n DIV df) * ((44 * tf * $a * 1000000) DIV " +
          s"(20 * tf * $a + 6 * $a + 18 * dl * 1000))"))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Top-k characteristic tokens per document, ranked by term
    * frequency (desc), then corpus rarity (document frequency asc),
    * then token — the tf-idf ordering expressed in pure integers, so
    * ranks are deterministic and exactly SQL-reproducible (a float
    * tf·idf score would tie-break on log rounding).
    *
    * Scale shape: explode + two combined groupBys, a join against the
    * (small) DF table — Catalyst broadcasts it — and one window by
    * document.
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    val tf = fanOut(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("token"))
    tf.join(docFrequency(docs, idCol, textCol), "token")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("token"), col("rank"))
  }

  // PII patterns: character-class-only regexes behave identically under
  // Java regex (Spark) and RE2 (DuckDB), so redaction is oracle-exact.
  val EmailPattern = "[a-z0-9._]+@[a-z0-9.]+"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction: mask email-like and phone-like substrings, count
    * what was masked. Pure codegen'd column expressions — one pass in
    * the scan projection, no shuffle, the shape a 100 TB scrubbing
    * stage needs. Emails redact before phones so an address containing
    * digits can't be double-masked.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_replace(regexp_replace(t, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("clean"),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhonePattern)).cast("long").as("n_phones"))
  }

  /** Benchmark decontamination: documents sharing ANY word n-gram with
    * a benchmark corpus. The benchmark side is small by construction
    * (eval sets are thousands of docs, not billions) → its distinct
    * shingle set broadcasts; the corpus side stays unshuffled — one
    * explode + broadcast semi-join + distinct on ids, never a corpus
    * shuffle. The standard eval-overlap filter for training data.
    */
  /** URL regex (RE2-portable): scheme + host, with the host captured
    * as group 1 for domain extraction. Path characters beyond the host
    * are intentionally not consumed — domain policy is what C4-style
    * filtering acts on. */
  val UrlPattern = "https?://([a-z0-9.-]+)"

  /** Per-document URL profile: every URL host mentioned + the count —
    * one codegen'd projection inside the scan (no shuffle, no UDF).
    * Matching runs over the lowercased text so `HTTPS://HOST` and
    * mixed-case hosts are seen (URL schemes and hosts are
    * case-insensitive per RFC 3986); extracted domains come out
    * lowercased. */
  def urlProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    docs.select(col(idCol),
      regexp_extract_all(t, lit(UrlPattern), lit(1)).as("domains"),
      regexp_count(t, lit(UrlPattern)).cast("long").as("n_urls"))
  }

  /** C4-style domain-blocklist filter: drop every document that
    * mentions a URL whose host is on the blocklist. The blocklist
    * travels as a LITERAL array in the plan (the C4 badlist is a
    * static file of bounded size), so the whole op is one codegen'd
    * scan projection + filter — the corpus is never shuffled, joined,
    * or exploded (PlanSpec-pinned). Survivors keep their columns plus
    * the n_urls profile. */
  def urlFilter(docs: DataFrame, idCol: String, textCol: String,
                blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist filters nothing")
    // lowercase both sides: hosts are case-insensitive, and a
    // mixed-case 'HTTPS://SPAM.EXAMPLE' must not slip past the gate
    val t = lower(col(textCol))
    val domains = regexp_extract_all(t, lit(UrlPattern), lit(1))
    docs
      .withColumn("n_urls",
        regexp_count(t, lit(UrlPattern)).cast("long"))
      .where(!arrays_overlap(domains,
        array(blockedDomains.map(d => lit(d.toLowerCase)): _*)))
  }

  def contaminated(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   n: Int = 3): DataFrame = {
    val docSh = docs.select(col(idCol),
      explode(shingles(col(textCol), n)).as("sh"))
    val benchSh = bench.select(explode(shingles(col(benchTextCol), n)).as("sh"))
      .distinct()
    docSh.join(broadcast(benchSh), Seq("sh"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** [[contaminated]] with a Bloom pre-filter — the cluster-scale
    * variant for when the benchmark shingle set is too large to ship
    * raw to every task. The bloom is built DISTRIBUTED with Catalyst's
    * own `BloomFilterAggregate` (the expression behind Spark's runtime
    * row-group filters), materialized as one bounded row — exactly how
    * `InjectRuntimeFilter` materializes its scalar subquery — and
    * applied with codegen'd `BloomFilterMightContain` inside the
    * corpus scan, so the 99%+ of shingles that miss never reach the
    * semi-join. Bloom filters have NO false negatives, and survivors
    * are still exactly verified against the true shingle set, so the
    * result is bit-identical to [[contaminated]] (q82 shares q58's
    * oracle); the bloom only changes how much data the join touches.
    *
    * `expectedShingles`/`fpp` size the filter (n·ln(1/fpp)/ln²2 bits);
    * at fpp = 1% the bloom is ~1.2 bytes per benchmark shingle —
    * 100 M shingles ride in ~120 MB, vs multi-GB for the raw set.
    */
  def contaminatedBloom(docs: DataFrame, idCol: String, textCol: String,
                        bench: DataFrame, benchTextCol: String,
                        n: Int = 3, expectedShingles: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    require(expectedShingles > 0 && fpp > 0 && fpp < 1,
      "bloom sizing must be positive with fpp in (0,1)")
    val numBits = math.ceil(
      -expectedShingles * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate SILENTLY clamps numBits to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumBits (default 64M
    // bits = 8 MB) — a clamped filter degrades fpp toward 1 and the
    // prefilter quietly stops filtering. Raise the ceiling to what the
    // caller asked for rather than let the sizing silently lie.
    val spark = docs.sparkSession
    val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    if (spark.conf.get(maxBitsKey, "67108864").toLong < numBits)
      spark.conf.set(maxBitsKey, numBits.toString)
    // benchSh feeds BOTH the bloom build (an eager head() action) and
    // the exact verify join — persist so the benchmark scan+shingle+
    // distinct pass runs once, and release after the (small) result
    // set is materialized (the minhashNearDupPairs cache discipline)
    val benchSh = bench
      .select(explode(shingles(col(benchTextCol), n)).as("sh")).distinct()
      .persist()
    val bloomAgg = GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(col("sh"))),
      Literal(expectedShingles), Literal(numBits)).toAggregateExpression())
    val bin = benchSh.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bin, BinaryType),
      GraftSqlBridge.expression(xxhash64(col("sh")))))
    val result = docs
      .select(col(idCol), explode(shingles(col(textCol), n)).as("sh"))
      .where(mightContain)
      .join(broadcast(benchSh), Seq("sh"), "left_semi")
      .select(col(idCol)).distinct()
      .persist()
    result.count()
    benchSh.unpersist()
    result
  }

  /** Repetition profile (the Gopher-style repetitiousness signal):
    * total tokens, distinct tokens, and the top token's frequency per
    * document — all integers, oracle-exact. Two map-side-combined
    * groupBys keyed by (doc, token) then doc; scales like any word
    * count.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fanOut(docs).select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_tok_freq"))

  /** Corpus-level boilerplate removal (the C4 recipe, applied to
    * fixed-width chunks): split every document into `window`-word
    * chunks at fixed positions, count in how many DISTINCT documents
    * each exact chunk text occurs, strip every chunk occurring in
    * `maxDf`-or-more documents (license headers, navigation chrome,
    * duplicated passages), and reassemble the survivors in order.
    * Returns (id, clean) — a document that was pure boilerplate comes
    * back as the empty string, not a dropped row.
    *
    * Scale shape: chunking is a narrow per-row explode (≈ words/window
    * rows); the chunk-frequency table is one map-side-combined groupBy
    * whose OUTPUT (chunks with df ≥ maxDf) is small — boilerplate is
    * by definition repeated, so the blocklist broadcasts and the
    * corpus side anti-joins without shuffling; reassembly is one
    * groupBy per doc over surviving chunks (sort_array over ≤
    * words/window elements per doc, never across docs). No UDFs —
    * everything is codegen'd except the array lambdas.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       window: Int = 10, maxDf: Int = 2): DataFrame = {
    require(window > 0 && maxDf >= 2, "window >= 1, maxDf >= 2")
    // single-pass chunking expression: the transform/sequence/slice
    // formulation re-evaluated the captured split(text) once PER CHUNK
    // (interpreted HOF lambdas have no CSE — the winnowing O(L²)
    // class); WordChunks tokenizes once per row
    val chunks = graft.functions.TextExpressions.wordChunks(
      split(regexp_replace(col(textCol), "^\\s+|\\s+$", ""), "\\s+"),
      window, window)
    val chunked = docs
      .select(col(idCol), posexplode(chunks).as(Seq("cpos", "chunk")))
    val blocklist = chunked.groupBy("chunk")
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") >= maxDf)
      .select("chunk")
    val kept = chunked.join(broadcast(blocklist), Seq("chunk"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("cpos"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean"))
    docs.select(col(idCol))
      .join(kept, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Frequency-ranked vocabulary + token-id encoding — the tokenizer
    * back half of a training pipeline: build the top-`vocabSize` word
    * vocabulary (rank by corpus count, ties broken by the word itself,
    * so ids are fully deterministic; id 1 = most frequent, id 0 =
    * out-of-vocabulary), then map every document to its id sequence.
    * Returns (id, ids: array of int).
    *
    * Scale shape: one explode + map-side-combined groupBy builds the
    * counts; the vocabulary itself is LIMIT vocabSize — small by
    * construction, so the rank window and the token→id join both run
    * over broadcast data; re-assembly is one groupBy per doc
    * (sort_array over that doc's tokens only). The corpus never
    * shuffles except by doc id for reassembly.
    */
  def vocabEncode(docs: DataFrame, idCol: String, textCol: String,
                  vocabSize: Int): DataFrame = {
    val toks = fanOut(docs).select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    // single-partition window is fine: input is already LIMITed to
    // vocabSize rows
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("c"), asc("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(vocabSize)
      .withColumn("tid", row_number().over(w))
      .select("tok", "tid")
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("tid"), lit(0)).as("tid")))),
        x => x.getField("tid")).as("ids"))
  }

  /** Exact discrete per-group quantiles of an integer column WITHOUT
    * collecting groups: build the per-group value histogram (one
    * map-side-combined groupBy — the only pass over the data), then
    * pick the value whose cumulative count covers rank ceil(q·n) with
    * a window over the SMALL histogram. This is the scalable
    * exact-percentile shape for integer-valued metrics: a 10B-row
    * group reduces to at most |distinct values| histogram rows, so the
    * window never sees big data. Rank arithmetic is IEEE
    * double·long → ceil on both engines, so the oracle replays it
    * bit-for-bit.
    */
  def discQuantiles(df: DataFrame, groupCol: String, valCol: String,
                    qs: Seq[(String, Double)]): DataFrame = {
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val hist = df.groupBy(col(groupCol), col(valCol)).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(byGroup.orderBy(col(valCol))))
      .withColumn("n", sum(col("c")).over(byGroup))
    qs.map { case (label, q) =>
      val rank = ceil(lit(q) * col("n"))
      hist.where(col("cum") - col("c") < rank && rank <= col("cum"))
        .select(col(groupCol), lit(label).as("pct"), col(valCol).as("value"))
    }.reduce(_.unionByName(_))
  }

  /** Integer bigram-surprisal quality signal (the CCNet/KenLM idea —
    * score documents by how surprising their token transitions are
    * under a corpus LM — made bit-reproducible): per bigram the
    * quantized surprisal is floor(log₂ c(w1)) − floor(log₂ c(w1,w2))
    * = the bit-length difference of the two counts, all integers — no
    * float log ever touches the result, so Spark and a SQL oracle
    * agree exactly. Low sum/n_bigrams ⇒ repetitive/templated text;
    * high ⇒ diverse transitions. Counts are trained on the input
    * corpus itself (self-surprisal, the usual curation setup).
    *
    * Scale shape: bigram expansion is a narrow zip+explode; the count
    * tables shuffle by (w1,w2) / (w1) with map-side combine; the
    * re-join of doc bigrams against both count tables shuffles by the
    * same keys (AQE broadcasts them when the vocabulary is small);
    * the final per-doc sum combines map-side.
    */
  def bigramSurprisal(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val n = greatest(size(t) - 1, lit(0))
    val pairs = arrays_zip(slice(t, lit(1), n).as("w1"),
      slice(t, lit(2), n).as("w2"))
    val bg = fanOut(docs).select(col(idCol).as("doc_id"), explode(pairs).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val scored = bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum(flog2(col("c1")) - flog2(col("c2"))).as("surprisal"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal"), lit(0L)).as("surprisal"))
  }

  /** ROUGE-2 F1 between candidate document pairs, in exact integer
    * micro-units (×1e6, floor division — oracle-reproducible; never
    * a float sum). `pairs` carries (ia, ib); the result adds
    * `f1_micro`, one row per input pair, zero-overlap pairs included.
    *
    * Multiset semantics (true ROUGE): a bigram occurring twice in both
    * docs contributes 2, via `sum(least(ca, cb))` over the per-doc
    * bigram counts. Scale shape: the per-doc gram relation is computed
    * once (narrow explode + map-side-combined groupBy); each pair then
    * joins its two sparse count vectors on (doc, gram) — the standard
    * sparse-overlap join, shuffled by gram, never all-pairs (pair
    * generation is the caller's LSH/banding problem, e.g.
    * [[Dedup.minhashNearDupPairs]]).
    */
  def rougeBigramF1(docs: DataFrame, idCol: String, textCol: String,
                    pairs: DataFrame): DataFrame = {
    // null text scores like an empty doc (f1 = 0), it must not silently
    // drop its pairs from the one-row-per-pair contract
    val withT = fanOut(docs).select(col(idCol).as("id"),
      coalesce(tokens(col(textCol)),
        array().cast("array<string>")).as("t"))
    // slice+two-arg transform, not sequence(1, n-1): sequence throws on
    // a 1-token doc (start > stop), slice degrades to the empty array
    // (greatest-0 guard: slice rejects the negative length an empty
    // token array would produce)
    val grams = withT.select(col("id"),
        explode(expr(
          "transform(slice(t, 2, greatest(size(t) - 1, 0)), " +
            "(x, i) -> concat(t[i], ' ', x))"))
          .as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val sizes = withT.select(col("id"),
      greatest(size(col("t")) - 1, lit(0)).cast("long").as("n"))
    val ov = pairs.select(col("ia"), col("ib"))
      .join(grams.as("ga"), col("ia") === col("ga.id"))
      .join(grams.as("gb"),
        col("ib") === col("gb.id") && col("ga.g") === col("gb.g"))
      .groupBy("ia", "ib")
      .agg(sum(least(col("ga.c"), col("gb.c"))).as("ov"))
    pairs.select(col("ia"), col("ib"))
      .join(ov, Seq("ia", "ib"), "left")
      .join(sizes.select(col("id").as("ia"), col("n").as("na")), Seq("ia"))
      .join(sizes.select(col("id").as("ib"), col("n").as("nb")), Seq("ib"))
      // integer floor division (`div`), not a float divide — the F1 is
      // oracle-compared bit-exactly
      .withColumn("num", lit(2000000L) * coalesce(col("ov"), lit(0L)))
      .withColumn("den", col("na") + col("nb"))
      .select(col("ia"), col("ib"),
        expr("CASE WHEN den = 0 THEN 0L ELSE num div den END").as("f1_micro"))
  }

  /** Per-document text statistics + quality flag, as a ready projection. */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      tokenCount(t).as("n_tokens"),
      bpeTokenCount(t).as("n_bpe_tokens"),
      stopwordCount(t).as("n_stopwords"),
      punctCount(t).as("n_punct"),
      isQuality(t).as("is_quality"),
      langId(t).as("pred_lang"))
  }
}
