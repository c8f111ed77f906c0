package graft.text

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` (SURVEY.md §2 "Text
  * analysis"). All are single-pass, map-side-only column pipelines —
  * at 100 TB they run at scan speed with zero shuffles (the ORDER BY
  * exists only for the deterministic oracle compare).
  */
object TextAnalysis {

  /** Token counting: whitespace tokens, a BPE-ish regex segmentation
    * (word runs and single punctuation marks — the pre-tokenizer shape
    * GPT-style BPEs use), and the chars/4 rule-of-thumb estimate. */
  private val tokensQ: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("w", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("w")).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)"))
          .as("n_re_tokens"),
        length(col("text")).as("n_chars_obs"),
        ceil(length(col("text")) / 4.0).cast("int").as("est_bpe_tokens"))
      .orderBy(col("doc_id"))

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Quality scoring: stopword ratio, mean token length, and a
    * composite score — all exact integer ratios in double. */
  private val quality: Q = (s, d) => {
    val inList = Stopwords.map(w => s"'$w'").mkString(", ")
    Tables.documents(s, d)
      .withColumn("w", tokens(col("text")))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("n_stop",
        size(expr(s"filter(w, t -> t IN ($inList))")))
      .withColumn("sum_len",
        expr("aggregate(w, 0, (acc, t) -> acc + length(t))"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens").cast("double"))
          .as("stop_ratio"),
        (col("sum_len").cast("double") / col("n_tokens").cast("double"))
          .as("mean_tok_len"),
        (col("n_stop").cast("double") / col("n_tokens").cast("double") * 0.5 +
          least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.5)
          .as("quality_score"))
      .orderBy(col("doc_id"))
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "un"),
    "zh" -> Seq("de", "shi", "le"))

  /** Language ID by marker-word counts with a fixed precedence
    * arg-max (en > es > de > fr > zh). The synthetic corpus is an
    * English-ish word soup, so this exercises the mechanics (and its
    * oracle) rather than real recall. */
  private val langid: Q = (s, d) => {
    var df = Tables.documents(s, d).withColumn("w", tokens(col("text")))
    LangMarkers.foreach { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      df = df.withColumn(s"c_$lang",
        size(expr(s"filter(w, t -> t IN ($inList))")))
    }
    val langs = LangMarkers.map(_._1)
    val guess = expr(langs.map { l =>
      val geq = langs.filterNot(_ == l).map(o => s"c_$l >= c_$o").mkString(" AND ")
      s"WHEN $geq THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END"))
    df.select((Seq(col("doc_id")) ++ langs.map(l => col(s"c_$l")) ++
        Seq(guess.as("lang_guess"),
          (guess === col("lang")).as("matches_label"))): _*)
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: polynomial rolling hash (mod 1e9+7)
    * + winnowing-style min window hash, both native single-pass
    * kernels with an engine-portable fold — the DuckDB oracle
    * reproduces them with `list_reduce` over `string_split`. */
  private val fingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        polyFingerprint("text").as("poly_fp"),
        minWindowHash("text").as("min_window_hash"))
      .orderBy(col("doc_id"))

  /** Denylist-term redaction — the PII-scrub shape (regex match →
    * replace → count), exercised with terms that exist in this corpus
    * since it contains no digits/emails. Pure map-side; at 100 TB it
    * runs at scan speed and the regex compiles once per codegen'd
    * task, not per row. */
  private val redact: Q = (s, d) => {
    val pattern = "\\b(customer|key)\\b"
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        regexp_replace(col("text"), pattern, "[REDACTED]").as("redacted"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
          .as("n_redactions"))
      .orderBy(col("doc_id"))
  }

  /** Structured PII detection (the production pre-training scrub:
    * Dolma/CCNet-style pattern classes, not a denylist): emails,
    * phone numbers, SSN-shaped ids, IPv4 addresses — each class its
    * own regex, its own per-doc COUNT column, and its own tag in the
    * redacted text, plus a `has_pii` verdict conjunction, mirroring
    * `text_gopher_filter`'s auditable per-rule shape (per-class hit
    * rates are a one-line aggregate downstream). The corpus carries
    * no real PII, so deterministic synthetic PII derived from doc_id
    * is appended to 4 of 5 docs first — the oracle replays the same
    * synthesis, making detection exactly checkable. Pure map-side:
    * regexes compile once per codegen'd task, zero shuffles, scan
    * speed at 100 TB. */
  private val pii: Q = (s, d) => {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val synthetic = concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" today")))
        .when(col("doc_id") % 5 === 2,
          concat(lit(" id 123-45-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" on file")))
        .when(col("doc_id") % 5 === 3,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") / 256).cast("long") % 256)
              .cast("string"),
            lit(" logged")))
        .otherwise(lit("")))
    // the enriched text feeds four counters and a four-stage replace
    // chain: let-bind it once (CollapseProject would otherwise inline
    // the synthesis per use)
    val out = bind(synthetic, t =>
      array(
        size(regexp_extract_all(t, lit(email), lit(0))).cast("string"),
        size(regexp_extract_all(t, lit(phone), lit(0))).cast("string"),
        size(regexp_extract_all(t, lit(ssn), lit(0))).cast("string"),
        size(regexp_extract_all(t, lit(ip), lit(0))).cast("string"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
          email, "[EMAIL]"), phone, "[PHONE]"), ssn, "[SSN]"),
          ip, "[IP]")))
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), out.as("m"))
      .select(
        col("doc_id"),
        element_at(col("m"), 1).cast("int").as("n_email"),
        element_at(col("m"), 2).cast("int").as("n_phone"),
        element_at(col("m"), 3).cast("int").as("n_ssn"),
        element_at(col("m"), 4).cast("int").as("n_ip"),
        element_at(col("m"), 5).as("redacted"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ssn") + col("n_ip") > 0)
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary: top-100 word bigrams by frequency. The
    * explode→count shape is the vocabulary/BPE-training primitive; at
    * 100 TB the groupBy is the only shuffle and partial aggregation
    * collapses each task's counts before anything moves. */
  private val ngramFreq: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(wordNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(100)

  /** Repetition-based quality signals (the Gopher-rules shape):
    * duplicate 3-gram fraction and the frequency share of the most
    * common 2-gram. Entirely per-row higher-order-function work — a
    * doc's score never leaves its partition, so at 100 TB this is a
    * zero-shuffle scan. Max-multiplicity is computed as the longest
    * run in the SORTED 2-gram array: one O(n log n) `array_sort` +
    * one `aggregate` pass instead of a per-distinct-gram rescan. */
  private val repetition: Q = (s, d) => {
    // one tokenization, one 3-gram build, one sorted 2-gram build per
    // row: everything nests in let-bindings inside ONE projection,
    // because any column referenced twice across projections gets
    // inlined (recomputed) by CollapseProject. The metrics come back
    // as a homogeneous double array (struct field names do not
    // survive lambda contexts).
    val metrics = bind(tokens(coalesce(col("text"), lit(""))), w =>
      bind(ngramsOfTokens(w, 3), g3 =>
        bind(array_sort(ngramsOfTokens(w, 2)), g2s =>
          array(
            size(g3).cast("double"),
            (size(g3) - size(array_distinct(g3))).cast("double") /
              greatest(size(g3), lit(1)).cast("double"),
            maxRunLength(g2s).cast("double") /
              greatest(size(g2s), lit(1)).cast("double")))))
    Tables.documents(s, d)
      .select(col("doc_id"), metrics.as("m"))
      .select(
        col("doc_id"),
        element_at(col("m"), 1).cast("int").as("n3"),
        element_at(col("m"), 2).as("dup3_frac"),
        element_at(col("m"), 3).as("top2_frac"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style document quality filter (the rule shape of public
    * web-corpus pipelines: word-count bounds, mean-word-length bounds,
    * stopword presence, alphabetic-word fraction, duplicate-3-gram
    * cap — the corpus is single-line, so line-level rules are
    * vacuous here and omitted). Each rule is its own per-doc boolean
    * VERDICT column and `keep` is their conjunction: per-rule drop
    * rates fall out of a one-line aggregate downstream, which is what
    * makes a 100 TB filtering run auditable. One tokenization pass
    * inside a single let-bound projection (a column referenced across
    * projections gets inlined per use by CollapseProject), zero
    * shuffles — this runs at scan speed. */
  private val gopherFilter: Q = (s, d) => {
    val metrics = bind(tokens(coalesce(col("text"), lit(""))), w =>
      bind(ngramsOfTokens(w, 3), g3 =>
        array(
          size(w).cast("double"),
          aggregate(w, lit(0L), (a, t) => a + length(t)).cast("double") /
            greatest(size(w), lit(1)).cast("double"),
          size(array_distinct(filter(w,
            t => t.isin(Stopwords: _*)))).cast("double"),
          size(filter(w, t => t.rlike("^[a-z]+$"))).cast("double") /
            greatest(size(w), lit(1)).cast("double"),
          (size(g3) - size(array_distinct(g3))).cast("double") /
            greatest(size(g3), lit(1)).cast("double"))))
    Tables.documents(s, d)
      .select(col("doc_id"), metrics.as("m"))
      .select(
        col("doc_id"),
        element_at(col("m"), 1).cast("int").as("n_words"),
        element_at(col("m"), 2).as("mean_word_len"),
        element_at(col("m"), 3).cast("int").as("n_stop_distinct"),
        element_at(col("m"), 4).as("alpha_frac"),
        element_at(col("m"), 5).as("dup3_frac"))
      .select(
        (col("*") +:
          Seq(
            col("n_words").between(50, 100000).as("r_wordcount"),
            col("mean_word_len").between(3.0, 10.0).as("r_meanlen"),
            (col("n_stop_distinct") >= 2).as("r_stopwords"),
            (col("alpha_frac") >= 0.80).as("r_alpha"),
            (col("dup3_frac") <= 0.30).as("r_dup3"))): _*)
      .withColumn("keep",
        col("r_wordcount") && col("r_meanlen") && col("r_stopwords") &&
          col("r_alpha") && col("r_dup3"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-frequency rarity scoring (the word-frequency quality
    * filter: a doc of vanishingly rare tokens is noise, one of only
    * top-frequency tokens is boilerplate): token-level join against
    * the corpus vocabulary, per-doc mean and min token frequency —
    * integer-exact sums, double only at the final ratio, so the
    * oracle compares bit-exactly. Scale shape: the vocabulary is an
    * aggregate (one row per distinct token) consumed through a
    * BROADCAST join, so the Zipf-skewed token key never shuffles
    * ("the" would hot-spot any token-keyed exchange); at 100 TB the
    * contract becomes a top-K vocabulary broadcast (frequency mass
    * concentrates, OOV scores as rarest) — the corpus-side plan is
    * identical. */
  private val rarity: Q = (s, d) => {
    // NO coalesce here, deliberately: NULL text must propagate to
    // zero token rows (explode of a null array) so the doc is ABSENT
    // from the output — exactly what the oracle's unnest(NULL) does;
    // coalescing to "" would emit a one-empty-token row the oracle
    // doesn't have
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("tf"))
    toks.join(broadcast(vocab), Seq("t"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(col("tf")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_tok_freq"),
        min(col("tf")).as("min_tok_freq"))
      .orderBy(col("doc_id"))
  }

  /** Corpus bigram-LM fluency scoring (the CCNet/KenLM
    * quality-filter shape with the corpus itself as the LM): each
    * adjacent word bigram `w1 w2` scores its CONDITIONAL probability
    * P(w2|w1) = count(w1 w2) / count(w1 ·), quantized to
    * parts-per-million by INTEGER floor division so every per-doc
    * aggregate is an exact integer sum (a double log-prob sum would
    * be shuffle-order-dependent and libm-divergent vs the oracle) —
    * doubles appear only at the final per-doc ratio. A doc of
    * improbable transitions (low mean, zero min) is noise; one of
    * only top transitions is boilerplate — the signal `text_rarity`'s
    * unigram frequencies cannot see. Scale shape: both LM relations
    * (bigram counts, head counts) are aggregates consumed through
    * BROADCAST joins, so the Zipf-skewed gram keys never shuffle; at
    * 100 TB the contract becomes a top-K LM broadcast with OOV
    * scoring zero — the corpus-side plan is identical. */
  private val lmScore: Q = (s, d) => {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), explode(wordNgrams(col("text"), 2)).as("g"))
      .withColumn("head", substring_index(col("g"), " ", 1))
    val bigramLm = grams.groupBy(col("g")).agg(count(lit(1)).as("bf"))
    // head counts DERIVE from the bigram LM (count(w1 ·) = Σ bf over
    // bigrams headed w1) — an aggregation over the tiny LM relation,
    // not a second full corpus explode+shuffle
    val headLm = bigramLm
      .groupBy(substring_index(col("g"), " ", 1).as("head"))
      .agg(sum(col("bf")).as("hf"))
    grams
      .join(broadcast(bigramLm), Seq("g"))
      .join(broadcast(headLm), Seq("head"))
      .withColumn("ppm", expr("(bf * 1000000) div hf"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("ppm")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_cond_ppm"),
        min(col("ppm")).as("min_cond_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Lexical diversity (vocabulary richness — the corpus-quality
    * axis repetition metrics don't capture): per document, token
    * count, type (distinct-token) count, hapax-legomenon count,
    * type/token ratio, hapax ratio, and the top token's mass. All
    * derived from EXACT integer run-lengths over the sorted token
    * array — one O(n log n) array_sort + one aggregate() fold per
    * row, zero shuffles, scan speed — and the only doubles are
    * single divisions of exact longs (deterministic, oracle-exact).
    * The 100 TB use is the standard one: low TTR + high top-token
    * mass flags boilerplate/spam before it poisons training mix. */
  private val lexicalDiversity: Q = (s, d) => {
    val metrics = bind(
      array_sort(filter(tokens(coalesce(col("text"), lit(""))),
        w => w =!= lit(""))), ws => {
        // run-length fold over the sorted tokens: a new run is a new
        // type; a closing run of length 1 is a hapax
        val zero = struct(lit("").as("prev"), lit(0L).as("run"),
          lit(0L).as("types"), lit(0L).as("hapax"), lit(0L).as("maxn"))
        val folded = aggregate(ws, zero,
          (acc, x) => {
            val same = x === acc.getField("prev")
            val closedHapax = acc.getField("hapax") +
              when(acc.getField("run") === 1L, 1L).otherwise(0L)
            val closedMax =
              greatest(acc.getField("maxn"), acc.getField("run"))
            struct(x.as("prev"),
              when(same, acc.getField("run") + 1L).otherwise(lit(1L))
                .as("run"),
              when(same, acc.getField("types"))
                .otherwise(acc.getField("types") + 1L).as("types"),
              when(same, acc.getField("hapax")).otherwise(closedHapax)
                .as("hapax"),
              when(same, acc.getField("maxn")).otherwise(closedMax)
                .as("maxn"))
          },
          // close the final run
          acc => struct(
            acc.getField("types").as("n_types"),
            (acc.getField("hapax") +
              when(acc.getField("run") === 1L, 1L).otherwise(0L))
              .as("hapax"),
            greatest(acc.getField("maxn"), acc.getField("run"))
              .as("maxn")))
        struct(size(ws).cast("long").as("n_tokens"),
          folded.getField("n_types").as("n_types"),
          folded.getField("hapax").as("hapax"),
          folded.getField("maxn").as("maxn"))
      })
    Tables.documents(s, d)
      .select(col("doc_id"), metrics.as("m"))
      .select(col("doc_id"),
        col("m.n_tokens").as("n_tokens"),
        col("m.n_types").as("n_types"),
        col("m.hapax").as("n_hapax"),
        (col("m.n_types").cast("double") /
          col("m.n_tokens").cast("double")).as("ttr"),
        (col("m.hapax").cast("double") /
          col("m.n_tokens").cast("double")).as("hapax_ratio"),
        (col("m.maxn").cast("double") /
          col("m.n_tokens").cast("double")).as("top_token_frac"))
      .filter(col("n_tokens") > 0)
      .orderBy(col("doc_id"))
  }

  /** BPE merges and vocabulary-cap constants for [[bpeQ]]. */
  private val BpeMerges = 64
  private val BpeVocabCap = 8192

  /** Train `n` BPE merges on a (word → count) vocabulary —
    * deterministic: the highest-count adjacent pair wins each round,
    * ties break lexicographically (left symbol, then right). Standard
    * BPE training operates on exactly this dictionary, never the raw
    * corpus, so the driver-side fold is over the BOUNDED top-K
    * vocabulary aggregate (the same contract as `text_rarity`'s
    * broadcast vocabulary) — at 100 TB the train input is one small
    * shuffle result, and the trained merges are plan metadata like
    * the IVF/PQ codebooks. */
  private[graft] def trainBpe(vocab: Seq[(String, Long)], n: Int)
      : Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] = vocab.map { case (w, c) =>
      val b = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (b.result().toArray, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < n && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 &&
                syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result().toArray, c)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Bounded corpus vocabulary → trained merges → the NUL-joined
    * merge literals the native `graft_bpe_tokens` expression
    * consumes — the shared trained-artifact path of `text_bpe` and
    * `pipeline_bpe_budget`. Determinism and the full merge count are
    * require()d HERE so every caller gets the checks; a change to
    * the literal contract (the NUL separator the kernel splits on)
    * has exactly one home. */
  private[graft] def corpusBpeMergeLits(
      docs: org.apache.spark.sql.DataFrame): Seq[String] = {
    val vocab: Seq[(String, Long)] = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(BpeVocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = trainBpe(vocab, BpeMerges)
    require(merges == trainBpe(vocab, BpeMerges),
      "BPE training must be deterministic")
    require(merges.size == BpeMerges,
      s"corpus too small to train $BpeMerges merges")
    val sep = new String(Array(0.toChar))
    merges.map { case (a, b) => a + sep + b }
  }

  /** Trained-BPE tokenization (`text_bpe`): train merges on the
    * corpus vocabulary, apply as the native `graft_bpe_tokens`
    * expression, and prove the tokenizer's laws in one aggregate —
    * lossless roundtrip (concat(tokens) == text minus spaces, every
    * doc), token count bounded by [words, codepoints], and genuine
    * compression (the merges fired). Training is require()d
    * deterministic (two runs, identical merges). The oracle replays
    * the SQL-computable facts (doc/word/char totals) and pins the
    * verdicts — the merge list itself is a trained artifact like the
    * k-means centroids, so its values live in the spec, not SQL. */
  private val bpeQ: Q = (s, d) => {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val mergeLits = corpusBpeMergeLits(docs)
    val toks = docs.select(lower(col("text")).as("lt"),
      call_function("graft_bpe_tokens", col("text"),
        array(mergeLits.map(lit): _*)).as("tk"))
    val r = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("tk"))).as("nb"),
      sum(when(concat_ws("", col("tk")) ===
        regexp_replace(col("lt"), " ", ""), 0L).otherwise(1L)).as("bad"),
      sum(size(filter(split(col("lt"), " "),
        w => w =!= ""))).as("n_ws_tokens"),
      sum(length(regexp_replace(col("lt"), " ", ""))).as("n_chars"))
      .head()
    require(r.getAs[Long]("bad") == 0L,
      "BPE roundtrip must be lossless for every document")
    val nb = r.getAs[Long]("nb")
    require(nb >= r.getAs[Long]("n_ws_tokens") &&
      nb < r.getAs[Long]("n_chars"),
      s"BPE token count $nb must sit in [words, chars)")
    import s.implicits._
    Seq((r.getAs[Long]("n_docs"), r.getAs[Long]("n_ws_tokens"),
      r.getAs[Long]("n_chars"), true, true, BpeMerges))
      .toDF("n_docs", "n_ws_tokens", "n_chars", "roundtrip_ok",
        "bpe_in_bounds", "merges_trained")
  }

  val queries: Map[String, Q] = Map(
    "text_bpe" -> bpeQ,
    "text_lexical_diversity" -> lexicalDiversity,
    "text_lm_score" -> lmScore,
    "text_repetition" -> repetition,
    "text_gopher_filter" -> gopherFilter,
    "text_rarity" -> rarity,
    "text_ngram_freq" -> ngramFreq,
    "text_tokens" -> tokensQ,
    "text_quality" -> quality,
    "text_langid" -> langid,
    "text_fingerprint" -> fingerprint,
    "text_redact" -> redact,
    "text_pii" -> pii)

  val oracles: Map[String, String] = Map(
    // trained-artifact decision row (the merge list is plan metadata,
    // like the k-means centroids -- ann_ivf_kmeans precedent): the SQL
    // side recomputes every SQL-expressible fact, the verdicts are
    // require()d in-query and spec-pinned
    "text_bpe" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(lower(text), ' '),
        |    w -> w <> ''))) AS BIGINT) AS n_ws_tokens,
        |  CAST(SUM(length(replace(lower(text), ' ', ''))) AS BIGINT)
        |    AS n_chars,
        |  TRUE AS roundtrip_ok,
        |  TRUE AS bpe_in_bounds,
        |  CAST(64 AS INT) AS merges_trained
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    // counts are exact integers; the three ratios are single IEEE
    // divisions of exact longs — deterministic on both engines
    "text_lexical_diversity" ->
      """WITH w AS (SELECT doc_id,
        |    UNNEST(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        | wc AS (SELECT doc_id, word, COUNT(*) AS n FROM w
        |  WHERE word <> '' GROUP BY doc_id, word),
        | d AS (SELECT doc_id,
        |    CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS n_hapax,
        |    CAST(MAX(n) AS BIGINT) AS max_n
        |  FROM wc GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        | CAST(n_types AS DOUBLE) / n_tokens AS ttr,
        | CAST(n_hapax AS DOUBLE) / n_tokens AS hapax_ratio,
        | CAST(max_n AS DOUBLE) / n_tokens AS top_token_frac
        |FROM d WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin,
    // conditional bigram probabilities quantized by INTEGER floor
    // division (ppm) — every aggregate integer-exact, one IEEE
    // division at the doc boundary
    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN
        |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |        ELSE [] END) AS g
        |      FROM t),
        |gh AS (SELECT doc_id, g, string_split(g, ' ')[1] AS head FROM g),
        |blm AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS bf FROM gh GROUP BY g),
        |hlm AS (SELECT head, CAST(COUNT(*) AS BIGINT) AS hf
        |        FROM gh GROUP BY head)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM((bf * 1000000) // hf) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_cond_ppm,
        |  CAST(MIN((bf * 1000000) // hf) AS BIGINT) AS min_cond_ppm
        |FROM gh JOIN blm USING (g) JOIN hlm USING (head)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // integer-exact frequency sums; the final ratio is the same IEEE
    // division on both engines
    "text_rarity" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY t)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tf) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_tok_freq,
        |  CAST(MIN(tf) AS BIGINT) AS min_tok_freq
        |FROM tok JOIN v USING (t)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The same rule metrics via DuckDB list ops; integer-over-integer
    // double division is the same IEEE op on both engines, so the
    // verdicts compare exactly.
    "text_gopher_filter" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |             FROM documents),
        |g AS (SELECT doc_id, w,
        |  CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
        |    i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] ||
        |         ' ' || w[CAST(i + 2 AS INT)]) ELSE [] END AS g3
        |FROM tok),
        |m AS (SELECT doc_id,
        |  CAST(len(w) AS INT) AS n_words,
        |  CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
        |    / CAST(greatest(len(w), 1) AS DOUBLE) AS mean_word_len,
        |  CAST(len(list_distinct(list_filter(w,
        |    t -> t IN ('the', 'a', 'of', 'and', 'to')))) AS INT)
        |    AS n_stop_distinct,
        |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[a-z]+$')))
        |      AS DOUBLE)
        |    / CAST(greatest(len(w), 1) AS DOUBLE) AS alpha_frac,
        |  CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
        |    / CAST(greatest(len(g3), 1) AS DOUBLE) AS dup3_frac
        |FROM g)
        |SELECT *,
        |  (r_wordcount AND r_meanlen AND r_stopwords AND r_alpha
        |    AND r_dup3) AS keep
        |FROM (SELECT *,
        |  n_words BETWEEN 50 AND 100000 AS r_wordcount,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS r_meanlen,
        |  n_stop_distinct >= 2 AS r_stopwords,
        |  alpha_frac >= 0.80 AS r_alpha,
        |  dup3_frac <= 0.30 AS r_dup3
        | FROM m)
        |ORDER BY doc_id""".stripMargin,
    // Max 2-gram multiplicity via per-distinct-gram rescans (the
    // engine-side longest-run trick is an optimization the result
    // doesn't depend on). Integer-over-integer division is the same
    // IEEE op on both engines.
    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |             FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
        |    i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] ||
        |         ' ' || w[CAST(i + 2 AS INT)]) ELSE [] END AS g3,
        |  CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
        |    i -> w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)])
        |    ELSE [] END AS g2
        |FROM tok)
        |SELECT doc_id,
        |  CAST(len(g3) AS INT) AS n3,
        |  CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
        |    / CAST(greatest(len(g3), 1) AS DOUBLE) AS dup3_frac,
        |  CAST(coalesce(list_max(list_transform(list_distinct(g2),
        |         x -> len(list_filter(g2, y -> y = x)))), 0) AS DOUBLE)
        |    / CAST(greatest(len(g2), 1) AS DOUBLE) AS top2_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_ngram_freq" ->
      """WITH t AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |b AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN
        |        [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
        |        ELSE [] END) AS bigram
        |      FROM t)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 100""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(lower(text), ' ')) AS INT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS n_re_tokens,
        | CAST(length(text) AS INT) AS n_chars_obs,
        | CAST(ceil(length(text) / 4.0) AS INT) AS est_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents),
        | x AS (SELECT doc_id,
        |   len(w) AS n_tokens,
        |   len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
        |   list_sum(list_transform(w, t -> length(t))) AS sum_len FROM t)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        | CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        | CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
        | CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.5 +
        |   least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5 AS quality_score
        |FROM x ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        | regexp_replace(text, '\b(customer|key)\b', '[REDACTED]', 'g') AS redacted,
        | CAST(len(regexp_extract_all(text, '\b(customer|key)\b')) AS INT)
        |   AS n_redactions
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same synthesis, same four class regexes, same replace order
    // (DuckDB regexp_replace needs the explicit 'g' flag; Spark's is
    // global by default)
    "text_pii" ->
      """WITH t AS (
        |  SELECT doc_id, text || CASE
        |    WHEN doc_id % 5 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@example.com now'
        |    WHEN doc_id % 5 = 1 THEN ' call 555-' ||
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
        |    WHEN doc_id % 5 = 2 THEN ' id 123-45-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' on file'
        |    WHEN doc_id % 5 = 3 THEN ' from 10.0.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |      CAST((doc_id // 256) % 256 AS VARCHAR) || ' logged'
        |    ELSE '' END AS et
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT doc_id, et,
        |    CAST(len(regexp_extract_all(et,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
        |    CAST(len(regexp_extract_all(et,
        |      '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
        |    CAST(len(regexp_extract_all(et,
        |      '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
        |    CAST(len(regexp_extract_all(et,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip
        |  FROM t)
        |SELECT doc_id, n_email, n_phone, n_ssn, n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(et,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
        |    AS redacted,
        |  (n_email + n_phone + n_ssn + n_ip > 0) AS has_pii
        |FROM c ORDER BY doc_id""".stripMargin,
    // The polynomial fold (seed 7, base 31, mod 1e9+7) is reproduced
    // exactly: DuckDB ascii() == code point == what the native kernel
    // folds (corpus is ASCII; both engines agree on any BMP text).
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(7 AS BIGINT),
        |     list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |   (h, c) -> (h * 31 + c) % 1000000007) AS poly_fp,
        | CASE WHEN length(text) >= 8 THEN
        |   list_min(list_transform(range(1, length(text) - 6), i ->
        |     list_reduce(list_prepend(CAST(7 AS BIGINT),
        |         list_transform(string_split(text[CAST(i AS INT):CAST(i + 7 AS INT)], ''),
        |           c -> CAST(ascii(c) AS BIGINT))),
        |       (h, c) -> (h * 31 + c) % 1000000007)))
        | ELSE
        |   list_reduce(list_prepend(CAST(7 AS BIGINT),
        |       list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |     (h, c) -> (h * 31 + c) % 1000000007)
        | END AS min_window_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      val langs = LangMarkers.map(_._1)
      val counts = LangMarkers.map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(w, t -> t IN ($inList))) AS INT) AS c_$lang"
      }.mkString(",\n   ")
      val guess = langs.map { l =>
        val geq = langs.filterNot(_ == l).map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN $geq THEN '$l'"
      }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
      s"""WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') w
         |           FROM documents),
         | x AS (SELECT doc_id, lang,
         |   $counts FROM t)
         |SELECT doc_id, ${langs.map(l => s"c_$l").mkString(", ")},
         | $guess AS lang_guess,
         | ($guess = lang) AS matches_label
         |FROM x ORDER BY doc_id""".stripMargin
    })
}
