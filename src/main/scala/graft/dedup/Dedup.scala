package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.Tables
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` (SURVEY.md §2 "Dedup").
  *
  * Scale design (100 TB): document *text* is only ever scanned once,
  * map-side, to produce fixed-size derived keys (md5, minhash sigs,
  * simhash). Every shuffle carries hashes/ids, never bodies. The
  * exact-Jaccard queries use `source` as a blocking key (the analog
  * of a crawl/domain partition); the unblocked scale path is
  * MinHash-LSH whose candidate set is verified with exact Jaccard.
  */
object Dedup {

  /** Exact dedup: group by content hash; the shuffle key is 24 bytes
    * regardless of document size. Keep-first = min(doc_id). The
    * group key is md5 PLUS an independent xxhash64 — md5 collisions
    * are practically constructible (public chosen-prefix blobs land
    * in crawl corpora), and a collision would silently merge two
    * distinct documents; a simultaneous collision in both hashes is
    * not constructible. Output keeps the md5 alone (the oracle
    * groups by the text itself, so the compare is unchanged). */
  private val exact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_md5"),
        xxhash64(col("text")).as("h2"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("content_md5"))
      .orderBy(col("keep_id"))

  /** Substring-dedup window width in tokens. Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better")
    * use 50 BPE tokens; the test corpus runs 10–200 words per doc,
    * so 16 keeps spans observable while the algorithm is
    * width-agnostic. */
  private val SpanW = 16

  /** Substring-level exact dedup: maximal duplicated token spans of
    * ≥ `w` tokens per document — the standard LLM-corpus complement
    * to document-level MinHash (Lee et al. find 50-token duplicated
    * spans inside otherwise-distinct documents). Every dedup here
    * operated on whole documents until round 14; this is the
    * below-document granularity.
    *
    * Spark-native shape (vs the paper's single-machine suffix
    * array): ONE native pass turns each document into positional
    * w-token window hashes ([[graft.functions.NativeExprs.SpanHashes]]),
    * so only (doc_id, pos, hash8) rows — ~20 bytes per corpus
    * token — ever leave the scan; document text never shuffles.
    * A window duplicated anywhere in the corpus (cross-doc or
    * within-doc, the paper's definition) marks its position; marked
    * positions merge into maximal spans per doc via gaps-and-islands
    * (two windows p < p' continue one duplicated region iff
    * p' ≤ p + w, i.e. their token ranges overlap or touch). Three
    * shuffles total — window-hash groupBy, the flagged-position
    * re-key, the per-doc island window — all on hashes/ids. At
    * 100 TB the (hash, doc, pos) relation is ~1.6× the token count
    * in bytes, the honest cost of the one-shuffle formulation; the
    * groupBy is a partial-aggregating count so boilerplate windows
    * (the skew risk) reduce map-side. 64-bit window-hash collisions
    * (~n²/2⁶⁵) mark false duplicates; at corpus scales where that
    * bites, verify flagged spans exactly like the LSH route does. */
  private[graft] def substringSpans(docs: DataFrame, w: Int): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    // coalesce keeps the kernel non-nullable (see [[shingled]]: a
    // nullable kernel gets re-evaluated by inferred isnotnull).
    // PERSISTED: the dup-hash aggregate and the flagged-position
    // probe both consume this relation — without the cache the
    // corpus is scanned and span-hashed TWICE (plan-audited; the
    // kernel is ~w hashLongs per token, real CPU at 100 TB)
    val wins = OpCache.swap("substring.wins",
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(call_function("graft_span_hashes",
            coalesce(col("text"), lit("")), lit(w))))
        .toDF("doc_id", "pos", "wh"))
    val dupHashes = wins.groupBy("wh").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("wh")
    val marked = wins.join(dupHashes, "wh").select("doc_id", "pos")
    marked
      .withColumn("new_span",
        when(col("pos") - lag("pos", 1).over(win) <= w, 0).otherwise(1))
      .withColumn("island", sum("new_span").over(win))
      .groupBy(col("doc_id"), col("island"))
      .agg(min("pos").as("s"), max("pos").as("e"))
      .select(col("doc_id"),
        col("s").cast("int").as("span_start"),
        (col("e") + lit(w - 1)).cast("int").as("span_end"),
        (col("e") - col("s") + lit(w)).cast("int").as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  private val substringQ: Q = (s, d) =>
    substringSpans(Tables.parallel(Tables.documents(s, d)), SpanW)

  /** Substring-level dedup, the REMOVAL half (Lee et al. rewrite the
    * corpus, they don't just report): every duplicated w-token window
    * keeps its canonical occurrence corpus-wide INTACT (the smallest
    * (doc_id, pos) — deterministic), and every token covered by a
    * NON-canonical duplicated window strips from its document —
    * UNLESS that token also lies inside some window's canonical
    * occurrence (canonical ranges are protected, so overlapping
    * duplicated windows can never strip each other's canonical copy
    * down to zero intact occurrences). Matching is CASE-INSENSITIVE
    * (the window hashes lowercase), but the rewritten text preserves
    * the original bytes — an untouched document round-trips
    * byte-identical (token boundaries are spaces, which lowercasing
    * never moves, so positions agree between the hash and reassembly
    * tokenizations). Unique text is untouched; a fully-boilerplate
    * doc strips to empty rather than disappearing (the caller decides
    * whether empty docs drop — that is a filtering policy, not
    * dedup).
    *
    * Plan shape: the cached window relation feeds (a) the dup-hash
    * aggregate and (b) a per-hash rank (one shuffle on wh — smallest
    * occurrence wins) marking non-canonical occurrences; tokens strip
    * via a LEFT ANTI range join (doc equi-key + pos-in-window
    * residual — each token matches ≤ w windows, and anti-join stops
    * at the first, so boilerplate can't blow the join up) plus a
    * disjoint protected leg (semi canonical ∩ semi removal — only
    * tokens under BOTH a canonical and a removal range re-enter);
    * the cleaned text reassembles from an order-restoring sorted
    * collect per doc. Document text shuffles exactly once (the
    * reassembly) — the marking side moves only (hash8, doc, pos). */
  private[graft] def substringStrip(docs: DataFrame, w: Int): DataFrame = {
    val wins = OpCache.swap("substrip.wins",
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(call_function("graft_span_hashes",
            coalesce(col("text"), lit("")), lit(w))))
        .toDF("doc_id", "pos", "wh"))
    // ONE aggregate elects the canonical occurrence AND counts: both
    // min(struct) and count partial-combine map-side, so a
    // boilerplate window repeated 10⁶ times collapses before the
    // shuffle instead of sorting one hot key in one task (the
    // row_number-over-wh formulation's skew cliff)
    val canon = wins.groupBy("wh")
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id"), col("pos"))).as("c"))
      .filter(col("n") >= 2)
      .select(col("wh"), col("c"))
    // non-canonical occurrences of duplicated windows: removal ranges
    val removal = wins.join(canon, "wh")
      .filter(!(col("doc_id") === col("c.doc_id") &&
        col("pos") === col("c.pos")))
      .select(col("doc_id").as("rdoc"), col("pos").as("rs"),
        (col("pos") + lit(w - 1)).as("re"))
    // canonical occurrences' token ranges: PROTECTED from removal
    // (same row count as `canon` — one range per duplicated window)
    val protect = canon
      .select(col("c.doc_id").as("cdoc"), col("c.pos").as("cs"),
        (col("c.pos") + lit(w - 1)).as("ce"))
    // persisted like wins: the anti-join legs and the per-doc total
    // all consume this — uncached, the corpus tokenizes repeatedly.
    // ORIGINAL case: the rewrite must preserve the source bytes (the
    // hashes lowercase for matching; split boundaries agree).
    val toks = OpCache.swap("substrip.toks",
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")))
        .toDF("doc_id", "idx", "tok"))
    val untouched = toks.join(removal,
      col("doc_id") === col("rdoc") &&
        col("idx") >= col("rs") && col("idx") <= col("re"),
      "left_anti")
    // tokens under a removal range AND a canonical range survive —
    // disjoint from `untouched` by construction (both semi-join legs
    // require a removal hit), so the union needs no dedup
    val protectedToks = toks
      .join(removal,
        col("doc_id") === col("rdoc") &&
          col("idx") >= col("rs") && col("idx") <= col("re"),
        "left_semi")
      .join(protect,
        col("doc_id") === col("cdoc") &&
          col("idx") >= col("cs") && col("idx") <= col("ce"),
        "left_semi")
    val kept = untouched.unionByName(protectedToks)
    val total = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"))
    kept.groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("tok")))),
          e => e.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(total, Seq("doc_id"), "right")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
      .orderBy("doc_id")
  }

  private val substringStripQ: Q = (s, d) =>
    substringStrip(Tables.parallel(Tables.documents(s, d)), SpanW)

  /** doc_id, source, sorted distinct hashed 3-gram shingle set —
    * one native pass over the text ([[graft.functions.NativeExprs.ShingleHashes]]);
    * shingle strings are never materialized.
    *
    * Null handling is deliberate: null texts are dropped by a plain
    * scan-level filter, and the kernel input is `coalesce(text, '')`
    * so the shingle column is *non-nullable*. Without that, the
    * downstream self-joins' null-intolerant equalities make the
    * optimizer infer `isnotnull(<kernel>)` and push it below the
    * projection — evaluating the kernel twice per row per branch
    * (the round-1/2 plan finding). With a non-nullable kernel the
    * constraint folds to true and each branch evaluates it once.
    *
    * `minTokens` pre-filters on the raw token count *before* the
    * kernel (3 tokens ⇔ ≥1 shingle), replacing a `size(sh) > 0`
    * post-filter that had the same double-eval problem. */
  private def shingled(s: SparkSession, d: String, minTokens: Int = 0): DataFrame = {
    val base = Tables.parallel(Tables.documents(s, d))
      .filter(col("text").isNotNull)
    val pre =
      if (minTokens > 0)
        base.filter(size(split(lower(col("text")), " ")) >= minTokens)
      else base
    pre.select(col("doc_id"), col("source"),
      call_function("graft_shingle_hashes",
        coalesce(col("text"), lit(""))).as("sh"))
  }

  /** Exact n-gram Jaccard pairs (≥ 0.8) within a `source` block.
    * O(block²) compares for blocks up to [[MaxBlock]] docs; an
    * OVERSIZED block is routed through the LSH candidate path
    * ([[lshCandidates]]) instead of silently going quadratic — the
    * bound is enforced in [[ngramJaccardPairs]], not just declared.
    * Shingles are xxhash64'd and sorted ONCE per document so the
    * per-pair compare is a primitive merge walk
    * ([[graft.functions.NativeExprs.JaccardSortedLong]]) — the pair
    * count is the quadratic term, so per-pair cost is what matters. */
  private val ngramJaccard: Q = (s, d) => {
    // minTokens = 3 ⇔ at least one shingle: without it, two
    // shingle-less docs in one source block score 0/0 = NaN, which
    // PASSES `j >= 0.8` under NaN-is-largest comparison semantics
    // and emits garbage "near-duplicates" (latent on this corpus —
    // min 10 tokens — real on any other)
    // persisted: sizes, both all-pairs sides, and the LSH verify
    // joins all consume the shingle relation
    ngramJaccardPairs(
      OpCache.swap("ngramJaccard.sh", shingled(s, d, minTokens = 3)),
      MaxBlock)
  }

  /** All-pairs exact Jaccard within blocks of ≤ `maxBlock` docs;
    * larger blocks switch to LSH candidate generation + exact verify
    * (per-pair miss probability < 1e-7 at J ≥ 0.8 with 32×4 banding),
    * so no block can force O(block²) compares. Block sizes come from
    * one tiny count aggregate, broadcast back onto the docs. */
  private[graft] def ngramJaccardPairs(sh: DataFrame, maxBlock: Int): DataFrame = {
    val sizes = sh.groupBy(col("source"))
      .agg(count(lit(1)).as("block_n"))
    val tagged = sh.join(broadcast(sizes), "source")
    val small = tagged.filter(col("block_n") <= maxBlock)
    val big = tagged.filter(col("block_n") > maxBlock)
    val a = small.select(col("doc_id").as("doc_a"), col("source"),
      col("sh").as("shh_a"))
    val b = small.select(col("doc_id").as("doc_b"),
      col("source").as("source_b"), col("sh").as("shh_b"))
    val exactPairs = a
      .join(b, col("source") === col("source_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shh_a"), col("shh_b"))
    // Oversized blocks: LSH banding keyed by (source, band, bucket) —
    // candidates never cross a block boundary, and the bucket cap
    // bounds boilerplate inside the block too.
    // assertExact like the minhash/simhash routes: the ngram oracle
    // is exact all-pairs, so a capped (overflowing) bucket must log
    // its loss loudly, never drop pairs silently
    val lshPairs = lshCandidates(
        big.select(col("doc_id"), col("source").as("block"), col("sh")),
        MaxBucket, assertExact = true, site = "ngramJaccard")
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("shh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shh_a"), col("shh_b"))
    exactPairs.union(lshPairs)
      .withColumn("j", call_function("graft_jaccard_sorted",
        col("shh_a"), col("shh_b")))
      .filter(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("j"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact all-pairs is tractable to ~2k docs/block (≤ 2M compares);
    * beyond that the LSH route wins on any hardware. */
  private val MaxBlock = 2000

  /** A band bucket with more than this many docs is boilerplate
    * territory: cap its candidate generation via representatives. */
  private val MaxBucket = 64

  private val NumHashes = 128
  private val Bands = 32
  private val RowsPerBand = NumHashes / Bands

  /** MinHash signatures + LSH banding over the *whole* corpus, then
    * exact-Jaccard verification of the candidates — the standard
    * 100 TB near-dup pipeline:
    *   1. 128 minhashes per doc in ONE map-side projection over the
    *      shingle array (no explode, no groupBy — signature building
    *      is a zero-shuffle scan);
    *   2. band → bucket join: only docs sharing a band bucket are
    *      compared (≈ pairs with J ≥ τ, P[miss] < 1e-7 at J=0.8 with
    *      32 bands × 4 rows);
    *   3. exact verify on the candidate set only.
    * Skew note: a pathological bucket (boilerplate) IS bounded —
    * [[lshCandidates]] caps each band bucket at [[MaxBucket]]
    * representatives, so a b-doc bucket yields O(b·cap) candidate
    * pairs, never b². */
  private val minhashLsh: Q = (s, d) => {
    // persisted: the candidate-verify joins consume sh twice beyond
    // the signature build — unpersisted, the full-corpus shingle
    // kernel would re-run once PER consumer
    val sh = OpCache.swap("minhashLsh.sh", shingled(s, d, minTokens = 3))
    val candidates = lshCandidates(
      sh.select(col("doc_id"), lit("").as("block"), col("sh")), MaxBucket,
      assertExact = true, site = "minhashLsh")
    val withSets = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    withSets
      .withColumn("j", call_function("graft_jaccard_sorted",
        col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("j"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** LSH candidate pairs with an enforced bucket cap, from a
    * `(doc_id, block, sh)` relation (`block` scopes candidates — a
    * constant for whole-corpus dedup, `source` for blocked dedup).
    *
    * Map-side signatures: 128 minhashes per doc computed in one
    * projection over the shingle array — no explode, no groupBy, so
    * signature building is a zero-shuffle scan producing 1 KB/doc
    * regardless of document size. The banded relation is persisted
    * per invocation ([[OpCache]] — one live entry per call site), so
    * the rep election, the overflow check's eager action, and the
    * member-side join all read ONE computed copy of the signatures —
    * the explicit between-stage checkpoint a 100 TB deployment of
    * this pipeline would run anyway.
    *
    * Bucket cap: a self-join of a b-doc band bucket emits b²
    * candidate pairs — a single boilerplate bucket (every page's
    * cookie banner) turns the candidate step quadratic at web scale.
    * Instead, each bucket elects its `maxBucket` LOWEST doc_ids as
    * representatives via a SALTED two-level rank (stage 1 ranks
    * within (bucket, salt) — parallel bounded sorts whose outputs
    * are ≤ cap rows each; stage 2 ranks the ≤ RepSalt·cap survivors
    * — input bounded by construction, so no window ever sorts a full
    * boilerplate bucket in one task), and candidates are
    * (rep, member) pairs: O(b·cap) per bucket. For buckets ≤ cap
    * every member is a representative, which is exactly the
    * all-pairs self-join — the cap changes NOTHING until a bucket
    * actually overflows. For an OVERFLOWING bucket the emitted pair
    * LIST is intentionally partial — a pair of non-representatives
    * sharing only that bucket is not generated — which is the cap's
    * explicit trade: the preserved guarantee is CLUSTER CONNECTIVITY
    * (every member pairs with the shared reps, so a true dup cluster
    * bigger than the cap still lands in one connected component for
    * [[components]]-level dedup), not pair-level completeness inside
    * boilerplate buckets. At web scale partial pair lists inside
    * boilerplate buckets are the intended behavior; a query whose
    * oracle is EXACT passes `assertExact = true`, which CHECKS at
    * runtime (one tiny count over 8-byte band keys) whether any
    * bucket overflowed on this corpus — zero overflow proves the
    * capped output identical to all-pairs where the oracle runs;
    * overflow logs the loss loudly and continues capped
    * ([[checkBucketOverflow]]). */
  private[graft] def lshCandidates(shBlocks: DataFrame,
      maxBucket: Int, assertExact: Boolean = false,
      site: String = "lshCandidates"): DataFrame = {
    val sigs = shBlocks.select(col("doc_id"), col("block"),
      call_function("graft_minhash128_long", col("sh")).as("sig"))
    // cache key is the CALLER's site: two operators sharing this
    // helper must not evict each other's persisted signatures
    val bands = OpCache.swap(site,
      sigs.select(col("doc_id"), col("block"), explode(expr(
        s"""transform(sequence(0, ${Bands - 1}), b -> named_struct(
           |  'band', b,
           |  'bh', xxhash64(slice(sig, b * $RowsPerBand + 1, $RowsPerBand))))"""
          .stripMargin)).as("bb"))
        .select(col("doc_id"), col("block"),
          col("bb.band").as("band"), col("bb.bh").as("bh")))
    val reps = cappedElection(bands, site,
        Seq(col("block"), col("band"), col("bh")),
        Seq(col("doc_id").asc), maxBucket, col("doc_id"), assertExact)
      .select(col("block").as("r_block"), col("band").as("r_band"),
        col("bh").as("r_bh"), col("doc_id").as("rep"))
    bands.join(reps,
        col("block") === col("r_block") && col("band") === col("r_band") &&
          col("bh") === col("r_bh") && col("rep") < col("doc_id"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** Runtime check that the capped candidate path lost nothing on
    * THIS corpus: when no band bucket exceeds `maxBucket`, the capped
    * output is provably identical to all-pairs (the cap changes
    * nothing below the cap), which is what makes the exact DuckDB
    * oracles sound where they run. An overflow LOGS — loudly, with
    * the bucket count and worst size — and the query continues with
    * the capped pair list: buckets necessarily outgrow any fixed cap
    * as the corpus grows (simhash band values are only 16 bits, so
    * occupancy rises linearly even without boilerplate), and a
    * hard failure would brick every at-scale run to defend an oracle
    * that only executes at small scale. The capped list's preserved
    * guarantee is cluster connectivity through shared reps — the
    * documented web-scale contract of [[lshCandidates]]. Returns the
    * number of overflowing buckets so specs can pin both regimes.
    * Cost: near zero — the stats are DERIVED from the rep election
    * itself ([[graft.functions.SaltedRank.topKPerGroupSized]] carries
    * each bucket's exact total through its own two window jobs), so
    * this is one filtered scan of the ≤cap-per-bucket rep relation,
    * not a second aggregate over the full bands relation (the
    * round-6 bench cost this replaces). */
  private def checkBucketOverflow(reps: DataFrame, rank: String,
      total: String, maxBucket: Int, what: String): Long = {
    val row = reps.filter(col(rank) === 1 && col(total) > maxBucket)
      .agg(count(lit(1)).as("over"), max(col(total)).as("worst")).head()
    val over = row.getLong(0)
    if (over > 0)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"$what: $over band buckets exceed $maxBucket docs " +
          s"(worst ${row.get(1)}); the pair list is capped to " +
          "representatives in those buckets (cluster connectivity " +
          "preserved, pair-level completeness not) — the exact-oracle " +
          "contract holds only on corpora with zero overflow")
    over
  }

  /** One live cached relation per (SparkSession, operator call-site):
    * [[swap]] persists the new invocation's hot relation
    * (MEMORY_AND_DISK) and unpersists the previous invocation's, so
    * repeated query runs (Verify, bench reps) hold at most ONE cache
    * entry per site instead of leaking one per invocation. The cache
    * exists because the capped-candidate queries consume their
    * band/scored relation from several subplans (the rep election,
    * the eager overflow check, the member-side join) and Spark
    * computes an unpersisted common subplan once PER consumer — at
    * 100 TB this persist is the explicit between-stage checkpoint of
    * the signature relation.
    *
    * Keying by session keeps independent SparkSessions in one JVM
    * (parallel test suites, a notebook server) from evicting each
    * other's in-flight cache; entries of STOPPED sessions are swept
    * on every swap, so the map never pins a dead session or its
    * blocks past the next dedup invocation. Within one session the
    * one-computed-copy guarantee is per call-site: two concurrent
    * invocations of the SAME operator in the SAME session may evict
    * each other mid-flight — results stay correct (an evicted
    * relation recomputes), the guarantee is just not concurrent,
    * which matches the one-query-at-a-time driver contract. */
  private object OpCache {
    private val live =
      scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
    def swap(key: String, df: DataFrame): DataFrame = {
      val session = df.sparkSession
      live.keys.filter(_._1.sparkContext.isStopped)
        .foreach(k => live.remove(k))
      // Unpersist BEFORE persisting: the CacheManager keys entries by
      // normalized plan, so a re-invocation with an identical plan
      // (bench reps) would otherwise share the old entry and the
      // deferred unpersist would silently evict the new cache too.
      live.remove((session, key)).foreach(old =>
        scala.util.Try(old.unpersist(blocking = false)))
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // put returns the value a concurrent swap raced in — unpersist
      // it, or the loser's blocks stay pinned until session stop.
      live.put((session, key), cached).foreach(prev =>
        if (prev ne cached)
          scala.util.Try(prev.unpersist(blocking = false)))
      cached
    }
  }

  /** The shared capped-representative election: top-`cap` rows per
    * key group by `order`, elected via the salted rank, PERSISTED
    * (the eager overflow check and the downstream candidate join both
    * consume it — one computed copy), with the overflow stats derived
    * from the election's own carried group totals when `assertExact`.
    * Returns the rep relation with the bookkeeping columns dropped. */
  private def cappedElection(relation: DataFrame, site: String,
      keys: Seq[Column], order: Seq[Column], cap: Int, saltOn: Column,
      assertExact: Boolean): DataFrame = {
    val (elected0, rank, total) = graft.functions.SaltedRank.topKPerGroupSized(
      relation, keys, order, cap, saltOn, RepSalt)
    val elected = OpCache.swap(s"$site.reps", elected0)
    if (assertExact) checkBucketOverflow(elected, rank, total, cap, site)
    elected.drop(rank, total)
  }

  /** Stage-1 fanout of the rep selection. */
  private val RepSalt = 16

  /** SimHash near-dup: 64-bit sketch per doc (map-side only), then
    * 16-bit-band LSH join and hamming ≤ 3 verification. By
    * pigeonhole, hamming ≤ 3 over 4 bands guarantees ≥ 1 identical
    * band, so banding loses nothing — the oracle is therefore the
    * brute-force hamming join over DuckDB's bit-exact FNV-1a
    * reproduction of the same sketch (bit-exact on ASCII text: the
    * kernel folds UTF-8 BYTES while the oracle folds code points —
    * identical below 0x80, divergent beyond, same caveat as
    * polyFingerprint; the test corpus is ASCII); PipelineSpec
    * additionally pins banded == brute in Spark.
    *
    * The band join is CAPPED like [[lshCandidates]]: each (band, bv)
    * bucket elects its [[MaxBucket]] lowest doc_ids as reps via the
    * salted rank and candidates are (rep, member) pairs — a
    * boilerplate cluster of b identical sketches emits O(4·b·cap)
    * rows, never the ~4·b² of a raw self-join (the round-5 verdict's
    * remaining quadratic cliff). Buckets ≤ cap are unchanged
    * (every member is a rep = all pairs); overflowing buckets trade
    * pair completeness for cluster connectivity exactly as minhash
    * does, and the exact-oracle invariant is runtime-checked (zero
    * overflow proven where the oracle runs, logged loss beyond) by
    * [[checkBucketOverflow]] — simhash reaches overflow earlier than
    * minhash because its band values are 16-bit, so bucket occupancy
    * grows linearly with corpus size even without boilerplate. */
  private val simhash: Q = (s, d) => {
    // Same non-nullable kernel contract as [[shingled]]: null texts
    // filtered at the scan, coalesce makes `sim` non-nullable so the
    // band join infers no isnotnull(<kernel>) filter (which would
    // re-evaluate the kernel per row per branch).
    val docs = Tables.parallel(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        call_function("graft_simhash64",
          graft.functions.TextFunctions.tokens(coalesce(col("text"), lit(""))))
          .as("sim"))
    simhashPairs(docs, MaxBucket, assertExact = true)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Capped banded hamming-≤3 pairs from a `(doc_id, sim)` relation;
    * see [[simhash]] for the cap semantics. */
  private[graft] def simhashPairs(docs: DataFrame, maxBucket: Int,
      assertExact: Boolean = false): DataFrame = {
    val bands = OpCache.swap("simhashPairs",
      docs.select(col("doc_id"), col("sim"),
        explode(expr(
          """transform(sequence(0, 3), b ->
            |  struct(b AS band, (shiftright(sim, b * 16) & 65535) AS bv))"""
            .stripMargin)).as("bb"))
        .select(col("doc_id"), col("sim"), col("bb.band").as("band"),
          col("bb.bv").as("bv")))
    val reps = cappedElection(bands, "simhashPairs",
        Seq(col("band"), col("bv")),
        Seq(col("doc_id").asc), maxBucket, col("doc_id"), assertExact)
      .select(col("band").as("r_band"), col("bv").as("r_bv"),
        col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    bands.join(reps,
        col("band") === col("r_band") && col("bv") === col("r_bv") &&
          col("doc_a") < col("doc_id"))
      .select(col("doc_a"), col("doc_id").as("doc_b"),
        col("sim_a"), col("sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The embeddings corpus with precomputed norms. */
  private def embCorpus(s: SparkSession, d: String): DataFrame =
    Tables.parallel(Tables.embeddings(s, d))
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", l2norm(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("nrm"))

  /** Ordered same-label pairs with cosine >= `tau` — the IVF-cell-
    * blocked near-dup join [[embedding]] and [[components]] share
    * (norms precomputed, label equi-join, a < b dedup). */
  private def cosinePairs(e: DataFrame, tau: Double): DataFrame = {
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"))
  }

  private val embedding: Q = (s, d) =>
    cosinePairs(embCorpus(s, d), 0.4).orderBy(col("vec_a"), col("vec_b"))

  private val SemTau = 0.4

  /** SemDeDup-style semantic dedup: [[embedding]] only DETECTS
    * near-dup pairs; this applies the keep policy. Within each
    * cluster (`label` — the pluggable coarse-quantizer cell; the
    * trained version of the quantizer is ann_ivf_kmeans), score every
    * vector by cosine to the decimal-exact cluster centroid, and DROP
    * a vector iff a MORE CENTRAL one (higher centroid-cosine, ties to
    * the lower vec_id) sits within τ of it — per near-dup
    * neighborhood, the most representative member survives. No Lloyd
    * rounds (cluster ids are given), so unlike the trained ANN tiers
    * this keeps a full row-level oracle.
    *
    * Scale shape: the pairwise join is cluster-blocked, and the
    * block size is ENFORCED, not assumed: the dropper (b) side of the
    * join is capped at `cap` most-central members per cell, elected
    * by the same salted rank as the LSH bucket reps, so one hot
    * quantizer cell costs O(cell·cap) join rows, never cell². The
    * cap is EXACT below itself — the drop rule only ever drops a
    * vector because of a MORE CENTRAL one, and the elected reps are
    * precisely the cell's top-`cap` by (centrality, id), so for cells
    * ≤ cap the capped join is literally the full join (which is what
    * keeps the row-level oracle sound where it runs; the overflow
    * check proves that on every oracle corpus). For an OVERSIZED cell
    * the trade is the documented one: a vector is dropped only if one
    * of the cap most-central neighbors covers it — the keep-policy
    * semantics (most-representative member survives) hold for every
    * emitted verdict. The centroid relation is one row per cluster,
    * broadcast; one shuffle for the means, one for the (capped)
    * self-join. */
  private val semantic: Q = (s, d) =>
    semanticKept(embCorpus(s, d), SemTau, MaxBucket, assertExact = true)
      .orderBy(col("vec_id"))

  /** `(vec_id, label, kept)` verdicts for a `(vec_id, label, v, nrm)`
    * corpus; see [[semantic]] for the cap semantics. */
  private[graft] def semanticKept(e: DataFrame, tau: Double, cap: Int,
      assertExact: Boolean = false): DataFrame = {
    // decimal-exact per-cluster centroid (shuffle-order-independent,
    // so the oracle reproduces it bit-identically)
    val cent = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("decimal(28,18)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, s -> s.m)").as("c_v"))
      .withColumn("c_nrm", l2norm(col("c_v")))
    val scored = OpCache.swap("semanticKept",
      e.join(broadcast(cent), Seq("label"))
        .withColumn("c_cos",
          cosine(col("v"), col("c_v"), col("nrm"), col("c_nrm")))
        .select(col("vec_id"), col("label"), col("v"), col("nrm"),
          col("c_cos")))
    // Dropper side: the cell's `cap` most-central members. The
    // election order IS the drop rule's centrality order, so every
    // non-elected member ranks below every rep — capping loses only
    // "dropped by a non-top-cap neighbor" events in oversized cells.
    val b = cappedElection(scored, "semanticKept",
        Seq(col("label")), Seq(col("c_cos").desc, col("vec_id").asc),
        cap, col("vec_id"), assertExact)
      .select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("v").as("b_v"), col("nrm").as("b_nrm"),
        col("c_cos").as("b_ccos"))
    val dropped = scored.join(b,
        col("label") === col("b_label") && col("vec_id") =!= col("b_id") &&
          (col("b_ccos") > col("c_cos") ||
            (col("b_ccos") === col("c_cos") && col("b_id") < col("vec_id"))))
      .filter(cosine(col("v"), col("b_v"), col("nrm"), col("b_nrm")) >= tau)
      .select(col("vec_id")).distinct()
      .withColumn("drop", lit(true))
    // c_cos stays internal: its last ULP differs from DuckDB's
    // accumulation order, so only the verdict (which agrees — the
    // compared values are far apart relative to 1 ULP) is output
    scored.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("drop").isNull.as("kept"))
  }

  /** Benchmark decontamination — the training-corpus hygiene step
    * every LLM pipeline runs: drop (here: count) corpus documents that
    * share any 8-token n-gram with a held-out benchmark set (the
    * standard n-gram-overlap decontamination rule). `source = 'src0'`
    * stands in for the benchmark partition.
    *
    * Scale shape: grams are xxhash64'd in the same projection that
    * builds them, so every shuffle key is 8 bytes, never text; the
    * benchmark gram set (eval suites are tiny next to a 100 TB corpus)
    * is broadcast, so the contamination probe adds zero shuffles to
    * the corpus side beyond the doc_id distinct. A 64-bit gram-hash
    * collision could over-flag one doc (P ≈ n²/2⁶⁴); acceptable for a
    * filter whose false-positive cost is dropping one document. */
  private val decontaminate: Q = (s, d) => {
    val docs = Tables.parallel(Tables.documents(s, d))
    // persisted: bench + probe sides both consume the explosion
    val grams = OpCache.swap("decontaminate.grams",
      docs.select(col("doc_id"), col("source"),
        explode(wordNgrams(coalesce(col("text"), lit("")), 8)).as("g"))
        .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh")))
    val bench = grams.filter(col("source") === "src0")
      .select(col("gh")).distinct()
    val contaminated = grams.filter(col("source") =!= "src0")
      .join(broadcast(bench), "gh")
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(1))
    docs.filter(col("source") =!= "src0")
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_contaminated"))
      .orderBy(col("source"))
  }

  /** Decontamination via a broadcast BLOOM FILTER — the shape that
    * wins when even the benchmark's distinct-gram set is too big to
    * broadcast as a join relation: the driver builds a 64 KB bitset
    * from the benchmark grams (4 probes/element — the reference set
    * is small by definition; the CORPUS never collects) and the
    * corpus side becomes a pure map-side `graft_bloom_contains`
    * filter — no shuffle, no join, each gram tests 4 bits. Bloom
    * candidates are then verified EXACTLY (join against the true
    * gram set, candidates only), the same verify-after-sketch
    * discipline as minhash→Jaccard. The decision row proves the
    * sketch contract: zero false negatives (structural bloom
    * property), false-positive docs within 1% of the corpus, and the
    * exact contaminated count for the oracle. */
  private val bloomDecontaminate: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.parallel(Tables.documents(s, d))
    // persisted: the decision row consumes the explosion ~6 ways
    // (driver collect, flags, exact×2, FP probe×2) — unpersisted,
    // the corpus is tokenized+exploded once PER consumer
    val grams = OpCache.swap("bloomDecontaminate.grams",
      docs.select(col("doc_id"), col("source"),
        explode(wordNgrams(coalesce(col("text"), lit("")), 8)).as("g"))
        .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh")))
    val benchHashes = grams.filter(col("source") === "src0")
      .select(col("gh")).distinct().as[Long].collect()
    // sized from the reference set: 16 bits/element (FP ≈ 0.24% per
    // gram at 4 probes) with a 64 KB floor — a fixed size would let
    // the per-gram FP rate explode as the benchmark grows
    val bloom = new Array[Byte](
      math.max(64 * 1024, benchHashes.length * 2))
    benchHashes.foreach(h =>
      graft.functions.NativeKernels.bloomAdd(bloom, h))
    // The bitset travels as a BROADCAST, not a plan literal: the
    // expression serializes a handle, executors fetch the blocks once
    // per JVM. A `lit(bloom)` would re-ship the bitset inside every
    // task binary and bake it into the plan fingerprint — at the 10⁸-
    // gram scale this operator exists for, that is a ~200 MB literal.
    val bloomBc = s.sparkContext.broadcast(bloom)
    def bloomHit(c: Column): Column =
      org.apache.spark.sql.GraftSqlBridge.columnOf(
        graft.functions.NativeExprs.BloomBroadcastContains(bloomBc,
          org.apache.spark.sql.GraftSqlBridge.expressionOf(c)))
    val flagged = grams.filter(col("source") =!= "src0")
      .filter(bloomHit(col("gh")))
      .select(col("doc_id")).distinct()
    // The exact overlap both yields the decision row's n_exact and
    // proves the zero-false-negative property against the flags. In
    // production this join runs over the bloom CANDIDATES only (the
    // map-side filter's whole point); here it must cover the full
    // corpus because the decision row REPORTS the true count.
    val bench = grams.filter(col("source") === "src0")
      .select(col("gh")).distinct()
    val exact = grams.filter(col("source") =!= "src0")
      .join(broadcast(bench), "gh").select(col("doc_id")).distinct()
    val missed = exact.join(flagged, Seq("doc_id"), "left_anti")
    // FP bound is PER GRAM — the unit the filter is actually sized in
    // (16 bits/element ⇒ ~0.24% FP per probe; 0.5% leaves 2× slack).
    // A per-DOC bound is not scale-invariant: a doc with g grams is
    // falsely flagged with probability ≈ g·0.24%, so any corpus of
    // ≥5-gram docs would blow a 1%-of-docs bound the moment the
    // reference set outgrows the 64 KB floor that hides the effect at
    // test scale.
    val corpusGh = grams.filter(col("source") =!= "src0")
      .select(col("gh")).distinct()
    val fpGrams = corpusGh.join(broadcast(bench), Seq("gh"), "left_anti")
      .filter(bloomHit(col("gh")))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
      .crossJoin(fpGrams.agg(count(lit(1)).as("n_fp_grams")))
      .crossJoin(corpusGh.agg(count(lit(1)).as("n_grams")))
      .select(col("n_exact"),
        (col("n_missed") === 0).as("no_false_negatives"),
        (col("n_fp_grams").cast("double") <=
          col("n_grams").cast("double") * 0.005).as("fp_bounded"))
  }

  /** Connected components over a near-duplicate graph — the step
    * after pair generation in a real dedup pipeline (keep one doc per
    * *cluster*, not per pair). Alternating LARGE-STAR / SMALL-STAR
    * contraction (the canonical MapReduce CC — Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond"): each round
    * rewires every vertex's neighbors onto its neighborhood minimum,
    * so the edge set itself contracts toward stars centered on
    * component minima in O(log² n) rounds. Plain min-label
    * propagation needs O(diameter) rounds and chain-shaped near-dup
    * clusters at sf0.1 took it 18+; star contraction converges in a
    * handful, and — unlike label propagation — the data VOLUME
    * shrinks every round too.
    *
    * Every round ends in `localCheckpoint()`: without lineage
    * truncation each round's plan nests all previous rounds, and
    * analyzer/AQE recompilation plus accumulated broadcasts exhaust
    * the driver heap long before the data does (observed OOM at
    * 2000 vertices). A cluster deployment would use a reliable
    * `checkpoint()` dir instead. The driver loop reads only a
    * (count, hash) convergence pair per round.
    * Component id = min vertex id, so output is deterministic and
    * SQL-oracle-able (recursive CTE). */
  def componentLabels(vertices: DataFrame, edges: DataFrame): DataFrame = {
    // One star round: connect the chosen side of every neighborhood
    // to m(u) = min(N(u) ∪ {u}). large: strictly larger neighbors;
    // small: smaller neighbors plus u itself.
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val d = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val m = d.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val dm = d.join(m, "u")
      val rewired =
        if (large) dm.filter(col("v") > col("u"))
          .select(col("v").as("x"), col("m").as("y"))
        else dm.filter(col("v") < col("u"))
          .select(col("v").as("x"), col("m").as("y"))
          .union(m.select(col("u").as("x"), col("m").as("y")))
      rewired.filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct()
    }
    var e = edges.select(
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // canonical undirected; cuts pair-gen lineage
    var rounds = 0
    var stable = false
    while (!stable) {
      rounds += 1
      require(rounds <= 40, "componentLabels failed to converge")
      e = star(star(e, large = true), large = false).localCheckpoint()
      // Fixpoint test WITHOUT another contraction (round 19, FIXED in
      // round 20): the loop previously compared (count, hash)
      // signatures across rounds, which pays one extra full
      // double-star round just to OBSERVE the fixpoint. e is a
      // fixpoint iff it is a disjoint union of MIN-ROOTED STARS, i.e.
      //  (1) no vertex appears on both the a (root, canonical min)
      //      and b (member) side, AND
      //  (2) every member carries exactly ONE root.
      // Round 19 tested (1) alone, which is NOT sufficient (advice
      // r19): edges {(1,5),(1,6),(2,5),(2,7)} have disjoint sides yet
      // member 5 carries two roots — stopping there splits the
      // component {1,2,5,6,7} into {1,5,6}/{2,7}. With both
      // conditions, e is a union of stars (root < members by the
      // a < b canonicalization), each star is mapped to itself by
      // both star rounds (a genuine fixpoint), and since every
      // contraction round preserves connectivity the stars ARE the
      // components. Both conditions in ONE aggregation pass: tag each
      // directed appearance (root side r = null, member side r = its
      // root), group by vertex, violation = root-and-member or
      // two distinct roots.
      val rType = e.schema("a").dataType
      stable = e.select(col("a").as("v"), lit(null).cast(rType).as("r"))
        .union(e.select(col("b").as("v"), col("a").as("r")))
        .groupBy(col("v"))
        .agg(max(col("r").isNull).as("isRoot"),
          min(col("r")).as("rLo"), max(col("r")).as("rHi"))
        .filter((col("isRoot") && col("rHi").isNotNull) ||
          col("rLo") =!= col("rHi"))
        .isEmpty
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round=$rounds stable=$stable " +
          s"t=${System.nanoTime() / 1e9}")
    }
    // At the star fixpoint every remaining edge is (member, root), so
    // a vertex's component is its min neighbor (or itself if isolated).
    val nbr = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
      .groupBy(col("u")).agg(min(col("v")).as("mn"))
    vertices.join(nbr, col("id") === col("u"), "left")
      .select(col("id"),
        least(col("id"), coalesce(col("mn"), col("id"))).as("comp"))
  }

  /** Near-dup clusters over the embedding-cosine graph (τ = 0.3,
    * blocked by `label` like [[embedding]]). */
  private val components: Q = (s, d) => {
    val e = embCorpus(s, d)
    val pairs = cosinePairs(e, 0.3)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    componentLabels(e.select(col("vec_id").as("id")), pairs)
      .select(col("id").as("vec_id"), col("comp").cast("bigint").as("component"))
      .orderBy(col("vec_id"))
  }

  /** The canonical preprocessing funnel as ONE declarative plan:
    * exact-dedup (keep first) → quality gate (≥ 20 tokens) →
    * per-source corpus stats, in exactly two shuffles. Keep-first
    * partitions the window by `xxhash64(text)` — an 8-byte shuffle/
    * sort key instead of the document body — and keeps a row when the
    * previous row in (text, doc_id) order has *different* text, which
    * is min-doc_id-per-distinct-text even when two texts collide into
    * one hash group. Full-text compares only happen between rows whose
    * 64-bit hashes already tie. */
  private val cleanCorpus: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("text").asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("h", xxhash64(col("text")))
      .withColumn("prev_text", lag(col("text"), 1).over(w))
      .filter(col("prev_text").isNull || col("prev_text") =!= col("text"))
      .withColumn("ntok", size(tokens(col("text"))))
      .filter(col("ntok") >= 20)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
      .orderBy(col("source"))
  }

  /** Sequence packing — the GPT-pretraining "concat and chunk" step:
    * documents are concatenated in doc_id order within each `source`
    * shard and split into fixed 2048-token context windows; each doc
    * reports its token offset and the window span it lands in.
    * Packing is per-shard by design (that's how sharded dataloaders
    * consume it), so the prefix sum parallelizes across sources —
    * one shuffle on `source`, no global ordering bottleneck at
    * 100 TB. All arithmetic is integer (DIV), so the oracle is
    * bit-exact. */
  private val pack: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .withColumn("ntok", size(tokens(col("text"))))
      .withColumn("start_tok",
        coalesce(sum(col("ntok")).over(w), lit(0L)).cast("bigint"))
      .select(col("doc_id"), col("source"), col("ntok"), col("start_tok"),
        expr("start_tok DIV 2048").as("first_window"),
        expr("(start_tok + greatest(ntok, 1) - 1) DIV 2048").as("last_window"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic ~30% sample per document: keep rows whose content
    * hash's first hex byte sorts below 0x4d. Hash-based sampling is
    * the 100 TB method — `rand()` gives different rows on task retry
    * or speculative execution; a content hash gives the same sample
    * on every run, every engine, every retry. */
  private val stratifiedSample: Q = (s, d) =>
    Tables.documents(s, d)
      // concat_ws silently SKIPS nulls while the oracle's `||`
      // null-propagates — exclude null-source rows explicitly so both
      // engines agree on any corpus, not just this one
      .filter(col("source").isNotNull)
      .filter(substring(md5(concat_ws("|", col("source"),
        col("doc_id").cast("string"))), 1, 2) < "4d")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("source"))

  /** Training-mixture sampling — the data-mixing step of a pretraining
    * pipeline ("2.5 epochs of books, half of web, a quarter of the
    * rest"): each document materializes `floor(w)` copies plus one
    * more when its content hash falls under the fractional weight.
    * Entirely map-side (hash, CASE, explode are row-local; the only
    * shuffle is the reporting aggregate — in a real pipeline the
    * exploded rows stream straight to the writer), and hash-based so
    * the mixture is identical on every run, retry, and engine —
    * which is what makes the DuckDB oracle exact. Weights live in a
    * literal CASE: at 100 TB a mixture config is metadata, never a
    * join. */
  private val mix: Q = (s, d) => {
    val h4 = substring(md5(concat_ws("|", col("source"),
      col("doc_id").cast("string"))), 1, 4)
    def frac(threshold: String) = when(h4 < threshold, 1).otherwise(0)
    val copies =
      when(col("source") === "src0", lit(2) + frac("8000")) // w = 2.5
        .when(col("source") === "src1", lit(1))             // w = 1.0
        .when(col("source") === "src2", frac("8000"))       // w = 0.5
        .otherwise(frac("4000"))                            // w = 0.25
    Tables.documents(s, d)
      .filter(col("source").isNotNull) // match the oracle's null `||`
      .withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("n_copies"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("source"))
  }

  /** Deterministic training-order shuffle — the last step before a
    * dataloader sees the corpus: each document hashes to a shard and
    * a within-shard sort key, giving a reproducible global
    * permutation without a global sort. Positions are per-shard
    * (that is how sharded loaders consume data), so the only wide
    * operation is one hash-partitioned window per shard — no
    * single-partition global ORDER BY bottleneck at 100 TB. Hash is
    * md5 (engine-portable), salted by an epoch tag so re-shuffling
    * per epoch is a literal change, and retry/speculation-safe
    * (unlike rand()). */
  private val shuffleQ: Q = (s, d) => {
    val key = md5(concat_ws("|",
      col("doc_id").cast("string"), lit("epoch0")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), key.as("key"))
      .withColumn("shard", ascii(substring(col("key"), 1, 1)) % 4)
      .withColumn("position", row_number().over(w).cast("bigint"))
      .select(col("shard"), col("position"), col("doc_id"))
      .orderBy(col("shard"), col("position"))
  }

  /** Per-source document cap (RefinedWeb-style corpus shaping): keep
    * the [[SourceCap]] highest-quality docs per source, quality being
    * the text_quality composite score, ties to the lowest doc_id.
    * Selection is [[graft.functions.SaltedRank.topKPerGroupRanked]]:
    * stage 1 ranks within (source, salt) — parallel bounded sorts of
    * ≤ cap survivors each — and stage 2 ranks the ≤ fanout·cap
    * survivors, so a 10-billion-doc source never funnels through one
    * task the way a plain rank-window cap would, and the whole plan
    * stays codegen'd windows. (A typed TopKAggregator computes the
    * same cut but pays the object-aggregation/ExpressionEncoder plan
    * constant on the FULL corpus path — the exact cost profiled and
    * purged from LSH rep election in round 5; the aggregator remains
    * right only post-pruning on bounded inputs, see
    * [[graft.ann.Ann]].) */
  private val SourceCap = 15
  private val sourceCapQ: Q = (s, d) => {
    val inList = Seq("the", "a", "of", "and", "to")
      .map(w => s"'$w'").mkString(", ")
    val scored = Tables.documents(s, d)
      // degenerate-input guard (same class as shingled()'s minTokens):
      // a 0-token doc scores 0/0 = NaN, which DuckDB ranks FIRST and
      // Spark's ordering ranks LAST — silent divergence. Excluding
      // NULL/empty text on BOTH sides keeps the engines aligned
      // (latent on this min-10-token corpus, real on any other).
      .filter(col("text").isNotNull)
      .withColumn("w", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("w")) >= 1)
      .withColumn("n_tokens", size(col("w")))
      .withColumn("n_stop",
        size(expr(s"filter(w, t -> t IN ($inList))")))
      .select(col("source"), col("doc_id"),
        (col("n_stop").cast("double") / col("n_tokens").cast("double") * 0.5 +
          least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.5)
          .as("q"))
    val (top, rankCol) = graft.functions.SaltedRank.topKPerGroupRanked(
      scored, Seq(col("source")),
      Seq(col("q").desc, col("doc_id").asc), SourceCap,
      col("doc_id"), RepSalt)
    top.select(col("source"), col("doc_id"), col(rankCol).as("rank"))
      .orderBy(col("source"), col("rank"))
  }

  private val TokenBudget = 1000L
  private val BudgetBuckets = 1024

  /** Per-source TOKEN-budget curation (the "data budget" shape:
    * every training mix fixes tokens per source, not documents):
    * greedy by quality — order docs by (score desc, doc_id asc) and
    * keep while the running token total stays ≤ B. The naive plan is
    * a full-corpus prefix-sum window partitioned only by `source` —
    * the per-source single-task sort this codebase keeps purging —
    * so the selection runs as a HISTOGRAM CUT instead, exact and
    * scale-safe:
    *
    *  1. map-side: quantize each doc's score into one of
    *     [[BudgetBuckets]] buckets; aggregate token sums per
    *     (source, bucket) — a bounded relation (≤ sources×buckets);
    *  2. prefix-sum token mass over the DESCENDING buckets (window
    *     over ≤ [[BudgetBuckets]] rows per source — bounded, free)
    *     and find the boundary bucket where the budget crosses;
    *  3. docs in better buckets keep outright; docs in worse buckets
    *     drop; ONLY the boundary bucket's docs (≈ corpus/buckets —
    *     a heavy score-tie mass degrades this, the same caveat as any
    *     equi-bucketed cut) pay an exact ranked prefix sum against
    *     the leftover budget.
    *
    * The kept SET is bit-identical to the naive global greedy (the
    * oracle replays exactly that with one SUM OVER), but no stage
    * sorts more than a bucket. */
  /** BPE-DENOMINATED token budget (`pipeline_bpe_budget`): the
    * budget [[tokenBudgetQ]] cuts in chars/4 proxy tokens, cut in
    * REAL trained-tokenizer tokens — what an LLM data mix actually
    * buys. Train the corpus BPE (the bounded-vocabulary driver fold
    * shared with `text_bpe`), count each doc's tokens with the
    * native `graft_bpe_tokens` expression (one map-side pass, no
    * shuffle of text), then greedy-keep by quality until the budget
    * is spent — the same histogram-cut shape as [[tokenBudgetQ]]
    * (bounded bucket aggregate + one ranked prefix over ONLY the
    * boundary bucket), so no global sort of the corpus exists at
    * any scale. The kept set depends on the trained artifact, so —
    * like `text_bpe` — the output is a decision row whose laws
    * (fits, greedy-maximal, non-trivial) are require()d in-query and
    * whose SQL-computable facts the oracle replays. */
  private val bpeBudgetQ: Q = (s, d) => {
    val BpeBudget = 4000L
    val W = org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(expr("filter(w, t -> t != '')")) >= 1)
    // shared trained-artifact path with text_bpe (vocab fold, merges,
    // and the NUL merge-literal contract live in ONE place)
    val mergeLits = graft.text.TextAnalysis.corpusBpeMergeLits(docs)
    val scored = docs
      .withColumn("tok", size(call_function("graft_bpe_tokens",
        col("text"), array(mergeLits.map(lit): _*))).cast("long"))
      .withColumn("q", qualityCol)
      .select(col("doc_id"), col("tok"), col("q"),
        least(floor(col("q") * BudgetBuckets),
          lit(BudgetBuckets - 1)).cast("int").as("bkt"))
    val cached = OpCache.swap("bpe_budget_scored", scored)
    val hist = cached.groupBy(col("bkt"))
      .agg(sum(col("tok")).as("btok"))
      .withColumn("cum_incl", sum(col("btok")).over(
        W.orderBy(col("bkt").desc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
    val cut = hist.filter(col("cum_incl") > BpeBudget)
      .agg(max(struct(col("bkt"),
        (col("cum_incl") - col("btok")).as("cum_before"))).as("c"))
      .select(col("c.bkt").as("cut_bkt"),
        (lit(BpeBudget) - col("c.cum_before")).as("remaining"))
    // left join on a constant key: an empty `cut` (corpus fits the
    // budget whole) must keep every row, not drop them all
    val tagged = cached.withColumn("one", lit(1))
      .join(broadcast(cut.withColumn("one", lit(1))), Seq("one"), "left")
    val kept = tagged
      .filter(col("cut_bkt").isNull || col("bkt") > col("cut_bkt"))
      .select(col("doc_id"), col("tok"), col("q"))
      .unionAll(tagged.filter(col("bkt") === col("cut_bkt"))
        .withColumn("cum_in_bkt", sum(col("tok")).over(
          W.orderBy(col("q").desc, col("doc_id").asc)
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .filter(col("cum_in_bkt") <= col("remaining"))
        .select(col("doc_id"), col("tok"), col("q")))
    val keptAgg = kept.agg(count(lit(1)).as("n_kept"),
      coalesce(sum(col("tok")), lit(0L)).as("kept_tok")).head()
    val (nKept, keptTok) =
      (keptAgg.getAs[Long]("n_kept"), keptAgg.getAs[Long]("kept_tok"))
    val nDocs = cached.count()
    require(keptTok <= BpeBudget, s"kept $keptTok exceeds $BpeBudget")
    require(nKept > 0 && nKept < nDocs,
      s"budget cut must be non-trivial ($nKept of $nDocs)")
    // greedy maximality: the best-ranked EXCLUDED doc must overflow
    val firstExcluded = cached.join(kept.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .orderBy(col("q").desc, col("doc_id").asc).limit(1)
      .select(col("tok")).collect().map(_.getLong(0))
    require(firstExcluded.isEmpty ||
      keptTok + firstExcluded.head > BpeBudget,
      "greedy prefix must be maximal: the next-ranked doc overflows")
    import s.implicits._
    Seq((nDocs, BpeBudget, true, true, true))
      .toDF("n_docs", "budget", "kept_fits", "greedy_maximal",
        "non_trivial")
  }

  /** The composite [0,1] quality score the budget cuts rank by
    * (stop-ratio half + capped-length half), over a `w` token-array
    * column — ONE definition for `pipeline_token_budget` and
    * `pipeline_bpe_budget`, so the cut ordering can never drift
    * between the proxy-token and trained-token denominations. */
  private def qualityCol: Column = {
    val inList = Seq("the", "a", "of", "and", "to")
      .map(w => s"'$w'").mkString(", ")
    size(expr(s"filter(w, t -> t IN ($inList))")).cast("double") /
      size(col("w")).cast("double") * 0.5 +
      least(lit(1.0), size(col("w")).cast("double") / 100.0) * 0.5
  }

  private val tokenBudgetQ: Q = (s, d) => {
    val W = org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(s, d)
      // same degenerate-input guard as sourceCapQ: a 0-token doc
      // scores NaN and the engines rank NaN differently
      .filter(col("text").isNotNull)
      .withColumn("w", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("w")) >= 1)
      .select(col("source"), col("doc_id"),
        ceil(length(col("text")) / 4.0).cast("long").as("tok"),
        qualityCol.as("q"))
      // score ∈ [0,1]: stop_ratio ≤ 1 and the length term caps at 1
      .withColumn("bkt", least(floor(col("q") * BudgetBuckets),
        lit(BudgetBuckets - 1)).cast("int"))
    val hist = scored.groupBy(col("source"), col("bkt"))
      .agg(sum(col("tok")).as("btok"))
      .withColumn("cum_incl", sum(col("btok")).over(
        W.partitionBy(col("source")).orderBy(col("bkt").desc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
    // boundary = the highest bucket whose inclusive cumulative mass
    // exceeds the budget; absent (source fits entirely) ⇒ keep all
    val cut = hist.filter(col("cum_incl") > TokenBudget)
      .groupBy(col("source"))
      .agg(max(struct(col("bkt"), (col("cum_incl") - col("btok"))
        .as("cum_before"))).as("c"))
      .select(col("source"), col("c.bkt").as("cut_bkt"),
        (lit(TokenBudget) - col("c.cum_before")).as("remaining"))
    val tagged = scored.join(broadcast(cut), Seq("source"), "left")
    val keptOutright = tagged
      .filter(col("cut_bkt").isNull || col("bkt") > col("cut_bkt"))
    // only the boundary bucket pays an exact ranked prefix sum, over
    // ≈ corpus/buckets docs per source
    val boundary = tagged.filter(col("bkt") === col("cut_bkt"))
      .withColumn("cum_in_bkt", sum(col("tok")).over(
        W.partitionBy(col("source"))
          .orderBy(col("q").desc, col("doc_id").asc)
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .filter(col("cum_in_bkt") <= col("remaining"))
    keptOutright.select(col("source"), col("doc_id"), col("tok"))
      .unionByName(boundary.select(col("source"), col("doc_id"), col("tok")))
      .orderBy(col("source"), col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_token_budget" -> tokenBudgetQ,
    "pipeline_bpe_budget" -> bpeBudgetQ,
    "pipeline_shuffle" -> shuffleQ,
    "pipeline_clean_corpus" -> cleanCorpus,
    "pipeline_stratified_sample" -> stratifiedSample,
    "pipeline_mix" -> mix,
    "pipeline_pack" -> pack,
    "pipeline_source_cap" -> sourceCapQ,
    "dedup_exact" -> exact,
    "dedup_substring" -> substringQ,
    "dedup_substring_strip" -> substringStripQ,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_simhash" -> simhash,
    "dedup_embedding" -> embedding,
    "dedup_semantic" -> semantic,
    "dedup_decontaminate" -> decontaminate,
    "dedup_bloom" -> bloomDecontaminate,
    "dedup_components" -> components)

  // Docs under 3 tokens (or with NULL text) carry no shingles and are
  // excluded outright — mirroring the Spark side's minTokens = 3
  // pre-filter, so neither engine can emit 0/0 = NaN "similarities".
  private val ShingleCte =
    """WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') w
      |           FROM documents),
      | s AS (SELECT doc_id, source,
      |   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                  for i in range(1, len(w) - 1)]) AS sh
      |   FROM t WHERE len(w) >= 3)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the NAIVE global greedy (one SUM OVER per source) — the
    // histogram-cut plan must reproduce its kept set exactly
    // trained-artifact decision row (text_bpe's contract): the kept
    // set depends on the trained merges, so the oracle pins the
    // SQL-computable facts and the in-query require()s carry the laws
    "pipeline_bpe_budget" ->
      """SELECT COUNT(*) AS n_docs, CAST(4000 AS BIGINT) AS budget,
        |  true AS kept_fits, true AS greedy_maximal,
        |  true AS non_trivial
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND len(list_filter(string_split(lower(text), ' '),
        |          t -> t != '')) >= 1""".stripMargin,
    "pipeline_token_budget" ->
      """WITH t AS (SELECT source, doc_id, text,
        |             string_split(lower(text), ' ') w FROM documents
        |           WHERE text IS NOT NULL
        |             AND len(string_split(lower(text), ' ')) >= 1),
        |x AS (SELECT source, doc_id,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to')))
        |      AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) * 0.5 +
        |  least(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.5 AS q
        |FROM t),
        |r AS (SELECT source, doc_id, tok,
        |  SUM(tok) OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC
        |                 ROWS UNBOUNDED PRECEDING) AS cum
        |FROM x)
        |SELECT source, doc_id, tok FROM r WHERE cum <= 1000
        |ORDER BY source, doc_id""".stripMargin,
    // the same md5 shard + sort-key permutation, recomputed in SQL
    // same composite score as text_quality; ranking mirrors the
    // (score desc, doc_id asc) tie-break of the bounded top-k
    "pipeline_source_cap" ->
      """WITH t AS (SELECT source, doc_id,
        |             string_split(lower(text), ' ') w FROM documents
        |           WHERE text IS NOT NULL AND len(string_split(lower(text), ' ')) >= 1),
        |x AS (SELECT source, doc_id,
        |  len(w) AS n_tokens,
        |  len(list_filter(w, t -> t IN ('the', 'a', 'of', 'and', 'to')))
        |    AS n_stop FROM t),
        |r AS (SELECT source, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |    CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.5 +
        |      least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5 DESC,
        |    doc_id ASC) AS INT) AS rank
        |  FROM x)
        |SELECT source, doc_id, rank FROM r WHERE rank <= 15
        |ORDER BY source, rank""".stripMargin,
    "pipeline_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  md5(CAST(doc_id AS VARCHAR) || '|epoch0') AS key
        |  FROM documents),
        |s AS (SELECT doc_id, key,
        |  ascii(substr(key, 1, 1)) % 4 AS shard FROM k)
        |SELECT shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |    ORDER BY key, doc_id) AS BIGINT) AS position,
        |  doc_id
        |FROM s ORDER BY shard, position""".stripMargin,
    "pipeline_stratified_sample" ->
      """SELECT source, COUNT(*) AS n_sampled FROM documents
        |WHERE substring(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 2) < '4d'
        |GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |    substring(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 4) h4
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |    CASE WHEN source = 'src0'
        |           THEN 2 + CASE WHEN h4 < '8000' THEN 1 ELSE 0 END
        |         WHEN source = 'src1' THEN 1
        |         WHEN source = 'src2'
        |           THEN CASE WHEN h4 < '8000' THEN 1 ELSE 0 END
        |         ELSE CASE WHEN h4 < '4000' THEN 1 ELSE 0 END
        |    END AS n FROM d),
        |e AS (SELECT doc_id, source FROM c, UNNEST(range(n)))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM e GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
        |k AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        |t AS (SELECT source,
        |        CAST(len(string_split(lower(text), ' ')) AS INT) AS ntok
        |      FROM k)
        |SELECT source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS sum_tokens
        |FROM t WHERE ntok >= 20 GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(lower(text), ' ')) AS INT) AS ntok
        |  FROM documents),
        |c AS (SELECT doc_id, source, ntok,
        |  CAST(coalesce(SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_tok
        |  FROM t)
        |SELECT doc_id, source, ntok, start_tok,
        |  start_tok // 2048 AS first_window,
        |  (start_tok + greatest(ntok, 1) - 1) // 2048 AS last_window
        |FROM c ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | md5(text) AS content_md5
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    // window strings stand in for the Spark side's window hashes
    // (equal token sequences ⇔ equal joined strings); islands merge
    // when positions are within W of each other, same as the plan
    "dedup_substring" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w
        |           FROM documents WHERE text IS NOT NULL),
        |wn AS (SELECT doc_id,
        |         unnest(generate_series(0, len(w) - 16)) AS pos, w
        |       FROM t WHERE len(w) >= 16),
        |wh AS (SELECT doc_id, pos,
        |         array_to_string(w[pos+1:pos+16], ' ') AS win FROM wn),
        |dup AS (SELECT win FROM wh GROUP BY win HAVING count(*) >= 2),
        |m AS (SELECT doc_id, pos FROM wh
        |      WHERE win IN (SELECT win FROM dup)),
        |g AS (SELECT doc_id, pos,
        |        CASE WHEN pos - lag(pos) OVER
        |               (PARTITION BY doc_id ORDER BY pos) <= 16
        |             THEN 0 ELSE 1 END AS ns FROM m),
        |i AS (SELECT doc_id, pos,
        |        SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS UNBOUNDED PRECEDING) AS island
        |      FROM g)
        |SELECT doc_id,
        |  CAST(MIN(pos) AS INT) AS span_start,
        |  CAST(MAX(pos) + 15 AS INT) AS span_end,
        |  CAST(MAX(pos) - MIN(pos) + 16 AS INT) AS span_tokens
        |FROM i GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    "dedup_substring_strip" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w,
        |             string_split(text, ' ') wo
        |           FROM documents WHERE text IS NOT NULL),
        |wn AS (SELECT doc_id,
        |         unnest(generate_series(0, len(w) - 16)) AS pos, w
        |       FROM t WHERE len(w) >= 16),
        |wh AS (SELECT doc_id, pos,
        |         array_to_string(w[pos+1:pos+16], ' ') AS win FROM wn),
        |dup AS (SELECT win FROM wh GROUP BY win HAVING count(*) >= 2),
        |canon AS (SELECT win, doc_id AS cd, pos AS cp FROM (
        |  SELECT win, doc_id, pos,
        |    ROW_NUMBER() OVER (PARTITION BY win
        |                       ORDER BY doc_id, pos) AS rk
        |  FROM wh WHERE win IN (SELECT win FROM dup)) WHERE rk = 1),
        |rem AS (SELECT h.doc_id, h.pos AS rs, h.pos + 15 AS re
        |        FROM wh h JOIN canon c ON h.win = c.win
        |        WHERE NOT (h.doc_id = c.cd AND h.pos = c.cp)),
        |ti AS (SELECT doc_id,
        |         unnest(generate_series(1, len(wo))) AS i, wo FROM t),
        |tk AS (SELECT doc_id, i - 1 AS idx, wo[i] AS tok FROM ti),
        |keep AS (SELECT tk.doc_id, tk.idx, tk.tok FROM tk
        |         WHERE NOT EXISTS (SELECT 1 FROM rem r
        |           WHERE r.doc_id = tk.doc_id
        |             AND tk.idx BETWEEN r.rs AND r.re)
        |            OR EXISTS (SELECT 1 FROM canon c
        |           WHERE c.cd = tk.doc_id
        |             AND tk.idx BETWEEN c.cp AND c.cp + 15)),
        |tot AS (SELECT doc_id, COUNT(*) AS n_tokens
        |        FROM tk GROUP BY doc_id)
        |SELECT t.doc_id,
        |  COALESCE(k.clean_text, '') AS clean_text,
        |  COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept,
        |  t.n_tokens - COALESCE(k.n_kept, CAST(0 AS BIGINT))
        |    AS n_removed
        |FROM tot t LEFT JOIN (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx)
        |           AS clean_text,
        |         COUNT(*) AS n_kept
        |  FROM keep GROUP BY doc_id) k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$ShingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // The LSH pipeline's *output contract* is exact: every pair with
    // true Jaccard ≥ 0.8 (banding P[miss] < 1e-7 at the threshold,
    // deterministic for a fixed dataset — verified locally).
    "dedup_minhash_lsh" ->
      s"""$ShingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE len(a.sh) > 0 AND len(b.sh) > 0
         |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |   / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Bit-exact reproduction of the simhash pipeline: FNV-1a token
    // hashes in HUGEINT arithmetic (xor touches only the low byte, so
    // it is expressible as subtract-add), per-bit sign aggregation,
    // two's-complement fold back to BIGINT, brute-force hamming join
    // (== the banded result by pigeonhole).
    "dedup_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents
        |),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(string_split(tok, ''), c -> CAST(ascii(c) AS HUGEINT))),
        |      (hh, c) -> ((hh - (hh % 256) + CAST(xor(CAST(hh % 256 AS BIGINT), CAST(c AS BIGINT)) AS HUGEINT)) * 1099511628211) % 18446744073709551616
        |    ) AS th
        |  FROM t
        |),
        |bits AS (
        |  SELECT doc_id, j.j AS j,
        |    CASE WHEN SUM(CASE WHEN (h.th // (CAST(1 AS HUGEINT) << CAST(j.j AS INT))) % 2 = 1
        |                       THEN 1 ELSE -1 END) >= 0
        |         THEN CAST(1 AS HUGEINT) << CAST(j.j AS INT) ELSE CAST(0 AS HUGEINT) END AS bitval
        |  FROM h, (SELECT unnest(range(0, 64)) AS j) j
        |  GROUP BY doc_id, j.j
        |),
        |sims AS (
        |  SELECT doc_id,
        |    CAST(SUM(bitval) % 18446744073709551616 -
        |      CASE WHEN SUM(bitval) % 18446744073709551616 >= 9223372036854775808
        |           THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS sim
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    // Decimal-exact centroids (same CTE shape as ann_ivf), then the
    // keep rule replayed literally: drop iff a more-central same-
    // cluster vector sits within tau.
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings),
        |ex AS (SELECT label, UNNEST(v) AS x,
        |  UNNEST(range(1, len(v)+1)) AS pos FROM e),
        |cm AS (SELECT label, pos,
        |  CAST(SUM(CAST(x AS DECIMAL(28,18))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS m
        | FROM ex GROUP BY label, pos),
        |cent AS (SELECT label, list(m ORDER BY pos) AS c_v
        | FROM cm GROUP BY label),
        |sc AS (SELECT e.vec_id, e.label, e.v,
        |  list_cosine_similarity(e.v, c.c_v) AS c_cos
        | FROM e JOIN cent c USING (label)),
        |dr AS (SELECT DISTINCT a.vec_id
        | FROM sc a JOIN sc b ON a.label = b.label AND a.vec_id <> b.vec_id
        |  AND (b.c_cos > a.c_cos
        |    OR (b.c_cos = a.c_cos AND b.vec_id < a.vec_id))
        | WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
        |SELECT s.vec_id, s.label, dr.vec_id IS NULL AS kept
        |FROM sc s LEFT JOIN dr ON s.vec_id = dr.vec_id
        |ORDER BY s.vec_id""".stripMargin,
    // Same 8-gram definition, string-keyed (the hash join key is an
    // internal optimization the output doesn't depend on).
    "dedup_decontaminate" ->
      """WITH tok AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
        |             FROM documents),
        |g AS (SELECT doc_id, source,
        |        unnest(CASE WHEN len(w) >= 8 THEN
        |          list_transform(range(1, len(w) - 6),
        |            i -> array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))
        |          ELSE [] END) AS gram
        |      FROM tok),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
        |         WHERE g.source <> 'src0')
        |SELECT d.source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_contaminated
        |FROM documents d LEFT JOIN cont c USING (doc_id)
        |WHERE d.source <> 'src0'
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // the exact contaminated-doc count (the bloom flags a superset
    // the query verifies exactly; both booleans are the contract)
    "dedup_bloom" ->
      """WITH tok AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
        |             FROM documents),
        |g AS (SELECT doc_id, source,
        |        unnest(CASE WHEN len(w) >= 8 THEN
        |          list_transform(range(1, len(w) - 6),
        |            i -> array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))
        |          ELSE [] END) AS gram
        |      FROM tok),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
        |         WHERE g.source <> 'src0')
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |       TRUE AS no_false_negatives, TRUE AS fp_bounded
        |FROM cont""".stripMargin,
    // Components = min reachable vec_id, via transitive closure.
    "dedup_components" ->
      """WITH RECURSIVE ev AS (SELECT vec_id, label,
        |        CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |p AS (SELECT a.vec_id a, b.vec_id b FROM ev a JOIN ev b
        |      ON a.label = b.label AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.v, b.v) >= 0.3),
        |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
        |reach AS (SELECT a AS n, b AS m FROM e
        |          UNION
        |          SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a)
        |SELECT v.vec_id,
        |       CAST(least(v.vec_id, coalesce(min(r.m), v.vec_id)) AS BIGINT)
        |         AS component
        |FROM ev v LEFT JOIN reach r ON r.n = v.vec_id
        |GROUP BY v.vec_id ORDER BY v.vec_id""".stripMargin)
}
