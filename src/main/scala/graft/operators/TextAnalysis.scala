package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: quality stats, regex token
  * counting, language-ID heuristic, document fingerprinting.
  *
  * All are narrow per-row transforms — zero data shuffles; at 100 TB these
  * run as one codegen'd scan→project stage, fully parallel. The presentation
  * ORDER BY sits on the source key BEFORE the projection so the range
  * sampler never re-executes the per-row hashing/regex work (see
  * SearchHistory for the pattern).
  *
  * Determinism: ratios are computed as integer-derived double divisions
  * (identical in both engines); the rolling fingerprint is a sequential
  * modular fold — Spark `aggregate` HOF vs DuckDB `list_reduce`, same
  * left-to-right order, all values < 2^35 so no overflow.
  */
object TextAnalysis extends QueryModule {

  private[graft] val stop = Seq("the", "a", "of", "and")
  private val stopList = stop.map(w => s"'$w'").mkString(", ")

  /** Deterministic uniform draw in [0, 1): md5-derived 32-bit hash of the
    * doc_id, reduced mod 1e6 — the portable stand-in for rand() that the
    * sampling operators share (same value on both engines, any run, any
    * partitioning).
    */
  private def u01(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.functions.TextFunctions.md5Bits(idCol.cast("string"), 8), lit(1000000L))
      .cast("double") / 1000000.0

  /** Bottom-k-by-content-hash sample size for the sampled BPE trainer —
    * ONE definition interpolated into both the engine plan and the
    * DuckDB oracle so the two can never drift. At this k the sampled
    * argmax reproduces the exact trainer's merge VOCABULARY on the
    * fixture corpus (near-tied rounds can swap order at any honest k —
    * segmentation-neutral for disjoint pairs, see the smoke spec);
    * production tunes k to the pair-margin noise it can tolerate.
    */
  private val BpeSampleK = 384

  /** The round-1 BPE merge table "trained" by `txt_bpe_merges` on the
    * fixture corpus (top-10 adjacent pairs, rank order), each mapped to a
    * fresh single-char symbol — uppercase is outside the corpus alphabet,
    * so placeholders can never collide with source text.
    */
  private val bpeMerges = Seq(
    "er" -> "A", "in" -> "B", "ow" -> "C", "or" -> "D", "st" -> "E",
    "me" -> "F", "to" -> "G", "at" -> "H", "lu" -> "I", "al" -> "J")

  /** The 5-round BPE training loop shared by txt_bpe_train and
    * pipe_tokenizer_e2e: iterate count → pick-top-merge → re-segment,
    * driver-controlled with exactly one 1-row collect (the picked pair)
    * per round. Returns the final merge-chain SQL expression (in terms of
    * column `text`) and the merge table rows
    * (round, pair, symbol, n, n_syms_after). Placeholder symbols must be
    * FRESH — a corpus containing literal A..E would conflate text
    * characters with merge symbols, silently corrupting pair counts
    * IDENTICALLY in both engines (the oracle could not catch it), so the
    * taint check fails loudly (the srpPlanes precedent).
    */
  private def bpeTrainLoop(docs: DataFrame, measureRounds: Boolean = true)
      : (String, Seq[(Long, String, String, Long, Long)]) = {
    val tainted = docs.filter(col("text").rlike("[A-E]")).limit(1).count()
    require(tainted == 0L,
      "bpeTrainLoop: corpus contains literal A-E — supply placeholder " +
        "symbols outside this corpus's alphabet")
    var rewritten = "text" // SQL expr: corpus re-segmented by merges so far
    // `cur` is the corpus re-segmented by the merges so far, MATERIALIZED
    // (cache) once per round: each round's two aggregates (pair count,
    // compression measure) scan the round's segmentation instead of
    // re-evaluating the whole replace chain over raw text — round r
    // previously re-ran r chained replaces per scan, O(r²) replace
    // evaluations across the loop, now O(r) (guide §1.2 "per-task work":
    // one replace per round, aggregates read the cached segmentation).
    // The picked pairs and all reported counts are unchanged: replaces
    // compose, so scanning cur ≡ scanning expr(rewritten) over raw text.
    var cur = docs.select(col("text"))
    var cached: Option[DataFrame] = None
    val table = Seq.newBuilder[(Long, String, String, Long, Long)]
    for (r <- 1 to 5) {
      val sym = ('A' + r - 1).toChar.toString
      val top = cur
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
        )).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("pair")).limit(1)
        .collect()(0)
      // escape for a Spark SQL literal: backslashes are escape
      // sequences in Spark (but literal in DuckDB — whose oracle never
      // embeds the pair as a literal, it flows through subqueries), and
      // a lone trailing backslash would swallow the closing quote
      val pair = top.getString(0).replace("\\", "\\\\").replace("'", "''")
      rewritten = s"replace($rewritten, '$pair', '$sym')"
      // the per-round compression scan only matters to callers reporting
      // the merge table (txt_bpe_train); the tokenizer capstone discards
      // the table and must not pay 5 extra corpus scans for it. The last
      // round's segmentation is only built when something reads it.
      val nAfter =
        if (r < 5 || measureRounds) {
          val next = cur.select(
            expr(s"replace(text, '$pair', '$sym')").as("text")).cache()
          // materialize `next` BEFORE dropping its parent from cache —
          // otherwise the first action on it would re-derive the whole
          // replace chain from raw text (the cost this rewrite removes).
          // With measureRounds the compression aggregate IS that action;
          // without it a count() pays the one replace into cache.
          val n =
            if (measureRounds)
              next.agg(sum(expr("length(replace(text, ' ', ''))")).cast("bigint"))
                .collect()(0).getLong(0)
            else { next.count(); -1L }
          cached.foreach(_.unpersist(false))
          cached = Some(next)
          cur = next
          n
        } else -1L
      table += ((r.toLong, top.getString(0), sym, top.getLong(1), nAfter))
    }
    cached.foreach(_.unpersist(false))
    (rewritten, table.result())
  }

  /** Chained literal `replace` applying [[bpeMerges]] in rank order —
    * the same textual expression is valid Spark SQL and DuckDB SQL.
    * Exposed to [[Curation]] so the token-budget family can count BPE
    * tokens with the SAME shipped merge table the tokenizer queries use
    * (real mixture configs are in tokenizer tokens, not whitespace
    * words).
    */
  private[operators] def bpeApplied(inner: String): String =
    bpeMerges.foldLeft(inner) { case (acc, (p, r)) =>
      s"replace($acc, '$p', '$r')"
    }

  /** Per-doc BPE token count under the shipped merge table — the
    * `n_syms_after` arithmetic of txt_bpe_apply as one expression
    * (symbols are single chars after merging, so the count is the
    * space-stripped length). Valid in both engines. Callers on the
    * counting path must run [[requireBpeCountable]] first: a corpus
    * containing a literal A–J would yield wrong counts IDENTICALLY in
    * engine and oracle, so the gate could never catch it.
    */
  private[graft] def bpeTokenCountSql: String =
    s"CAST(length(replace(${bpeApplied("text")}, ' ', '')) AS BIGINT)"

  /** The merge-placeholder taint alphabet as a regex character class,
    * DERIVED from [[bpeMerges]]' symbol column (today `[ABCDEFGHIJ]`) so
    * widening the merge table can never leave a counting-path guard
    * checking a stale alphabet — shared by [[requireBpeCountable]] and
    * the streaming stats rollup's lake-borne taint counter.
    */
  private[graft] val bpeTaintPattern: String =
    bpeMerges.map(_._2).mkString("[", "", "]")

  /** Loud taint guard for the SHIPPED merge chain's counting path
    * ([[bpeApplied]] / [[bpeTokenCountSql]]): the full placeholder
    * alphabet is A–J (wider than [[bpeTrainLoop]]'s own A–E guard — the
    * loop mints only 5 symbols, the shipped table maps 10), and a corpus
    * carrying any of them literally would conflate text with merge
    * symbols. Memoized per corpus fingerprint so the scan is paid once
    * per fixture, not once per counting query.
    */
  private val bpeCountableDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[operators] def requireBpeCountable(s: SparkSession, d: String): Unit = {
    val key = Dedup.DerivedArtifacts.fingerprint(d, "documents")
    if (!bpeCountableDirs.contains(key)) {
      val tainted = Tables.documents(s, d)
        .filter(col("text").rlike(bpeTaintPattern)).limit(1).count()
      require(tainted == 0L,
        "BPE token counting: corpus contains a literal A-J — the shipped " +
          "merge table's placeholder symbols must be outside the corpus " +
          "alphabet")
      bpeCountableDirs.add(key)
    }
  }

  /** A REAL streaming-maintained corpus-stats fixture: the dedup'd
    * corpus ingest body
    * ([[graft.streaming.StreamRunner.dedupPublishBatch]] — exact dedup →
    * near-dup-vs-index → audited publish → index + PER-SOURCE STATS
    * maintenance) replayed over three deterministic `documents` slices
    * (doc_id % 3 = 1, 2, 0 — in that order), built once per corpus
    * fingerprint under [[StreamedFixture]]'s locked atomic publish.
    * Serves the `<prefix>_stats` lake the incremental mix queries read.
    */
  /** The canonical three-slice ingest replay BOTH stats fixtures run —
    * one copy, so the hybrid fixture provably replays "the SAME three
    * sliced ingest batches" its shared oracle assumes. `afterBatch`
    * fires after each batch publishes (the hybrid's mid-stream fold
    * hook).
    */
  private def replaySlicedIngest(
      s: SparkSession, d: String,
      wh: graft.pipeline.Warehouse, scratch: String,
      afterBatch: Int => Unit = _ => ()): Unit = {
    val docs = Tables.documents(s, d)
    Seq(col("doc_id") % 3 === 1, col("doc_id") % 3 === 2,
        col("doc_id") % 3 === 0).zipWithIndex.foreach { case (cond, i) =>
      graft.streaming.StreamRunner.dedupPublishBatch(
        docs.filter(cond), i.toLong, wh, scratch, _ => None, 0.5)
      afterBatch(i)
    }
  }

  private[graft] object CorpusStatsFixture extends StreamedFixture(
    "cs", "graft_corpus_stats",
    Seq("", "_sigs", "_hashes", "_stats"), layout = "v1",
    extraPruneSuffixes = Seq("_stats_serve", "_serve")) {
    override protected def buildScratch(
        s: SparkSession, d: String, scratch: String): Unit =
      replaySlicedIngest(s, d, wh, scratch)

    /** Build (if needed), then FOLD the stats lake into the versioned
      * `_stats_serve` snapshot once per JVM
      * ([[graft.streaming.StreamRunner.compactStats]] under the shared
      * [[StreamedFixture.compactOnce]] memo; retention pruned to the
      * last two). Returns the table prefix.
      */
    def compact(s: SparkSession, d: String): String = {
      val p = build(s, d)
      compactOnce(p) {
        graft.streaming.StreamRunner.compactStats(s, wh, p)
        wh.pruneVersions(s"${p}_stats_serve", keep = 2)
        wh.currentVersion(s"${p}_stats_serve").isDefined
      }
      p
    }

    /** Build (if needed), then compact the published CORPUS lake into
      * its source-partitioned `_serve` generation once per JVM
      * (distinct memo key from the stats fold — the two compactions are
      * independent maintenance jobs).
      */
    def compactCorpus(s: SparkSession, d: String): String = {
      val p = build(s, d)
      compactOnce(s"$p@corpus") {
        graft.streaming.StreamRunner.compactCorpus(s, wh, p)
        wh.pruneVersions(s"${p}_serve", keep = 2)
        wh.currentVersion(s"${p}_serve").isDefined
      }
      p
    }
  }

  /** The HYBRID-serve variant of [[CorpusStatsFixture]]: the SAME three
    * sliced ingest batches, but compaction runs MID-STREAM — after
    * batch 1, before batch 2 — so the `_stats_serve` snapshot genuinely
    * covers only a PREFIX of the ingest and the live tail partition is
    * LOAD-BEARING in the snapshot+tail serve
    * ([[graft.streaming.StreamRunner.statsServeHybrid]]). A watermark
    * off-by-one (`>=` for `>`) double-counts or drops batch 2's mass
    * and flips the shared replay oracle. `_stats_serve` is built inside
    * the scratch prefix, so it participates in the fixture's atomic
    * multi-table publish.
    */
  private[graft] object CorpusStatsHybridFixture extends StreamedFixture(
    "csh", "graft_corpus_stats_hyb",
    Seq("", "_sigs", "_hashes", "_stats", "_stats_serve"), layout = "v1") {
    override protected def buildScratch(
        s: SparkSession, d: String, scratch: String): Unit =
      replaySlicedIngest(s, d, wh, scratch, afterBatch = i =>
        if (i == 1)
          graft.streaming.StreamRunner.compactStats(s, wh, scratch): Unit)
  }

  /** The VACUUMED-lake variant — the full LSM maintenance loop a
    * perpetual ingest runs, compressed into one fixture: fold after
    * batch 1, VACUUM the folded fragments (slack 0 — the quiesced
    * maintenance-window form), ingest batch 2, fold AGAIN. The second
    * fold can only be correct via fold-forward (prior snapshot ∪ tail):
    * batches 0–1's fragments no longer exist, so a whole-lake refold
    * would silently lose their mass — and the shared replay oracle,
    * which accounts all three batches, flips. Serves through the same
    * hybrid snapshot+tail read.
    */
  private[graft] object CorpusStatsVacuumFixture extends StreamedFixture(
    "csg", "graft_corpus_stats_gc",
    Seq("", "_sigs", "_hashes", "_stats", "_stats_serve"), layout = "v1") {
    override protected def buildScratch(
        s: SparkSession, d: String, scratch: String): Unit =
      replaySlicedIngest(s, d, wh, scratch, afterBatch = {
        case 1 =>
          graft.streaming.StreamRunner.compactStats(s, wh, scratch)
          graft.streaming.StreamRunner
            .gcStats(s, wh, scratch, slackGenerations = 0): Unit
        case 2 =>
          graft.streaming.StreamRunner.compactStats(s, wh, scratch): Unit
        case _ => ()
      })
  }

  /** The CORPUS-lake hybrid variant — the published documents lake AND
    * the near-dup index both compacted and fully vacuumed MID-STREAM
    * (after batch 1 of 3), then batch 2 ingested: its near-dup match
    * join can only find batches 0–1's signatures through the
    * `_sigs_serve`/`_hashes_serve` snapshots
    * ([[graft.streaming.StreamRunner.hybridLakeRead]]'s ingest side),
    * and the corpus hybrid serve's tail partition (batch 2) is
    * load-bearing. The shared whole-replay oracle hashes every
    * survivor's text, so an ingest that missed a cross-batch near-dup
    * (index loss), a vacuum that deleted unfolded mass, or a
    * double-read across the fold boundary all flip rows.
    */
  private[graft] object CorpusLakeHybridFixture extends StreamedFixture(
    "clh", "graft_corpus_lake_hyb",
    Seq("", "_sigs", "_hashes", "_stats", "_serve", "_sigs_serve",
      "_hashes_serve"), layout = "v1") {
    override protected def buildScratch(
        s: SparkSession, d: String, scratch: String): Unit =
      replaySlicedIngest(s, d, wh, scratch, afterBatch = i =>
        if (i == 1) {
          graft.streaming.StreamRunner.compactCorpus(s, wh, scratch)
          graft.streaming.StreamRunner.gcLake(s, wh, scratch,
            s"${scratch}_serve", slackGenerations = 0)
          graft.streaming.StreamRunner.compactDedupIndex(s, wh, scratch)
          graft.streaming.StreamRunner.gcLake(s, wh, s"${scratch}_sigs",
            s"${scratch}_sigs_serve", slackGenerations = 0)
          graft.streaming.StreamRunner.gcLake(s, wh, s"${scratch}_hashes",
            s"${scratch}_hashes_serve", slackGenerations = 0): Unit
        })
  }

  /** Per-source (n_docs, n_tokens) rollup of the fixture's stats lake —
    * the |batches|x|sources| read both incremental mix serves share.
    * Refuses to finalize if any ingested doc carried a merge-placeholder
    * letter (the lake-borne form of [[requireBpeCountable]]: the taint
    * counter was computed at ingest and rides the stats rows, so the
    * gate costs one 1-row collect per fixture prefix — memoized, like
    * its corpus-scan sibling — not a corpus scan per query).
    */
  private val statsTaintChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The lake-borne BPE taint gate: one memoized 1-row sum of
    * `n_tainted` over any stats frame (the raw lake or a rollup of it —
    * the sum is the same number at every granularity).
    */
  private def requireStatsUntainted(frame: DataFrame, memoKey: String): Unit =
    if (!statsTaintChecked.contains(memoKey)) {
      val tainted = frame.agg(sum(col("n_tainted")).as("t"))
        .collect()(0).getLong(0)
      require(tainted == 0L,
        "BPE token accounting: the ingested corpus contains a literal " +
          "merge-placeholder symbol — the shipped merge table's " +
          "placeholders must be outside the corpus alphabet")
      statsTaintChecked.add(memoKey): Unit
    }

  private def finalizeStats(agg: DataFrame, memoKey: String): DataFrame = {
    requireStatsUntainted(agg, memoKey)
    agg.drop("n_tainted")
  }
  private def corpusStatsAgg(s: SparkSession, p: String): DataFrame =
    finalizeStats(
      CorpusStatsFixture.wh.read(s, s"${p}_stats")
        .groupBy(col("source")).agg(
          sum(col("n_docs")).cast("bigint").as("n_docs"),
          sum(col("n_tokens_bpe")).cast("bigint").as("n_tokens"),
          sum(col("n_tainted")).cast("bigint").as("n_tainted")),
      p)

  /** The same rollup served from the FOLDED `_stats_serve` snapshot
    * ([[graft.streaming.StreamRunner.compactStats]]) — already one row
    * per source, so the read is a |sources|-row single-file scan with
    * no per-batch fragments and no aggregation. The taint gate memo is
    * keyed separately from the live lake's: the compacted read must
    * prove its OWN snapshot clean, not inherit the fragmented read's
    * verdict.
    */
  private def corpusStatsCompactedAgg(s: SparkSession, p: String): DataFrame =
    finalizeStats(
      CorpusStatsFixture.wh.readVersion(s, s"${p}_stats_serve")
        .select(col("source"), col("n_docs"),
          col("n_tokens_bpe").as("n_tokens"), col("n_tainted")),
      s"$p@serve")

  /** The rollup served snapshot-PLUS-TAIL from the hybrid fixture
    * ([[graft.streaming.StreamRunner.statsServeHybrid]]: the mid-stream
    * `_stats_serve` prefix fold + the live partitions above its
    * watermark). Same taint gate, own memo key.
    */
  private def corpusStatsHybridAgg(s: SparkSession,
      wh: graft.pipeline.Warehouse, p: String): DataFrame =
    finalizeStats(
      graft.streaming.StreamRunner.statsServeHybrid(s, wh, p)
        .select(col("source"), col("n_docs"),
          col("n_tokens_bpe").as("n_tokens"), col("n_tainted")),
      s"$p@hybrid")

  /** Domain-mix finalization over a `(source, n_docs, n_tokens)` rollup —
    * min-source token mass as the keep budget, integer keep
    * probabilities; shared by the live-lake and compacted serves.
    */
  private def domainMixOf(agg: DataFrame): DataFrame = {
    val kMin = agg.agg(min(col("n_tokens")).as("k"))
    agg.crossJoin(broadcast(kMin))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("k * 1000000 DIV n_tokens").as("keep_prob_x1e6"))
      .orderBy(col("source"))
  }

  /** Temperature-mix finalization (sqrt token-mass weights, sequential
    * source-ordered fold for a bit-reproducible normalizer); shared by
    * the live-lake and compacted serves.
    */
  private def temperatureMixOf(agg: DataFrame): DataFrame = {
    val z = agg.agg(
      expr("aggregate(transform(sort_array(collect_list(struct(source, " +
        "sqrt(CAST(n_tokens AS DOUBLE)) AS w))), x -> x.w), 0.0D, (a, x) -> a + x)").as("z"))
    agg.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")) / col("z"), 6).as("target_frac"))
      .orderBy(col("source"))
  }

  /** Distinct 3-word shingles of a (doc_id, text) frame. */
  private def shingled(df: DataFrame): DataFrame = df
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .filter(size(col("w")) >= 3)
    .select(col("doc_id"), explode(expr(
      "array_distinct(transform(sequence(0, size(w) - 3), i -> concat_ws(' ', w[i], w[i+1], w[i+2])))"
    )).as("shingle"))

  /** Eval-set decontamination with the eval set as an EXPLICIT bounded
    * input: for each corpus document, how many 3-word shingles (and how
    * many distinct benchmark docs) it shares with `bench`. Real
    * decontamination runs against a FIXED eval suite — its size does not
    * grow with the corpus — so the bench shingles are broadcast and the
    * 100 TB plan is one corpus scan + broadcast hash join, no shuffle of
    * the training side (TextAnalysisSpec pins the broadcast). If the eval
    * side DOES grow with the data, this is the wrong shape: drop the
    * broadcast and band the (skewed) shingle key the way the MinHash
    * candidate join does.
    */
  def contamination(corpus: DataFrame, bench: DataFrame): DataFrame =
    shingled(corpus)
      .join(broadcast(shingled(bench).select(col("shingle"), col("doc_id").as("bench_id"))),
        "shingle")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy(col("doc_id"))

  /** Body of txt_boilerplate_scrub, on any (doc_id, text) frame: segment
    * into 5-word windows, drop every segment whose text occurs in more
    * than one distinct document, reassemble in order, fingerprint. Docs
    * whose every segment is boilerplate survive with n_kept = 0 and the
    * fingerprint of the empty string (PlanPolicySpec pins the edge).
    */
  def scrubBoilerplate(docs: DataFrame): DataFrame = {
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, CAST(floor((size(w) - 1) / 5) AS INT)), " +
          "i -> named_struct('idx', CAST(i AS BIGINT), " +
          "'seg', concat_ws(' ', slice(w, i * 5 + 1, 5))))")).as("s"))
      .select(col("doc_id"), col("s.idx").as("idx"), col("s.seg").as("seg"),
        md5(col("s.seg").cast("binary")).as("h"))
    val docFreq = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val kept = segs.join(docFreq, "h").filter(col("df") === 1)
    val re = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(expr(
        "transform(array_sort(collect_list(named_struct('idx', idx, 'seg', seg))), x -> x.seg)"
      ), " ").as("scrubbed"))
    val tot = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
    docs.select(col("doc_id")).join(tot, "doc_id").join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("scrubbed"), lit("")).cast("binary")).as("scrubbed_fp"))
      .orderBy(col("doc_id"))
  }

  /** HTML-framed documents: each doc's text wrapped in a REAL page
    * template that exercises every hazard the extractor must survive —
    * doctype, comment, `<style>` content, a `<script>` whose body
    * contains both a bare `<` comparison and a `"<p>"` string literal, a
    * quoted attribute containing `>`, `&amp;`/`&#65;` entities, and
    * `doc_id % 3` extra anchors. The oracle predicts the EXTRACTION
    * OUTPUT from (doc_id, text) without ever seeing the markup, while the
    * Spark side can only reach it by genuinely parsing the page.
    */
  /** THE page template — single source of truth shared by this module's
    * declarative fixture and [[Crawl]]'s WARC bodies, so the two can
    * never desynchronize from each other or from the oracles' replay.
    */
  private[operators] def htmlTemplate(id: Long, text: String): String =
    s"""<!DOCTYPE html>
       |<html><head><title>Doc $id</title><style>body { color: #fff; }</style></head>
       |<body><!-- generated fixture -->
       |<h1>Doc $id &amp; friends &#65;</h1>
       |<p class="body" data-x="a>b">$text</p>
       |<script type="text/javascript">if (1 < 2) { console.log("<p>"); }</script>
       |<a href="https://example.com/$id">link $id</a>""".stripMargin +
      ("\n<a href=\"#\">x</a>" * (id % 3).toInt) + "\n</body></html>"

  private def attachHtml(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col("doc_id"), col("text")).rdd.map { r =>
      org.apache.spark.sql.Row(r.getLong(0), htmlTemplate(r.getLong(0), r.getString(1)))
    }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("html",
        org.apache.spark.sql.types.StringType))))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- REAL HTML visible-text extraction (`graft_html_stats`, a
    // native one-pass state machine — no HTML library): the crawl→corpus
    // step every training pipeline runs first. Every output value except
    // doc_id exists on the Spark side ONLY by parsing the markup —
    // skipping script/style content (including the embedded `<` and
    // `"<p>"` traps), honoring quoted-attribute `>`, decoding entities,
    // counting anchors/scripts/tags — while the oracle predicts the same
    // extraction output directly from the generator. Narrow codegen'd
    // scan stage; only extracted stats continue. ----
    // ---- SFT record assembly with loss-mask accounting: each document
    // becomes one instruction-tuning record (system + user + assistant
    // template) with the numbers a trainer needs to mask the prompt out
    // of the loss — the mask boundary in chars and whitespace tokens,
    // total and loss-bearing token counts, and the record's content md5
    // (both engines assemble and hash the IDENTICAL string — any
    // template or concatenation drift breaks the hash). Narrow
    // codegen'd projection; at 100 TB this is the final formatting pass
    // before pipe_export_shards writes the shards. ----
    "txt_sft_assemble" -> ((s, d) => {
      val prompt = concat(
        lit("### System: You are a helpful assistant.\n### User: Summarize document "),
        col("doc_id"), lit(".\n### Assistant: "))
      val full = concat(prompt, col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(full).as("record_md5"),
          length(prompt).cast("bigint").as("mask_start_char"),
          lit(14L).as("mask_start_token"), // tokens in the fixed template
          (lit(14L) + size(split(col("text"), " "))).cast("bigint").as("n_tokens"),
          size(split(col("text"), " ")).cast("bigint").as("n_loss_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- REAL UTF-8 well-formedness audit (`graft_utf8_stats`, the full
    // RFC 3629 validity table — overlongs, surrogates, >U+10FFFF all
    // rejected; resync-per-invalid-byte counting): each doc's bytes carry
    // a doc_id-determined planted tail — a valid 2-byte ¢, an OVERLONG
    // C0 80, a valid 3-byte € plus a BEL control, or a run of lone
    // continuation bytes — and every count below exists on the Spark side
    // only by walking the bytes through the validator, while the oracle
    // predicts them from the plant arithmetic. The mojibake/control-noise
    // gate a crawl corpus passes before tokenization. ----
    "txt_utf8_audit" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      val tail = when(col("doc_id") % 4 === 0, lit("C2A2"))
        .when(col("doc_id") % 4 === 1, lit("C080"))
        .when(col("doc_id") % 4 === 2, lit("E282AC07"))
        .otherwise(repeat(lit("80"), (col("doc_id") % 3 + 1).cast("int")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text").cast("binary"), unhex(tail)).as("payload"))
        .select(col("doc_id"),
          call_function("graft_utf8_stats", col("payload")).as("st"))
        .select(col("doc_id"), col("st.n_valid_chars"), col("st.n_invalid_bytes"),
          col("st.n_multibyte"), col("st.n_control"), col("st.is_valid"))
        .orderBy(col("doc_id"))
    }),

    "txt_html_extract" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      attachHtml(Tables.documents(s, d))
        .select(col("doc_id"),
          call_function("graft_html_stats", col("html")).as("st"))
        .select(col("doc_id"),
          md5(col("st.text")).as("extracted_md5"),
          length(col("st.text")).cast("bigint").as("n_extracted_chars"),
          col("st.n_links"), col("st.n_scripts"), col("st.n_tags"))
        .orderBy(col("doc_id"))
    }),
    // ---- quality scoring: length / word / type-token stats ----
    "txt_stats" -> ((s, d) => {
      Tables.documents(s, d).orderBy(col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .select(
          col("doc_id"), col("lang"), col("source"),
          length(col("text")).cast("bigint").as("char_len"),
          size(col("w")).cast("bigint").as("n_words"),
          size(array_distinct(col("w"))).cast("bigint").as("n_distinct_words"))
        .withColumn("avg_word_len",
          (col("char_len") - (col("n_words") - 1)).cast("double") / col("n_words"))
        .withColumn("type_token_ratio",
          col("n_distinct_words").cast("double") / col("n_words"))
    }),

    // ---- lexical diversity via the Simpson index — the libm-free entropy
    // substitute (token entropy needs log(); Σp² doesn't): for token
    // frequencies c_w in a doc of n tokens, diversity = 1 − Σ(c_w/n)²,
    // here as the exact integer simpson_x1e6 = 10⁶ − (10⁶·Σc²) DIV n².
    // Low diversity = looped/gibberish text (complements txt_repetition's
    // top-gram fraction: Simpson sees the WHOLE distribution, not just the
    // mode). Overflow-safe: Σc² ≤ n² and n²·10⁶ < 2⁶³ for docs up to ~3M
    // tokens (far beyond any real document; chunk first if not). Per-doc
    // partial aggregation — (doc, token) counts collapse map-side;
    // nothing global. ----
    "txt_diversity" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
          expr("CAST(1000000 - (1000000 * sum_c2) DIV (n_tokens * n_tokens) AS BIGINT)")
            .as("simpson_x1e6"))
        .orderBy(col("doc_id"))
    }),

    // ---- Gopher-style composite quality gate: the four repetition-free
    // heuristic rules a pretraining filter applies per document (word-count
    // bounds, mean-word-length band, stopword floor, lexical-diversity
    // floor), each surfaced as its own boolean next to the measurements so
    // a curator can tune one threshold without re-running the others.
    // Everything is integer-derived (scaled-x100 DIV forms) — no float
    // ratios to drift between engines. Narrow per-row projection: zero
    // shuffles, one codegen'd scan at any SF; pairs with txt_repetition
    // (top-gram fraction) and txt_diversity (Simpson) for the
    // repetition-family rules Gopher adds on top. ----
    "txt_gopher_rules" -> ((s, d) => {
      Tables.documents(s, d).orderBy(col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .withColumn("n_words", size(col("w")).cast("bigint"))
        .withColumn("mean_wlen_x100",
          expr("CAST(length(replace(text, ' ', '')) AS BIGINT) * 100 div n_words"))
        .withColumn("n_stop",
          expr(s"CAST(size(filter(w, x -> x IN ($stopList))) AS BIGINT)"))
        .withColumn("distinct_x100",
          expr("CAST(size(array_distinct(w)) AS BIGINT) * 100 div n_words"))
        .withColumn("r_len", col("n_words").between(20L, 10000L))
        .withColumn("r_wlen", col("mean_wlen_x100").between(300L, 1000L))
        .withColumn("r_stop", col("n_stop") >= 2L)
        .withColumn("r_div", col("distinct_x100") >= 20L)
        .withColumn("pass",
          col("r_len") && col("r_wlen") && col("r_stop") && col("r_div"))
        .select("doc_id", "n_words", "mean_wlen_x100", "n_stop",
          "distinct_x100", "r_len", "r_wlen", "r_stop", "r_div", "pass")
    }),

    // ---- BPE-ish regex token counting ----
    "txt_token_count" -> ((s, d) => {
      Tables.documents(s, d).orderBy(col("doc_id"))
        .select(
          col("doc_id"),
          regexp_count(col("text"), lit("[a-z0-9]+")).cast("bigint").as("n_tokens"),
          regexp_count(col("text"), lit("[aeiou]")).cast("bigint").as("n_vowels"))
    }),

    // ---- tf-idf top terms per doc. Rarity weight is the LINEAR ratio
    // (n_docs+1)/(df+1) rather than its log: log is monotone in the ratio,
    // so the per-doc ranking is identical, and the linear form is pure
    // double multiply/divide — bit-identical across engines, where libm's
    // ln() is not guaranteed to be. Two partial-agg shuffles (tf, df), a
    // word-keyed join, and a per-doc top-3 window over ≤ vocab rows per
    // doc — never over raw token volume. ----
    "txt_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = toks.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("word"))
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        // rank on the ROUNDED score so both engines break the same ties
        .withColumn("score", round(col("tf").cast("double")
          * (col("n_docs").cast("double") + 1.0)
          / (col("df").cast("double") + 1.0), 6))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("word"), col("tf"), col("df"), col("score"), col("rk"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // ---- vocabulary coverage: build the top-10-by-frequency vocab in one
    // pass (TakeOrderedAndProject — bounded, no global sort), broadcast it
    // (fixed k entries — genuinely constant-size, per the broadcast
    // policy), and score each doc's out-of-vocabulary token rate. The
    // tokenizer-coverage check a real training pipeline runs before
    // committing to a vocab. ----
    "txt_vocab_oov" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val vocab = toks.groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("word")).limit(10)
        .select(col("word"), lit(1L).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
        .orderBy(col("doc_id"))
    }),

    // ---- stopword scrub: token-level stopword removal (the filtering
    // sibling of txt_lang_id's counting). One narrow codegen'd projection —
    // split → filter → rejoin — with the scrubbed text emitted as an md5
    // fingerprint so the oracle can verify content equality without
    // shipping the full rewritten corpus through the compare. At 100 TB
    // this is a pure map stage: no shuffle, payload never leaves the
    // executor that read it. ----
    "txt_stop_scrub" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("bigint").as("n_tokens"),
          expr(s"size(filter(toks, w -> w IN ($stopList)))").cast("bigint").as("n_stop"),
          md5(expr(s"array_join(filter(toks, w -> NOT (w IN ($stopList))), ' ')"))
            .as("scrub_hash"))
        .orderBy(col("doc_id"))
    }),

    // ---- language-ID heuristic: stopword-hit ratio ----
    "txt_lang_id" -> ((s, d) => {
      Tables.documents(s, d).orderBy(col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .withColumn("stop_hits",
          expr(s"size(filter(w, x -> x IN ($stopList)))").cast("bigint"))
        .withColumn("n_words", size(col("w")).cast("bigint"))
        .withColumn("predicted_lang",
          when(col("stop_hits") * 20 >= col("n_words"), lit("en")).otherwise(lit("unk")))
        .select(col("doc_id"), col("lang"), col("stop_hits"), col("n_words"),
          col("predicted_lang"))
    }),

    // ---- deterministic stratified sampling: md5-bucket per doc, keep
    // bucket 0 per source stratum (≈10%). Hash-based so the sample is
    // stable across engines, runs, and partitionings — the reproducibility
    // a training-corpus sample needs (rand()-based sampling is none of
    // those). ----
    "txt_sample_strat" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket",
          pmod(graft.functions.TextFunctions.md5Bits(col("doc_id").cast("string"), 8), lit(10)))
        .filter(col("bucket") === 0)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ---- quality-weighted deterministic sampling: each doc kept with
    // probability proportional to a quality proxy (here: word count, capped
    // at 1), decided by comparing a per-doc md5-uniform draw against the
    // weight — the "sample good documents more" primitive of corpus
    // curation. Hash-based, so the sample is identical across engines,
    // runs, and partitionings (rand() is none of those). Narrow scan →
    // project → filter: ZERO shuffles at any scale. ----
    "txt_weighted_sample" -> ((s, d) => {
      val nWords = size(split(col("text"), " ")).cast("bigint")
      val u = u01(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("n_words", nWords)
        .withColumn("keep_p", least(lit(1.0), col("n_words").cast("double") / 200.0))
        .filter(u < col("keep_p"))
        .select(col("doc_id"), col("source"), col("n_words"),
          round(col("keep_p"), 6).as("keep_p"))
        .orderBy(col("doc_id"))
    }),

    // ---- token-budget sequence packing: assign documents to fixed-budget
    // training shards (2048 whitespace tokens) by cumulative token offset.
    // The window partitions on (source, doc_id % 16) sub-shards, NOT the
    // whole source: greedy packing is inherently sequential, so the
    // scalable form bounds each sequential run to a shard — shards pack in
    // parallel, per-window state is one running sum, and at 100 TB you
    // raise the shard count with the data. seq_id = floor(start_offset /
    // budget) is pure integer arithmetic — deterministic and identical in
    // both engines. ----
    "txt_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("shard", pmod(col("doc_id"), lit(16L)))
        .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
        .withColumn("offset", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(col("doc_id"), col("source"), col("shard").cast("bigint").as("shard"),
          col("n_tok"), expr("offset div 2048").cast("bigint").as("seq_id"))
        .orderBy(col("doc_id"))
    }),

    // ---- domain-mixture rebalancing: downsample every source to (about)
    // the smallest source's share via a HASH THRESHOLD — keep doc iff
    // uniform(md5(doc_id)) < k/n_source, where k = min source count. The
    // only shuffle is the tiny per-source count aggregate (broadcast
    // back); the corpus itself is scanned once and filtered — no
    // per-source sort, no window, no skew exposure, which is what makes
    // this the 100 TB shape. (An exact-k variant needs row_number within
    // source — a per-source sort that the biggest domain turns into the
    // straggler; the threshold form trades ±sqrt(k) size jitter for a
    // filter-only plan. Both are deterministic; the threshold form is
    // registered.)
    // NAMING POLICY (round 15): doc-count weighting is the cheap
    // DIAGNOSTIC form — txt_domain_mix_bpe (token-MASS weights under
    // the shipped BPE merge table) is the PRIMARY mix a mixture config
    // budgets with; cite the _bpe numbers (SURVEY §2.12). ----
    "txt_domain_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("u", u01(col("doc_id")))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val kMin = counts.agg(min(col("n")).as("k"))
      docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(kMin))
        .filter(col("u") < col("k").cast("double") / col("n").cast("double"))
        .select(col("doc_id"), col("source"), col("n"), col("k"))
        .orderBy(col("doc_id"))
    }),

    // ---- temperature (α=0.5) domain resampling: target fraction per
    // source ∝ sqrt(count) — the multilingual-corpus rebalancing rule that
    // upweights small domains without letting the biggest ones dominate.
    // Deterministic keep-set via the hash-vs-probability draw (same as
    // txt_domain_mix); sampled size = half the corpus. fp discipline:
    // sqrt is IEEE-exact, but the weight-sum Z is folded SEQUENTIALLY over
    // source-sorted weights (fp + isn't associative — an agg SUM would be
    // partition-order dependent), and the p formula is written with the
    // identical association on both engines. Corpus side is one scan +
    // filter against broadcast constants — no shuffle at any scale.
    // NAMING POLICY (round 15): doc-count weighting is the cheap
    // DIAGNOSTIC form — txt_temperature_mix_bpe (token-MASS weights) is
    // the PRIMARY temperature mix; cite the _bpe numbers (SURVEY §2.12).
    // ----
    "txt_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d).withColumn("u", u01(col("doc_id")))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val z = counts.agg(
        expr("aggregate(transform(sort_array(collect_list(struct(source, " +
          "sqrt(CAST(n AS DOUBLE)) AS w))), x -> x.w), 0.0D, (a, x) -> a + x)").as("z"),
        sum(col("n")).as("n_total"))
      val p = least(lit(1.0),
        sqrt(col("n").cast("double")) / col("z")
          * (col("n_total").cast("double") / 2.0) / col("n").cast("double"))
      val kept = docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(z))
        .filter(col("u") < p)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      counts.crossJoin(broadcast(z))
        .withColumn("target_frac", round(sqrt(col("n").cast("double")) / col("z"), 6))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n").as("n_docs"), col("target_frac"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // ---- the TOKEN-MASS domain mix: real mixture configs balance
    // sources by TOKENIZER tokens, not doc counts — same deterministic
    // hash-vs-probability draw as txt_domain_mix, with the per-source
    // weight = BPE token mass under the shipped merge table (the same
    // counter the budget family and the BPE dataset card use, so the
    // mix and the card can never disagree). keep-prob = min-source
    // token mass / source token mass ⇒ expected kept token mass equals
    // the smallest source's. Plan unchanged: one scan + a |sources|
    // broadcast, no shuffle of the corpus side. ----
    "txt_domain_mix_bpe" -> ((s, d) => {
      requireBpeCountable(s, d)
      val docs = Tables.documents(s, d)
        .withColumn("u", u01(col("doc_id")))
        .withColumn("n_tokens", expr(bpeTokenCountSql))
      val counts = docs.groupBy(col("source")).agg(sum(col("n_tokens")).as("n"))
      val kMin = counts.agg(min(col("n")).as("k"))
      docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(kMin))
        .filter(col("u") < col("k").cast("double") / col("n").cast("double"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("n"), col("k"))
        .orderBy(col("doc_id"))
    }),

    // ---- the TOKEN-MASS temperature (α=0.5) mix: target fraction per
    // source ∝ sqrt(token mass); sampled size = half the total token
    // mass. Identical fp discipline to txt_temperature_mix (sequential
    // source-sorted weight fold, identical association on both
    // engines); the report carries BOTH kept docs and kept token mass —
    // the number a training-mix config actually budgets. ----
    "txt_temperature_mix_bpe" -> ((s, d) => {
      requireBpeCountable(s, d)
      val docs = Tables.documents(s, d)
        .withColumn("u", u01(col("doc_id")))
        .withColumn("nt", expr(bpeTokenCountSql))
      val counts = docs.groupBy(col("source")).agg(sum(col("nt")).as("n"))
      val z = counts.agg(
        expr("aggregate(transform(sort_array(collect_list(struct(source, " +
          "sqrt(CAST(n AS DOUBLE)) AS w))), x -> x.w), 0.0D, (a, x) -> a + x)").as("z"),
        sum(col("n")).as("n_total"))
      val p = least(lit(1.0),
        sqrt(col("n").cast("double")) / col("z")
          * (col("n_total").cast("double") / 2.0) / col("n").cast("double"))
      val kept = docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(z))
        .filter(col("u") < p)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept_docs"),
          sum(col("nt")).as("kept_tokens"))
      counts.crossJoin(broadcast(z))
        .withColumn("target_frac",
          round(sqrt(col("n").cast("double")) / col("z"), 6))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n").cast("bigint").as("n_tokens"),
          col("target_frac"),
          coalesce(col("n_kept_docs"), lit(0L)).cast("bigint").as("n_kept_docs"),
          coalesce(col("kept_tokens"), lit(0L)).cast("bigint").as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // ---- INCREMENTAL mix accounting: both mixes served from the
    // per-source stats lake the streaming dedup ingest maintains
    // ([[graft.streaming.StreamRunner.dedupPublishBatch]] — one additive
    // |sources|-row rollup per published batch), instead of
    // re-tokenizing the corpus. The fixture replays the REAL ingest
    // body over three deterministic corpus slices, so the serve numbers
    // are what a continuously-fed lake would answer; the oracle replays
    // the whole sliced ingest from scratch in SQL — within-batch exact
    // dedup, per-batch MinHash near-dup drop against the accumulated
    // survivors, then the mix finalization — so a stats row that
    // double-counts a replayed batch, misses a dropped duplicate, or
    // drifts from the published corpus flips the hash. At 100 TB the
    // serve side reads |batches|x|sources| rows — corpus text is never
    // touched after its own ingest batch. ----
    "pipe_domain_mix_incr" -> ((s, d) =>
      domainMixOf(corpusStatsAgg(s, CorpusStatsFixture.build(s, d)))),
    "pipe_temperature_mix_incr" -> ((s, d) =>
      temperatureMixOf(corpusStatsAgg(s, CorpusStatsFixture.build(s, d)))),

    // ---- the COMPACTED mix serves: the per-batch stats fragments
    // FOLDED into one row per source
    // ([[graft.streaming.StreamRunner.compactStats]] — additive sums,
    // versioned `_stats_serve` snapshot) and both mixes finalized from
    // the |sources|-row single-file snapshot. The oracles are the SAME
    // from-scratch sliced-ingest replays as the `_incr` forms —
    // compacted == live == from-scratch is the fold-correctness proof
    // (a lost batch, a double-counted replay partition, or a
    // non-additive column would flip the hash). ----
    "pipe_domain_mix_compacted" -> ((s, d) =>
      domainMixOf(corpusStatsCompactedAgg(s, CorpusStatsFixture.compact(s, d)))),
    "pipe_temperature_mix_compacted" -> ((s, d) =>
      temperatureMixOf(corpusStatsCompactedAgg(s, CorpusStatsFixture.compact(s, d)))),

    // ---- the HYBRID mix serves: snapshot + live tail — the read shape
    // of a mix query while ingest keeps running. The fixture compacts
    // MID-STREAM (after batch 1 of 3), so the snapshot covers only a
    // prefix and the serve must union the live partitions above the
    // snapshot's folded_thru watermark: a boundary off-by-one
    // double-counts or drops batch 2's token mass, and the oracle —
    // the same whole-ingest replay, verbatim — flips. ----
    "pipe_domain_mix_hybrid" -> ((s, d) =>
      domainMixOf(corpusStatsHybridAgg(s, CorpusStatsHybridFixture.wh,
        CorpusStatsHybridFixture.build(s, d)))),
    "pipe_temperature_mix_hybrid" -> ((s, d) =>
      temperatureMixOf(corpusStatsHybridAgg(s, CorpusStatsHybridFixture.wh,
        CorpusStatsHybridFixture.build(s, d)))),

    // ---- the VACUUMED lake: fold → GC the folded fragments → ingest →
    // fold-forward — the LSM maintenance loop that keeps the accounting
    // lake BOUNDED in a perpetual ingest. Batches 0–1 exist ONLY inside
    // the snapshot when the second fold runs, so this query is green iff
    // fold-forward carries their mass; the oracle (the whole-ingest
    // replay, verbatim) flips on a refold-from-lake bug, a GC that
    // deletes too much, or a watermark that lets vacuumed mass leak
    // back in through the tail read. ----
    "pipe_domain_mix_vacuumed" -> ((s, d) =>
      domainMixOf(corpusStatsHybridAgg(s, CorpusStatsVacuumFixture.wh,
        CorpusStatsVacuumFixture.build(s, d)))),

    // ---- the published CORPUS lake, compacted and CONTENT-proven: the
    // survivors' text itself served from the source-partitioned `_serve`
    // generation (until now the corpus content was spec-proven and only
    // its accounting was oracle-proven). The oracle re-derives the
    // survivor set from the whole sliced-ingest replay and hashes each
    // survivor's text — a compactor that drops, duplicates, or
    // corrupts ANY published document flips a row. ----
    "pipe_corpus_compacted" -> ((s, d) => {
      val p = CorpusStatsFixture.compactCorpus(s, d)
      CorpusStatsFixture.wh.readVersion(s, s"${p}_serve")
        .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- the HYBRID corpus serve: snapshot + live tail over the
    // published documents lake. The fixture compacts AND fully vacuums
    // the corpus lake and the near-dup index MID-STREAM (after batch 1
    // of 3), so batch 2's ingest had to drop its cross-batch near-dups
    // against the `_sigs_serve`/`_hashes_serve` snapshots and the serve
    // must union the pinned generation with the live partitions above
    // its watermark. Same content proof as pipe_corpus_compacted: the
    // oracle re-derives the survivor set from the whole replay and
    // hashes every survivor's text. ----
    "pipe_corpus_hybrid" -> ((s, d) => {
      val p = CorpusLakeHybridFixture.build(s, d)
      graft.streaming.StreamRunner.hybridLakeRead(
          s, CorpusLakeHybridFixture.wh, p, s"${p}_serve")
        .select(col("doc_id"), col("source"), md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- INCREMENTAL mix drift: the ingest-time monitoring twin of
    // pipe_drift, served ENTIRELY from the stats lake — per (batch,
    // source), the batch's token share vs the corpus-wide share, in
    // integer ppm (micro-unit discipline: bigint multiply-then-DIV on
    // both engines, no fp). A source whose per-batch share wanders more
    // than one point (10000 ppm) off its corpus share flags `drifted` —
    // the signal a mixture-controlled ingest pages on ("this feed's
    // composition shifted THIS batch"). The oracle replays the whole
    // sliced ingest and re-derives the per-batch survivor stats from
    // scratch, so a stats row misattributed to the wrong batch — which
    // the mix totals would forgive — flips this hash. At 100 TB: the
    // serve reads |batches|x|sources| rows; the totals it joins are
    // |batches|-row and |sources|-row broadcast sides. ----
    "pipe_mix_drift_incr" -> ((s, d) => {
      val p = CorpusStatsFixture.build(s, d)
      val lake0 = CorpusStatsFixture.wh.read(s, s"${p}_stats")
      requireStatsUntainted(lake0, p) // same memo key as the mix serves
      val lake = lake0
        .select(col("ingest_batch").cast("bigint").as("ingest_batch"),
          col("source"), col("n_docs"),
          col("n_tokens_bpe").as("n_tokens"))
      val batchTot = lake.groupBy(col("ingest_batch"))
        .agg(sum(col("n_tokens")).cast("bigint").as("batch_tokens"))
      val srcTot = lake.groupBy(col("source"))
        .agg(sum(col("n_tokens")).cast("bigint").as("src_tokens"))
      val grand = srcTot.agg(sum(col("src_tokens")).cast("bigint").as("all_tokens"))
      lake.join(broadcast(batchTot), Seq("ingest_batch"))
        .join(broadcast(srcTot), Seq("source"))
        .crossJoin(broadcast(grand))
        // the ×1e6 runs in DECIMAL(38,0): a bigint multiply would wrap
        // Spark's non-ANSI Long arithmetic once a group exceeds ~9.2e12
        // BPE tokens — inside the 100 TB envelope — while DuckDB raises
        // on BIGINT overflow, so engine and oracle would diverge exactly
        // at scale. DIV on decimals is still exact integer division
        // (IntegralDivide → BIGINT); the oracle widens through HUGEINT.
        .withColumn("batch_ppm",
          expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV batch_tokens"))
        .withColumn("corpus_ppm",
          expr("CAST(src_tokens AS DECIMAL(38,0)) * 1000000 DIV all_tokens"))
        .withColumn("drift_ppm", abs(col("batch_ppm") - col("corpus_ppm")))
        .select(col("ingest_batch"), col("source"), col("n_docs"),
          col("n_tokens"), col("batch_ppm"), col("corpus_ppm"),
          col("drift_ppm"), (col("drift_ppm") > 10000L).as("drifted"))
        .orderBy(col("ingest_batch"), col("source"))
    }),

    // ---- fuzzy matching: Levenshtein distance over blocked short-text
    // pairs (identical metric in both engines). The THRESHOLD form of the
    // builtin (levenshtein(l, r, k) — banded DP, early exit, -1 beyond the
    // bound) does O(k·n) work instead of the full O(n·m) table; for kept
    // pairs (distance ≤ k) its value equals the unbounded metric, so the
    // DuckDB oracle stays the plain levenshtein + WHERE ≤ k. ----
    "txt_levenshtein" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), substring(col("text"), 1, 30).as("prefix"))
        .filter(col("doc_id") < 50)
      t.as("a").join(t.as("b"),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.prefix"), col("b.prefix"), 20).cast("bigint").as("lev"))
        .filter(col("lev") >= 0 && col("lev") <= 20)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- fuzzy matching at corpus scale: blocked by CONTENT-derived keys
    // (first TWO tokens + prefix-length band), not by a row-id cut like the
    // demo query above. Same shape as the LSH pipelines: the equi-join
    // bounds the quadratic pair space to within-block pairs, the exact
    // metric verifies candidates. Blocking is recall-approximate by design
    // (an edit inside the leading tokens moves a doc between blocks) —
    // standard prefix-blocking trade, documented; the two-token key keeps
    // block sizes ~vocab× smaller than single-token blocking (30× fewer
    // candidate pairs on the fixture), which is what keeps the verify
    // stage bounded as the corpus grows. ----
    "txt_fuzzy_block" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 30).as("prefix"))
        .withColumn("blk_tok", split(col("prefix"), " ")(0))
        .withColumn("blk_tok2",
          coalesce(expr("try_element_at(split(prefix, ' '), 2)"), lit("")))
        .withColumn("blk_len", floor(length(col("prefix")) / 10).cast("bigint"))
      t.as("a").join(t.as("b"),
          col("a.blk_tok") === col("b.blk_tok") &&
            col("a.blk_tok2") === col("b.blk_tok2") &&
            col("a.blk_len") === col("b.blk_len") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          // threshold form: banded O(k·n) with early exit (-1 beyond k),
          // equal to the unbounded metric on every kept pair
          levenshtein(col("a.prefix"), col("b.prefix"), 15).cast("bigint").as("lev"))
        .filter(col("lev") >= 0 && col("lev") <= 15)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // ---- benchmark-contamination check via [[contamination]]: the
    // stand-in eval set is `doc_id % 50 == 0 AND doc_id < 2000` — BOUNDED
    // at ≤ 40 docs at ANY scale factor, so the broadcast the operator
    // relies on is safe by construction (round 2's unbounded `% 50` slice
    // grew with the corpus, which would have forced a shuffle join on a
    // skewed shingle key at 100 TB). Both filters push to the parquet
    // scan; the bench-side scan reads almost nothing. ----
    "txt_contamination" -> ((s, d) => {
      val isBench = (col("doc_id") % 50 === 0) && (col("doc_id") < 2000)
      val docs = Tables.documents(s, d)
      contamination(docs.filter(!isBench), docs.filter(isBench))
    }),

    // ---- repetition scoring (Gopher-style quality rule): fraction of the
    // document covered by its most frequent unigram and bigram — the
    // filter that removes boilerplate/looped text before training. Narrow
    // per-doc aggregation: two explode→count passes shuffling (doc, gram)
    // partial counts. ----
    // ---- bigram language-model quality scoring (CCNet-style, rational
    // form): train corpus bigram/prefix counts, score each document by its
    // mean scaled transition probability. Perplexity's log() is libm (not
    // correctly-rounded → not oracle-portable), so the score is the exact
    // RATIONAL mean of P(w_i|w_{i-1}) scaled to 1e6: per bigram,
    // p = c(w1,w2)·10⁶ DIV c(w1·) — integer division, so the per-doc sum
    // is partition-order independent and the one final IEEE division is
    // identical in DuckDB. Monotone in the geometric-mean ranking's
    // direction for the filtering use (low mean ⇒ improbable text).
    // Scale: bigram extraction is a shuffle-free HOF projection; the
    // count tables are vocab-sized partial aggs; the score joins shuffle
    // on the token key — stopword-skewed, which is exactly what AQE
    // skew-split handles (AqeSkewSpec pins the mechanism). ----
    "txt_bigram_lm" -> ((s, d) => {
      val bi = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))"
        )).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c2 = bi.groupBy(col("w1").as("c2_w1"), col("w2").as("c2_w2"))
        .agg(count(lit(1)).as("n2"))
      val c1 = bi.groupBy(col("w1").as("c1_w1"))
        .agg(count(lit(1)).as("n1"))
      bi.join(c2, col("w1") === col("c2_w1") && col("w2") === col("c2_w2"))
        .join(c1, col("w1") === col("c1_w1"))
        .withColumn("ps", expr("(n2 * 1000000L) div n1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("ps")).cast("double") / count(lit(1)), 4).as("avg_p"))
        .orderBy(col("doc_id"))
    }),

    // ---- DSIR-style importance-resampling weights (data selection via
    // importance resampling): score every document by the smoothed unigram
    // likelihood ratio of a TARGET domain (lang = 'en') vs the whole
    // corpus — the weight used to upsample target-like data when composing
    // a training mix. Libm-free rational form (same discipline as
    // txt_bigram_lm): per token, base = (c_tgt+1)·10⁶ DIV (c_all+1) ≤ 10⁶
    // (target ⊆ corpus so c_tgt ≤ c_all), and the constant smoothing
    // factor (N_all+V)/(N_tgt+V) multiplies the per-doc SUM once at the
    // end — no intermediate exceeds ~10¹⁸ at any SF and every division is
    // integral, so scores are partition-order independent and
    // oracle-hashable. Scale: token extraction is a shuffle-free
    // projection; the count tables are vocab-sized partial aggs; the score
    // join shuffles on the token key (stopword-skewed — AQE skew-split's
    // case); the 1-row totals broadcast. ----
    "txt_dsir_weights" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy(col("w").as("t_w")).agg(count(lit(1)).as("ct"))
      val allc = toks.groupBy(col("w").as("a_w")).agg(count(lit(1)).as("ca"))
      val tot = toks.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("bigint").as("nt"),
        count(lit(1)).as("na"),
        countDistinct(col("w")).as("v"))
      toks
        .join(allc, col("w") === col("a_w"))
        .join(tgt, col("w") === col("t_w"), "left")
        .select(col("doc_id"),
          expr("((coalesce(ct, 0L) + 1) * 1000000L) DIV (ca + 1)").as("base"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("base")).as("sb"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST((sb * (na + v)) DIV ((nt + v) * n_tokens) AS BIGINT)")
            .as("dsir_score"))
        .orderBy(col("doc_id"))
    }),

    "txt_repetition" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val uni = docs.select(col("doc_id"), size(col("w")).as("n_words"),
          explode(col("w")).as("g"))
        .groupBy(col("doc_id"), col("n_words"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n_words")).agg(max(col("c")).as("top_uni"))
      val bi = docs.filter(size(col("w")) >= 2)
        .select(col("doc_id"), (size(col("w")) - 1).as("n_bigrams"),
          explode(expr(
            "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"
          )).as("g"))
        .groupBy(col("doc_id"), col("n_bigrams"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n_bigrams")).agg(max(col("c")).as("top_bi"))
      uni.join(bi, "doc_id")
        .select(col("doc_id"),
          col("n_words").cast("bigint").as("n_words"),
          round(col("top_uni").cast("double") / col("n_words"), 6).as("top_uni_frac"),
          round(col("top_bi").cast("double") / col("n_bigrams"), 6).as("top_bi_frac"))
        .orderBy(col("doc_id"))
    }),

    // ---- the composed corpus build: quality gate → exact-dedup
    // keep-first → deterministic hash sample, as ONE declarative plan (what
    // a training-data user actually runs — the stages fuse: Catalyst pushes
    // the quality filter into the scan and the sample predicate below the
    // join). Each stage is individually oracle-checked elsewhere
    // (txt_stats / dedup_exact / txt_sample_strat); this row checks the
    // composition. ----
    "pipe_corpus_build" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 5)
      val keep = docs.groupBy(md5(col("text")).as("ch"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      docs.join(keep, "doc_id")
        .filter(pmod(graft.functions.TextFunctions
          .md5Bits(col("doc_id").cast("string"), 8), lit(10)) < 3)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // ---- the FULL curation pipeline composed into one declarative plan:
    // quality gate (token-count floor, pushed to the scan) → exact dedup
    // (content-hash keep-min, one 16-byte-key shuffle) → domain-mixture
    // rebalance (hash threshold vs broadcast per-source survivor counts —
    // filter-only) → token-budget sequence packing (window on bounded
    // (source, shard) sub-shards). Four curation stages, TWO data
    // shuffles total at any scale; each stage is individually
    // oracle-checked elsewhere (txt_stats / dedup_exact / txt_domain_mix /
    // txt_pack_sequences) — this row checks the composition. ----
    "pipe_training_shards" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("bigint"))
        .filter(col("n_tok") >= 5)
        .withColumn("ch", md5(col("text")))
      val keep = base.groupBy(col("ch")).agg(min(col("doc_id")).as("doc_id"))
      val uniq = base.join(keep, Seq("ch", "doc_id"))
      val counts = uniq.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val kMin = counts.agg(min(col("n")).as("k"))
      val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      uniq
        .join(broadcast(counts), "source")
        .crossJoin(broadcast(kMin))
        .filter(u01(col("doc_id")) < col("k").cast("double") / col("n").cast("double"))
        .withColumn("shard", pmod(col("doc_id"), lit(16L)))
        .withColumn("offset", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(col("doc_id"), col("source"), col("shard").cast("bigint").as("shard"),
          col("n_tok"), expr("offset div 2048").cast("bigint").as("seq_id"))
        .orderBy(col("doc_id"))
    }),

    // ---- data-quality report: per-source completeness / uniqueness /
    // range metrics — the gate a corpus build runs before training ----
    "txt_quality_report" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_distinct_ids"),
          sum(when(col("text").isNull || col("text") === "", 1L).otherwise(0L)).as("n_empty_text"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .withColumn("ids_unique", col("n_distinct_ids") === col("n_rows"))
        .orderBy(col("source"))
    }),

    // ---- document fingerprinting: rolling modular hash + md5 ----
    "txt_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).orderBy(col("doc_id"))
        .select(
          col("doc_id"),
          expr(
            """aggregate(split(text, ' '), CAST(0 AS BIGINT),
              |  (acc, w) -> pmod(acc * 31 + CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT), 1000000007))
              |""".stripMargin).as("fp_rolling"),
          md5(col("text")).as("fp_md5"))
    }),

    // ---- one BPE merge-table round: the corpus-wide adjacent-symbol pair
    // counts a byte-pair-encoding tokenizer trainer computes to pick its
    // next merge — here the first round (symbols = characters), reported
    // as the top-10 pairs (count DESC, pair ASC tiebreak). Each token
    // occurrence contributes its pairs, exactly like the classic BPE count
    // over the word-frequency table. One explode → count shuffle where
    // (pair, partial_count) combines map-side — at 100 TB the shuffle
    // carries ~|alphabet|² rows per mapper, not token volume; later rounds
    // re-run the same plan over the re-segmented corpus with the merge
    // applied (the iteration is driver-controlled, one plan per round).
    // ----
    "txt_bpe_merges" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
        )).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("pair"))
        .limit(10)
    }),

    // ---- applying a trained BPE merge table: the inference half of the
    // tokenizer (txt_bpe_merges is the training half). The 10-entry merge
    // table is the shipped artifact — dimension-sized state inlined as
    // literals (the PQ-codebook / SRP-plane pattern); each pair rewrites
    // to a single placeholder symbol, applied in rank order as a chained
    // literal replace (left-to-right non-overlapping in both engines, so
    // interacting merges — 'the' consumed by 'th' before 'he' can see it —
    // resolve identically). Merges run BEFORE space-stripping so a pair
    // can never bridge a word boundary. Output: per-doc symbol counts
    // before/after + compression per 10k symbols, all exact integers.
    // Shuffle-free scan at any SF. ----
    "txt_bpe_apply" -> ((s, d) => {
      requireBpeCountable(s, d)
      Tables.documents(s, d).orderBy(col("doc_id"))
        .select(col("doc_id"),
          expr("CAST(length(replace(text, ' ', '')) AS BIGINT)")
            .as("n_syms_before"),
          expr(s"CAST(length(replace(${bpeApplied("text")}, ' ', '')) AS BIGINT)")
            .as("n_syms_after"))
        .withColumn("saved_x10000",
          expr("(n_syms_before - n_syms_after) * 10000 div n_syms_before"))
    }),

    // ---- the FULL BPE training loop: iterate count → pick-top-merge →
    // re-segment for 5 rounds, producing a real (hierarchical) merge table
    // — txt_bpe_merges is one loop body, txt_bpe_apply is the shipped
    // artifact's inference half; this composes them. Round r counts
    // adjacent symbol pairs over the corpus AS RE-SEGMENTED by merges
    // 1..r−1 (each merged pair becomes a fresh single placeholder symbol,
    // so later rounds can merge ACROSS earlier merges — the hierarchy a
    // real tokenizer vocabulary has), picks the (count DESC, pair ASC)
    // winner, and records the corpus symbol count after applying it. The
    // iteration is driver-controlled: one counting job + one shuffle-free
    // re-measure job per round, each a full corpus scan with the merge
    // chain applied as chained literal `replace` (codegen'd; no UDF), and
    // per round exactly ONE 1-row collect — the selected pair — the same
    // bounded driver state as the PQ codebook / SRP planes. Result is the
    // merge table itself: inherently driver-sized (N rows for N rounds).
    // At 100 TB a trainer caps per-round cost by sampling the corpus
    // (standard practice — BPE statistics converge long before full-corpus
    // counts); the per-round plan is unchanged, only the input fraction.
    // Oracle: the identical loop as 5 chained CTE levels with the picked
    // pair flowing through scalar subqueries — the sequential-greedy
    // oracle pattern (sim_topk_mmr precedent). ----
    "txt_bpe_train" -> ((s, d) => {
      val (_, table) = bpeTrainLoop(Tables.documents(s, d).select(col("text")))
      import s.implicits._
      table.toDF("round", "pair", "symbol", "n", "n_syms_after")
        .orderBy(col("round"))
    }),

    // ---- the SAMPLED trainer — the 100 TB form of txt_bpe_train: the
    // exact loop drives 1–2 full corpus scans per merge round (5 rounds
    // ≈ 5–10 corpus passes), so at scale the standard move is the
    // q_percentiles_approx BOTTOM-K-BY-HASH idiom: the [[BpeSampleK]]
    // (384) documents with the smallest content-md5 rank form a deterministic
    // fixed-SIZE sample (one TakeOrderedAndProject corpus scan — no
    // window, no shuffle of text; ties are identical texts, so the
    // sampled multiset is replay-stable on both engines), cached, and
    // the 5 greedy rounds run over those 384 rows — per-round cost is
    // CONSTANT in corpus size, so the whole trainer is one corpus scan
    // plus O(k) work. Pair frequencies are corpus-wide ratios, so the
    // sampled argmax picks the same merges wherever the true top pair's
    // margin exceeds sampling noise (OperatorSmokeSpec pins merge-SET
    // agreement with the exact trainer at fixture scale — near-tied
    // rounds may swap order, which is segmentation-neutral for the
    // disjoint pairs the spec also asserts); n / n_syms_after are
    // sample-sized by definition. The oracle replays the identical
    // greedy loop over the identically-sampled t0. ----
    "txt_bpe_train_sampled" -> ((s, d) => {
      val sample = Tables.documents(s, d)
        .select(col("text"),
          graft.functions.TextFunctions.md5Bits(col("text"), 14).as("__h"))
        .orderBy(col("__h"), col("text"))
        .limit(BpeSampleK)
        .select(col("text"))
        .cache()
      try {
        val (_, table) = bpeTrainLoop(sample)
        import s.implicits._
        table.toDF("round", "pair", "symbol", "n", "n_syms_after")
          .orderBy(col("round"))
      } finally sample.unpersist(): Unit
    }),

    // ---- the tokenizer LIFECYCLE capstone: train the 5-round merge
    // table on this corpus ([[bpeTrainLoop]] — the txt_bpe_train loop),
    // then apply the TRAINED chain to every document (txt_bpe_apply's
    // inference shape, but with the merges the corpus itself produced,
    // not a shipped literal artifact) — per-doc symbol counts before /
    // after and compression per 10k symbols, all exact integers. This is
    // what "a user can train a tokenizer and run it" means end-to-end.
    // Same plan economics as its halves: training is driver-controlled
    // (two partial-agg'd jobs + one 1-row collect per round), inference
    // is one shuffle-free chained-replace scan. Oracle: the identical
    // greedy loop as chained MATERIALIZED CTEs carrying doc_id, the
    // trained pairs flowing through scalar subqueries — the oracle never
    // sees the Spark side's picks. ----
    "pipe_tokenizer_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (chain, _) = bpeTrainLoop(docs.select(col("text")), measureRounds = false)
      docs.orderBy(col("doc_id"))
        .select(col("doc_id"),
          expr("CAST(length(replace(text, ' ', '')) AS BIGINT)")
            .as("n_syms_before"),
          expr(s"CAST(length(replace($chain, ' ', '')) AS BIGINT)")
            .as("n_syms_after"))
        .withColumn("saved_x10000",
          expr("(n_syms_before - n_syms_after) * 10000 div n_syms_before"))
    }),

    // ---- corpus n-gram frequency: top-3 bigrams per language by count
    // (deterministic bigram tiebreak) — the vocabulary/corpus-statistics
    // pass of a training pipeline. One explode → count shuffle with partial
    // agg (bigram counts combine map-side), then a per-language top-k. At
    // 100 TB the count agg is the only heavy stage and shuffles
    // (lang, bigram, partial_count) rows, not documents. ----
    "txt_ngram_freq" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bi = Tables.documents(s, d)
        .select(col("lang"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"
        )).as("bigram"))
        .groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("n"))
      val byLang = Window.partitionBy(col("lang")).orderBy(desc("n"), col("bigram"))
      bi.withColumn("rk", row_number().over(byLang))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("bigram"), col("n"), col("rk").cast("bigint").as("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // ---- heavy hitters (tokens with frequency > n/(k+1)) via the two-pass
    // Misra–Gries pattern: pass 1 is graft_mgsketch (bounded k=32-counter
    // summary, map-side partials cap at k entries — the full-vocab groupBy
    // this replaces shuffles every distinct token, at 100 TB trillions of
    // skewed keys); pass 2 exactly counts ONLY the ≤ k candidates (broadcast
    // join, build side ≤ k rows) and keeps those with exact count
    // > n/(k+1). The MG superset guarantee (every such item IS a candidate,
    // any arrival order) makes the output exact and deterministic even
    // though the intermediate summary is not — which is why the oracle can
    // be plain exact SQL. ----
    // ---- cross-document boilerplate scrub (the C4/CCNet line-dedup rule,
    // over 5-word segments since the corpus has no newlines): drop every
    // segment whose text appears in MORE than one distinct document, keep
    // the survivors in order. The doc-frequency aggregate and the join
    // back are keyed on md5(seg) — 32-byte keys, never the segment text —
    // so at 100 TB the shuffle carries hashes while the text rides only
    // the narrow per-doc reassembly. Output carries an md5 fingerprint of
    // the scrubbed text, not the text itself (narrow result at any SF). ----
    "txt_boilerplate_scrub" -> ((s, d) =>
      scrubBoilerplate(Tables.documents(s, d))),

    // ---- sliding-window chunking (training-sequence prep): 32-token
    // chunks at stride 24 (8-token overlap), per-doc. Pure explode +
    // slice — zero shuffles, one codegen stage; chunk count grows with
    // corpus volume, never with corpus count, so the plan is identical at
    // 100 TB. Tail chunks shorter than the stride are kept (n_tokens says
    // how short). ----
    "txt_chunk_overlap" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).as("nw"), col("w"),
          explode(expr("sequence(0, size(w) - 1, 24)")).as("start"))
        .select(col("doc_id"),
          expr("start DIV 24").cast("bigint").as("chunk_idx"),
          least(lit(32), col("nw") - col("start")).cast("bigint").as("n_tokens"),
          expr("concat_ws(' ', slice(w, start + 1, 32))").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "txt_heavy_hitters" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
      val sk = toks.agg(
        call_function("graft_mgsketch", col("word"), lit(32)).as("cand"),
        count(lit(1)).as("n"))
      val cands = sk
        .select(explode(col("cand")).as("c"), col("n"))
        .select(col("c").getField("token").as("word"), col("n"))
      toks.join(broadcast(cands), "word")
        .groupBy(col("word"), col("n"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 33L > col("n"))
        .select(col("word"), col("cnt"))
        .orderBy(col("word"))
    }),

    // ---- vocabulary coverage curve: for each min_count threshold, the
    // vocab size and the corpus-mass coverage of keeping only tokens with
    // count ≥ threshold — the report that decides a tokenizer's min_count
    // (too low: vocab bloat; too high: OOV explosion). The exact per-token
    // count is the one vocab-sized shuffle (map-side combined; run at
    // tokenizer-design time, not per batch); everything after runs on the
    // count-of-counts HISTOGRAM (|distinct counts| rows — the q_skew_report
    // trick), so the 6 thresholds re-aggregate a report, not the corpus.
    // Coverage in exact integer millionths. ----
    "txt_vocab_coverage" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
      val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("n_at"))
      val tot = hist.agg(sum(col("c") * col("n_at")).cast("bigint").as("total_mass"))
      val thresholds = {
        import s.implicits._
        Seq(1L, 2L, 4L, 8L, 16L, 32L).toDF("min_count")
      }
      hist.crossJoin(broadcast(thresholds))
        .filter(col("c") >= col("min_count"))
        .groupBy(col("min_count"))
        .agg(sum(col("n_at")).cast("bigint").as("vocab_size"),
          sum(col("c") * col("n_at")).cast("bigint").as("kept_mass"))
        .crossJoin(broadcast(tot))
        // the millionths multiply runs in DECIMAL(38,0): 1e6 × a BIGINT
        // token mass overflows Long at ~9.2e12 tokens — a real 100 TB
        // corpus is past that; DuckDB computes the same value in HUGEINT
        .select(col("min_count"), col("vocab_size"), col("kept_mass"),
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * kept_mass DIV total_mass AS BIGINT)")
            .as("coverage_x1e6"))
        .orderBy(col("min_count"))
    }),

    // ---- Count-Min point-frequency estimates: ONE constant-state (2 KB)
    // sketch pass over the token stream, then per-probe-word estimates
    // looked up in the broadcast summary beside their exact counts. The
    // estimate never undercounts (overcount column shows the collision
    // cost — the absent probe word makes it visible). At 100 TB the
    // sketch's map-side partials cap at 256 cells per mapper, vs the full
    // vocabulary shuffle of a direct GROUP BY token; the exact side here
    // exists only to audit the sketch and filters to the |probes| keys
    // BEFORE its aggregation. ----
    "txt_cms_freq" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      cmsEstimates(s, Tables.documents(s, d), rollup = false)
    }),

    // ---- the re-aggregation half of the CMS contract (same shape as
    // q_hll_rollup): build per-source sketches — the persisted per-shard
    // summaries a 100 TB lake would keep — then answer the corpus-wide
    // question by graft_cms_merge over the 2 KB summaries, never
    // re-reading raw tokens. CMS cells are plain sums, so the rollup is
    // bit-identical to sketching raw globally — exactly what the shared
    // oracle SQL checks. ----
    "txt_cms_rollup" -> ((s, d) => {
      graft.plans.GraftExtensions.ensureRegistered(s)
      cmsEstimates(s, Tables.documents(s, d), rollup = true)
    }),

    // ---- BM25 lexical retrieval (Robertson–Spärck Jones, k1=1.2 b=0.75):
    // the keyword-search companion to the sim_* ANN ladder — rank the
    // corpus against a query, here the corpus's own top-5 non-stop terms
    // (deterministic on both engines: frequency DESC, word ASC). The whole
    // scoring chain is INTEGER rational arithmetic so the per-doc sum is
    // partition-order independent and oracle-hashable: idf scaled 1e3 as
    // (N−df)·10³ DIV (df+1); the tf saturation term cleared of its k1/b
    // fractions by multiplying through by 10·total_tokens —
    // tfn = 2.2·tf / (tf + 0.3 + 0.9·dl·N/total) becomes
    // 22·tf·total / (10·tf·total + 3·total + 9·dl·N) exactly. Values stay
    // < 2⁶³ through sf10 (idf ≤ N·10³, numerator ≤ idf·22·dl·total); a
    // production engine at larger N swaps the same plan onto doubles and
    // drops the oracle guarantee. Scale: tf is a semi-join against the
    // broadcast 5-term query before any grouping, so the per-(doc,term)
    // agg touches only matching tokens; df/dl are partial-agg'd; the
    // 1-row totals broadcast; top-10 plans TakeOrderedAndProject — no
    // global sort. ----
    "txt_bm25_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val qterms = toks.filter(!col("word").isin(stop: _*))
        .groupBy(col("word")).agg(count(lit(1)).as("cf"))
        .orderBy(desc("cf"), col("word")).limit(5)
        .select(col("word"))
      val tf = toks.join(broadcast(qterms), "word")
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      bm25Score(tf, toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
    }),

    // ---- BM25 served from a PERSISTED inverted index: the same top-10
    // ranking as [[txt_bm25_topk]] (identical oracle — that hash-equality
    // IS the index-correctness proof), but the corpus text is never read.
    // Build-once artifacts (DerivedArtifacts staleness contract): the
    // postings list (word, doc_id, tf) and the doc-length table — exactly
    // what Lucene persists, in columnar form. Serving touches postings
    // only: query-term collection frequency is sum(tf) over postings (==
    // the live token count by construction), the 5-term query broadcasts,
    // and the scan of everything else prunes at the parquet row-group
    // level. At 100 TB this is the difference between a search that
    // re-tokenizes the lake and one that reads a posting-list slice —
    // index once, serve forever; the [[sim_topk_pq_artifact]] precedent
    // for the lexical side. ----
    "txt_bm25_artifact" -> ((s, d) => {
      val postings = Dedup.DerivedArtifacts.table(s, d, "documents", "bm25_postings")(
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf")))
      val doclen = Dedup.DerivedArtifacts.table(s, d, "documents", "bm25_doclen")(
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
      val qterms = postings.filter(!col("word").isin(stop: _*))
        .groupBy(col("word")).agg(sum(col("tf")).as("cf"))
        .orderBy(desc("cf"), col("word")).limit(5).select(col("word"))
      bm25Score(postings.join(broadcast(qterms), "word"), doclen)
    }),

    // ---- BM25 served from a COMPACTED postings generation: the streamed
    // index accumulates one (wb, ingest_batch) fragment per micro-batch —
    // after thousands of batches every k-term probe reads thousands of
    // posting files per term bucket, the fragmented-segment problem
    // Lucene solves with merges. The fixture materializes that exact
    // fragmented layout (8 synthetic ingest generations), runs
    // [[graft.streaming.StreamRunner.compactPostings]] — a layout-only
    // rewrite into ONE wb-partitioned VERSIONED snapshot (~one file per
    // term bucket; the `_VERSION` flip is the atomic reader-visible
    // commit) — and this query ranks from the pinned compacted
    // generation. The oracle is IDENTICAL to txt_bm25_topk/artifact:
    // that hash equality IS the proof that compaction changed the file
    // layout and nothing else. At 100 TB: probe cost goes from
    // O(batches) file opens per bucket back to O(1), ingest keeps
    // appending to the fragmented lake, and the next compaction commits
    // the next generation. ----
    // ---- postings-lake MAINTENANCE policy: per term bucket, how many
    // ingest fragments have accumulated and should this bucket's
    // generation be merged — the signal a scheduler polls to decide when
    // to run [[graft.streaming.StreamRunner.compactPostings]] (Lucene's
    // merge policy for the streamed index; the pipe_compaction_plan
    // idiom applied to the postings layout). Reads the FRAGMENTED lake's
    // metadata-weight columns only (wb, ingest_batch, word) — partial-
    // agg'd to 16 bucket rows; the posting payloads never move. Merge
    // rule: > 4 fragments in a bucket (each probe pays one file open per
    // fragment per term — the cost the compacted generation amortizes to
    // one). ----
    "txt_postings_merge_plan" -> ((s, d) => {
      val (wh, _, _) = PostingsLakeFixture.compacted(s, d)
      wh.read(s, "lex_postings")
        .groupBy(col("wb").cast("bigint").as("wb"))
        .agg(countDistinct(col("ingest_batch")).as("n_fragments"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("word")).as("n_terms"))
        .select(col("wb"), col("n_fragments"), col("n_rows"), col("n_terms"),
          (col("n_fragments") > 4).as("merge"))
        .orderBy(col("wb"))
    }),

    "txt_bm25_compacted" -> ((s, d) => {
      val (wh, pv, dv) = PostingsLakeFixture.compacted(s, d)
      val postings = wh.readVersion(s, "lex_postings_serve", Some(pv))
      val doclen = wh.readVersion(s, "lex_doclen_serve", Some(dv))
      val qterms = postings.filter(!col("word").isin(stop: _*))
        .groupBy(col("word")).agg(sum(col("tf")).as("cf"))
        .orderBy(desc("cf"), col("word")).limit(5).select(col("word"))
      bm25Score(postings.join(broadcast(qterms), "word"),
        doclen.select(col("doc_id"), col("dl")))
    }),

    // ---- the HYBRID BM25 serve: snapshot + live tail over BOTH index
    // tables — the lexical lake joins the semantic/IVF/corpus/frontier
    // lakes in the bounded-under-perpetual-ingest story. The fixture
    // folds batches 0–5 into the `_serve` generations and VACUUMS their
    // fragments before batches 6–7 land, so the ranking is only whole if
    // the read unions the pinned snapshot with the watermark-pruned
    // tail. The oracle is the SAME full-corpus BM25 SQL as
    // txt_bm25_topk/artifact/compacted — hash equality across all four
    // serve layouts IS the layout-independence proof. ----
    "txt_bm25_hybrid" -> ((s, d) => {
      val wh = PostingsLakeHybridFixture.warehouse(s, d)
      val postings = graft.streaming.StreamRunner.hybridLakeRead(
        s, wh, "lex_postings", "lex_postings_serve")
      val doclen = graft.streaming.StreamRunner.hybridLakeRead(
        s, wh, "lex_doclen", "lex_doclen_serve")
      val qterms = postings.filter(!col("word").isin(stop: _*))
        .groupBy(col("word")).agg(sum(col("tf")).as("cf"))
        .orderBy(desc("cf"), col("word")).limit(5).select(col("word"))
      bm25Score(postings.join(broadcast(qterms), "word"),
        doclen.select(col("doc_id"), col("dl")))
    }),

    // ---- POSITIONAL phrase search (Lucene PhraseQuery): exact "w1 w2"
    // adjacency matched from POSITIONAL postings — (word, doc_id,
    // positions[]) — by intersecting w1's positions with w2's shifted by
    // one (`filter(pos1, p -> array_contains(pos2, p+1))`, codegen'd
    // HOFs). The 3 probe phrases are the corpus's top non-stopword
    // bigrams (TakeOrderedAndProject, no window anywhere in this query:
    // bigram enumeration is a per-row transform/sequence HOF, not a
    // lead() window). The oracle computes phrase frequency the OTHER way
    // — direct bigram-occurrence counting — so the hash only agrees if
    // the position lists and the adjacency intersection are exact.
    // Scale: postings are semi-join-pruned to the ≤6 probe words BEFORE
    // the grouping (the bm25 broadcast-prune precedent), so the
    // positional join touches a vanishing slice of the lake; per-doc
    // position arrays are doc-length-bounded state; the final rollup is
    // 3 rows. The argmax doc re-derives via a broadcast join back on
    // max_tf (two-pass argmax — no max_by nondeterminism, no window). ----
    "txt_phrase_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val words = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      val occ = words.filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(!col("w1").isin(stop: _*) && !col("w2").isin(stop: _*))
      val topPhrases = occ.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cf"))
        .withColumn("phrase", concat(col("w1"), lit(" "), col("w2")))
        .orderBy(desc("cf"), col("phrase")).limit(3)
        .select(col("phrase"), col("w1"), col("w2"))
      val probeWords = topPhrases.select(col("w1").as("word"))
        .union(topPhrases.select(col("w2").as("word"))).distinct()
      val postings = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .join(broadcast(probeWords), "word")
        .groupBy(col("word"), col("doc_id"))
        .agg(sort_array(collect_list(col("pos"))).as("positions"))
      val m = postings.as("p1")
        .join(broadcast(topPhrases), col("w1") === col("p1.word"))
        .join(postings.as("p2"),
          col("w2") === col("p2.word") && col("p1.doc_id") === col("p2.doc_id"))
        .select(col("phrase"), col("p1.doc_id").as("doc_id"),
          size(expr("filter(p1.positions, p -> array_contains(p2.positions, p + 1))"))
            .cast("bigint").as("tf"))
        .filter(col("tf") > 0)
      val agg = m.groupBy(col("phrase")).agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("tf")).cast("bigint").as("total_occ"),
        max(col("tf")).cast("bigint").as("max_tf"))
      m.join(broadcast(agg), "phrase")
        .filter(col("tf") === col("max_tf"))
        .groupBy(col("phrase"), col("n_docs"), col("total_occ"), col("max_tf"))
        .agg(min(col("doc_id")).cast("bigint").as("best_doc"))
        .orderBy(col("phrase"))
    }),

    // ---- trained quality classifier, batch-perceptron form (the learned
    // filter a DataComp/Dolma-style pipeline trains to keep target-like
    // text; labels here: lang = 'en' → +1). Features are hashed
    // token-counts — 16 md5 buckets + a bias slot — so the model is a
    // 17-long integer vector and training is PURE AGGREGATION: epoch 1
    // from w=0 (every doc has margin 0 ⇒ misclassified ⇒ contributes y·x),
    // w₁[f] = Σ y·x[f]; epoch 2 re-scores every doc under w₁ (one
    // broadcast join — weights never shuffle) and adds Σ y·x over the
    // still-misclassified (y·m ≤ 0). Integer weights end-to-end: no
    // sigmoid/exp (libm, not oracle-portable), no learning-rate float —
    // bit-identical on any engine, any partitioning. This IS distributed
    // batch gradient descent's data movement: per epoch one doc-keyed
    // margin agg + one feature-keyed gradient agg, model state broadcast —
    // the shape that holds at 100 TB where per-doc state never leaves its
    // partition. Trains on the even-doc_id half; [[txt_perceptron_apply]]
    // evaluates held-out. ----
    "txt_perceptron_train" -> ((s, d) =>
      perceptronWeights(s, d)
        .select(col("feature"), col("w1"), col("w2"))
        .orderBy(col("feature"))),

    // ---- held-out evaluation of the trained perceptron: score every
    // odd-doc_id document under w₂ (one broadcast join — the model is 17
    // rows), predict sign(margin) with the training convention margin ≤ 0
    // → −1, and report per-doc correctness. Integer margins ⇒
    // oracle-hashable; the accuracy aggregate is one further GROUP BY away
    // and deliberately left to the reader of this per-doc table (the
    // driver hash covers every row, a stronger check than one ratio). ----
    "txt_perceptron_apply" -> ((s, d) => {
      val test = Tables.documents(s, d).filter(col("doc_id") % 2 === 1)
      val feat = hashedFeatures(test)
      // served from the persisted model artifact — the training scans
      // never appear in this plan (see [[perceptronModel]])
      val w2 = perceptronModel(s, d).select(col("feature"), col("w2"))
      feat.join(broadcast(w2), "feature")
        .groupBy(col("doc_id"))
        .agg(sum(col("w2") * col("x")).cast("bigint").as("margin"))
        .join(test.select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(-1L).as("label")), "doc_id")
        .withColumn("pred", when(col("margin") > 0, 1L).otherwise(-1L))
        .withColumn("correct", (col("pred") === col("label")).cast("int"))
        .select(col("doc_id"), col("margin"), col("pred"), col("label"), col("correct"))
        .orderBy(col("doc_id"))
    }),

    // ---- CCNet-style perplexity bucketing: score every document with the
    // corpus bigram LM (the txt_bigram_lm rational form — no libm log) and
    // cut each LANGUAGE's score distribution into head/middle/tail
    // terciles, most-probable first. Per-language cuts are what CCNet
    // actually ships (a Wikipedia-trained LM per language, cutoff SCORES
    // derived from the distribution, buckets assigned by comparing each
    // doc's score to the cutoffs — ties share a bucket). The cutoffs come
    // from a COUNT-OF-COUNTS histogram of the integer micro-unit score
    // (avg_p is round(·,4), so p4 = round(avg_p·10⁴) is an exact integer
    // key): per (lang, p4) counts partial-agg, a cumulative window over
    // HISTOGRAM rows (distinct scores per language — the evt_rfm_segments
    // bounded-input class, never a docs-sized sort), and the ≤|langs|-row
    // cut table broadcasts back so assignment is a shuffle-free
    // comparison. t1 = score at descending rank ⌊n/3⌋, t2 at ⌊2n/3⌋;
    // head = p4 ≥ t1, middle = p4 ≥ t2, else tail — on tie-free data
    // exactly the old rank rule, and a boundary TIE GROUP now lands whole
    // in the better bucket instead of splitting by doc_id (which at 100 TB
    // forced every doc of the dominant language through ONE sort task). ----
    // ---- the COMPOSED learned-filter funnel (the Dolma/DataComp/RefinedWeb
    // curation chain as ONE plan): every document flows through all four
    // round-10 gates and the per-doc decision table records each verdict —
    // (1) Gopher rule gate (the 4 integer-derived booleans), (2) CCNet
    // perplexity bucket with 'tail' cut (docs under the bigram-LM's 2-token
    // domain bucket as 'none' and fail), (3) the TRAINED perceptron's
    // target-likeness prediction (w2 scored over ALL docs — one broadcast
    // ---- PII detection + redaction (the pre-release scrub every public
    // training corpus runs — emails, IPv4s, phone numbers): each doc's
    // text carries a doc_id-determined planted tail mixing REAL PII forms
    // with decoys that a naive regex would miscount — a no-TLD email
    // (`user7@exhost`), an IPv4 candidate whose first octet can exceed
    // 255 (pattern-match but semantically invalid), a short not-a-phone
    // (`ext 42`). Every count and the redacted-text hash exist on the
    // Spark side ONLY by running the codegen'd regex extraction +
    // octet-range validation + 3-pass regexp_replace over the augmented
    // string, while the oracle predicts them from the plant arithmetic
    // and constructs the redacted string directly — it never runs a
    // regex, so any pattern/validation/replacement drift breaks the
    // hash. Scale: narrow per-row projection, zero shuffles; the ORDER
    // BY sits on doc_id (source-key sort, regex never re-executes in the
    // range sampler). ----
    "txt_pii_scrub" -> ((s, d) =>
      // ORDER BY placed on the source key BELOW the regex projection (the
      // sh_raw_typed_load sampler pattern): a global sort's range-sampling
      // pass re-executes its child, so sorting first means the sampler
      // reads only the scan and the scrub runs ONCE. Output order is
      // identical (doc_id is unique and 1:1 through the projection).
      piiPerDoc(Tables.documents(s, d).orderBy(col("doc_id")))
        .select(col("doc_id"), col("n_email"), col("n_ip_cand"),
          col("n_ip_valid"), col("n_phone"),
          col("n_card_cand"), col("n_card_valid"),
          col("n_ssn_cand"), col("n_ssn_valid"),
          md5(col("redacted")).as("redacted_md5"),
          length(col("redacted")).cast("bigint").as("redacted_len"))),

    // ---- corpus-level PII audit: the per-source release report (rates,
    // class totals, multi-class doc counts) a dataset card cites. Same
    // detection path as txt_pii_scrub, then a partial-agg'd rollup to
    // |sources| rows — the per-doc regex work map-side combines, only
    // counter tuples shuffle. multi_rate is an integer-derived double
    // division (identical IEEE result in both engines). ----
    "pipe_pii_audit" -> ((s, d) =>
      piiPerDoc(Tables.documents(s, d))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_email")).cast("bigint").as("total_emails"),
          sum(col("n_ip_valid")).cast("bigint").as("total_valid_ips"),
          sum(col("n_phone")).cast("bigint").as("total_phones"),
          sum(col("n_card_valid")).cast("bigint").as("total_cards"),
          sum(col("n_ssn_valid")).cast("bigint").as("total_ssns"),
          sum(when(
            (when(col("n_email") > 0, 1).otherwise(0) +
              when(col("n_ip_valid") > 0, 1).otherwise(0) +
              when(col("n_phone") > 0, 1).otherwise(0) +
              when(col("n_card_valid") > 0, 1).otherwise(0) +
              when(col("n_ssn_valid") > 0, 1).otherwise(0)) >= 2, 1L)
            .otherwise(0L)).cast("bigint").as("docs_multi"))
        .withColumn("multi_rate", col("docs_multi") / col("n_docs"))
        .orderBy(col("source"))),

    // of the 17-row model), (4) exact-dedup canonical keep (min doc_id per
    // content md5). keep = AND of the four. A per-doc table rather than a
    // survivor count: the oracle hash then proves every gate's verdict on
    // every doc, not just the aggregate. Scale: the three metric passes
    // are the audited plans of their standalone queries (narrow scan /
    // broadcast-cut comparison / broadcast-model agg), the canon pass
    // shuffles 16-byte hashes, and the final assembly is doc_id
    // equi-joins. ----
    "pipe_filter_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val gopher = queries("txt_gopher_rules")(s, d)
        .select(col("doc_id"), col("pass").as("gopher_pass"))
      val buckets = queries("txt_ccnet_buckets")(s, d)
        .select(col("doc_id"), col("bucket"))
      val feat = hashedFeatures(docs)
      // gate 3 reads the persisted 17-row model — the funnel's plan no
      // longer retrains the perceptron per query (see [[perceptronModel]])
      val w2 = perceptronModel(s, d).select(col("feature"), col("w2"))
      val pred = feat.join(broadcast(w2), "feature")
        .groupBy(col("doc_id"))
        .agg(sum(col("w2") * col("x")).cast("bigint").as("margin"))
        .select(col("doc_id"),
          when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
      val canon = docs.groupBy(md5(col("text")).as("hsh"))
        .agg(min(col("doc_id")).as("keep_id"))
      docs.select(col("doc_id"), md5(col("text")).as("hsh"))
        .join(canon, "hsh")
        .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("is_canon"))
        .join(gopher, "doc_id")
        .join(buckets, Seq("doc_id"), "left")
        .join(pred, "doc_id")
        .withColumn("bucket", coalesce(col("bucket"), lit("none")))
        .select(col("doc_id"), col("gopher_pass"), col("bucket"),
          col("pred"), col("is_canon"),
          (col("gopher_pass") && col("bucket").isin("head", "middle") &&
            col("pred") === 1L && col("is_canon")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    "txt_ccnet_buckets" -> ((s, d) => {
      val scored = queries("txt_bigram_lm")(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("p4", round(col("avg_p") * 10000, 0).cast("long"))
      val cumW = Window.partitionBy(col("lang")).orderBy(desc("p4"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.partitionBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cuts = scored.groupBy(col("lang"), col("p4"))
        .agg(count(lit(1)).as("k"))
        .withColumn("cum", sum(col("k")).over(cumW))
        .withColumn("n_lang", sum(col("k")).over(allW))
        .groupBy(col("lang"))
        .agg(
          max(when(col("n_lang") >= 3 &&
            col("cum") >= expr("n_lang DIV 3"), col("p4"))).as("t1"),
          max(when(col("n_lang") >= 2 &&
            col("cum") >= expr("(2 * n_lang) DIV 3"), col("p4"))).as("t2"))
      scored.join(broadcast(cuts), "lang")
        .withColumn("bucket",
          when(col("t1").isNotNull && col("p4") >= col("t1"), "head")
            .when(col("t2").isNotNull && col("p4") >= col("t2"), "middle")
            .otherwise("tail"))
        .select(col("doc_id"), col("lang"), col("avg_p"), col("bucket"))
        .orderBy(col("doc_id"))
    }))

  /** Java-regex PII patterns shared by scrub/audit. Deliberately plain
    * RE2-compatible classes (no lookaround) — the same literal strings
    * would run unchanged in any engine, but the oracle never uses them:
    * it replays the plant arithmetic instead, which is what proves the
    * Spark-side extraction is real.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\+1-\\d{3}-\\d{3}-\\d{4}"
  private val cardRe = "\\b\\d{4} \\d{4} \\d{4} \\d{4}\\b"
  private val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Deterministic PII-bearing text: the fixture corpus with a planted
    * tail appended — per doc_id class, a valid email (two when
    * doc_id%6=0, a no-TLD decoy when %3=1, none when %3=2), an IPv4
    * candidate whose FIRST octet ranges over 0..299 (pattern-valid
    * always, semantically valid iff ≤ 255), and a `+1-` phone
    * (%4=0; `ext N` decoy otherwise). All pieces are integer-derived
    * string builds replayable in SQL.
    */
  private[graft] def piiAugmented(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val emailPart = when(id % 6 === 0,
        concat(lit("user"), s(id), lit("@ex"), s(id % 7), lit(".org and alt"),
          s(id), lit("@ex"), s(id % 5), lit(".net")))
      .when(id % 3 === 0,
        concat(lit("user"), s(id), lit("@ex"), s(id % 7), lit(".org")))
      .when(id % 3 === 1, concat(lit("user"), s(id), lit("@exhost")))
      .otherwise(lit("nobody"))
    val ipPart = concat(
      s((id * 7) % 300), lit("."), s((id * 13) % 256), lit("."),
      s((id * 3) % 256), lit("."), s((id * 11) % 256))
    val phonePart = when(id % 4 === 0,
        concat(lit("+1-"), lpad(s((id * 17) % 1000), 3, "0"), lit("-"),
          lpad(s((id * 19) % 1000), 3, "0"), lit("-"),
          lpad(s((id * 23) % 10000), 4, "0")))
      .otherwise(concat(lit("ext "), s(id % 100)))
    // 16-digit card plant: 15 payload digits d_j = (id·(2j+1)+j) mod 10,
    // 16th = Luhn check digit — CORRECT for the id%5=0 class, shifted +5
    // (always wrong) for the id%5=1 decoy class. The validity is thereby
    // pure integer arithmetic the oracle replays without running Luhn on
    // a string. Grouped dddd dddd dddd dddd so detection must strip
    // separators before checksumming.
    def dj(j: Int) = pmod(id * lit(2L * j + 1) + lit(j.toLong), lit(10L))
    val luhnSum = (1 to 15).map { j =>
      val dd = dj(j)
      if (j % 2 == 1) when(dd * 2 > 9, dd * 2 - 9).otherwise(dd * 2) else dd
    }.reduce(_ + _)
    val checkOk = pmod(lit(10L) - pmod(luhnSum, lit(10L)), lit(10L))
    def grp(a: Int) = concat((a to a + 3).map(j => s(dj(j))): _*)
    def cardWith(check: org.apache.spark.sql.Column) = concat(
      grp(1), lit(" "), grp(5), lit(" "), grp(9), lit(" "),
      s(dj(13)), s(dj(14)), s(dj(15)), s(check))
    val cardPart = when(id % 5 === 0, cardWith(checkOk))
      .when(id % 5 === 1, cardWith(pmod(checkOk + 5, lit(10L))))
      .otherwise(lit("none"))
    // SSN plant: id%7=0 valid (area 100-599, group 01-99, serial 0001-9999);
    // decoy classes carry the KNOWN-INVALID ranges — area 900-999 (id%7=1),
    // area 666 (id%7=2), group 00 (id%7=3)
    val ssnArea = when(id % 7 === 1, s(lit(900L) + pmod(id, lit(100L))))
      .when(id % 7 === 2, lit("666"))
      .otherwise(s(lit(100L) + pmod(id, lit(500L))))
    val ssnGroup = when(id % 7 === 3, lit("00"))
      .otherwise(lpad(s(lit(1L) + pmod(id, lit(99L))), 2, "0"))
    val ssnPart = when(id % 7 <= 3,
        concat(ssnArea, lit("-"), ssnGroup, lit("-"),
          lpad(s(lit(1L) + pmod(id, lit(9999L))), 4, "0")))
      .otherwise(lit("none"))
    docs.select(col("doc_id"), col("source"),
      concat(col("text"), lit(" contact "), emailPart, lit(" from "),
        ipPart, lit(" call "), phonePart, lit(" pay "), cardPart,
        lit(" id "), ssnPart).as("aug"))
  }

  /** The per-doc detection/redaction pass shared by txt_pii_scrub and
    * pipe_pii_audit: regex extraction for each class, VALIDATION where
    * the class has a checksum or range rule — IPv4 octet ranges, the
    * Luhn mod-10 over separator-stripped card candidates, the SSN
    * known-invalid ranges (area 000/666/900+, group 00, serial 0000) —
    * all via array HOFs (codegen'd, no UDF), then redaction: a 3-pass
    * regexp_replace for the pattern-only classes (email → ip → phone;
    * textually disjoint so order only matters for determinism) plus a
    * validation-GATED literal-replace fold for cards and SSNs, so a
    * Luhn-invalid decoy stays in the text (it is not PII) while every
    * valid match is scrubbed. One narrow projection — nothing shuffles.
    */
  private[graft] def piiPerDoc(docs: DataFrame): DataFrame =
    piiAugmented(docs)
      .withColumn("ip_cands", regexp_extract_all(col("aug"), lit(ipRe), lit(0)))
      .withColumn("card_cands", regexp_extract_all(col("aug"), lit(cardRe), lit(0)))
      .withColumn("valid_cards", expr(
        """filter(card_cands, c -> aggregate(sequence(1, 16), 0, (acc, i) ->
          |  acc + (CASE WHEN i % 2 = 1
          |    THEN IF(2 * CAST(substring(replace(c, ' ', ''), i, 1) AS INT) > 9,
          |            2 * CAST(substring(replace(c, ' ', ''), i, 1) AS INT) - 9,
          |            2 * CAST(substring(replace(c, ' ', ''), i, 1) AS INT))
          |    ELSE CAST(substring(replace(c, ' ', ''), i, 1) AS INT) END)
          |  ) % 10 = 0)""".stripMargin))
      .withColumn("ssn_cands", regexp_extract_all(col("aug"), lit(ssnRe), lit(0)))
      .withColumn("valid_ssns", expr(
        """filter(ssn_cands, c ->
          |  CAST(substring(c, 1, 3) AS INT) NOT IN (0, 666)
          |  AND CAST(substring(c, 1, 3) AS INT) < 900
          |  AND CAST(substring(c, 5, 2) AS INT) > 0
          |  AND CAST(substring(c, 8, 4) AS INT) > 0)""".stripMargin))
      .withColumn("red3",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            ipRe, "<IP>"),
          phoneRe, "<PHONE>"))
      .select(
        col("doc_id"), col("source"),
        size(regexp_extract_all(col("aug"), lit(emailRe), lit(0)))
          .cast("bigint").as("n_email"),
        size(col("ip_cands")).cast("bigint").as("n_ip_cand"),
        size(filter(col("ip_cands"), c =>
          forall(transform(split(c, "\\."), o => o.cast("int") <= 255),
            b => b))).cast("bigint").as("n_ip_valid"),
        size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0)))
          .cast("bigint").as("n_phone"),
        size(col("card_cands")).cast("bigint").as("n_card_cand"),
        size(col("valid_cards")).cast("bigint").as("n_card_valid"),
        size(col("ssn_cands")).cast("bigint").as("n_ssn_cand"),
        size(col("valid_ssns")).cast("bigint").as("n_ssn_valid"),
        // boundary-aware gated scrub: each VALIDATED candidate is rebuilt
        // as a \b-anchored literal pattern (every non-alphanumeric char
        // escaped), so a candidate string that also occurs EMBEDDED in a
        // longer digit run elsewhere in the doc is left alone there —
        // plain substring replace would rewrite it
        expr(
          """aggregate(valid_ssns,
            |  aggregate(valid_cards, red3, (acc, c) -> regexp_replace(acc,
            |    concat('\\b', regexp_replace(c, '([^a-zA-Z0-9])', '\\\\$1'), '\\b'),
            |    '<CARD>')),
            |  (acc, c) -> regexp_replace(acc,
            |    concat('\\b', regexp_replace(c, '([^a-zA-Z0-9])', '\\\\$1'), '\\b'),
            |    '<SSN>'))""".stripMargin).as("redacted"))

  /** BM25 scoring tail shared by the live ([[txt_bm25_topk]]) and
    * index-serving ([[txt_bm25_artifact]]) forms: the integer-rational
    * Robertson ranking over a (doc_id, word, tf) matched-postings relation
    * plus a (doc_id, dl) length table — df re-derived by a partial-agg'd
    * count, the 1-row totals broadcast, top-10 via TakeOrderedAndProject.
    * See the txt_bm25_topk query scaladoc for the arithmetic derivation.
    */
  private[graft] def bm25Score(tf: DataFrame, dl: DataFrame): DataFrame = {
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val tot = dl.agg(sum(col("dl")).cast("bigint").as("total"),
      count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("idfr", expr("((n_docs - df) * 1000L) DIV (df + 1)"))
      .withColumn("sterm", expr(
        "(idfr * 22L * tf * total) DIV (10L * tf * total + 3L * total + 9L * dl * n_docs)"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"), sum(col("sterm")).cast("bigint").as("score"))
      .select(col("doc_id"), col("dl"), col("n_terms"), col("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(10)
  }

  /** Hashed token-count features for the perceptron pair: 16 md5 buckets
    * (one hex char of md5(word) → 0..15) plus the bias slot (feature 16,
    * x = 1 for every doc). One shuffle on (doc_id, feature); the bias rows
    * are a narrow projection unioned in.
    */
  private def hashedFeatures(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.md5Bits
    val fTok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), md5Bits(col("w"), 1).as("feature"))
      .groupBy(col("doc_id"), col("feature"))
      .agg(count(lit(1)).as("x"))
    val bias = docs.select(col("doc_id"), lit(16L).as("feature"), lit(1L).as("x"))
    fTok.unionByName(bias)
  }

  /** The 2-epoch batch-perceptron trainer shared by txt_perceptron_train /
    * txt_perceptron_apply (see the train entry's scaladoc for the model).
    * Returns (feature, w1, w2) — integer weights, one row per feature seen
    * in the even-doc_id training half.
    */
  private def perceptronWeights(s: SparkSession, d: String): DataFrame = {
    val train = Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
    val feat = hashedFeatures(train)
    val lab = train.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    val w1 = feat.join(lab, "doc_id")
      .groupBy(col("feature"))
      .agg(sum(col("y") * col("x")).cast("bigint").as("w1"))
    val marg = feat.join(broadcast(w1), "feature")
      .groupBy(col("doc_id"))
      .agg(sum(col("w1") * col("x")).cast("bigint").as("m"))
    val upd = feat.join(lab, "doc_id").join(marg, "doc_id")
      .filter(col("y") * col("m") <= 0)
      .groupBy(col("feature"))
      .agg(sum(col("y") * col("x")).cast("bigint").as("dw"))
    w1.join(upd, Seq("feature"), "left")
      .select(col("feature"), col("w1"),
        (col("w1") + coalesce(col("dw"), lit(0L))).cast("bigint").as("w2"))
  }

  /** Fragmented → compacted postings lake, built once per corpus
    * fingerprint: the batch postings matrix written as 8 synthetic ingest
    * generations — the exact `(wb, ingest_batch)` leaf layout
    * [[graft.streaming.StreamRunner.postingsIngestToWarehouse]]
    * accumulates — then compacted by
    * [[graft.streaming.StreamRunner.compactPostings]] into a versioned
    * wb-partitioned serve generation. Returns the lake's warehouse plus
    * the committed (postings, doclen) snapshot versions, so the serving
    * query reads a PINNED generation (lineage-stable even if a later
    * compaction commits).
    */
  private object PostingsLakeFixture {
    private val base =
      new java.io.File(sys.props("java.io.tmpdir"), "graft_postingslake")
    private val built =
      new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

    def compacted(s: SparkSession, d: String): (graft.pipeline.Warehouse, Int, Int) = {
      val key = s"lake_v1_${Dedup.DerivedArtifacts.fingerprint(d, "documents")}"
      val wh = new graft.pipeline.Warehouse(new java.io.File(base, key).getPath)
      val (pv, dv) = built.computeIfAbsent(key, _ =>
        // the marker commits LAST, so a committed version implies the
        // whole build (fragmented lake included) completed — a crashed
        // prior build reruns here
        (wh.currentVersion("lex_postings_serve"),
          wh.currentVersion("lex_doclen_serve")) match {
          case (Some(p), Some(dl)) => (p, dl)
          case _ =>
            val toks = Tables.documents(s, d)
              .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
            wh.partitionedUpsertWrite(
              toks.groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
                .withColumn("wb",
                  graft.functions.TextFunctions.md5Bits(col("word"), 1))
                .withColumn("ingest_batch", pmod(col("doc_id"), lit(8L))),
              "lex_postings", Seq("wb", "ingest_batch"))
            wh.partitionedUpsertWrite(
              toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
                .withColumn("ingest_batch", pmod(col("doc_id"), lit(8L))),
              "lex_doclen", Seq("ingest_batch"))
            graft.streaming.StreamRunner.compactPostings(s, wh, "lex")
        })
      (wh, pv, dv)
    }
  }

  /** The HYBRID postings-lake fixture: the same 8-synthetic-generation
    * `(wb, ingest_batch)` layout as [[PostingsLakeFixture]], but the
    * serve snapshots are folded over batches 0–5 ONLY and those
    * fragments fully VACUUMED ([[graft.streaming.StreamRunner.gcLake]],
    * slack 0) before batches 6–7 land — so `txt_bm25_hybrid`'s
    * snapshot+tail read has a load-bearing tail AND a load-bearing
    * snapshot (batches 0–5 exist nowhere else). A `__DONE` marker
    * commits LAST (the StreamedFixture rule): the mid-build compaction
    * means a committed `_serve` version alone no longer implies a
    * complete build.
    */
  private object PostingsLakeHybridFixture {
    private val base =
      new java.io.File(sys.props("java.io.tmpdir"), "graft_postingslake_hyb")
    private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    def warehouse(s: SparkSession, d: String): graft.pipeline.Warehouse =
      synchronized {
        val key = s"lake_v1_${Dedup.DerivedArtifacts.fingerprint(d, "documents")}"
        val wh = new graft.pipeline.Warehouse(
          new java.io.File(base, key).getPath)
        if (!built.contains(key)) {
          val done = new java.io.File(wh.root, "__DONE")
          if (!done.exists()) {
            // a crashed prior build may have left partial tables — clean
            // slate before rebuilding (content is deterministic)
            Seq("lex_postings", "lex_doclen", "lex_postings_serve",
              "lex_doclen_serve").foreach(wh.dropTable)
            val toks = Tables.documents(s, d)
              .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
            def writeFrags(ids: Seq[Long]): Unit = {
              val cond = col("ingest_batch").isin(ids: _*)
              wh.partitionedUpsertWrite(
                toks.groupBy(col("word"), col("doc_id"))
                  .agg(count(lit(1)).as("tf"))
                  .withColumn("wb",
                    graft.functions.TextFunctions.md5Bits(col("word"), 1))
                  .withColumn("ingest_batch", pmod(col("doc_id"), lit(8L)))
                  .filter(cond),
                "lex_postings", Seq("wb", "ingest_batch"))
              wh.partitionedUpsertWrite(
                toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
                  .withColumn("ingest_batch", pmod(col("doc_id"), lit(8L)))
                  .filter(cond),
                "lex_doclen", Seq("ingest_batch"))
              // live-batch ledger markers for exactly the landed ids
              ids.foreach { b =>
                wh.noteLiveBatch("lex_postings", b)
                wh.noteLiveBatch("lex_doclen", b)
              }
            }
            writeFrags(0L until 6L)
            graft.streaming.StreamRunner.compactPostings(s, wh, "lex")
            graft.streaming.StreamRunner.gcLake(s, wh, "lex_postings",
              "lex_postings_serve", slackGenerations = 0)
            graft.streaming.StreamRunner.gcLake(s, wh, "lex_doclen",
              "lex_doclen_serve", slackGenerations = 0)
            writeFrags(Seq(6L, 7L))
            java.nio.file.Files.write(done.toPath, "v1".getBytes("UTF-8")): Unit
          }
          built.add(key): Unit
        }
        wh
      }
  }

  /** The trained perceptron SERVED from a persisted 17-row model artifact
    * (the txt_bm25_artifact precedent, fingerprint-keyed to the corpus):
    * training runs once at artifact-build time; every serving query —
    * txt_perceptron_apply, pipe_filter_funnel's gate 3 — reads the model
    * table instead of re-running the two training epochs' corpus scans.
    * Deterministic integer training ⇒ the persisted rows equal a live
    * [[perceptronWeights]] bit-for-bit, so serving from the artifact
    * cannot move an oracle hash (LearnedOpsSpec pins the equality). At
    * 100 TB this is the train-once/score-forever split a learned filter
    * actually deploys — the model is data-sized-free, the apply pass is
    * one broadcast join.
    */
  private def perceptronModel(s: SparkSession, d: String): DataFrame =
    Dedup.DerivedArtifacts.table(s, d, "documents", "perceptron_w")(
      perceptronWeights(s, d))

  /** Probe keys for the CMS audit: seven corpus words + one absent word
    * (collision-only estimate — exercises the ≥-never-undercounts bound
    * from both sides).
    */
  private val cmsProbes = Seq(
    "data", "filter", "join", "merge", "quantum", "spark", "table", "window")
  private val cmsProbeList = cmsProbes.map(w => s"'$w'").mkString(", ")

  /** Shared engine of txt_cms_freq / txt_cms_rollup: sketch the token
    * stream (directly, or per-source then merged when `rollup`), broadcast
    * the 2 KB summary, and emit est-vs-exact per probe word. Estimate =
    * min over the 4 rows of the probed cell, each row's bucket being the
    * low 6 bits of one 15-bit md5 lane ([[graft.plans.CmsAggregate]]).
    */
  private def cmsEstimates(
      s: SparkSession, docs: DataFrame, rollup: Boolean): DataFrame = {
    import graft.functions.TextFunctions.md5Bits
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
    val hashed = toks.select(col("source"), md5Bits(col("word"), 15).as("h"))
    val sk =
      if (rollup) {
        hashed.groupBy(col("source"))
          .agg(call_function("graft_cms", col("h")).as("sk_shard"))
          .agg(call_function("graft_cms_merge", col("sk_shard")).as("sk"))
      } else {
        hashed.agg(call_function("graft_cms", col("h")).as("sk"))
      }
    val exact = toks.filter(col("word").isin(cmsProbes: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt_x"))
    val probes = {
      import s.implicits._
      cmsProbes.toDF("word")
    }
    val rowEst = (0 until graft.plans.CmsAggregate.D).map { i =>
      coalesce(
        expr(s"try_element_at(filter(sk, e -> e.cell = CAST(${i * 64} + " +
          s"(shiftright(h, ${15 * i}) & 63) AS INT)), 1).cnt"),
        lit(0L))
    }
    probes
      .withColumn("h", md5Bits(col("word"), 15))
      .crossJoin(broadcast(sk))
      .join(broadcast(exact), Seq("word"), "left")
      .withColumn("exact_cnt", coalesce(col("cnt_x"), lit(0L)))
      .withColumn("est_cnt", least(rowEst: _*))
      .select(col("word"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
      .orderBy(col("word"))
  }

  /** Shared CMS replay: rebuild the 4×64 cells from md5 lanes, estimate =
    * min over rows — bit-identical for the direct and rollup forms (cells
    * are plain sums).
    */
  private val cmsOracle: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
       |), hashed AS (
       |  SELECT try_cast('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h FROM toks
       |), rows4 AS (SELECT unnest([0, 1, 2, 3]) AS i
       |), cells AS (
       |  SELECT (i * 64 + ((h >> (15 * i)) & 63)) AS cell, count(*) AS cnt
       |  FROM hashed CROSS JOIN rows4 GROUP BY 1
       |), probes AS (SELECT unnest([$cmsProbeList]) AS word
       |), ph AS (
       |  SELECT word, try_cast('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
       |  FROM probes
       |), pcells AS (
       |  SELECT word, (i * 64 + ((h >> (15 * i)) & 63)) AS cell
       |  FROM ph CROSS JOIN rows4
       |), pest AS (
       |  SELECT word, min(coalesce(c.cnt, 0)) AS est_cnt
       |  FROM pcells LEFT JOIN cells c USING (cell) GROUP BY word
       |), pexact AS (
       |  SELECT word, count(*) AS exact_cnt FROM toks
       |  WHERE word IN ($cmsProbeList) GROUP BY word
       |)
       |SELECT p.word, CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS exact_cnt,
       |  CAST(e.est_cnt AS BIGINT) AS est_cnt,
       |  CAST(e.est_cnt - coalesce(x.exact_cnt, 0) AS BIGINT) AS overcount
       |FROM probes p JOIN pest e USING (word) LEFT JOIN pexact x USING (word)
       |ORDER BY p.word""".stripMargin

  /** Shared PII plant-replay CTE (class counts + the constructed redacted
    * string) feeding both the per-doc scrub oracle and the per-source
    * audit oracle. Mirrors [[piiAugmented]]'s arithmetic exactly.
    */
  private val piiOracleCte: String = {
    // the Luhn check digit replayed as pure integer arithmetic over the
    // plant's 15 payload digits d_j = (doc_id·(2j+1)+j) mod 10 — the
    // oracle never runs a checksum over a STRING; it derives the digit
    // the generator wrote and rebuilds the invalid-decoy card verbatim
    def d(j: Int) = s"((doc_id * ${2 * j + 1} + $j) % 10)"
    val luhnSum = (1 to 15).map { j =>
      if (j % 2 == 1)
        s"(CASE WHEN 2 * ${d(j)} > 9 THEN 2 * ${d(j)} - 9 ELSE 2 * ${d(j)} END)"
      else d(j)
    }.mkString(" + ")
    val checkBad = s"(((10 - ($luhnSum) % 10) % 10 + 5) % 10)"
    def digits(js: Range) = js.map(j => s"CAST(${d(j)} AS VARCHAR)").mkString(" || ")
    val badCard = s"${digits(1 to 4)} || ' ' || ${digits(5 to 8)} || ' ' || " +
      s"${digits(9 to 12)} || ' ' || ${digits(13 to 15)} || CAST($checkBad AS VARCHAR)"
    val ssnGroup = "lpad(CAST(1 + doc_id % 99 AS VARCHAR), 2, '0')"
    val ssnSerial = "lpad(CAST(1 + doc_id % 9999 AS VARCHAR), 4, '0')"
    s"""WITH p AS (
      |  SELECT doc_id, source,
      |    CAST(CASE WHEN doc_id % 6 = 0 THEN 2
      |              WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_email,
      |    CAST(1 AS BIGINT) AS n_ip_cand,
      |    CAST(CASE WHEN (doc_id * 7) % 300 <= 255 THEN 1 ELSE 0 END AS BIGINT) AS n_ip_valid,
      |    CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_phone,
      |    CAST(CASE WHEN doc_id % 5 IN (0, 1) THEN 1 ELSE 0 END AS BIGINT) AS n_card_cand,
      |    CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_card_valid,
      |    CAST(CASE WHEN doc_id % 7 <= 3 THEN 1 ELSE 0 END AS BIGINT) AS n_ssn_cand,
      |    CAST(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_ssn_valid,
      |    text || ' contact ' ||
      |      CASE WHEN doc_id % 6 = 0 THEN '<EMAIL> and <EMAIL>'
      |           WHEN doc_id % 3 = 0 THEN '<EMAIL>'
      |           WHEN doc_id % 3 = 1 THEN 'user' || doc_id || '@exhost'
      |           ELSE 'nobody' END ||
      |      ' from <IP> call ' ||
      |      CASE WHEN doc_id % 4 = 0 THEN '<PHONE>'
      |           ELSE 'ext ' || (doc_id % 100) END ||
      |      ' pay ' ||
      |      CASE WHEN doc_id % 5 = 0 THEN '<CARD>'
      |           WHEN doc_id % 5 = 1 THEN $badCard
      |           ELSE 'none' END ||
      |      ' id ' ||
      |      CASE WHEN doc_id % 7 = 0 THEN '<SSN>'
      |           WHEN doc_id % 7 = 1 THEN CAST(900 + doc_id % 100 AS VARCHAR)
      |             || '-' || $ssnGroup || '-' || $ssnSerial
      |           WHEN doc_id % 7 = 2 THEN '666-' || $ssnGroup || '-' || $ssnSerial
      |           WHEN doc_id % 7 = 3 THEN CAST(100 + doc_id % 500 AS VARCHAR)
      |             || '-00-' || $ssnSerial
      |           ELSE 'none' END AS redacted
      |  FROM documents
      |)
      |""".stripMargin
  }

  /** From-scratch DuckDB replay of [[CorpusStatsFixture]]'s sliced
    * streaming ingest, ending in `stats(source, n_docs, n_tokens)` over
    * the survivors — the shared head of both incremental mix oracles.
    * Batch k's near-dup round drops any batch doc whose banded MinHash
    * candidacy verifies at jaccard ≥ 0.5 against the accumulated
    * survivors of batches < k (the [[Dedup.incrementalMatches]]
    * semantics: uncapped bands, rounded jaccard, any-match drop).
    * Every round CTE is MATERIALIZED — the minhash pipeline is
    * referenced by later rounds, and DuckDB's default inlining would
    * re-evaluate it per reference (the dedup_kcore lesson).
    */
  private def corpusStatsReplayCte: String = {
    def dupRound(batch: String, corpus: String): String =
      s"""  SELECT DISTINCT a.doc_id AS doc_id
         |  FROM bx a JOIN bx b ON a.band_idx = b.band_idx AND a.bkey = b.bkey
         |  JOIN sets sa ON sa.doc_id = a.doc_id
         |  JOIN sets sb ON sb.doc_id = b.doc_id
         |  WHERE a.doc_id IN (SELECT doc_id FROM $batch)
         |    AND b.doc_id IN (SELECT doc_id FROM $corpus)
         |    AND round(CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS DOUBLE)
         |      / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh_set, sb.sh_set))), 6) >= 0.5""".stripMargin
    s"""${Dedup.sigCte}${Dedup.bandsCte}${Dedup.setsCte}, bx AS MATERIALIZED (
       |  SELECT doc_id, band_idx, bkey FROM bands0
       |), s0 AS MATERIALIZED (
       |  SELECT min(doc_id) AS doc_id FROM documents
       |  WHERE doc_id % 3 = 1 GROUP BY md5(text)
       |), e1 AS MATERIALIZED (
       |  SELECT min(doc_id) AS doc_id FROM documents
       |  WHERE doc_id % 3 = 2 GROUP BY md5(text)
       |), d1 AS MATERIALIZED (
       |${dupRound("e1", "s0")}
       |), prev AS MATERIALIZED (
       |  SELECT doc_id FROM s0 UNION ALL
       |  SELECT doc_id FROM e1 WHERE doc_id NOT IN (SELECT doc_id FROM d1)
       |), e2 AS MATERIALIZED (
       |  SELECT min(doc_id) AS doc_id FROM documents
       |  WHERE doc_id % 3 = 0 GROUP BY md5(text)
       |), d2 AS MATERIALIZED (
       |${dupRound("e2", "prev")}
       |), surv AS MATERIALIZED (
       |  SELECT doc_id FROM prev UNION ALL
       |  SELECT doc_id FROM e2 WHERE doc_id NOT IN (SELECT doc_id FROM d2)
       |), stats AS MATERIALIZED (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum($bpeTokenCountSql) AS BIGINT) AS n_tokens
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM surv)
       |  GROUP BY source
       |)""".stripMargin
  }

  /** The two incremental-mix replays, shared verbatim by the `_incr`
    * (live fragmented lake) and `_compacted` (folded snapshot) serves —
    * both must hash-match the same from-scratch sliced-ingest replay.
    */
  private def domainMixReplayOracle: String =
    corpusStatsReplayCte + """, k AS (SELECT min(n_tokens) AS k FROM stats)
      |SELECT source, n_docs, n_tokens,
      |  CAST((k.k * 1000000) // n_tokens AS BIGINT) AS keep_prob_x1e6
      |FROM stats, k ORDER BY source""".stripMargin
  private def temperatureMixReplayOracle: String =
    corpusStatsReplayCte + """, z AS (
      |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source)),
      |         (a, x) -> a + x) AS z
      |  FROM stats
      |)
      |SELECT source, n_docs, n_tokens,
      |  round(sqrt(CAST(n_tokens AS DOUBLE)) / z.z, 6) AS target_frac
      |FROM stats, z ORDER BY source""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // predicts every class count from the plant arithmetic and CONSTRUCTS
    // the redacted string directly (decoys left in place, matches
    // replaced) — no regex anywhere in the oracle; the md5 only agrees if
    // the Spark side's extraction/validation/replacement is exact
    "txt_pii_scrub" -> (piiOracleCte +
      """SELECT doc_id, n_email, n_ip_cand, n_ip_valid, n_phone,
        |  n_card_cand, n_card_valid, n_ssn_cand, n_ssn_valid,
        |  md5(redacted) AS redacted_md5,
        |  CAST(length(redacted) AS BIGINT) AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin),
    // same plant replay, rolled up per source; multi_rate re-derived as
    // the same bigint/bigint double division
    "pipe_pii_audit" -> (piiOracleCte +
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_email) AS BIGINT) AS total_emails,
        |  CAST(sum(n_ip_valid) AS BIGINT) AS total_valid_ips,
        |  CAST(sum(n_phone) AS BIGINT) AS total_phones,
        |  CAST(sum(n_card_valid) AS BIGINT) AS total_cards,
        |  CAST(sum(n_ssn_valid) AS BIGINT) AS total_ssns,
        |  CAST(sum(CASE WHEN (CASE WHEN n_email > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_ip_valid > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_phone > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_card_valid > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_ssn_valid > 0 THEN 1 ELSE 0 END) >= 2
        |           THEN 1 ELSE 0 END) AS BIGINT) AS docs_multi,
        |  CAST(sum(CASE WHEN (CASE WHEN n_email > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_ip_valid > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_phone > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_card_valid > 0 THEN 1 ELSE 0 END
        |                    + CASE WHEN n_ssn_valid > 0 THEN 1 ELSE 0 END) >= 2
        |           THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS BIGINT) AS multi_rate
        |FROM p GROUP BY source ORDER BY source""".stripMargin),
    // assembles the IDENTICAL record string and hashes it; token/char
    // accounting re-derived arithmetically
    "txt_sft_assemble" ->
      """SELECT doc_id,
        |  md5('### System: You are a helpful assistant.' || chr(10) ||
        |      '### User: Summarize document ' || doc_id || '.' || chr(10) ||
        |      '### Assistant: ' || text) AS record_md5,
        |  CAST(87 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS mask_start_char,
        |  CAST(14 AS BIGINT) AS mask_start_token,
        |  CAST(14 + len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_loss_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // predicts every validator count from the planted-tail arithmetic:
    // the fixture text is ASCII (n_chars valid 1-byte chars, no controls),
    // so the tail's contribution is exact per doc_id class
    "txt_utf8_audit" ->
      """SELECT doc_id,
        |  CAST(n_chars + CASE doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 2
        |    ELSE 0 END AS BIGINT) AS n_valid_chars,
        |  CAST(CASE doc_id % 4 WHEN 1 THEN 2 WHEN 3 THEN doc_id % 3 + 1
        |    ELSE 0 END AS BIGINT) AS n_invalid_bytes,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END AS BIGINT) AS n_multibyte,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_control,
        |  doc_id % 4 IN (0, 2) AS is_valid
        |FROM documents ORDER BY doc_id""".stripMargin,
    // predicts the extraction OUTPUT from (doc_id, text) — title + h1
    // (entities decoded), body text, anchor texts, whitespace-normalized;
    // tag/script/link counts follow the template arithmetic. The oracle
    // never parses markup; the Spark side never sees this formula.
    "txt_html_extract" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      'Doc ' || doc_id || ' Doc ' || doc_id || ' & friends A ' ||
        |        text || ' link ' || doc_id || repeat(' x', CAST(doc_id % 3 AS INT)),
        |      '\s+', ' ', 'g')) AS t
        |  FROM documents
        |)
        |SELECT doc_id, md5(t) AS extracted_md5,
        |  CAST(length(t) AS BIGINT) AS n_extracted_chars,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_links,
        |  CAST(1 AS BIGINT) AS n_scripts,
        |  CAST(18 + 2 * (doc_id % 3) AS BIGINT) AS n_tags
        |FROM p ORDER BY doc_id""".stripMargin,
    "txt_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |), counts AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY word
        |), hist AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS n_at FROM counts GROUP BY c
        |), tot AS (
        |  SELECT CAST(sum(c * n_at) AS BIGINT) AS total_mass FROM hist
        |), th AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS BIGINT) AS min_count)
        |SELECT th.min_count,
        |  CAST(sum(n_at) AS BIGINT) AS vocab_size,
        |  CAST(sum(c * n_at) AS BIGINT) AS kept_mass,
        |  CAST(1000000 * sum(c * n_at) // max(total_mass) AS BIGINT) AS coverage_x1e6
        |FROM hist CROSS JOIN th CROSS JOIN tot
        |WHERE c >= th.min_count
        |GROUP BY th.min_count
        |ORDER BY th.min_count""".stripMargin,
    "txt_cms_freq" -> cmsOracle,
    "txt_cms_rollup" -> cmsOracle,
    "txt_boilerplate_scrub" ->
      """WITH segs AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(w[i*5+1 : i*5+5], ' ') AS seg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |       UNNEST(generate_series(0, CAST(floor((len(w) - 1) / 5) AS INT))) AS t(i)
        |), docfreq AS (
        |  SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
        |), kept AS (
        |  SELECT s.doc_id, s.idx, s.seg FROM segs s JOIN docfreq USING (seg) WHERE df = 1
        |), re AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(seg, ' ' ORDER BY idx) AS scrubbed
        |  FROM kept GROUP BY doc_id
        |), tot AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM segs GROUP BY doc_id
        |)
        |SELECT d.doc_id, t.n_segs, coalesce(re.n_kept, 0) AS n_kept,
        |  md5(coalesce(re.scrubbed, '')) AS scrubbed_fp
        |FROM documents d JOIN tot t USING (doc_id) LEFT JOIN re USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "txt_chunk_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
        |  CAST(least(32, len(w) - start) AS BIGINT) AS n_tokens,
        |  array_to_string(w[start+1 : start+32], ' ') AS chunk
        |FROM w, UNNEST(generate_series(0, len(w) - 1, 24)) AS t(start)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "txt_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |), tot AS (SELECT count(*) AS n FROM toks
        |), c AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word)
        |SELECT word, CAST(cnt AS BIGINT) AS cnt
        |FROM c, tot WHERE cnt * 33 > n ORDER BY word""".stripMargin,
    "txt_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
        |), df AS (
        |  SELECT word, count(*) AS df FROM tf GROUP BY word
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT doc_id, tf.word AS word, tf, df,
        |    round(CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) + 1.0)
        |          / (CAST(df AS DOUBLE) + 1.0), 6) AS score
        |  FROM tf JOIN df ON tf.word = df.word, n
        |)
        |SELECT doc_id, word, tf, df, score, rk FROM (
        |  SELECT doc_id, word, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, word) AS BIGINT) AS rk
        |  FROM scored)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "txt_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), v AS (
        |  SELECT word FROM (
        |    SELECT word, row_number() OVER (ORDER BY n DESC, word) AS rk
        |    FROM (SELECT word, count(*) AS n FROM toks GROUP BY word))
        |  WHERE rk <= 10
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM toks LEFT JOIN v ON toks.word = v.word
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "txt_stop_scrub" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    w -> w IN ($stopList))) AS BIGINT) AS n_stop,
         |  md5(array_to_string(list_filter(string_split(text, ' '),
         |    w -> w NOT IN ($stopList)), ' ')) AS scrub_hash
         |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_ngram_freq" ->
      """WITH words AS (
        |  SELECT lang, string_split(text, ' ') AS w FROM documents
        |), bi AS (
        |  SELECT lang, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM words WHERE len(w) >= 2
        |), counted AS (
        |  SELECT lang, bigram, count(*) AS n FROM bi GROUP BY lang, bigram
        |)
        |SELECT lang, bigram, n, rk FROM (
        |  SELECT lang, bigram, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
        |  FROM counted) t
        |WHERE rk <= 3 ORDER BY lang, rk""".stripMargin,
    "txt_stats" ->
      """SELECT doc_id, lang, source,
        |  length(text) AS char_len,
        |  len(string_split(text, ' ')) AS n_words,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_word_len,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS type_token_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_diversity" ->
      """WITH c AS (
        |  SELECT doc_id, w, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |  ) GROUP BY doc_id, w
        |), agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(sum(c * c) AS BIGINT) AS sum_c2
        |  FROM c GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens,
        |  CAST(1000000 - (1000000 * sum_c2) // (n_tokens * n_tokens) AS BIGINT)
        |    AS simpson_x1e6
        |FROM agg ORDER BY doc_id""".stripMargin,
    "txt_bpe_merges" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |), pairs AS (
        |  SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
        |  FROM words WHERE length(w) >= 2
        |)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 10""".stripMargin,
    "txt_bpe_apply" ->
      s"""SELECT doc_id,
         |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_syms_before,
         |  CAST(length(replace(${bpeApplied("text")}, ' ', '')) AS BIGINT) AS n_syms_after,
         |  (CAST(length(replace(text, ' ', '')) AS BIGINT)
         |    - CAST(length(replace(${bpeApplied("text")}, ' ', '')) AS BIGINT)) * 10000
         |    // CAST(length(replace(text, ' ', '')) AS BIGINT) AS saved_x10000
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the same 5-round greedy loop as chained CTEs: p_r picks round r's
    // winning pair over t_{r-1}'s re-segmented corpus, t_r applies it via
    // a scalar subquery — the oracle never sees the Spark side's picks
    "txt_bpe_train" -> {
      val rounds = 1 to 5
      val ctes = rounds.map { r =>
        val sym = ('A' + r - 1).toChar
        s""", p$r AS (
           |  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
           |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM t${r - 1}) ws
           |    WHERE length(w) >= 2
           |  ) ps GROUP BY pair ORDER BY n DESC, pair LIMIT 1
           |), t$r AS (
           |  SELECT replace(text, (SELECT pair FROM p$r), '$sym') AS text FROM t${r - 1}
           |)""".stripMargin
      }.mkString
      val rows = rounds.map { r =>
        val sym = ('A' + r - 1).toChar
        s"""SELECT CAST($r AS BIGINT) AS round, (SELECT pair FROM p$r) AS pair,
           |  '$sym' AS symbol, (SELECT n FROM p$r) AS n,
           |  (SELECT CAST(sum(length(replace(text, ' ', ''))) AS BIGINT) FROM t$r) AS n_syms_after""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH t0 AS (SELECT text FROM documents)$ctes\nSELECT * FROM (\n$rows\n) tr ORDER BY round"
    },
    // the same greedy loop over the identically hash-sampled t0 (the
    // [[BpeSampleK]] = 384 smallest 14-hex-char content-md5 ranks — the engine's
    // deterministic bottom-k sample; ties are identical texts, so the
    // sampled multiset agrees)
    "txt_bpe_train_sampled" -> {
      val rounds = 1 to 5
      val ctes = rounds.map { r =>
        val sym = ('A' + r - 1).toChar
        s""", p$r AS (
           |  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
           |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM t${r - 1}) ws
           |    WHERE length(w) >= 2
           |  ) ps GROUP BY pair ORDER BY n DESC, pair LIMIT 1
           |), t$r AS (
           |  SELECT replace(text, (SELECT pair FROM p$r), '$sym') AS text FROM t${r - 1}
           |)""".stripMargin
      }.mkString
      val rows = rounds.map { r =>
        val sym = ('A' + r - 1).toChar
        s"""SELECT CAST($r AS BIGINT) AS round, (SELECT pair FROM p$r) AS pair,
           |  '$sym' AS symbol, (SELECT n FROM p$r) AS n,
           |  (SELECT CAST(sum(length(replace(text, ' ', ''))) AS BIGINT) FROM t$r) AS n_syms_after""".stripMargin
      }.mkString("\nUNION ALL\n")
      "WITH t0 AS (SELECT text FROM (" +
        "SELECT text, try_cast('0x' || substr(md5(text), 1, 14) AS BIGINT) AS h " +
        s"FROM documents ORDER BY h, text LIMIT $BpeSampleK))" +
        s"$ctes\nSELECT * FROM (\n$rows\n) tr ORDER BY round"
    },
    // the same 5-round greedy loop carrying doc_id, then the per-doc
    // apply of the TRAINED chain (t5). MATERIALIZED throughout — each
    // t_r is referenced by p_{r+1}, t_{r+1} AND the final join, and
    // DuckDB 1.0's default inlining re-evaluates chained CTEs
    // exponentially (the recorded k-core oracle lesson)
    "pipe_tokenizer_e2e" -> {
      val rounds = 1 to 5
      val ctes = rounds.map { r =>
        val sym = ('A' + r - 1).toChar
        s""", p$r AS MATERIALIZED (
           |  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
           |    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM t${r - 1}) ws
           |    WHERE length(w) >= 2
           |  ) ps GROUP BY pair ORDER BY n DESC, pair LIMIT 1
           |), t$r AS MATERIALIZED (
           |  SELECT doc_id, replace(text, (SELECT pair FROM p$r), '$sym') AS text FROM t${r - 1}
           |)""".stripMargin
      }.mkString
      s"""WITH t0 AS MATERIALIZED (SELECT doc_id, text FROM documents)$ctes
         |SELECT t0.doc_id,
         |  CAST(length(replace(t0.text, ' ', '')) AS BIGINT) AS n_syms_before,
         |  CAST(length(replace(t5.text, ' ', '')) AS BIGINT) AS n_syms_after,
         |  (CAST(length(replace(t0.text, ' ', '')) AS BIGINT)
         |    - CAST(length(replace(t5.text, ' ', '')) AS BIGINT)) * 10000
         |    // CAST(length(replace(t0.text, ' ', '')) AS BIGINT) AS saved_x10000
         |FROM t0 JOIN t5 ON t0.doc_id = t5.doc_id
         |ORDER BY t0.doc_id""".stripMargin
    },
    "txt_gopher_rules" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) * 100
         |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS mean_wlen_x100,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 100
         |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS distinct_x100
         |  FROM documents
         |)
         |SELECT doc_id, n_words, mean_wlen_x100, n_stop, distinct_x100,
         |  n_words BETWEEN 20 AND 10000 AS r_len,
         |  mean_wlen_x100 BETWEEN 300 AND 1000 AS r_wlen,
         |  n_stop >= 2 AS r_stop,
         |  distinct_x100 >= 20 AS r_div,
         |  (n_words BETWEEN 20 AND 10000) AND (mean_wlen_x100 BETWEEN 300 AND 1000)
         |    AND n_stop >= 2 AND distinct_x100 >= 20 AS pass
         |FROM m ORDER BY doc_id""".stripMargin,
    "txt_lang_id" ->
      s"""SELECT doc_id, lang,
         |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS BIGINT) AS stop_hits,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) * 20
         |            >= len(string_split(text, ' '))
         |       THEN 'en' ELSE 'unk' END AS predicted_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_quality_report" ->
      """SELECT source, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT doc_id) AS n_distinct_ids,
        |  CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text,
        |  CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  COUNT(DISTINCT doc_id) = COUNT(*) AS ids_unique
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "txt_sample_strat" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE (try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10) = 0
        |ORDER BY doc_id""".stripMargin,
    "txt_levenshtein" ->
      """WITH t AS (
        |  SELECT doc_id, source, substr(text, 1, 30) AS prefix FROM documents WHERE doc_id < 50
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS lev
        |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin,
    "txt_fuzzy_block" ->
      """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 30) AS prefix,
        |    string_split(substr(text, 1, 30), ' ')[1] AS blk_tok,
        |    coalesce(string_split(substr(text, 1, 30), ' ')[2], '') AS blk_tok2,
        |    CAST(floor(length(substr(text, 1, 30)) / 10) AS BIGINT) AS blk_len
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS lev
        |FROM t a JOIN t b
        |  ON a.blk_tok = b.blk_tok AND a.blk_tok2 = b.blk_tok2
        |  AND a.blk_len = b.blk_len AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 15
        |ORDER BY doc_a, doc_b""".stripMargin,
    "pipe_corpus_build" ->
      """WITH w AS (
        |  SELECT doc_id, lang, source, text, string_split(text, ' ') AS wl FROM documents
        |), q AS (
        |  SELECT doc_id, lang, source, text FROM w WHERE len(wl) >= 5
        |), k AS (
        |  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)
        |)
        |SELECT q.doc_id, q.lang, q.source
        |FROM q JOIN k USING (doc_id)
        |WHERE (try_cast('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10) < 3
        |ORDER BY q.doc_id""".stripMargin,
    "txt_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS u
        |  FROM documents
        |)
        |SELECT doc_id, source, n_words,
        |  round(least(1.0, CAST(n_words AS DOUBLE) / 200.0), 6) AS keep_p
        |FROM t
        |WHERE u < least(1.0, CAST(n_words AS DOUBLE) / 200.0)
        |ORDER BY doc_id""".stripMargin,
    "txt_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source, doc_id % 16 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, source, shard, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS off
        |  FROM t
        |)
        |SELECT doc_id, source, CAST(shard AS BIGINT) AS shard, n_tok,
        |  CAST(off // 2048 AS BIGINT) AS seq_id
        |FROM o ORDER BY doc_id""".stripMargin,
    "txt_temperature_mix" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS u
        |  FROM documents
        |), c AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY source
        |), z AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)), (a, x) -> a + x) AS z,
        |         CAST(SUM(n) AS BIGINT) AS n_total
        |  FROM c
        |), kept AS (
        |  SELECT u.source, count(*) AS n_kept
        |  FROM u JOIN c USING (source) CROSS JOIN z
        |  WHERE u.u < least(1.0, sqrt(CAST(c.n AS DOUBLE)) / z.z
        |                         * (CAST(z.n_total AS DOUBLE) / 2.0) / CAST(c.n AS DOUBLE))
        |  GROUP BY u.source
        |)
        |SELECT c.source, c.n AS n_docs,
        |  round(sqrt(CAST(c.n AS DOUBLE)) / z.z, 6) AS target_frac,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
        |FROM c CROSS JOIN z LEFT JOIN kept ON c.source = kept.source
        |ORDER BY c.source""".stripMargin,
    "txt_domain_mix" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS u
        |  FROM documents
        |), c AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY source
        |), k AS (SELECT min(n) AS k FROM c)
        |SELECT u.doc_id, u.source, c.n, k.k
        |FROM u JOIN c USING (source), k
        |WHERE u.u < CAST(k.k AS DOUBLE) / CAST(c.n AS DOUBLE)
        |ORDER BY doc_id""".stripMargin,
    // the token-mass twin: identical draw, per-source weights = BPE
    // token mass under the same literal merge chain
    "txt_domain_mix_bpe" ->
      s"""WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS u,
        |    $bpeTokenCountSql AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n FROM u GROUP BY source
        |), k AS (SELECT min(n) AS k FROM c)
        |SELECT u.doc_id, u.source, u.n_tokens, c.n, k.k
        |FROM u JOIN c USING (source), k
        |WHERE u.u < CAST(k.k AS DOUBLE) / CAST(c.n AS DOUBLE)
        |ORDER BY doc_id""".stripMargin,
    // the token-mass temperature twin: same sequential source-sorted
    // sqrt-weight fold and p formula, weights = BPE token mass; kept
    // doc and token masses both replayed
    "txt_temperature_mix_bpe" ->
      s"""WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0 AS u,
        |    $bpeTokenCountSql AS nt
        |  FROM documents
        |), c AS (
        |  SELECT source, CAST(sum(nt) AS BIGINT) AS n FROM u GROUP BY source
        |), z AS (
        |  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |           list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)), (a, x) -> a + x) AS z,
        |         CAST(SUM(n) AS BIGINT) AS n_total
        |  FROM c
        |), kept AS (
        |  SELECT u.source, count(*) AS n_kept_docs,
        |    CAST(sum(u.nt) AS BIGINT) AS kept_tokens
        |  FROM u JOIN c USING (source) CROSS JOIN z
        |  WHERE u.u < least(1.0, sqrt(CAST(c.n AS DOUBLE)) / z.z
        |                         * (CAST(z.n_total AS DOUBLE) / 2.0) / CAST(c.n AS DOUBLE))
        |  GROUP BY u.source
        |)
        |SELECT c.source, c.n AS n_tokens,
        |  round(sqrt(CAST(c.n AS DOUBLE)) / z.z, 6) AS target_frac,
        |  CAST(coalesce(n_kept_docs, 0) AS BIGINT) AS n_kept_docs,
        |  CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens
        |FROM c CROSS JOIN z LEFT JOIN kept ON c.source = kept.source
        |ORDER BY c.source""".stripMargin,
    // the incremental mixes: from-scratch replay of the WHOLE sliced
    // streaming ingest (within-batch exact dedup, per-batch MinHash
    // near-dup drop vs the accumulated survivors — the same sig/band
    // arithmetic dedup_incremental replays), then the mix finalization
    // over the survivors' per-source stats. The Spark side reads the
    // stats lake the ingest maintained; only an ingest that dropped
    // exactly these duplicates and accounted exactly these batches
    // hashes equal.
    "pipe_domain_mix_incr" -> domainMixReplayOracle,
    "pipe_temperature_mix_incr" -> temperatureMixReplayOracle,
    // the compacted serves answer from the folded snapshot; the oracle
    // is the identical from-scratch replay — fold == live == replay
    "pipe_domain_mix_compacted" -> domainMixReplayOracle,
    "pipe_temperature_mix_compacted" -> temperatureMixReplayOracle,
    // the hybrid serves union a mid-stream snapshot with the live tail;
    // the same whole-ingest replay proves no loss and no double count
    // across the fold boundary
    "pipe_domain_mix_hybrid" -> domainMixReplayOracle,
    "pipe_temperature_mix_hybrid" -> temperatureMixReplayOracle,
    // fold → vacuum → ingest → fold-forward; the same replay proves the
    // vacuumed batches' mass survived inside the snapshot chain
    "pipe_domain_mix_vacuumed" -> domainMixReplayOracle,
    // the survivor set re-derived from the whole replay, each
    // survivor's text hashed — corpus-content proof of the compacted
    // generation
    "pipe_corpus_compacted" ->
      (corpusStatsReplayCte + """
        |SELECT doc_id, source, md5(text) AS text_md5 FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM surv)
        |ORDER BY doc_id""".stripMargin),
    // the hybrid serve unions the mid-stream corpus snapshot with the
    // live tail, over an ingest whose batch-2 dedup ran against the
    // compacted index snapshots — the SAME whole-replay content proof
    "pipe_corpus_hybrid" ->
      (corpusStatsReplayCte + """
        |SELECT doc_id, source, md5(text) AS text_md5 FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM surv)
        |ORDER BY doc_id""".stripMargin),
    // per-batch drift: the replay's batch CTEs re-derive each batch's
    // survivor set (s0 / e1−d1 / e2−d2), then per-(batch, source) stats
    // and the same integer-ppm share arithmetic as the engine
    "pipe_mix_drift_incr" ->
      (corpusStatsReplayCte + s""", bsurv AS MATERIALIZED (
        |  SELECT 0 AS ingest_batch, doc_id FROM s0
        |  UNION ALL
        |  SELECT 1, doc_id FROM e1 WHERE doc_id NOT IN (SELECT doc_id FROM d1)
        |  UNION ALL
        |  SELECT 2, doc_id FROM e2 WHERE doc_id NOT IN (SELECT doc_id FROM d2)
        |), bstats AS MATERIALIZED (
        |  SELECT b.ingest_batch, d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum($bpeTokenCountSql) AS BIGINT) AS n_tokens
        |  FROM documents d JOIN bsurv b ON d.doc_id = b.doc_id
        |  GROUP BY b.ingest_batch, d.source
        |), bt AS (
        |  SELECT ingest_batch, CAST(sum(n_tokens) AS BIGINT) AS batch_tokens
        |  FROM bstats GROUP BY ingest_batch
        |), st AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
        |  FROM bstats GROUP BY source
        |), gt AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS all_tokens FROM bstats
        |)
        |SELECT CAST(bs.ingest_batch AS BIGINT) AS ingest_batch,
        |  bs.source, bs.n_docs, bs.n_tokens,
        |  CAST((CAST(bs.n_tokens AS HUGEINT) * 1000000) // bt.batch_tokens AS BIGINT) AS batch_ppm,
        |  CAST((CAST(st.src_tokens AS HUGEINT) * 1000000) // gt.all_tokens AS BIGINT) AS corpus_ppm,
        |  CAST(abs((CAST(bs.n_tokens AS HUGEINT) * 1000000) // bt.batch_tokens
        |    - (CAST(st.src_tokens AS HUGEINT) * 1000000) // gt.all_tokens) AS BIGINT) AS drift_ppm,
        |  abs((CAST(bs.n_tokens AS HUGEINT) * 1000000) // bt.batch_tokens
        |    - (CAST(st.src_tokens AS HUGEINT) * 1000000) // gt.all_tokens) > 10000 AS drifted
        |FROM bstats bs JOIN bt USING (ingest_batch) JOIN st USING (source), gt
        |ORDER BY bs.ingest_batch, bs.source""".stripMargin),
    "pipe_training_shards" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, md5(text) AS ch
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5
        |), keep AS (
        |  SELECT ch, min(doc_id) AS doc_id FROM q GROUP BY ch
        |), uniq AS (
        |  SELECT q.* FROM q JOIN keep USING (ch, doc_id)
        |), c AS (
        |  SELECT source, count(*) AS n FROM uniq GROUP BY source
        |), k AS (SELECT min(n) AS k FROM c
        |), mix AS (
        |  SELECT u.doc_id, u.source, u.n_tok
        |  FROM uniq u JOIN c USING (source), k
        |  WHERE CAST(try_cast('0x' || substr(md5(CAST(u.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0
        |    < CAST(k.k AS DOUBLE) / CAST(c.n AS DOUBLE)
        |), sh AS (
        |  SELECT doc_id, source, doc_id % 16 AS shard, n_tok FROM mix
        |), o AS (
        |  SELECT doc_id, source, shard, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS off
        |  FROM sh
        |)
        |SELECT doc_id, source, CAST(shard AS BIGINT) AS shard, n_tok,
        |  CAST(off // 2048 AS BIGINT) AS seq_id
        |FROM o ORDER BY doc_id""".stripMargin,
    "txt_contamination" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingle
        |  FROM words WHERE len(w) >= 3
        |), bench AS (
        |  SELECT shingle, doc_id AS bench_id FROM sh
        |  WHERE doc_id % 50 = 0 AND doc_id < 2000
        |)
        |SELECT s.doc_id,
        |  count(DISTINCT s.shingle) AS n_shared_shingles,
        |  count(DISTINCT bench.bench_id) AS n_bench_docs
        |FROM sh s JOIN bench ON s.shingle = bench.shingle
        |WHERE NOT (s.doc_id % 50 = 0 AND s.doc_id < 2000)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "txt_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), idx AS (
        |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
        |), bi AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS n1 FROM bi GROUP BY w1
        |), p AS (
        |  SELECT bi.doc_id, (n2 * 1000000) // n1 AS ps
        |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(SUM(ps) AS DOUBLE) / count(*), 4) AS avg_p
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "txt_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
        |), tgt AS (
        |  SELECT w, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY w
        |), allc AS (SELECT w, count(*) AS ca FROM toks GROUP BY w),
        |tot AS (
        |  SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS na, CAST(count(DISTINCT w) AS BIGINT) AS v
        |  FROM toks
        |), scored AS (
        |  SELECT t.doc_id,
        |    ((coalesce(tg.ct, 0) + 1) * 1000000) // (ac.ca + 1) AS base
        |  FROM toks t LEFT JOIN tgt tg ON t.w = tg.w JOIN allc ac ON t.w = ac.w
        |)
        |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST((CAST(sum(base) AS BIGINT) * (tot.na + tot.v))
        |    // ((tot.nt + tot.v) * count(*)) AS BIGINT) AS dsir_score
        |FROM scored s CROSS JOIN tot
        |GROUP BY s.doc_id, tot.nt, tot.na, tot.v ORDER BY s.doc_id""".stripMargin,
    "txt_repetition" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), uc AS (
        |  SELECT doc_id, n_words, g, count(*) AS c
        |  FROM (SELECT doc_id, len(w) AS n_words, unnest(w) AS g FROM words) t
        |  GROUP BY doc_id, n_words, g
        |), uni AS (
        |  SELECT doc_id, n_words, max(c) AS top_uni FROM uc GROUP BY doc_id, n_words
        |), bc AS (
        |  SELECT doc_id, n_bigrams, g, count(*) AS c
        |  FROM (SELECT doc_id, len(w) - 1 AS n_bigrams,
        |          unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |        FROM words WHERE len(w) >= 2) t
        |  GROUP BY doc_id, n_bigrams, g
        |), bi AS (
        |  SELECT doc_id, n_bigrams, max(c) AS top_bi FROM bc GROUP BY doc_id, n_bigrams
        |)
        |SELECT uni.doc_id, CAST(uni.n_words AS BIGINT) AS n_words,
        |  round(CAST(top_uni AS DOUBLE) / uni.n_words, 6) AS top_uni_frac,
        |  round(CAST(top_bi AS DOUBLE) / bi.n_bigrams, 6) AS top_bi_frac
        |FROM uni JOIN bi ON uni.doc_id = bi.doc_id
        |ORDER BY uni.doc_id""".stripMargin,
    "txt_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        w -> try_cast('0x' || substr(md5(w), 1, 8) AS BIGINT))),
        |    (acc, w) -> (acc * 31 + w) % 1000000007) AS fp_rolling,
        |  md5(text) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_bm25_topk" -> bm25OracleSql,
    // identical oracle by design: index-served BM25 must hash-equal the
    // live computation — that equality is the inverted-index proof
    "txt_bm25_artifact" -> bm25OracleSql,
    // identical again: the compacted generation must rank exactly as the
    // fragmented lake and the live scan — compaction is layout-only
    "txt_bm25_compacted" -> bm25OracleSql,
    // snapshot+tail over vacuumed-index fixtures — same full-corpus SQL:
    // equality across live/artifact/compacted/hybrid layouts is the proof
    "txt_bm25_hybrid" -> bm25OracleSql,
    // phrase frequency computed the OTHER way: direct bigram-occurrence
    // counting (list_transform over 1..len-1), never a position list —
    // agreement proves the Spark side's positional postings and the
    // shifted-intersection adjacency match are exact
    "txt_phrase_search" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |occ AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i + 1])) AS phrase
         |  FROM w WHERE len(w) >= 2
         |), filt AS (
         |  SELECT * FROM occ
         |  WHERE string_split(phrase, ' ')[1] NOT IN ($stopList)
         |    AND string_split(phrase, ' ')[2] NOT IN ($stopList)
         |), top3 AS (
         |  SELECT phrase FROM filt GROUP BY phrase
         |  ORDER BY count(*) DESC, phrase LIMIT 3
         |), m AS (
         |  SELECT f.phrase, f.doc_id, count(*) AS tf
         |  FROM filt f JOIN top3 USING (phrase) GROUP BY 1, 2
         |), a AS (
         |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(tf) AS BIGINT) AS total_occ, CAST(max(tf) AS BIGINT) AS max_tf
         |  FROM m GROUP BY phrase
         |)
         |SELECT a.phrase, a.n_docs, a.total_occ, a.max_tf,
         |  CAST(min(m.doc_id) AS BIGINT) AS best_doc
         |FROM a JOIN m ON a.phrase = m.phrase AND m.tf = a.max_tf
         |GROUP BY a.phrase, a.n_docs, a.total_occ, a.max_tf
         |ORDER BY a.phrase""".stripMargin,
    // predicts the fragmented lake's bucket accounting from documents:
    // postings = distinct (word, doc_id), fragment = the doc's synthetic
    // ingest generation, bucket = the word's md5 hex digit
    "txt_postings_merge_plan" ->
      """WITH pr AS (
        |  SELECT word, doc_id
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY word, doc_id
        |), b AS (
        |  SELECT try_cast('0x' || substr(md5(word), 1, 1) AS BIGINT) AS wb,
        |    doc_id % 8 AS ib, word
        |  FROM pr
        |)
        |SELECT wb, CAST(count(DISTINCT ib) AS BIGINT) AS n_fragments,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT word) AS BIGINT) AS n_terms,
        |  count(DISTINCT ib) > 4 AS merge
        |FROM b GROUP BY wb ORDER BY wb""".stripMargin,
    "txt_perceptron_train" ->
      s"""$perceptronCtes
         |SELECT w1.feature AS feature, w1.w1 AS w1,
         |  CAST(w1.w1 + coalesce(upd.dw, 0) AS BIGINT) AS w2
         |FROM w1 LEFT JOIN upd USING (feature)
         |ORDER BY feature""".stripMargin,
    "txt_perceptron_apply" ->
      s"""$perceptronCtes, wfinal AS (
         |  SELECT w1.feature AS feature,
         |    CAST(w1.w1 + coalesce(upd.dw, 0) AS BIGINT) AS w2
         |  FROM w1 LEFT JOIN upd USING (feature)
         |), test AS (
         |  SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1
         |), tfeat AS (
         |  SELECT doc_id,
         |    try_cast('0x' || substr(md5(w), 1, 1) AS BIGINT) AS feature,
         |    count(*) AS x
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents WHERE doc_id % 2 = 1)
         |  GROUP BY doc_id, feature
         |  UNION ALL
         |  SELECT doc_id, CAST(16 AS BIGINT), CAST(1 AS BIGINT) FROM test
         |), margins AS (
         |  SELECT doc_id, CAST(sum(w2 * x) AS BIGINT) AS margin
         |  FROM tfeat JOIN wfinal USING (feature) GROUP BY doc_id
         |)
         |SELECT m.doc_id AS doc_id, margin,
         |  CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
         |  CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS BIGINT) AS label,
         |  CAST(CASE WHEN (CASE WHEN margin > 0 THEN 1 ELSE -1 END)
         |              = (CASE WHEN lang = 'en' THEN 1 ELSE -1 END)
         |       THEN 1 ELSE 0 END AS INT) AS correct
         |FROM margins m JOIN test USING (doc_id) ORDER BY doc_id""".stripMargin,
    "txt_ccnet_buckets" ->
      s"""WITH $ccnetCtes
         |SELECT doc_id, lang, avg_p, bucket
         |FROM bucketed ORDER BY doc_id""".stripMargin,
    "pipe_filter_funnel" ->
      s"""$perceptronCtes, $ccnetCtes, wfinal AS (
         |  SELECT w1.feature AS feature,
         |    CAST(w1.w1 + coalesce(upd.dw, 0) AS BIGINT) AS w2
         |  FROM w1 LEFT JOIN upd USING (feature)
         |), afeat AS (
         |  SELECT doc_id,
         |    try_cast('0x' || substr(md5(w), 1, 1) AS BIGINT) AS feature,
         |    count(*) AS x
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY doc_id, feature
         |  UNION ALL
         |  SELECT doc_id, CAST(16 AS BIGINT), CAST(1 AS BIGINT) FROM documents
         |), apred AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN sum(w2 * x) > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
         |  FROM afeat JOIN wfinal USING (feature) GROUP BY doc_id
         |), gop AS (
         |  SELECT doc_id,
         |    (CAST(len(string_split(text, ' ')) AS BIGINT) BETWEEN 20 AND 10000)
         |    AND (CAST(length(replace(text, ' ', '')) AS BIGINT) * 100
         |         // CAST(len(string_split(text, ' ')) AS BIGINT) BETWEEN 300 AND 1000)
         |    AND len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) >= 2
         |    AND CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 100
         |        // CAST(len(string_split(text, ' ')) AS BIGINT) >= 20
         |    AS gopher_pass
         |  FROM documents
         |), bkt AS (
         |  SELECT doc_id, bucket FROM bucketed
         |), canon AS (
         |  SELECT md5(text) AS hsh, min(doc_id) AS keep_id
         |  FROM documents GROUP BY 1
         |)
         |SELECT d.doc_id AS doc_id, g.gopher_pass AS gopher_pass,
         |  coalesce(b.bucket, 'none') AS bucket, a.pred AS pred,
         |  d.doc_id = c.keep_id AS is_canon,
         |  g.gopher_pass AND coalesce(b.bucket, 'none') IN ('head', 'middle')
         |    AND a.pred = 1 AND d.doc_id = c.keep_id AS keep
         |FROM documents d
         |JOIN gop g ON d.doc_id = g.doc_id
         |LEFT JOIN bkt b ON d.doc_id = b.doc_id
         |JOIN apred a ON d.doc_id = a.doc_id
         |JOIN canon c ON md5(d.text) = c.hsh
         |ORDER BY d.doc_id""".stripMargin)

  /** The CCNet scoring CTE chain (corpus bigram LM → per-doc mean scaled
    * transition probability → per-language rank), shared by the
    * txt_ccnet_buckets oracle and the pipe_filter_funnel capstone. Body
    * only — callers prepend WITH or splice after their own CTEs.
    */
  private lazy val ccnetCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |), idx AS (
      |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
      |), bi AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx
      |), c2 AS (
      |  SELECT w1, w2, count(*) AS n2 FROM bi GROUP BY w1, w2
      |), c1 AS (
      |  SELECT w1, count(*) AS n1 FROM bi GROUP BY w1
      |), p AS (
      |  SELECT bi.doc_id, (n2 * 1000000) // n1 AS ps
      |  FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      |), scored AS (
      |  SELECT p.doc_id AS doc_id,
      |    round(CAST(SUM(ps) AS DOUBLE) / count(*), 4) AS avg_p
      |  FROM p GROUP BY p.doc_id
      |), p4s AS (
      |  SELECT s.doc_id AS doc_id, d.lang AS lang, s.avg_p AS avg_p,
      |    CAST(round(s.avg_p * 10000, 0) AS BIGINT) AS p4
      |  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
      |), chist AS (
      |  SELECT lang, p4, count(*) AS k FROM p4s GROUP BY lang, p4
      |), ccum AS (
      |  SELECT lang, p4,
      |    sum(k) OVER (PARTITION BY lang ORDER BY p4 DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(k) OVER (PARTITION BY lang) AS n_lang
      |  FROM chist
      |), ccuts AS (
      |  SELECT lang,
      |    max(CASE WHEN n_lang >= 3 AND cum >= n_lang // 3 THEN p4 END) AS t1,
      |    max(CASE WHEN n_lang >= 2 AND cum >= (2 * n_lang) // 3 THEN p4 END) AS t2
      |  FROM ccum GROUP BY lang
      |), bucketed AS (
      |  SELECT p.doc_id AS doc_id, p.lang AS lang, p.avg_p AS avg_p,
      |    CASE WHEN t1 IS NOT NULL AND p4 >= t1 THEN 'head'
      |         WHEN t2 IS NOT NULL AND p4 >= t2 THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM p4s p JOIN ccuts c ON p.lang = c.lang
      |)""".stripMargin

  /** The BM25 oracle, shared verbatim by txt_bm25_topk and
    * txt_bm25_artifact (the oracle always recomputes from `documents`;
    * serving from the persisted postings must not change a single hash).
    */
  private lazy val bm25OracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |), qterms AS (
       |  SELECT word FROM (
       |    SELECT word, count(*) AS cf FROM toks
       |    WHERE word NOT IN ($stopList)
       |    GROUP BY word ORDER BY cf DESC, word LIMIT 5)
       |), tf AS (
       |  SELECT doc_id, t.word AS word, count(*) AS tf
       |  FROM toks t JOIN qterms q ON t.word = q.word
       |  GROUP BY doc_id, t.word
       |), dfq AS (
       |  SELECT word, count(*) AS df FROM tf GROUP BY word
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
       |), tot AS (
       |  SELECT CAST(sum(dl) AS BIGINT) AS total, count(*) AS n_docs FROM dl
       |)
       |SELECT tf.doc_id AS doc_id, dl.dl AS dl,
       |  count(*) AS n_terms,
       |  CAST(sum(
       |    ((((n_docs - df) * 1000) // (df + 1)) * 22 * tf * total)
       |      // (10 * tf * total + 3 * total + 9 * dl.dl * n_docs)
       |  ) AS BIGINT) AS score
       |FROM tf JOIN dfq USING (word) JOIN dl ON tf.doc_id = dl.doc_id, tot
       |GROUP BY tf.doc_id, dl.dl
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** Shared CTE prefix of the perceptron train/apply oracles — the 2-epoch
    * integer batch-perceptron on the even-doc_id half (see the
    * txt_perceptron_train query scaladoc for the model).
    */
  private val perceptronCtes: String =
    """WITH train AS (
      |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 0
      |), feat AS (
      |  SELECT doc_id,
      |    try_cast('0x' || substr(md5(w), 1, 1) AS BIGINT) AS feature,
      |    count(*) AS x
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM train)
      |  GROUP BY doc_id, feature
      |  UNION ALL
      |  SELECT doc_id, CAST(16 AS BIGINT), CAST(1 AS BIGINT) FROM train
      |), lab AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM train
      |), w1 AS (
      |  SELECT feature, CAST(sum(y * x) AS BIGINT) AS w1
      |  FROM feat JOIN lab USING (doc_id) GROUP BY feature
      |), marg AS (
      |  SELECT doc_id, CAST(sum(w1 * x) AS BIGINT) AS m
      |  FROM feat JOIN w1 USING (feature) GROUP BY doc_id
      |), upd AS (
      |  SELECT feature, CAST(sum(y * x) AS BIGINT) AS dw
      |  FROM feat JOIN lab USING (doc_id) JOIN marg USING (doc_id)
      |  WHERE y * m <= 0 GROUP BY feature
      |)""".stripMargin
}
