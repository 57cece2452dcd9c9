package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the learned / retrieval operators added in round 10:
  * the batch-perceptron classifier pair, BM25 retrieval (live and
  * index-served), the exact substring-span dedup report, CCNet perplexity
  * buckets, and the k-NN label eval. Value-level cross-engine equality is
  * the DuckDB oracle's job (scripts/oracle_check.py); these tests pin the
  * INVARIANTS a refactor could silently break while still hashing green on
  * some corpus — epoch algebra, ordering, bucket arithmetic, vote bounds.
  */
class LearnedOpsSpec extends SparkSuiteBase {

  // ---- perceptron ----

  test("perceptron epoch 1 is the label-weighted feature sum (w=0 start)") {
    // from w=0 every doc has margin 0 <= 0, so w1[bias] must equal
    // sum(y) over the training half = (#en - #other)
    val w = SparkEntry.queries("txt_perceptron_train")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val biasW1 = w.find(_._1 == 16L).map(_._2).get
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === 0)
      .agg(sum(when(col("lang") === "en", 1L).otherwise(-1L)))
      .head().getLong(0)
    assert(biasW1 == counts, s"bias w1 $biasW1 != sum(y) $counts")
    // features are the 16 md5 buckets + bias, nothing else
    assert(w.map(_._1).forall(f => f >= 0 && f <= 16))
  }

  test("perceptron apply margins are exactly dot(w2, features)") {
    val w2 = SparkEntry.queries("txt_perceptron_train")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val applied = SparkEntry.queries("txt_perceptron_apply")(spark, sf0001)
    val rows = applied.limit(5).collect()
    assert(rows.nonEmpty)
    import graft.functions.TextFunctions.md5Bits
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    rows.foreach { r =>
      val docId = r.getLong(r.fieldIndex("doc_id"))
      val margin = r.getLong(r.fieldIndex("margin"))
      val feats = docs.filter(col("doc_id") === docId)
        .select(explode(split(col("text"), " ")).as("w"))
        .select(md5Bits(col("w"), 1).as("f"))
        .groupBy("f").count().collect()
        .map(x => (x.getLong(0), x.getLong(1))) :+ ((16L, 1L))
      val expected = feats.map { case (f, x) => w2.getOrElse(f, 0L) * x }.sum
      assert(margin == expected, s"doc $docId margin $margin != $expected")
      // prediction convention: margin <= 0 -> -1 (matches training's
      // "y*m <= 0 is misclassified")
      val pred = r.getLong(r.fieldIndex("pred"))
      assert(pred == (if (margin > 0) 1L else -1L))
      val correct = r.getInt(r.fieldIndex("correct"))
      assert(correct == (if (pred == r.getLong(r.fieldIndex("label"))) 1 else 0))
    }
  }

  test("perceptron trains on the even half only; apply scores the odd half") {
    val applied = SparkEntry.queries("txt_perceptron_apply")(spark, sf0001)
    assert(applied.filter(col("doc_id") % 2 === 0).count() == 0)
    val nOdd = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 2 === 1).count()
    assert(applied.count() == nOdd, "every held-out doc must be scored")
  }

  test("perceptron SERVING reads the persisted model artifact; training stays live") {
    // apply and the funnel's gate 3 must scan the fingerprint-keyed
    // perceptron_w artifact instead of re-running the two training
    // epochs' corpus scans per query (the train-once/score-forever
    // split). The dot-product test above already proves the served
    // model equals the live training bit-for-bit.
    for (q <- Seq("txt_perceptron_apply", "pipe_filter_funnel")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("perceptron_w"),
        s"$q must serve the model from the persisted artifact")
    }
    // the train query IS the training benchmark — it must not silently
    // become an artifact read
    assert(!SparkEntry.queries("txt_perceptron_train")(spark, sf0001)
      .queryExecution.executedPlan.toString.contains("perceptron_w"))
  }

  // ---- BM25 ----

  test("bm25 top-10 is score-descending with doc_id tiebreak, scores positive") {
    val rows = SparkEntry.queries("txt_bm25_topk")(spark, sf0001).collect()
    assert(rows.length == 10)
    val keys = rows.map(r =>
      (r.getLong(r.fieldIndex("score")), r.getLong(r.fieldIndex("doc_id"))))
    keys.sliding(2).foreach { case Array((s1, d1), (s2, d2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2), "not in (score DESC, doc_id) order")
    }
    assert(keys.forall(_._1 > 0), "query terms are corpus-frequent; top scores must be > 0")
    assert(rows.forall(r => r.getLong(r.fieldIndex("n_terms")) >= 1 &&
      r.getLong(r.fieldIndex("n_terms")) <= 5))
  }

  test("bm25 tf saturation: duplicated term raises score sub-linearly") {
    // the integer rational form tfn = 22*tf*total / (10*tf*total + 3*total
    // + 9*dl*N) must be increasing in tf but bounded by 2.2: check the
    // algebra directly at representative sizes
    def tfn(tf: Long, dl: Long, total: Long, n: Long): Double =
      22.0 * tf * total / (10.0 * tf * total + 3.0 * total + 9.0 * dl * n)
    val (dl, total, n) = (30L, 15000L, 500L)
    val vals = (1L to 10L).map(tfn(_, dl, total, n))
    vals.sliding(2).foreach { case Seq(a, b) => assert(b > a) }
    // increments shrink (saturation) and the curve never exceeds k1+1
    val diffs = vals.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    diffs.sliding(2).foreach { case Seq(a, b) => assert(b < a) }
    assert(vals.last < 2.2)
  }

  test("bm25 served from the persisted inverted index equals the live ranking") {
    // the artifact path must reproduce the live top-10 bit-for-bit: same
    // docs, same order, same integer scores (the inverted-index proof)
    val live = SparkEntry.queries("txt_bm25_topk")(spark, sf0001).collect()
    val served = SparkEntry.queries("txt_bm25_artifact")(spark, sf0001).collect()
    assert(live.map(_.toSeq).toSeq == served.map(_.toSeq).toSeq)
  }

  // ---- exact substring-span dedup ----

  test("span dedup: intervals merged, bounds hold, zero-span docs kept") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val rows = SparkEntry.queries("dedup_span_frac")(spark, sf0001).collect()
    assert(rows.length == docs.count(), "one report row per corpus doc")
    rows.foreach { r =>
      val nWords = r.getLong(r.fieldIndex("n_words"))
      val nSpans = r.getLong(r.fieldIndex("n_spans"))
      val dupWords = r.getLong(r.fieldIndex("dup_words"))
      val frac = r.getLong(r.fieldIndex("dup_frac_x1e6"))
      assert(dupWords <= nWords, "merged spans can never exceed the doc")
      // every span is >= one 8-gram; merged spans are disjoint with a gap,
      // so k spans cover >= 8k words but <= n_words
      assert(dupWords >= 8 * nSpans || nSpans == 0)
      assert(frac == dupWords * 1000000L / nWords)
      if (nSpans == 0) assert(dupWords == 0L && frac == 0L)
    }
    // the synthetic corpus has a tiny vocabulary: duplicated 8-grams MUST
    // exist (a degenerate all-zero report would hash green on an empty
    // dup set; pin that the operator actually finds mass)
    assert(rows.exists(_.getLong(3) > 0), "no duplicated spans found at all")
  }

  test("span dedup agrees with a brute-force single-doc recompute") {
    // recompute doc 0's duplicated positions directly: hash every 8-gram
    // of every doc, find doc 0's grams whose hash count >= 2, merge
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val counts = scala.collection.mutable.Map.empty[String, Int]
    all.foreach { case (_, w) =>
      w.sliding(8).filter(_.length == 8)
        .foreach(g => counts.updateWith(g.mkString(" "))(c => Some(c.getOrElse(0) + 1)))
    }
    val w0 = all.toMap.apply(0L)
    val hitStarts = w0.sliding(8).zipWithIndex
      .filter { case (g, _) => g.length == 8 && counts(g.mkString(" ")) >= 2 }
      .map(_._2 + 1).toSeq // 1-based, matching the query
    var spans = List.empty[(Int, Int)]
    hitStarts.foreach { i =>
      spans match {
        case (s0, e0) :: rest if i <= e0 => spans = (s0, math.max(e0, i + 8)) :: rest
        case _ => spans = (i, i + 8) :: spans
      }
    }
    val expDup = spans.map { case (s0, e0) => e0 - s0 }.sum
    val got = SparkEntry.queries("dedup_span_frac")(spark, sf0001)
      .filter(col("doc_id") === 0).head()
    assert(got.getLong(got.fieldIndex("dup_words")) == expDup.toLong)
    assert(got.getLong(got.fieldIndex("n_spans")) == spans.length.toLong)
  }

  test("span cut: kept mass complements the span_frac report; untouched docs keep their bytes") {
    val cut = SparkEntry.queries("dedup_span_cut")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val frac = SparkEntry.queries("dedup_span_frac")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // exact complement: what the report counts as duplicated mass is
    // exactly what the cut removed, doc for doc
    cut.foreach { case (id, (nWords, nKept, _)) =>
      assert(nWords - nKept == frac(id),
        s"doc $id: cut ${nWords - nKept} words but the report says ${frac(id)}")
    }
    // zero-span docs must re-assemble to their ORIGINAL bytes
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), md5(col("text")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val untouched = cut.filter { case (_, (nw, nk, _)) => nw == nk }
    assert(untouched.nonEmpty, "fixture should leave some docs uncut")
    untouched.foreach { case (id, (_, _, keptMd5)) =>
      assert(keptMd5 == docs(id), s"doc $id: uncut text must hash to the original")
    }
    // and the fixture must exercise the cut (some doc loses words)
    assert(cut.exists { case (_, (nw, nk, _)) => nk < nw })
  }

  test("matryoshka eval: three truncation rows, sound bounds, full-dim ground truth covered") {
    val rows = SparkEntry.queries("sim_matryoshka_eval")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    val nProbes = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 10).count()
    rows.foreach { r =>
      val (hits, possible, recall) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(possible == nProbes * 10, "ground truth = 10 neighbours per probe")
      assert(hits >= 0 && hits <= possible)
      assert(recall == hits * 100 / possible)
    }
    // a 32-of-64 prefix preserving NOTHING of the neighbourhood would
    // mean the fixture embeddings are pathological — pin non-degeneracy
    assert(rows.last.getLong(1) > 0, "dim-32 recall must be non-zero")
  }

  test("postings merge plan: 16 buckets, fragment bounds, decision matches the rule") {
    val rows = SparkEntry.queries("txt_postings_merge_plan")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 16L),
      "one row per md5 hex bucket, ordered")
    rows.foreach { r =>
      val (nFrag, nRows, nTerms, merge) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(nFrag >= 1 && nFrag <= 8, "synthetic lake has 8 ingest generations")
      assert(nTerms <= nRows)
      assert(merge == (nFrag > 4), "decision must be exactly the >4-fragments rule")
    }
  }

  test("incremental span dedup: batch-only rows, artifact-served == corpus recompute, asymmetry holds") {
    val incr = SparkEntry.queries("dedup_span_incr")(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    // exactly the batch half (doc_id % 10 == 0), every batch doc reported
    assert(incr.map(_.getLong(0)).toSet ==
      docs.filter(col("doc_id") % 10 === 0).select("doc_id").collect()
        .map(_.getLong(0)).toSet)
    // parity: the persisted gram artifact must reproduce a LIVE corpus
    // recompute — hash every corpus 8-gram directly and re-derive one
    // batch doc's spans
    val all = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val corpusGrams = all.filter(_._1 % 10 != 0).flatMap { case (_, w) =>
      w.sliding(8).filter(_.length == 8).map(_.mkString(" "))
    }.toSet
    val probe = incr.map(_.getLong(0)).max
    val wP = all.toMap.apply(probe)
    val hitStarts = wP.sliding(8).zipWithIndex
      .filter { case (g, _) => g.length == 8 && corpusGrams(g.mkString(" ")) }
      .map(_._2 + 1).toSeq
    var spans = List.empty[(Int, Int)]
    hitStarts.foreach { i =>
      spans match {
        case (s0, e0) :: rest if i <= e0 => spans = (s0, math.max(e0, i + 8)) :: rest
        case _ => spans = (i, i + 8) :: spans
      }
    }
    val got = incr.find(_.getLong(0) == probe).get
    assert(got.getLong(got.fieldIndex("dup_words")) ==
      spans.map { case (s0, e0) => e0 - s0 }.sum.toLong)
    assert(got.getLong(got.fieldIndex("n_spans")) == spans.length.toLong)
    // ASYMMETRY: a gram shared only among batch docs must NOT flag — the
    // batch rows' hits are a subset of what the whole-corpus query finds
    val whole = SparkEntry.queries("dedup_span_frac")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    incr.foreach(r => assert(r.getLong(3) <= whole(r.getLong(0)),
      "incremental (corpus-only) mass can never exceed the whole-corpus mass"))
  }

  // ---- composed filter funnel ----

  test("filter funnel: keep is exactly the AND of the four gates; gates match their standalone queries") {
    val funnel = SparkEntry.queries("pipe_filter_funnel")(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(funnel.length == docs.count(), "every doc gets a verdict row")
    funnel.foreach { r =>
      val keep = r.getBoolean(r.fieldIndex("keep"))
      val expected = r.getBoolean(r.fieldIndex("gopher_pass")) &&
        Set("head", "middle")(r.getString(r.fieldIndex("bucket"))) &&
        r.getLong(r.fieldIndex("pred")) == 1L &&
        r.getBoolean(r.fieldIndex("is_canon"))
      assert(keep == expected, s"doc ${r.getLong(0)}: keep != AND of gates")
    }
    // gate columns agree with the standalone queries they compose
    val gopher = SparkEntry.queries("txt_gopher_rules")(spark, sf0001)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val buckets = SparkEntry.queries("txt_ccnet_buckets")(spark, sf0001)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    funnel.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      assert(r.getBoolean(r.fieldIndex("gopher_pass")) == gopher(id))
      assert(r.getString(r.fieldIndex("bucket")) == buckets.getOrElse(id, "none"))
    }
    // the funnel must actually funnel: strictly fewer keeps than docs,
    // and at least one survivor (degenerate all-false/all-true would
    // still hash green on a broken gate)
    val kept = funnel.count(_.getBoolean(5))
    assert(kept > 0 && kept < funnel.length, s"kept $kept of ${funnel.length}")
  }

  // ---- CCNet buckets ----

  test("ccnet buckets: per-language value-cut terciles — covering, minimal, strictly ordered") {
    val b = SparkEntry.queries("txt_ccnet_buckets")(spark, sf0001).collect()
    val byLang = b.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val n = rows.length
      def scores(bk: String) = rows.filter(_.getString(3) == bk).map(_.getDouble(2))
      val (head, mid, tail) = (scores("head"), scores("middle"), scores("tail"))
      if (n >= 3) {
        // the value cut covers the tercile target, overshooting only by
        // the tie group AT the cut (kept whole by design) — dropping
        // that group would fall below floor(n/3): minimality both ways
        assert(head.length >= n / 3, s"$lang: head ${head.length} < ${n / 3}")
        val t1 = head.min
        assert(head.count(_ > t1) < n / 3, s"$lang: head cut not minimal")
        assert(head.length + mid.length >= 2 * n / 3,
          s"$lang: head+middle < floor(2n/3)")
        if (mid.nonEmpty) {
          val t2 = mid.min
          assert((head ++ mid).count(_ > t2) < 2 * n / 3,
            s"$lang: middle cut not minimal")
        }
      }
      // buckets are STRICT value ranges: min(head) > max(middle) > ... —
      // a tie can never straddle a bucket boundary any more
      if (head.nonEmpty && mid.nonEmpty)
        assert(head.min > mid.max, s"$lang: head/middle overlap")
      if (mid.nonEmpty && tail.nonEmpty)
        assert(mid.min > tail.max, s"$lang: middle/tail overlap")
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min > tail.max, s"$lang: head/tail overlap")
    }
    // only docs with >= 2 tokens are scored (the bigram-LM domain)
    val eligible = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(b.length == eligible)
  }

  // ---- bitext mining ----

  test("bitext mine: one row per probe, margin algebra, hub suppression direction") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val nProbes = e.filter(col("label") === 0 && col("vec_id") < 60).count()
    val rows = SparkEntry.queries("sim_bitext_mine")(spark, sf0001).collect()
    assert(rows.length == nProbes && nProbes > 0)
    rows.foreach { r =>
      val cos = r.getLong(r.fieldIndex("cos_x1e6"))
      val margin = r.getLong(r.fieldIndex("margin_x1e6"))
      assert(cos >= -1000000L && cos <= 1000001L, s"cos out of range: $cos")
      // margin = best - mean of two top-4 neighbourhood means; the best
      // IS in its own forward top-4, so margin < best - (best/... ) is
      // loose — pin the hard bound: margin <= cos + 1e6 (bwd mean >= -1)
      assert(margin <= cos + 1000000L)
      assert(r.getBoolean(r.fieldIndex("accepted")) == (margin > 0))
    }
    // tgt side only ever proposes label-1 vectors
    val tgtLabels = e.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach(r => assert(tgtLabels(r.getLong(r.fieldIndex("tgt_id"))) == 1))
  }

  test("bitext mine: the proposed target is the probe's true cosine argmax over label 1") {
    val rows = SparkEntry.queries("sim_bitext_mine")(spark, sf0001).collect()
    val probe = rows.head.getLong(0)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === probe).select(col("embedding").as("s_emb"))
    val best = e.filter(col("label") === 1).crossJoin(broadcast(q))
      .withColumn("css",
        round(call_function("graft_cosine", col("embedding"), col("s_emb"))
          * lit(1000000), 0).cast("long"))
      .orderBy(desc("css"), col("vec_id")).limit(1)
      .select("vec_id").head().getLong(0)
    assert(rows.head.getLong(rows.head.fieldIndex("tgt_id")) == best)
  }

  // ---- kNN classify ----

  test("knn classify: one verdict per probe, votes in [1,5], correct consistent") {
    val rows = SparkEntry.queries("sim_knn_classify")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 20L),
      "exactly the 20 fixed probes, ordered")
    rows.foreach { r =>
      val votes = r.getLong(r.fieldIndex("votes"))
      assert(votes >= 1 && votes <= 5)
      val correct = r.getInt(r.fieldIndex("correct"))
      val agree = r.getInt(r.fieldIndex("true_label")) ==
        r.getInt(r.fieldIndex("pred_label"))
      assert(correct == (if (agree) 1 else 0))
    }
  }

  test("knn classify never votes a probe into its own neighbourhood") {
    // probes are vec_id < 20; the candidate pool starts at 20, so a probe
    // must not be its own neighbour even though probe embeddings exist in
    // the lake. Recompute probe 0's top-5 by brute force and check the
    // majority verdict matches the query's row.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val top5 = e.filter(col("vec_id") >= 20).crossJoin(broadcast(q))
      .withColumn("cos_sim",
        round(call_function("graft_cosine", col("embedding"), col("q_emb")), 6))
      .orderBy(desc("cos_sim"), col("vec_id")).limit(5)
      .select("label").collect().map(_.getInt(0))
    val expectedPred = top5.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (l, c) => (-c, l) }.head._1
    val got = SparkEntry.queries("sim_knn_classify")(spark, sf0001)
      .filter(col("vec_id") === 0).head()
    assert(got.getInt(got.fieldIndex("pred_label")) == expectedPred)
  }
}
