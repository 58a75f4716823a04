package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Regression fence for the dedup stack's 100 TB contract: candidate
  * volume must grow ~LINEARLY with the corpus, never quadratically.
  * PlanSpec pins plan SHAPES; this spec pins the resulting METRIC — the
  * largest equi-join output row count, read from SQL metrics after real
  * executions at two scale factors. A corpus-independent join key (the
  * r6 dedup_semantic bug class) reappearing anywhere in these pipelines
  * would push the measured growth toward the data ratio SQUARED.
  */
class ScaleGrowthSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Executes the declared query and returns the LARGEST output-row
    * metric across its shuffled/broadcast EQUI-join operators — the
    * candidate-generation and verify joins. Cached-relation internals
    * are not traversed (their builds are one-time linear passes);
    * broadcast nested-loop shapes (the K-row centroid fan-outs) are
    * out of scope for the candidate-volume contract. */
  private def maxJoinRows(name: String, sf: String): Long = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // fills the SQL metrics of this exact QueryExecution
    graft.plans.PlanWalk.nodes(df.queryExecution.executedPlan)
      .collect {
        case j: SortMergeJoinExec => j.metrics.get("numOutputRows")
        case j: ShuffledHashJoinExec => j.metrics.get("numOutputRows")
        case j: BroadcastHashJoinExec => j.metrics.get("numOutputRows")
      }
      .flatten.map(_.value).foldLeft(0L)(math.max)
  }

  test("containment candidate volume tracks the answer, not the corpus squared") {
    // No blocking scheme can emit fewer candidates than TRUE results,
    // and on this regenerated corpus the answer itself is quadratic:
    // the 31-word vocabulary saturates the gram space (~1000 distinct
    // 4-grams at every SF), so most same-source pairs genuinely contain
    // each other (measured 4.5k → 471k qualifying pairs over 10× docs).
    // The meaningful scale contract is therefore candidate volume =
    // O(answer + corpus) with a bounded overhead factor — on gram-
    // diverse corpora (the 100 TB web case) the same bound collapses to
    // linear candidates, which is what the pre-regeneration corpus
    // measured (~1× over 10× docs). Measured overhead: ~35× at BOTH SFs
    // through r13; ~21× since the r14 smaller-side-probes direction
    // filter (constant factor, i.e. the blocking tracks the answer);
    // bound tightened 80× → 50× accordingly.
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val cand = maxJoinRows("dedup_containment", sf)
      val answer = SparkEntry.queries("dedup_containment")(spark, sf).count()
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      info(s"dedup_containment at $sf: candidates=$cand answer=$answer docs=$docs")
      assert(cand <= 50L * math.max(answer, docs),
        s"$sf: candidate volume $cand not O(answer=$answer + corpus=$docs)")
    }
  }

  test("minhash-LSH banding candidate volume grows ~linearly over a 10× corpus") {
    // the (band, signature) bucket join is the candidate generator; its
    // key space grows with the corpus (signatures derive from content),
    // so bucket sizes stay bounded and candidates track N. A band/sig
    // scheme collapsing to few buckets (the corpus-independent-key bug
    // class) would push growth toward the ratio squared.
    val small = maxJoinRows("dedup_minhash_lsh", "/root/testdata/sf0.01")
    val big = maxJoinRows("dedup_minhash_lsh", "/root/testdata/sf0.1")
    info(s"dedup_minhash_lsh max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"LSH candidates grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("exact-substring duplicated-window volume grows ~linearly over a 10× corpus") {
    // No candidate join here — the keep decision is one window over the
    // corpus-growing 64-bit window hash. The quadratic bug class is a
    // boilerplate hash collapsing the key space (every occurrence past
    // the first counts as duplicated), so the fence metric is the total
    // duplicated-window volume Σ n_windows from the query's own output:
    // linear corpus growth must give ~linear duplicated-window growth.
    def dupWindows(sf: String): Long =
      SparkEntry.queries("dedup_exact_substr")(spark, sf)
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("n_windows"),
          org.apache.spark.sql.functions.lit(0L)))
        .collect()(0).getLong(0)
    val small = dupWindows("/root/testdata/sf0.01")
    val big = dupWindows("/root/testdata/sf0.1")
    info(s"dedup_exact_substr duplicated windows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"duplicated-window volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("edit-distance verification volume stays confined to LSH candidates") {
    // dedup_edit_distance consumes lshCandidates then joins text back on
    // BOTH sides — its largest equi-join output is the candidate×text
    // volume the O(len²) levenshtein actually runs over. The fence is the
    // same linear contract as the LSH generator itself: a regression that
    // widened the candidate block (or joined text before candidates)
    // would push this toward corpus².
    val small = maxJoinRows("dedup_edit_distance", "/root/testdata/sf0.01")
    val big = maxJoinRows("dedup_edit_distance", "/root/testdata/sf0.1")
    info(s"dedup_edit_distance max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"edit-distance volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("IVF+PQ candidate volume grows ~linearly with the corpus") {
    // the coarse-cell prune must cut the scored set BEFORE the ADC
    // lookups: the largest equi-join (probe cell ⋈ encoded corpus) must
    // track N, not N × K_cells. A broken prune (cell key collapsing, or
    // scoring before pruning) pushes the metric superlinear.
    // embeddings grow 500 → 2000 over sf0.01 → sf0.1 (the only span
    // where the regenerated testdata scales the vector corpus)
    val small = maxJoinRows("sim_topk_ivfpq", "/root/testdata/sf0.01")
    val big = maxJoinRows("sim_topk_ivfpq", "/root/testdata/sf0.1")
    info(s"sim_topk_ivfpq max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"IVF+PQ candidate volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("dedup provenance emits exactly one decision per document at every SF") {
    // the composed report's cardinality contract: four layered LEFT
    // joins may never duplicate or drop an input document — output rows
    // == corpus size, at both scale factors
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$sf/documents.parquet").count()
      val rows = SparkEntry.queries("pipeline_dedup_provenance")(spark, sf).count()
      info(s"pipeline_dedup_provenance rows at $sf: $rows (docs=$docs)")
      assert(rows == docs, s"$sf: $rows decisions for $docs documents")
    }
  }

  test("bm25 posting volume tracks the corpus, not corpus × vocabulary") {
    // the posting join (tf ⋈ broadcast terms, then ⋈ df / dl) must
    // output rows proportional to matching postings — linear in the
    // corpus for a fixed query set. A regression that joined postings
    // before the term filter (or keyed on something corpus-independent)
    // would push the largest join toward corpus × vocabulary.
    val small = maxJoinRows("text_bm25_topk", "/root/testdata/sf0.01")
    val big = maxJoinRows("text_bm25_topk", "/root/testdata/sf0.1")
    info(s"text_bm25_topk max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"bm25 posting volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("semantic-dedup pair volume tracks the corpus once K leaves the floor") {
    // The cosine threshold is FUSED into the pair join's condition, so
    // numOutputRows reports survivors (≈0), not candidates — measure the
    // pair volume the join must evaluate, Σ_cluster C(n_c, 2), from the
    // query's own (vec_id, cluster) output instead.
    // K = max(ceil(N/64), 8): below N=512 the floor holds K at 8, so the
    // informative span is sf0.01 (N=500, K=8) → sf0.1 (N=2000, K=32) —
    // 4× vectors with cluster populations pinned near the 64 target.
    // Linear contract: pair volume ≈ 4× (measured 4.005×); a fixed-K
    // regression leaves K=8 with ~250-vector clusters ⇒ ~16×.
    def pairVolume(sf: String): Long =
      SparkEntry.queries("dedup_semantic")(spark, sf)
        .groupBy("cluster").count().collect()
        .map { r => val n = r.getLong(1); n * (n - 1) / 2 }.sum
    val small = pairVolume("/root/testdata/sf0.01")
    val big = pairVolume("/root/testdata/sf0.1")
    info(s"dedup_semantic within-cluster pair volume: sf0.01=$small sf0.1=$big")
    assert(big <= 8L * math.max(small, 50L),
      s"semantic pair volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("incremental-dedup cross-boundary candidate volume grows ~linearly") {
    // batch-vs-corpus band candidates ride the same content-derived
    // (band, sig) keys as the full LSH fence; a corpus-independent key
    // would push the cross join toward |batch|×|corpus|
    val small = maxJoinRows("dedup_incremental", "/root/testdata/sf0.01")
    val big = maxJoinRows("dedup_incremental", "/root/testdata/sf0.1")
    info(s"dedup_incremental max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"incremental candidates grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("bipartite co-occurrence pair volume tracks order width, not corpus²") {
    // graph_cooccurrence self-joins on the order key: its largest join
    // output is Σ_orders w·(w−1)/2 with w bounded by order width (≤7
    // lineitems), so volume must grow ~linearly with orders — a key
    // change (e.g. joining on supplier instead) would blow toward N².
    val small = maxJoinRows("graph_cooccurrence", "/root/testdata/sf0.01")
    val big = maxJoinRows("graph_cooccurrence", "/root/testdata/sf0.1")
    info(s"graph_cooccurrence max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 30L * math.max(small, 50L),
      s"co-occurrence pair volume grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  test("paragraph boilerplate join volume tracks segment count, not corpus²") {
    // dedup_paragraph_common joins segments to their per-hash doc
    // frequencies: the join key is the content-derived segment hash and
    // the frequency side is one row per hash, so join output = segment
    // count exactly — linear in corpus tokens. A key regression (e.g.
    // joining on a constant-cardinality bucket) would multiply rows.
    val small = maxJoinRows("dedup_paragraph_common", "/root/testdata/sf0.01")
    val big = maxJoinRows("dedup_paragraph_common", "/root/testdata/sf0.1")
    info(s"dedup_paragraph_common max equi-join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 15L * math.max(small, 50L),
      s"paragraph boilerplate join grew superlinearly: sf0.01=$small → sf0.1=$big")
  }

  /** Largest BROADCAST build side (numOutputRows of any
    * BroadcastExchange) the executed plan materialized — the r10 blind
    * spot: PlanSpec pinned that the term join broadcasts and
    * maxJoinRows measured join OUTPUT, but neither read the build-side
    * INPUT cardinality, which is what OOMs the driver at 100 TB. */
  private def maxBroadcastRows(name: String, sf: String): Long = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    graft.plans.PlanWalk.nodes(df.queryExecution.executedPlan)
      .collect { case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        b.metrics.get("numOutputRows") }
      .flatten.map(_.value).foldLeft(0L)(math.max)
  }

  test("curation funnel gram-join volume grows linearly with the corpus") {
    // the funnel's decontamination join must match grams, not pairs of
    // docs: output rows track corpus growth (~10x), never its square
    val small = maxJoinRows("pipe_curation_funnel", "/root/testdata/sf0.01")
    val big = maxJoinRows("pipe_curation_funnel", "/root/testdata/sf0.1")
    info(s"funnel max join rows: sf0.01=$small sf0.1=$big")
    assert(big <= 15L * math.max(small, 50L),
      s"funnel join grew superlinearly: sf0.01=$small -> sf0.1=$big")
  }

  test("rank tests broadcast only DOMAIN-bounded rank tables at every SF") {
    // the r11 rank pipeline's contract: the tie-averaged rank tables are
    // bounded by the VALUE DOMAIN (cents ≤ ~49k distinct, props.k ≤ 100),
    // not the corpus — a 10× corpus must not grow the broadcast build
    // side past domain saturation
    val small = maxBroadcastRows("ml_spearman", "/root/testdata/sf0.01")
    val big = maxBroadcastRows("ml_spearman", "/root/testdata/sf0.1")
    info(s"spearman max broadcast build rows: sf0.01=$small sf0.1=$big")
    assert(small <= 49200L, s"sf0.01 rank table exceeds the cents domain: $small")
    assert(big <= 49200L, s"sf0.1 rank table exceeds the cents domain: $big")
  }

  test("retrieval scorers broadcast only term-bounded build sides at every SF") {
    // the r10 defect class: text_tfidf / text_bm25_topk broadcast the
    // FULL vocabulary-sized df aggregate. With AQE's size-guarded
    // runtime conversion disabled, the only broadcasts left are the
    // statically-hinted ones — and every one of those build sides must
    // be bounded by the QUERY (terms, corpus-count row), independent of
    // the corpus: ≤ 32 rows for bm25 (9 terms × few tables + 1-row
    // stats), ≤ 1 row for tfidf (the n_docs count) at BOTH SFs.
    val c = spark.conf
    val savedAqe = c.get("spark.sql.adaptive.enabled")
    val savedBc = c.get("spark.sql.autoBroadcastJoinThreshold")
    c.set("spark.sql.adaptive.enabled", "false")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val bm = maxBroadcastRows("text_bm25_topk", sf)
        val tf = maxBroadcastRows("text_tfidf", sf)
        info(s"max broadcast build rows at $sf: bm25=$bm tfidf=$tf")
        assert(bm <= 32, s"$sf: bm25 broadcast build side has $bm rows — corpus-growing")
        assert(tf <= 1, s"$sf: tfidf broadcast build side has $tf rows — corpus-growing")
      }
    } finally {
      c.set("spark.sql.adaptive.enabled", savedAqe)
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("null-safe join rows materialize only the linear equi-join — NULL bucket stays analytic") {
    // the naive IS NOT DISTINCT FROM plan funnels the 2%×2% NULL stripes
    // through ONE join key: 9e3 pairs at sf0.01 → 9e5 at sf0.1 → 9e11 at
    // sf100 (100× data = 10,000× pairs), and no skew-split saves one
    // logical key. The shipped plan computes that bucket analytically
    // (count_l_nulls × count_r_nulls) and equi-joins only non-null keys,
    // so the largest materialized join must track the FK — linear. A
    // regression back to the verbatim null-safe join trips this at sf0.1
    // (~1.05M joined rows vs the ~147k linear bound).
    // jn_nullsafe_engine rides the same fence: its query text is the
    // VERBATIM quadratic spelling and only the LinearizeNullSafeCountAgg
    // engine rule keeps it linear — this is the volume proof that the
    // rule's rewrite (not just its oracle equality) holds at scale.
    for (name <- Seq("jn_nullsafe", "jn_nullsafe_full", "jn_nullsafe_engine",
        "jn_nullsafe_full_engine", "jn_nullsafe_left_engine",
        // r16 widening rows: count(<non-null side attr>) must ride the
        // same linear band — the wider aggregate scope may not reopen
        // the quadratic bucket
        "jn_nullsafe_cnt_engine", "jn_nullsafe_left_cnt_engine",
        "jn_nullsafe_left_cnt0_engine", "jn_nullsafe_full_cnt_engine",
        // r17 widening rows: sum(<non-null integral side attr>) — same
        // contract, the sum scope may not reopen the bucket either
        "jn_nullsafe_sum_engine", "jn_nullsafe_left_sum_engine",
        "jn_nullsafe_left_sum0_engine", "jn_nullsafe_full_sum_engine",
        // r17 min/max widening rows — same contract
        "jn_nullsafe_minmax_engine", "jn_nullsafe_left_minmax0_engine",
        "jn_nullsafe_full_minmax_engine",
        // r18 count(DISTINCT) widening rows: the distinct-aggregate scope
        // may not reopen the bucket either (a verbatim regression would
        // additionally run the Expand over the quadratic pairs)
        "jn_nullsafe_cntd_engine", "jn_nullsafe_left_cntd0_engine",
        "jn_nullsafe_full_cntd_engine", "jn_nullsafe_verbatim",
        // r19 sum(DISTINCT) widening rows — same contract again
        "jn_nullsafe_sumd_engine", "jn_nullsafe_left_sumd0_engine",
        "jn_nullsafe_full_sumd_engine")) {
      val small = maxJoinRows(name, "/root/testdata/sf0.01")
      val big = maxJoinRows(name, "/root/testdata/sf0.1")
      info(s"$name max equi-join rows: sf0.01=$small sf0.1=$big")
      // r14: tightened 30× → 15× — the measured band is ~10× (exactly
      // linear in the FK) across three rounds; a quadratic NULL bucket
      // lands at ~100× over this span.
      assert(big <= 15L * math.max(small, 50L),
        s"$name join volume grew superlinearly (quadratic NULL-bucket regression): sf0.01=$small → sf0.1=$big")
    }
  }

  test("three-point growth: nullsafe join volume and containment overhead stay linear at 3× sf0.1") {
    // r13 verdict #2: two points cannot distinguish linear from n·log n
    // or small-quadratic-with-offset. The third point is a derived 3×
    // corpus (ScaleFixture: key-offset replicas, Caesar-shifted doc
    // text — same generative character, disjoint keys/grams).
    val sf1 = "/root/testdata/sf0.1"
    val sf3 = ScaleFixture.dir(spark)
    // null-safe rows: materialized join volume must grow ~3× (the FK is
    // replicated 3×), never ~9× (the NULL-stripe pair product under a
    // verbatim-join regression: 3× nulls per side ⇒ 9× bucket pairs).
    for (name <- Seq("jn_nullsafe", "jn_nullsafe_full", "jn_nullsafe_engine",
        "jn_nullsafe_full_engine", "jn_nullsafe_left_engine",
        "jn_nullsafe_cnt_engine", "jn_nullsafe_full_cnt_engine",
        "jn_nullsafe_sum_engine", "jn_nullsafe_full_sum_engine",
        "jn_nullsafe_minmax_engine", "jn_nullsafe_full_minmax_engine",
        "jn_nullsafe_cntd_engine", "jn_nullsafe_full_cntd_engine",
        "jn_nullsafe_sumd_engine", "jn_nullsafe_full_sumd_engine")) {
      val big = maxJoinRows(name, sf1)
      val big3 = maxJoinRows(name, sf3)
      info(s"$name max equi-join rows: sf0.1=$big 3×=$big3 (ratio ${big3.toDouble / math.max(big, 1)})")
      assert(big3 <= math.max((3.5 * big).toLong, 150L),
        s"$name join volume grew superlinearly over the 3× span: $big → $big3")
    }
    // containment: the candidate-tracks-answer contract must hold at
    // the third point with the same bounded overhead factor.
    val cand3 = maxJoinRows("dedup_containment", sf3)
    val ans3 = SparkEntry.queries("dedup_containment")(spark, sf3).count()
    val docs3 = spark.read.parquet(s"$sf3/documents.parquet").count()
    val cand1 = maxJoinRows("dedup_containment", sf1)
    val ans1 = SparkEntry.queries("dedup_containment")(spark, sf1).count()
    info(s"containment at 3×: candidates=$cand3 answer=$ans3 docs=$docs3 " +
      f"(overhead ${cand3.toDouble / math.max(ans3, 1)}%.1f× vs ${cand1.toDouble / math.max(ans1, 1)}%.1f× at sf0.1)")
    assert(cand3 <= 50L * math.max(ans3, docs3),
      s"3×: candidate volume $cand3 not O(answer=$ans3 + corpus=$docs3)")
    // constant-factor blocking: the overhead factor must not drift up
    // with the corpus (a superlinear blocking regression shows here
    // even while the absolute 80× bound still holds).
    //
    // CONSTANT REGENERATION PROCEDURE (r14 ADVICE #1: these drift/slack
    // constants are calibrated to the current testdata's measured band;
    // candidate counts are draw-dependent, so a testdata regeneration or
    // stableHash64 change can move them without any engine regression).
    // To re-derive: run `sbt "testOnly graft.ScaleGrowthSpec"` and read
    // the info() lines — each fence's constant is set ~15% above the
    // measured ratio (e.g. the r14 band measured overhead 21.0× (sf0.1)
    // vs 21.2× (3×) → drift factor 1.01, fenced at 1.5; family volumes
    // measured 3.00-3.09× → fenced at 3.5×). The ABSOLUTE
    // O(answer + corpus) bound (50×) is the hard scale contract and
    // should survive any regeneration; if a regenerated corpus trips
    // ONLY a ratio fence while the absolute bound holds, recalibrate
    // the ratio from the new info() band rather than loosening 50×.
    assert(cand3.toDouble / math.max(ans3, 1) <=
      1.5 * math.max(cand1.toDouble / math.max(ans1, 1), 4.0),
      s"containment blocking overhead drifted up at the third point: " +
        s"$cand3/$ans3 vs $cand1/$ans1 at sf0.1")
    // the whole documents-only dedup family rides the same third point:
    // candidate/duplicated-window volumes must grow ~3× (the Caesar
    // shift keeps replica gram/signature spaces disjoint, so blocking
    // keys keep growing with the corpus — a corpus-independent key
    // collapses buckets and lands ~9×). dedup_incremental's %3
    // batch/corpus split survives the 10^7 offset (10^7 ≡ 1 mod 3:
    // classes permute per replica, the 1/3-vs-2/3 split is preserved).
    for (name <- Seq("dedup_minhash_lsh", "dedup_edit_distance",
        "dedup_paragraph_common", "dedup_incremental")) {
      val big = maxJoinRows(name, sf1)
      val big3 = maxJoinRows(name, sf3)
      info(s"$name max equi-join rows: sf0.1=$big 3×=$big3")
      assert(big3 <= math.max((3.5 * big).toLong, 150L),
        s"$name candidate volume grew superlinearly over the 3× span: $big → $big3")
    }
    def dupWindows(sf: String): Long =
      SparkEntry.queries("dedup_exact_substr")(spark, sf)
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("n_windows"),
          org.apache.spark.sql.functions.lit(0L)))
        .collect()(0).getLong(0)
    val dw1 = dupWindows(sf1)
    val dw3 = dupWindows(sf3)
    info(s"dedup_exact_substr duplicated windows: sf0.1=$dw1 3×=$dw3")
    assert(dw3 <= math.max((3.5 * dw1).toLong, 150L),
      s"duplicated-window volume grew superlinearly over the 3× span: $dw1 → $dw3")
    // retrieval broadcasts stay QUERY-bounded at the third point —
    // corpus-independent build sides are what keeps the driver alive at
    // 100 TB (same conf guard as the two-point fence above).
    val c = spark.conf
    val savedAqe = c.get("spark.sql.adaptive.enabled")
    val savedBc = c.get("spark.sql.autoBroadcastJoinThreshold")
    c.set("spark.sql.adaptive.enabled", "false")
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bm = maxBroadcastRows("text_bm25_topk", sf3)
      val tf = maxBroadcastRows("text_tfidf", sf3)
      info(s"max broadcast build rows at 3×: bm25=$bm tfidf=$tf")
      assert(bm <= 32, s"3×: bm25 broadcast build side has $bm rows — corpus-growing")
      assert(tf <= 1, s"3×: tfidf broadcast build side has $tf rows — corpus-growing")
    } finally {
      c.set("spark.sql.adaptive.enabled", savedAqe)
      c.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("shared-vocabulary third point: containment candidates track the answer under genuine df growth") {
    // r14 verdict #3: the disjoint Caesar mode keeps replica gram
    // spaces apart, so it fences corpus-independent blocking keys
    // (~9× signature) but cannot see DF-GROWTH effects — a real 3× web
    // corpus triples shared grams' document frequencies, shifting the
    // rarity-ordered prefixes every probe is built from. The OVERLAP
    // fixture mode keeps 30% of docs unshifted across all three
    // replicas: their grams' df triples, and genuine cross-replica
    // duplicate pairs appear, so the ANSWER grows superlinearly BY
    // CONSTRUCTION (each all-unshifted qualifying pair appears ~9×,
    // plus 3 self-duplicate pairs per shared doc). The fence is
    // therefore NOT a ~3× volume ratio — it is that candidates keep
    // TRACKING the answer: the blocking overhead factor stays within
    // the same 1.5× drift bound as the disjoint mode, and the absolute
    // O(answer + corpus) contract holds. A prefix scheme whose
    // selectivity degrades under df growth (e.g. one keyed on
    // pre-growth rarity ranks) would inflate overhead here while
    // passing the disjoint-mode fence.
    //
    // Measured band (r15, v2 fixture): candidates=48,197,815
    // answer=2,270,985 (4.82× the sf0.1 answer — the cross-replica
    // duplicate regime engaged), overhead 21.2× vs 21.0× at sf0.1 and
    // 21.2× in the disjoint mode — the blocking factor is INVARIANT to
    // df growth because rarity ranks are recomputed per corpus.
    val sf1 = "/root/testdata/sf0.1"
    val sfo = ScaleFixture.dir(spark, overlap = true)
    val cand1 = maxJoinRows("dedup_containment", sf1)
    val ans1 = SparkEntry.queries("dedup_containment")(spark, sf1).count()
    val cando = maxJoinRows("dedup_containment", sfo)
    val anso = SparkEntry.queries("dedup_containment")(spark, sfo).count()
    val docso = spark.read.parquet(s"$sfo/documents.parquet").count()
    val ov1 = cand1.toDouble / math.max(ans1, 1)
    val ovo = cando.toDouble / math.max(anso, 1)
    info(f"containment under df growth: candidates=$cando answer=$anso docs=$docso " +
      f"(overhead $ovo%.1f× vs $ov1%.1f× at sf0.1; answer grew ${anso.toDouble / math.max(ans1, 1)}%.2f×)")
    assert(anso > 3L * ans1,
      s"overlap fixture did not create the df-growth regime (answer $ans1 → $anso)")
    assert(cando <= 50L * math.max(anso, docso),
      s"df-growth: candidate volume $cando not O(answer=$anso + corpus=$docso)")
    assert(ovo <= 1.5 * math.max(ov1, 4.0),
      s"containment blocking overhead degraded under df growth: " +
        s"$cando/$anso = $ovo vs $ov1 at sf0.1")
  }

  test("graph_pagerank input is CONSTANT at three scale points — its bench_3x ratio measures overhead, not scaling") {
    // r15 verdict #4: the driver's bench_3x flagged graph_pagerank at
    // 5.39× over the 3× fixture. The fence settles what that ratio can
    // and cannot mean: the star graph derives from `nation` alone —
    // fixed 25 rows at EVERY TPC-H scale factor, copied VERBATIM into
    // the 3× fixture (dims don't grow with the corpus) — so the edge
    // count is IDENTICAL at sf0.01, sf0.1 and 3×. No 9× self-join
    // blowup is possible (the r15 hypothesis to rule out), and a wall
    // ratio on this row compares two draws of fixed scheduling
    // overhead: Bench reports a >4.5× draw on it as
    // bench_3x_env_suspect (environment), not bench_3x_over (scaling).
    val e001 = queries.Graph2Queries.pagerankEdgeCount(spark, TestSpark.Sf)
    val e1 = queries.Graph2Queries.pagerankEdgeCount(spark, "/root/testdata/sf0.1")
    val e3 = queries.Graph2Queries.pagerankEdgeCount(spark, ScaleFixture.dir(spark))
    info(s"pagerank star edges: sf0.001=$e001 sf0.1=$e1 3×=$e3")
    assert(e001 > 0, "degenerate fixture: no edges at all")
    assert(e001 === e1, s"edge count varies with SF: $e001 vs $e1")
    assert(e1 === e3, s"edge count varies under the 3× fixture: $e1 vs $e3")
    // the env-suspect classification in Bench is exactly the set this
    // fence backs — adding a row there requires a fence like this one
    assert(Bench.constInput3x === Set("graph_pagerank"),
      "Bench.constInput3x changed — every member needs a constant-input fence")
  }
}
