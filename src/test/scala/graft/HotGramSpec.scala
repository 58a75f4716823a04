package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gram-dedup HOT-GRAM CONTRACT (DedupQueries.rarityRanked): grams
  * with df > spark.graft.dedup.hotDf are excluded from probe, prefix,
  * and index by one gram-level rule. The contract this spec proves on a
  * constructed hot-gram corpus:
  *
  *  1. EXACT for eligible docs — a qualifying pair whose docs each keep
  *     ⌊n/2⌋+1 non-hot grams is still found even though OTHER grams they
  *     share are globally hot (rarity ordering pushes hot grams out of
  *     the prefix, and the pigeonhole runs entirely on non-hot grams).
  *  2. DOCUMENTED EXCLUSION for residue docs — a doc made (mostly) of
  *     corpus-wide boilerplate has no full non-hot prefix; its pairs are
  *     dropped BY CONTRACT, not silently: the same corpus under the
  *     default threshold finds them, isolating the rule as the cause.
  */
class HotGramSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // fresh path per JVM: CacheOnce reuses persisted plans keyed by root
  // path, so a fixture regenerated at a reused path could be served
  // from cache (see CacheOnce contract)
  private val dir = s"/tmp/graft_hotgram_${System.nanoTime()}"

  // H = shared boilerplate (its 7 char-4-grams go hot: df = 12 docs);
  // R = rare block unique to docs 1 and 2 (df = 2, never hot).
  private val H = "qrstuvwxyz"
  private val R = "abcdefghij"

  // X = a 4-char block (one gram) shared ONLY by docs 21 and 22 —
  // df = 2, never hot. U = content unique to doc 22.
  private val X = "0123"
  private val U = "KLMNOPQRSTUVWXYZ"

  private def writeCorpus(): Unit = {
    val docs =
      Seq((1L, R + H), (2L, R + H)) ++ // dup pair: rare content + hot tail
        (3 to 10).map(i => (i.toLong, H + ("" + ('A' + i - 3).toChar) * 8)) ++
        Seq((11L, H), (12L, H)) ++ // residue dup pair: pure boilerplate
        // doc 21: RESIDUE (n = 11 grams: 7 hot H-grams + 3 df-1 crossing
        // grams + X — only 4 non-hot < bound ⌊11/2⌋+1 = 6) but sharing
        // ONE non-hot gram (X) with the larger doc 22; the pair
        // QUALIFIES through the hot overlap (ov = 7 H-grams + X = 8,
        // 2·8 ≥ 11). The r14 direction filter makes doc 21 the only
        // probing side — this pair proves a residue doc still surfaces
        // via its OWN probe whenever a common NON-HOT gram exists.
        Seq((21L, H + X), (22L, H + U + X))
    docs.map { case (id, t) => (id, "web", t) }
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("hot-gram rule is exact for eligible docs and excludes residue docs by contract") {
    writeCorpus()
    spark.conf.set("spark.graft.dedup.hotDf", "5")
    try {
      // docs 1,2 share hot grams (H) but keep a full non-hot prefix (R +
      // boundary, 10 of 17 grams) → found. Docs 11,12 are PURE hot →
      // residue, excluded. Docs 3..10 link only through hot grams →
      // their (qualifying) containment pairs are excluded too.
      //
      // (21,22) pins the SHARP gram-level contract under the r14
      // direction filter (r14 ADVICE #2): doc 21 is residue (4 non-hot
      // of 11 grams) and — as the smaller side — the ONLY probing side,
      // yet the pair is found because a qualifying pair's globally-FIRST
      // common gram is always (a) non-hot whenever any common non-hot
      // gram exists (non-hot sorts before hot in the df-asc order),
      // (b) within the smaller side's ⌊n/2⌋+1 prefix bound (at most
      // ov−1 common grams rank after it), and (c) positional-filter
      // passing (≥ ov−1 remain on both sides). Exclusion is therefore
      // exactly "all common grams hot" — residue-ness costs no recall
      // beyond that, and single-direction probing loses nothing in the
      // hot-engaged regime either.
      assert(pairs("dedup_ngram_jaccard") === Set((1L, 2L)))
      assert(pairs("dedup_containment") === Set((1L, 2L), (21L, 22L)))
    } finally spark.conf.unset("spark.graft.dedup.hotDf")

    // same corpus, default (inert) threshold: the residue pair IS found,
    // proving the exclusion above is the documented contract at work,
    // not a blocking defect
    val jac = pairs("dedup_ngram_jaccard")
    assert(jac((1L, 2L)) && jac((11L, 12L)), jac.toString)
    val con = pairs("dedup_containment")
    assert(con((1L, 2L)) && con((11L, 12L)), con.toString)
  }
}
