package graft.queries

import graft.Engine.table
import graft.functions.{Portable, TextFunctions => T}
import org.apache.spark.sql.functions._
import Registry.sql

/** Training-data pipeline operators, wave 4 (beyond-reference):
  * the Gopher rule census, DSIR-shape importance weighting, and the
  * combined IVF+PQ search — the three pieces that finish the curation
  * and retrieval stories started in Pipeline/Pipeline2/Pipeline3.
  *
  * Scale posture, per operator:
  *  - gopher_rules: pure per-row expression chain inside the scan (HOF
  *    filter/transform + a constant stopword array) — no shuffle, no
  *    UDF, safe inside a 100 TB scan stage.
  *  - dsir_weights: the bucket model is bounded by B=256 rows per side,
  *    BROADCAST onto the one tokenize pass; corpus rows shuffle only
  *    64-bit (doc_id, bucket) pairs for the per-doc aggregation.
  *  - topk_ivfpq: the coarse cell prunes candidates BEFORE the ADC
  *    lookup (the IVF nprobe=1 shape), and scoring touches only 8
  *    broadcast integer lookups per candidate (the PQ shape) — the
  *    production ANN layout where neither the full vectors nor the
  *    distance table ever shuffle.
  */
object Pipeline4Queries {

  /** Gopher stopword list restricted to words the synthetic corpus can
    * contain (rule semantics are unchanged; the list is a parameter). */
  private val Stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Training-token budget for pipe_token_budget — one constant
    * interpolated into BOTH the plan and the oracle SQL (the
    * conf-desync rule: a spark.graft.* conf would silently diverge). */
  private val TrainBudget = 1000000L

  /** Stage the five Gopher rule signals in ONE tokenize pass, carrying
    * `keep` columns (already projected on `df`, which must also carry
    * `text`) through. Shared by text_gopher_rules and pipe_dataset_card
    * so the signal definitions can never drift between the census and
    * the card. */
  private[queries] def gopherSignals(df: org.apache.spark.sql.DataFrame,
                            keep: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(keep.map(col) :+ col("text") :+ T.tokens(col("text")).as("toks"): _*)
      .select(keep.map(col) ++ Seq(
        size(col("toks")).cast("long").as("n_tok"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("sum_len"),
        size(filter(col("toks"), t => t.rlike("[a-zA-Z]")))
          .cast("long").as("n_alpha"),
        size(array_intersect(array_distinct(col("toks")),
          array(Stopwords.map(lit): _*))).cast("long").as("n_stop"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[#…]", "")))
          .cast("long").as("n_sym")): _*)

  /** The five Gopher rules over the staged signals — ONE definition for
    * both queries; thresholds live only here. */
  private[queries] val gopherRules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "r_wordcount" -> (col("n_tok") >= 50 && col("n_tok") <= 100000),
    "r_meanlen" -> (col("sum_len") >= col("n_tok") * 3 && col("sum_len") <= col("n_tok") * 10),
    "r_symbol" -> (col("n_sym") * 10 <= col("n_tok")),
    "r_alpha" -> (col("n_alpha") * 5 >= col("n_tok") * 4),
    "r_stopwords" -> (col("n_stop") >= 2))

  private[queries] def gopherPass: org.apache.spark.sql.Column =
    gopherRules.map(_._2).reduce(_ && _)

  /** DuckDB twin of gopherSignals: `inner` projects the carry-through
    * expressions (text stays available), `outer` re-selects their
    * aliases next to the five signals, `from` names the corpus table. */
  private[queries] def gopherSignalsSql(inner: String, outer: String,
                                        from: String = "documents"): String =
    s"""SELECT $outer,
        CAST(len(toks) AS BIGINT) AS n_tok,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
        CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
        CAST(len(list_intersect(list_distinct(toks),
          [${Stopwords.map(w => s"'$w'").mkString(", ")}])) AS BIGINT) AS n_stop,
        CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS BIGINT) AS n_sym
      FROM (SELECT $inner, text, ${T.tokensSql("text")} AS toks FROM $from)"""

  /** DuckDB twins of gopherRules / gopherPass. */
  private[queries] val gopherRulesSql: Seq[(String, String)] = Seq(
    "r_wordcount" -> "n_tok >= 50 AND n_tok <= 100000",
    "r_meanlen" -> "sum_len >= n_tok * 3 AND sum_len <= n_tok * 10",
    "r_symbol" -> "n_sym * 10 <= n_tok",
    "r_alpha" -> "n_alpha * 5 >= n_tok * 4",
    "r_stopwords" -> "n_stop >= 2")

  private[queries] val gopherPassSql: String =
    gopherRulesSql.map { case (_, p) => s"($p)" }.mkString(" AND ")

  val all: Seq[Q] = Seq(

    // GOPHER RULE CENSUS (Rae et al. 2021, Table A1 — public): the five
    // document-quality rules as independent booleans plus the composite
    // gate, in EXACT integer arithmetic (ratio thresholds become
    // cross-multiplied integer comparisons — no float rounding at the
    // decision boundary):
    //   r_wordcount: 50 ≤ n_tok ≤ 100000
    //   r_meanlen:   3 ≤ mean word length ≤ 10   (3n ≤ Σlen ≤ 10n)
    //   r_symbol:    symbol-to-word ratio ≤ 0.1  (10·n_sym ≤ n_tok)
    //   r_alpha:     ≥80% of words contain a letter (5·n_alpha ≥ 4·n_tok)
    //   r_stopwords: ≥2 distinct stopwords present
    // Unlike pipe_quality_gate (first-failing-rule funnel), this emits
    // the full rule bitmap — the per-rule ablation report a curation
    // team reads before picking thresholds.
    Q("text_gopher_rules",
      (s, d) => {
        val staged = gopherSignals(
          table(s, d, "documents").select(col("doc_id"), col("text")), Seq("doc_id"))
        val rules = gopherRules.foldLeft(staged) {
          case (df, (name, pred)) => df.withColumn(name, pred)
        }
        rules.select(col("doc_id") +: col("n_tok") +:
          gopherRules.map { case (name, _) => col(name) } :+
          gopherPass.as("gopher_pass"): _*)
      },
      Some(sql(s"""SELECT doc_id, n_tok,
                    ${gopherRulesSql.map(_._1).mkString(", ")},
                    $gopherPassSql AS gopher_pass
                  FROM (SELECT *,
                      ${gopherRulesSql.map { case (n, p) => s"$p AS $n" }.mkString(",\n                      ")}
                    FROM (${gopherSignalsSql("doc_id", "doc_id")}))"""))),

    // DSIR-SHAPE IMPORTANCE WEIGHTS (Xie et al. 2023 — public): score
    // every document by how target-like its hashed-unigram distribution
    // is. Features are 256 hash buckets; the per-bucket weight is the
    // integer-log2 likelihood ratio bits(b) = ⌊log2(c_tgt+1)⌋ −
    // ⌊log2(c_raw+1)⌋ (the bin()-length trick from text_lm_perplexity —
    // exact in both engines, add-one smoothed so empty target buckets
    // are defined). A document's weight is the sum of its tokens'
    // bucket bits — high = target-like, the resampling key DSIR ranks
    // by. Target domain here: sources src0-src2.
    Q("pipe_dsir_weights",
      (s, d) => {
        val toks = table(s, d, "documents")
          .select(col("doc_id"), col("source"),
            explode(T.tokens(col("text"))).as("tok"))
          .withColumn("b", pmod(Portable.stableHash64(col("tok")), lit(256L)))
        val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("c_raw"))
        val tgt = toks.filter(col("source").isin("src0", "src1", "src2"))
          .groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
        val model = raw.join(tgt, Seq("b"), "left")
          .select(col("b"),
            (length(bin(coalesce(col("c_tgt"), lit(0L)) + 1)) -
              length(bin(col("c_raw") + 1))).cast("long").as("bits_b"))
        toks.join(broadcast(model), "b")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"), sum(col("bits_b")).as("w_bits"),
            round(sum(col("bits_b")).cast("double") / count(lit(1)), 6)
              .as("bits_per_tok"))
      },
      Some(sql(s"""WITH toks AS (SELECT doc_id, source,
                      ${Portable.stableHash64Sql("tok")} % 256 AS b
                    FROM (SELECT doc_id, source,
                            unnest(${T.tokensSql("text")}) AS tok
                          FROM documents)),
                  raw AS (SELECT b, count(*) AS c_raw FROM toks GROUP BY b),
                  tgt AS (SELECT b, count(*) AS c_tgt FROM toks
                          WHERE source IN ('src0', 'src1', 'src2') GROUP BY b),
                  model AS (SELECT b,
                      CAST(length(printf('%b', coalesce(c_tgt, 0) + 1)) -
                           length(printf('%b', c_raw + 1)) AS BIGINT) AS bits_b
                    FROM raw LEFT JOIN tgt USING (b))
                  SELECT doc_id, count(*) AS n_tok,
                    CAST(sum(bits_b) AS BIGINT) AS w_bits,
                    round(CAST(sum(bits_b) AS DOUBLE) / count(*), 6) AS bits_per_tok
                  FROM toks JOIN model USING (b) GROUP BY doc_id"""))),

    // DATASET CARD — the per-source census a corpus release ships with,
    // computed in ONE scan + one small per-source aggregation: volume
    // (docs, tokens, chars), language mix, exact-duplicate mass inside
    // the source (docs minus distinct content hashes), and the Gopher
    // gate pass count — the FULL five-rule gate, shared with
    // text_gopher_rules via gopherSignals/gopherPass so census and card
    // can never disagree. Every output is exact integer arithmetic or
    // an exact-ratio round.
    Q("pipe_dataset_card",
      (s, d) => {
        val staged = gopherSignals(
          table(s, d, "documents")
            .select(col("source"), col("lang"),
              length(col("text")).cast("long").as("n_chars"),
              Portable.stableHash64(lower(trim(col("text")))).as("ch"),
              col("text")),
          Seq("source", "lang", "n_chars", "ch"))
          .withColumn("gpass", gopherPass.cast("long"))
        staged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
            countDistinct(col("lang")).as("n_langs"),
            (count(lit(1)) - countDistinct(col("ch"))).as("n_exact_dups"),
            sum(col("gpass")).as("n_gopher_pass"),
            round(sum(col("n_chars")).cast("double") / sum(col("n_tok")), 6)
              .as("chars_per_tok"))
      },
      Some(sql(s"""SELECT source, count(*) AS n_docs,
                    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                    CAST(sum(n_chars) AS BIGINT) AS n_chars,
                    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                    CAST(count(*) - count(DISTINCT ch) AS BIGINT) AS n_exact_dups,
                    CAST(sum(gpass) AS BIGINT) AS n_gopher_pass,
                    round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tok), 6) AS chars_per_tok
                  FROM (SELECT *,
                      CASE WHEN $gopherPassSql THEN 1 ELSE 0 END AS gpass
                    FROM (${gopherSignalsSql(
                      s"""source, lang, CAST(length(text) AS BIGINT) AS n_chars,
                          ${Portable.stableHash64Sql("lower(trim(text))")} AS ch""",
                      "source, lang, n_chars, ch")}))
                  GROUP BY source"""))),

    // TOKEN-BUDGET EPOCH PLAN — the step after mixture weighting: given
    // a total training budget, allocate tokens per source by the
    // temperature weights (the same milli-sqrt integer grid as
    // pipe_mixture_weights) and report the implied epochs over each
    // source's available tokens, in milli-epochs. EVERY value is BIGINT
    // integer arithmetic (div truncation identical in both engines) —
    // the "3 epochs of Wikipedia, 0.4 of web" table a training run is
    // configured from.
    Q("pipe_token_budget",
      (s, d) => {
        val bySrc = table(s, d, "documents")
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy(col("source"))
          .agg(sum(col("n_tok")).as("n_tokens"))
          .withColumn("w_raw",
            floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
        val total = bySrc.agg(sum(col("w_raw")).as("w_sum"))
        bySrc.crossJoin(broadcast(total))
          .select(col("source"), col("n_tokens"),
            expr(s"($TrainBudget * w_raw) div w_sum").as("alloc_tokens"),
            expr(s"(($TrainBudget * w_raw) div w_sum) * 1000 div n_tokens")
              .as("epochs_milli"))
      },
      Some(sql(s"""WITH t AS (SELECT source,
                      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                    FROM documents GROUP BY source),
                   w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w_raw FROM t),
                   tot AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_sum FROM w)
                   SELECT source, n_tokens,
                     ($TrainBudget * w_raw) // w_sum AS alloc_tokens,
                     (($TrainBudget * w_raw) // w_sum) * 1000 // n_tokens AS epochs_milli
                   FROM w, tot"""))),

    // CURRICULUM PHASES by LM difficulty — bucket documents into
    // easy/medium/hard training phases by their corpus-LM bits-per-pair
    // score (the text_lm_perplexity model, shared via one CTE chain so
    // filter and curriculum can never disagree). Thresholds 4.5/4.7
    // bits are applied as EXACT cross-multiplied integer comparisons
    // (total_bits·10 vs n_pairs·45/47) — no float boundary. Output is
    // the per-phase census a curriculum schedule is built from.
    Q("pipe_curriculum",
      (s, d) => {
        val perdoc = TextQueries.all.find(_.name == "text_lm_perplexity").get.fn(s, d)
        perdoc
          .withColumn("phase",
            when(col("total_bits") * 10 <= col("n_pairs") * 45, "easy")
              .when(col("total_bits") * 10 > col("n_pairs") * 47, "hard")
              .otherwise("medium"))
          .groupBy(col("phase"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_pairs")).as("sum_pairs"),
            sum(col("total_bits")).as("sum_bits"))
      },
      Some(sql(s"""WITH ${TextQueries.lmDocBitsSql}
                   SELECT phase, count(*) AS n_docs,
                     CAST(sum(n_pairs) AS BIGINT) AS sum_pairs,
                     CAST(sum(total_bits) AS BIGINT) AS sum_bits
                   FROM (SELECT n_pairs, total_bits,
                       CASE WHEN total_bits * 10 <= n_pairs * 45 THEN 'easy'
                            WHEN total_bits * 10 > n_pairs * 47 THEN 'hard'
                            ELSE 'medium' END AS phase FROM perdoc)
                   GROUP BY phase"""))),

    // IVF + PQ COMBINED SEARCH — the production ANN layout (an IVF
    // index whose cells store PQ codes, searched with ADC): the coarse
    // cell (label, nprobe=1 — the sim_topk_ivf shape) prunes candidates
    // FIRST, then each survivor is scored by 8 integer lookups in the
    // query's broadcast distance table (the sim_topk_pq shape). Top-k
    // via the graft_topk bounded heap. Neither full vectors nor the
    // distance table ever shuffle; the candidate set is |cell|, not N.
    Q("sim_topk_ivfpq",
      (s, d) => {
        // r21 (same rewrite as sim_topk_pq — r20 verdict #4): the ADC
        // sum no longer rides a (q_id, vec_id) exchange. The per-query
        // distance table is ONE 32-slot lookup array per query carrying
        // the query's coarse cell (pqQueryLut — a flat projection, zero
        // exchanges in the broadcast subtree), the candidate side is
        // ONE row per vector with its cell riding along (pqCodes), the
        // cell prune is the BHJ key of the lut join, and survivors are
        // scored by 8 codegen'd element_at lookups in the projection.
        // The only exchange left carries the bounded-heap topk partials.
        val qlut = Pipeline3Queries.pqQueryLut(s, d, Seq("label" -> "q_cell"))
        val dist = (0 to 7).map(j =>
          element_at(col("lut"),
            (lit(j * 4 + 1) + col(s"m_$j") % 4).cast("int"))).reduce(_ + _)
        Pipeline3Queries.pqCodes(s, d)
          .join(broadcast(qlut),
            col("label") === col("q_cell") && col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("c_id"),
            (-dist).cast("double").as("score"))
          .groupBy(col("q_id"))
          .agg(expr("graft_topk(score, c_id, 5)").as("top"))
          .select(col("q_id"), posexplode(col("top")))
          .select(col("q_id"), col("col.id").as("c_id"),
            (-col("col.score")).cast("long").as("dist"),
            (col("pos") + 1).cast("long").as("rk"))
      },
      Some(sql(s"""WITH ${Pipeline3Queries.pqCtesSql},
                  cells AS (SELECT vec_id, label FROM embeddings),
                  qsubs AS (SELECT vec_id AS q_id, j AS qj, sub AS qsub
                            FROM subs WHERE vec_id < 10),
                  dt AS (SELECT q.q_id, cb.cj, cb.code,
                      list_sum(list_transform(range(1, 9),
                        i -> (q.qsub[i] - cb.csub[i]) * (q.qsub[i] - cb.csub[i]))) AS dj
                    FROM cb JOIN qsubs q ON cb.cj = q.qj),
                  tot AS (SELECT dt.q_id, ch.vec_id AS c_id,
                      CAST(sum(dt.dj) AS BIGINT) AS dist
                    FROM chosen ch JOIN dt ON ch.j = dt.cj AND ch.code = dt.code
                      AND ch.vec_id <> dt.q_id
                    JOIN cells cc ON cc.vec_id = ch.vec_id
                    JOIN cells qc ON qc.vec_id = dt.q_id AND cc.label = qc.label
                    GROUP BY 1, 2)
                  SELECT q_id, c_id, dist, rk FROM (
                    SELECT q_id, c_id, dist,
                      CAST(row_number() OVER (PARTITION BY q_id
                        ORDER BY dist, c_id) AS BIGINT) AS rk
                    FROM tot)
                  WHERE rk <= 5""")))
  )
}
