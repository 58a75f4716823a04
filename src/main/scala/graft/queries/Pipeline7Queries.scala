package graft.queries

import graft.Engine.table
import graft.queries.{Pipeline4Queries => P4, TextQueries => TQ}
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-11 pipeline wave: the LEARNED quality classifier — the third
  * standard pre-training quality filter next to the rule-based Gopher
  * gate (text_gopher_gate) and the LM-perplexity filter
  * (text_perplexity_filter). CCNet/C4 run a fastText-style LINEAR model
  * over hashed bag-of-words features; inference is score = Σ_tokens
  * w[h(token) mod D] — a pure projection once the (tiny, fixed-D)
  * weight vector is in hand.
  *
  * Scale posture: the weight vector is a 64-element LITERAL baked into
  * the expression (the broadcast-model limit case — no join at all), the
  * token loop is a codegen'd HOF over the scan, so scoring is ZERO
  * exchange end-to-end (PlanSpec-fenced): the plan a 100 TB corpus
  * filter must have. Scores are exact integers — no sigmoid is needed
  * for a threshold decision because the logistic is monotone.
  */
object Pipeline7Queries {

  /** Fixed "trained" weights: 64 signed integers from a Knuth-hash ramp
    * — deterministic, zero-centred (range −1001..+1001), identical
    * literals on both engines. */
  private val W: Seq[Long] = (0 until 64).map(j => (j.toLong * 2654435761L % 2003L) - 1001L)

  private val wSpark = W.map(_.toString + "L").mkString("array(", ",", ")")
  private val wDuck = W.mkString("[", ",", "]")

  /** token → feature index, 0..63. Non-negativity holds because the
    * inline conv(md5 …, 16, 10) takes only 15 hex digits (60 bits), so
    * the BIGINT it parses to is always ≥ 0 and `% 64` never yields a
    * negative element_at subscript. A signed hash (e.g. a full-width
    * xxhash64) would NOT be safe here without an abs/pmod. */
  private val idxSpark =
    "CAST(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 64 AS INT) + 1"
  private val idxDuck =
    "CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 64 AS INT) + 1"

  /** The classifier score as reusable SQL over a `text` column — the
    * single definition the streaming curation census
    * (stream_curation_census) shares with the batch rows above, so the
    * incremental and batch quality gates can never drift. */
  private[graft] def clfSpark: String =
    s"aggregate(split(text, ' '), 0L, (acc, t) -> acc + element_at($wSpark, $idxSpark))"
  private[graft] def clfDuck: String =
    s"CAST(list_sum(list_transform(string_split(text, ' '), t -> ($wDuck)[$idxDuck])) AS BIGINT)"

  val all: Seq[Q] = Seq(

    Q("pipe_quality_classifier",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          expr(s"""aggregate(split(text, ' '), 0L,
                     (acc, t) -> acc + element_at($wSpark, $idxSpark))""")
            .as("score"))
        .withColumn("keep", col("score") >= 0L),
      Some(sql(s"""SELECT doc_id,
                     len(string_split(text, ' ')) AS n_tokens,
                     CAST(list_sum(list_transform(string_split(text, ' '),
                       t -> ($wDuck)[$idxDuck])) AS BIGINT) AS score,
                     CAST(list_sum(list_transform(string_split(text, ' '),
                       t -> ($wDuck)[$idxDuck])) AS BIGINT) >= 0 AS keep
                   FROM documents"""))),

    /** Quality-filter ENSEMBLE — the curation capstone that composes the
      * three standard filter families into one majority vote per doc:
      * rule-based (the five Gopher rules, reusing Pipeline4's single
      * definition), learned (the linear classifier above), and
      * statistical (the corpus-LM bits-per-pair score, threshold 4.6
      * spelled as the exact integer compare total_bits·10 ≤ n_pairs·46).
      * Docs too short to form a bigram fail the LM vote by definition.
      *
      * Scale posture: gopher + classifier are ONE scan-stage projection;
      * the LM model is vocabulary²-bounded and broadcasts onto the pair
      * scan; the only corpus shuffles are the per-doc bigram re-agg and
      * the doc_id equi-join of the two per-doc tables. */
    Q("pipe_quality_ensemble",
      (s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"), col("text"),
          expr(s"""aggregate(split(text, ' '), 0L,
                     (acc, t) -> acc + element_at($wSpark, $idxSpark))""").as("clf_score"))
        val g = P4.gopherSignals(docs, Seq("doc_id", "clf_score"))
        val pairs = table(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        val c12 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val lm = c12.join(c1, "w1").select(col("w1"), col("w2"),
          (length(bin(col("c1"))) - length(bin(col("c12")))).cast("long").as("bits"))
        val perdoc = pairs.join(broadcast(lm), Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("bits")).as("total_bits"))
        g.join(perdoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            P4.gopherPass.as("gopher_pass"),
            (col("clf_score") >= 0L).as("clf_pass"),
            coalesce(col("total_bits") * 10 <= col("n_pairs") * 46, lit(false))
              .as("lm_pass"))
          .withColumn("votes", (col("gopher_pass").cast("int")
            + col("clf_pass").cast("int") + col("lm_pass").cast("int")).cast("long"))
          .withColumn("keep", col("votes") >= 2)
      },
      Some(sql(s"""
        WITH ${TQ.lmDocBitsSql},
             sig AS (${P4.gopherSignalsSql("doc_id", "doc_id")}),
             clf AS (SELECT doc_id,
                       CAST(list_sum(list_transform(string_split(text, ' '),
                         t -> ($wDuck)[$idxDuck])) AS BIGINT) AS clf_score
                     FROM documents),
             flags AS (SELECT s.doc_id,
                 (${P4.gopherPassSql}) AS gopher_pass,
                 c.clf_score >= 0 AS clf_pass,
                 COALESCE(p.total_bits * 10 <= p.n_pairs * 46, false) AS lm_pass
               FROM sig s JOIN clf c USING (doc_id)
               LEFT JOIN perdoc p USING (doc_id))
        SELECT doc_id, gopher_pass, clf_pass, lm_pass,
               CAST(CAST(gopher_pass AS INT) + CAST(clf_pass AS INT)
                 + CAST(lm_pass AS INT) AS BIGINT) AS votes,
               (CAST(gopher_pass AS INT) + CAST(clf_pass AS INT)
                 + CAST(lm_pass AS INT)) >= 2 AS keep
        FROM flags"""))),

    /** Quality-drift monitor — Population Stability Index between a
      * reference corpus half and an incoming half (doc_id parity) over
      * the classifier-score distribution:
      *   PSI = Σ_buckets (p_new − p_ref) · ln(p_new / p_ref)
      * The industry alarm thresholds are 0.1 (investigate) / 0.25
      * (retrain the filter); iid halves read ≈0. Buckets are
      * DOMAIN-BOUNDED by construction (score div 50 clamped to ±4 → ≤9
      * buckets regardless of corpus size) and Laplace-smoothed (+1)
      * so empty cells never produce ln(0). Scale posture: one scan +
      * one ≤9-group aggregate — the canonical streaming-ingest drift
      * check, zero driver state. */
    Q("pipe_quality_psi",
      (s, d) => {
        graft.Engine.table(s, d, "documents")
          .createOrReplaceTempView("graft_psi_docs")
        s.sql(sql(s"""
          WITH scored AS (SELECT doc_id % 2 AS half, $clfSpark AS score
                          FROM graft_psi_docs),
               b AS (SELECT least(greatest(CAST(floor(score / 50.0) AS INT), -4), 4)
                              AS bkt,
                            count(*) FILTER (WHERE half = 0) AS nr,
                            count(*) FILTER (WHERE half = 1) AS nn
                     FROM scored GROUP BY 1),
               t AS (SELECT CAST(sum(nr) AS DOUBLE) AS tr,
                            CAST(sum(nn) AS DOUBLE) AS tn FROM b)
          SELECT count(*) AS n_buckets,
                 round(sum( ((nn + 1.0) / (tn + 9.0) - (nr + 1.0) / (tr + 9.0))
                      * ln(((nn + 1.0) / (tn + 9.0))
                           / ((nr + 1.0) / (tr + 9.0))) ), 6) AS psi
          FROM b CROSS JOIN t"""))
      },
      Some(sql(s"""
        WITH scored AS (SELECT doc_id % 2 AS half, $clfDuck AS score
                        FROM documents),
             b AS (SELECT least(greatest(CAST(floor(score / 50.0) AS INT), -4), 4)
                            AS bkt,
                          count(*) FILTER (WHERE half = 0) AS nr,
                          count(*) FILTER (WHERE half = 1) AS nn
                   FROM scored GROUP BY 1),
             t AS (SELECT CAST(sum(nr) AS DOUBLE) AS tr,
                          CAST(sum(nn) AS DOUBLE) AS tn FROM b)
        SELECT count(*) AS n_buckets,
               round(sum( ((nn + 1.0) / (tn + 9.0) - (nr + 1.0) / (tr + 9.0))
                    * ln(((nn + 1.0) / (tn + 9.0))
                         / ((nr + 1.0) / (tr + 9.0))) ), 6) AS psi
        FROM b CROSS JOIN t""")))
  )
}
