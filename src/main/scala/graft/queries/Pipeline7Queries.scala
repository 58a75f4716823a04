package graft.queries

import graft.Engine.table
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

  /** token → feature index, 0..63 (stableHash64 is non-negative). */
  private val idxSpark =
    "CAST(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 64 AS INT) + 1"
  private val idxDuck =
    "CAST(CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 64 AS INT) + 1"

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
                   FROM documents""")))
  )
}
