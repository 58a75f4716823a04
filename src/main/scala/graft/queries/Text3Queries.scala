package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-11 text wave 3 — Kneser-Ney smoothing, the standard n-gram LM
  * estimator (KenLM's default; Chen & Goodman 1999), completing the LM
  * family next to text_bigram_lm (MLE), text_trigram_backoff (stupid
  * backoff) and text_lm_perplexity (bits scoring).
  *
  * Interpolated bigram KN with absolute discount d = 0.75:
  *   P_kn(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
  *               + d·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|
  * where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
  * histories of w2. Every input is an exact integer count derived from
  * the ONE pair-extraction pass (c(w1·) and both N1+ tables re-aggregate
  * the c12 table, never the corpus); the discounted probability is the
  * single final IEEE projection. Output bounded by vocabulary² and the
  * count floor — independent of corpus rows.
  */
object Text3Queries {

  val all: Seq[Q] = Seq(

    Q("text_kneser_ney",
      (s, d) => {
        val pairs = table(s, d, "documents")
          .select(split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        val c12 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val left = c12.groupBy(col("w1"))
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_fwd"))
        val right = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bwd"))
        val types = c12.agg(count(lit(1)).as("n_types"))
        c12.join(left, "w1").join(right, "w2").crossJoin(broadcast(types))
          .filter(col("c12") >= 10)
          .select(col("w1"), col("w2"), col("c12"),
            col("c1").cast("long").as("c1"),
            col("n1p_fwd"), col("n1p_bwd"),
            round(greatest(col("c12") - lit(0.75), lit(0.0)) / col("c1")
              + lit(0.75) * col("n1p_fwd") / col("c1")
                * col("n1p_bwd") / col("n_types"), 6).as("p_kn"))
      },
      Some(sql("""
        WITH w AS (SELECT string_split(text, ' ') AS l FROM documents),
             pairs AS (SELECT l[i] AS w1, l[i+1] AS w2
               FROM (SELECT l, unnest(range(1, len(l))) AS i FROM w WHERE len(l) >= 2)),
             c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
             lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_fwd
                     FROM c12 GROUP BY 1),
             rgt AS (SELECT w2, count(*) AS n1p_bwd FROM c12 GROUP BY 1),
             ty AS (SELECT count(*) AS n_types FROM c12)
        SELECT w1, w2, c12, c1, n1p_fwd, n1p_bwd,
               round(greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / c1
                 + 0.75 * n1p_fwd / c1
                   * n1p_bwd / n_types, 6) AS p_kn
        FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN ty
        WHERE c12 >= 10""")))
  )
}
