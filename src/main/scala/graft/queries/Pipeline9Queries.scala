package graft.queries

import graft.Engine.table
import graft.queries.{Pipeline4Queries => P4}
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-11 pipeline wave 3 — two seq2seq/SFT data-preparation
  * operators, both pure scan-stage string/array algebra (zero exchange,
  * zero UDF — the plan a 100 TB formatting pass must have):
  *
  * - chat-template rendering with LOSS-MASK offsets: every document is
  *   rendered into a fixed chat template and the exact character span of
  *   the assistant turn (the only tokens that take loss in SFT) is
  *   emitted alongside — downstream tokenizers mask [1, assistant_start)
  *   and train on the assistant span. Offsets are exact integer
  *   arithmetic over component lengths (the stand-in assistant response
  *   upper(substr(text,1,50)) is length-preserving, so
  *   rendered_len = assistant_start − 1 + assistant_len is an invariant
  *   both engines must agree on). Template literals are single-spaced —
  *   the registry's whitespace-normalizing sql() helper must never touch
  *   literal content.
  *
  * - T5-style span corruption (Raffel et al. 2020, §3.1.4): the first 3
  *   tokens of every 15 are replaced by one ordinal sentinel in the
  *   INPUT and emitted after their sentinel in the TARGET — the
  *   denoising objective's data layout, deterministic by token index so
  *   both engines produce byte-identical strings.
  */
object Pipeline9Queries {

  private val SysP = "<|system|> You are a helpful assistant. <|user|> "
  private val MidP = " <|assistant|> "

  val all: Seq[Q] = Seq(

    Q("pipe_chat_template",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), col("text"),
          concat(lit(SysP), col("text"), lit(MidP),
            upper(substring(col("text"), 1, 50))).as("rendered"))
        .select(col("doc_id"),
          length(col("rendered")).cast("long").as("rendered_len"),
          (lit(SysP.length) + length(col("text")) + lit(MidP.length) + 1)
            .cast("long").as("assistant_start"),
          least(length(col("text")), lit(50)).cast("long").as("assistant_len"),
          col("rendered")),
      Some(sql(s"""SELECT doc_id,
                     CAST(length(rendered) AS BIGINT) AS rendered_len,
                     CAST(${SysP.length} + length(text) + ${MidP.length} + 1 AS BIGINT)
                       AS assistant_start,
                     CAST(least(length(text), 50) AS BIGINT) AS assistant_len,
                     rendered
                   FROM (SELECT doc_id, text,
                           '$SysP' || text || '$MidP' || upper(substr(text, 1, 50))
                             AS rendered
                         FROM documents)"""))),

    Q("pipe_span_corruption",
      (s, d) => table(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          expr("""array_join(filter(transform(sequence(1, size(w)),
              i -> CASE WHEN (i-1) % 15 = 0
                          THEN concat('<extra_id_', CAST((i-1) DIV 15 AS STRING), '>')
                        WHEN (i-1) % 15 < 3 THEN NULL
                        ELSE element_at(w, i) END),
            x -> x IS NOT NULL), ' ')""").as("corrupted"),
          expr("""array_join(filter(transform(sequence(1, size(w)),
              i -> CASE WHEN (i-1) % 15 = 0
                          THEN concat('<extra_id_', CAST((i-1) DIV 15 AS STRING), '> ',
                                      element_at(w, i))
                        WHEN (i-1) % 15 < 3 THEN element_at(w, i)
                        ELSE NULL END),
            x -> x IS NOT NULL), ' ')""").as("target"),
          expr("CAST(size(w) AS BIGINT)").as("n_tok"),
          expr("CAST((size(w) + 14) DIV 15 AS BIGINT)").as("n_spans")),
      Some(sql("""SELECT doc_id,
                    array_to_string(list_filter(list_transform(range(1, len(w) + 1),
                        i -> CASE WHEN (i-1) % 15 = 0
                                    THEN '<extra_id_' || CAST((i-1) // 15 AS VARCHAR) || '>'
                                  WHEN (i-1) % 15 < 3 THEN NULL
                                  ELSE w[i] END),
                      x -> x IS NOT NULL), ' ') AS corrupted,
                    array_to_string(list_filter(list_transform(range(1, len(w) + 1),
                        i -> CASE WHEN (i-1) % 15 = 0
                                    THEN '<extra_id_' || CAST((i-1) // 15 AS VARCHAR) || '> '
                                         || w[i]
                                  WHEN (i-1) % 15 < 3 THEN w[i]
                                  ELSE NULL END),
                      x -> x IS NOT NULL), ' ') AS target,
                    CAST(len(w) AS BIGINT) AS n_tok,
                    CAST((len(w) + 14) // 15 AS BIGINT) AS n_spans
                  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)"""))),

    /** The CURATION FUNNEL — the end-to-end survival census every
      * pre-training data report leads with: how many documents (and
      * whitespace tokens) survive each stage of
      *   raw → exact dedup (md5 keep-min) → Gopher quality gate →
      *   8-gram decontamination vs the held-out split → packed 512-token
      *   sequences.
      * Each stage reuses the registry's canonical rule (the Gopher gate
      * is Pipeline4's single shared definition; dedup/decontamination
      * mirror dedup_exact / pipe_decontaminate's shapes) so the funnel
      * can never drift from the per-stage rows. One row per stage, all
      * counts exact integers — the oracle recomputes the same funnel.
      */
    Q("pipe_curation_funnel",
      (s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val dedup = docs
          .withColumn("h", md5(col("text")))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("h")).orderBy(col("doc_id"))))
          .filter(col("rk") === 1).drop("h", "rk")
        // carry the split-tokenizer count under a distinct name — the
        // staged signals add their OWN n_tok (T.tokens) next to it
        val quality = P4.gopherSignals(
          dedup.withColumnRenamed("n_tok", "ntok_carry"),
          Seq("doc_id", "text", "ntok_carry"))
          .filter(P4.gopherPass)
          .select(col("doc_id"), col("text"), col("ntok_carry").as("n_tok"))
        // <8-token guard: sequence(1, 0) descends and slice(w, 0, 8)
        // throws; such docs produce no grams on either engine
        val testGrams = docs.filter(col("doc_id") % 10 === 0)
          .filter(size(split(col("text"), " ")) >= 8)
          .select(explode(expr(
            """transform(sequence(1, greatest(size(split(text, ' ')) - 7, 0)),
                 i -> md5(concat_ws(' ', slice(split(text, ' '), i, 8))))"""))
            .as("g")).distinct()
        val trainGrams = quality.filter(col("doc_id") % 10 =!= 0)
          .filter(size(split(col("text"), " ")) >= 8)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, greatest(size(split(text, ' ')) - 7, 0)),
                 i -> md5(concat_ws(' ', slice(split(text, ' '), i, 8))))"""))
            .as("g"))
        val contaminated = trainGrams.join(broadcast(testGrams), "g")
          .select(col("doc_id")).distinct()
        val clean = quality.filter(col("doc_id") % 10 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
        def stage(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(lit(name).as("stage"), count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"))
        stage("1_raw", docs)
          .unionAll(stage("2_dedup", dedup))
          .unionAll(stage("3_quality", quality))
          .unionAll(stage("4_decontaminated", clean))
          .unionAll(clean.agg(lit("5_packed").as("stage"),
            expr("CAST(sum(n_tok) DIV 512 AS BIGINT)").as("n_docs"),
            expr("CAST(sum(n_tok) DIV 512 * 512 AS BIGINT)").as("n_tokens")))
      },
      Some(sql(s"""
        WITH docs AS (SELECT doc_id, text,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                      FROM documents),
             dedup AS (SELECT doc_id, text, n_tok FROM (
                         SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rk
                         FROM docs) WHERE rk = 1),
             sig AS (${P4.gopherSignalsSql("doc_id, n_tok AS ntok_carry",
                        "doc_id, ntok_carry", "dedup")}),
             quality AS (SELECT s2.doc_id, d.text, s2.ntok_carry AS n_tok
                         FROM (SELECT doc_id, text FROM dedup) d
                         JOIN sig s2 ON d.doc_id = s2.doc_id
                         WHERE ${P4.gopherPassSql}),
             tg AS (SELECT DISTINCT md5(g) AS g FROM (
                      SELECT unnest(list_transform(
                        range(1, greatest(len(string_split(text, ' ')) - 7, 0) + 1),
                        i -> array_to_string(string_split(text, ' ')[i : i + 7], ' '))) AS g
                      FROM docs WHERE doc_id % 10 = 0)),
             contaminated AS (SELECT DISTINCT doc_id FROM (
                      SELECT doc_id, md5(g) AS g FROM (
                        SELECT doc_id, unnest(list_transform(
                          range(1, greatest(len(string_split(text, ' ')) - 7, 0) + 1),
                          i -> array_to_string(string_split(text, ' ')[i : i + 7], ' '))) AS g
                        FROM quality WHERE doc_id % 10 <> 0)) q
                      WHERE EXISTS (SELECT 1 FROM tg WHERE tg.g = q.g)),
             clean AS (SELECT * FROM quality
                       WHERE doc_id % 10 <> 0
                         AND doc_id NOT IN (SELECT doc_id FROM contaminated))
        SELECT '1_raw' AS stage, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM docs
        UNION ALL SELECT '2_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM dedup
        UNION ALL SELECT '3_quality', count(*), CAST(sum(n_tok) AS BIGINT) FROM quality
        UNION ALL SELECT '4_decontaminated', count(*), CAST(sum(n_tok) AS BIGINT) FROM clean
        UNION ALL SELECT '5_packed', CAST(sum(n_tok) // 512 AS BIGINT),
               CAST(sum(n_tok) // 512 * 512 AS BIGINT) FROM clean"""))),

    /** SKYLINE (Pareto front) over customers on (frequency ↑, monetary ↑)
      * — the classic Börzsönyi 2001 operator the registry lacked. The 2-D
      * skyline has a sort-free distributed spelling: a point survives iff
      * its monetary beats the best monetary among ALL strictly-higher
      * frequencies AND ties the best within its own frequency. Both
      * "bests" come from a frequency-DOMAIN-bounded aggregate (order
      * counts, not customers), whose cumulative runs over that bounded
      * table and BROADCASTS back — never an all-pairs dominance join and
      * never a corpus-wide window. Strict-dominance ties (equal freq AND
      * equal monetary) both survive, per the standard definition.
      */
    Q("pipe_skyline",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_sky")
        s.sql(sql("""
          WITH per_cust AS (SELECT o_custkey, count(*) AS freq,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
                 FROM graft_o_sky GROUP BY o_custkey),
               fmax AS (SELECT freq, max(mon) AS mx FROM per_cust GROUP BY freq),
               cum AS (SELECT freq, mx,
                   max(mx) OVER (ORDER BY freq DESC
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
                 FROM fmax)
          SELECT /*+ BROADCAST(c) */ p.o_custkey,
                 CAST(p.freq AS BIGINT) AS freq, CAST(p.mon AS BIGINT) AS mon
          FROM per_cust p JOIN cum c ON p.freq = c.freq
          WHERE (c.hi IS NULL OR p.mon > c.hi) AND p.mon = c.mx"""))
      },
      Some(sql("""
        WITH per_cust AS (SELECT o_custkey, count(*) AS freq,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
               FROM orders GROUP BY o_custkey),
             fmax AS (SELECT freq, max(mon) AS mx FROM per_cust GROUP BY freq),
             cum AS (SELECT freq, mx,
                 max(mx) OVER (ORDER BY freq DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
               FROM fmax)
        SELECT p.o_custkey, CAST(p.freq AS BIGINT) AS freq,
               CAST(p.mon AS BIGINT) AS mon
        FROM per_cust p JOIN cum c ON p.freq = c.freq
        WHERE (c.hi IS NULL OR p.mon > c.hi) AND p.mon = c.mx"""))),

    /** KEY-SKEW REPORT — the diagnostic every shuffle-tuning session
      * starts with: per-key row counts summarized as max / p50 / p99 /
      * top-10-key share. Everything derives from the COUNT-OF-COUNTS
      * table (how many keys have each count) — bounded by the count
      * DOMAIN, so the only windows run over that bounded table and the
      * quantiles are exact integer formulas (smallest count whose
      * cumulative key total reaches ⌈q·n_keys⌉), not engine percentile
      * functions — both engines evaluate the identical arithmetic. The
      * top-10 share handles count ties exactly: a tied group contributes
      * min(its keys, remaining slots) keys at its count.
      */
    Q("pipe_skew_report",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_skw")
        s.sql(sql("""
          WITH per_key AS (SELECT o_custkey, count(*) AS c
                 FROM graft_o_skw GROUP BY o_custkey),
               dist AS (SELECT c, count(*) AS k FROM per_key GROUP BY c),
               tot AS (SELECT sum(k) AS n_keys, sum(c * k) AS n_rows, max(c) AS max_c
                       FROM dist),
               asc_ AS (SELECT c, k,
                   SUM(k) OVER (ORDER BY c
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumk
                 FROM dist),
               p50 AS (SELECT min(c) AS v FROM asc_ CROSS JOIN tot
                       WHERE cumk >= (n_keys + 1) DIV 2),
               p99 AS (SELECT min(c) AS v FROM asc_ CROSS JOIN tot
                       WHERE cumk >= (99 * n_keys + 99) DIV 100),
               des AS (SELECT c, k,
                   COALESCE(SUM(k) OVER (ORDER BY c DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
                 FROM dist),
               top10 AS (SELECT sum(c * least(k, 10 - above)) AS rows10
                         FROM des WHERE above < 10)
          SELECT CAST(tot.n_keys AS BIGINT) AS n_keys,
                 CAST(tot.n_rows AS BIGINT) AS n_rows,
                 CAST(tot.max_c AS BIGINT) AS max_count,
                 CAST(p50.v AS BIGINT) AS p50_count,
                 CAST(p99.v AS BIGINT) AS p99_count,
                 round(CAST(top10.rows10 AS DOUBLE) / tot.n_rows, 6) AS top10_share
          FROM tot CROSS JOIN p50 CROSS JOIN p99 CROSS JOIN top10"""))
      },
      Some(sql("""
        WITH per_key AS (SELECT o_custkey, count(*) AS c
               FROM orders GROUP BY o_custkey),
             dist AS (SELECT c, count(*) AS k FROM per_key GROUP BY c),
             tot AS (SELECT sum(k) AS n_keys, sum(c * k) AS n_rows, max(c) AS max_c
                     FROM dist),
             asc_ AS (SELECT c, k,
                 SUM(k) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumk
               FROM dist),
             p50 AS (SELECT min(c) AS v FROM asc_ CROSS JOIN tot
                     WHERE cumk >= (n_keys + 1) // 2),
             p99 AS (SELECT min(c) AS v FROM asc_ CROSS JOIN tot
                     WHERE cumk >= (99 * n_keys + 99) // 100),
             des AS (SELECT c, k,
                 COALESCE(SUM(k) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
               FROM dist),
             top10 AS (SELECT sum(c * least(k, 10 - above)) AS rows10
                       FROM des WHERE above < 10)
        SELECT CAST(tot.n_keys AS BIGINT) AS n_keys,
               CAST(tot.n_rows AS BIGINT) AS n_rows,
               CAST(tot.max_c AS BIGINT) AS max_count,
               CAST(p50.v AS BIGINT) AS p50_count,
               CAST(p99.v AS BIGINT) AS p99_count,
               round(CAST(top10.rows10 AS DOUBLE) / tot.n_rows, 6) AS top10_share
        FROM tot CROSS JOIN p50 CROSS JOIN p99 CROSS JOIN top10"""))),

    /** Corpus snapshot diff — dataset versioning's core census: two
      * snapshot views of the corpus (doc_id mod-3 slices with an
      * overlap; the overlap's odd half carries a simulated edit) are
      * FULL-OUTER joined on doc_id and classified added / removed /
      * changed / unchanged by content hash. This is the audit a managed
      * training-data pipeline runs between every two corpus releases.
      * Scale posture: content hashes are computed scan-side, the diff
      * is one key-equi full join on doc_id (linear, shuffle-partitioned
      * by id), and the verified output is the 4-row census. */
    Q("pipeline_snapshot_diff",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_snap_docs")
        s.sql(sql(snapDiffBody("graft_snap_docs")))
      },
      Some(sql(snapDiffBody("documents"))))
  )

  /** Shared snapshot-diff body — identical text on both engines. */
  private def snapDiffBody(docs: String): String = s"""
    WITH v1 AS (SELECT doc_id, md5(text) AS h FROM $docs
                WHERE doc_id % 3 IN (0, 1)),
         v2 AS (SELECT doc_id,
                       md5(CASE WHEN doc_id % 6 = 1 THEN text || '!'
                                ELSE text END) AS h
                FROM $docs WHERE doc_id % 3 IN (1, 2))
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h = v2.h THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n
    FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1"""
}
