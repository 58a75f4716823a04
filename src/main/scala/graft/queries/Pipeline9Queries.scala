package graft.queries

import graft.Engine.table
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
                  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""")))
  )
}
