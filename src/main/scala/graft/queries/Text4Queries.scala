package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 text wave 4 — RAKE keyword extraction (Rose et al. 2010),
  * the degree/frequency complement to TextRank: candidate phrases are
  * maximal stopword-free token runs, each word scores degree/frequency
  * (degree = summed length of phrases it appears in), and a phrase
  * scores the sum of its words' scores.
  *
  * Engine-parity choices: phrases come from a GAPS-AND-ISLANDS split
  * (phrase id = cumulative stopword count before the token, a window
  * strictly PARTITIONED by doc) — no regex word boundaries whose
  * dialects could disagree; word scores are kept as exact MICRO-integers
  * (⌊10⁶·degree/freq⌋) so the per-phrase sum is order-independent
  * integer arithmetic, never an FP fold.
  */
object Text4Queries {

  private val Stop = Seq("the", "a", "and", "of", "to", "in")
  private val stopInSpark = Stop.map(w => s"'$w'").mkString("(", ", ", ")")
  private val stopInDuck = Stop.map(w => s"'$w'").mkString("(", ", ", ")")

  val all: Seq[Q] = Seq(

    Q("text_rake_keywords",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_doc_rake")
        s.sql(sql(s"""
          WITH toks AS (SELECT doc_id, pos, tok
                 FROM graft_doc_rake
                 LATERAL VIEW posexplode(split(lower(text), ' ')) t AS pos, tok
                 WHERE tok <> ''),
               marked AS (SELECT doc_id, pos, tok,
                   CASE WHEN tok IN $stopInSpark THEN 1 ELSE 0 END AS st
                 FROM toks),
               islands AS (SELECT doc_id, pos, tok, st,
                   SUM(st) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                 FROM marked),
               phrase_words AS (SELECT doc_id, grp, tok, pos
                                FROM islands WHERE st = 0),
               phrases AS (SELECT doc_id, grp,
                   concat_ws(' ', sort_array(collect_list(struct(pos, tok))).tok)
                     AS phrase,
                   count(*) AS plen
                 FROM phrase_words GROUP BY doc_id, grp),
               wstats AS (SELECT w.tok, count(*) AS freq,
                   sum(p.plen) AS degree
                 FROM phrase_words w JOIN phrases p
                   ON w.doc_id = p.doc_id AND w.grp = p.grp
                 GROUP BY w.tok),
               wscore AS (SELECT tok,
                   CAST(degree * 1000000 DIV freq AS BIGINT) AS micro
                 FROM wstats),
               pscore AS (SELECT p.phrase,
                   CAST(sum(s2.micro) AS BIGINT) AS score_micro
                 FROM phrase_words w
                 JOIN phrases p ON w.doc_id = p.doc_id AND w.grp = p.grp
                 JOIN wscore s2 ON w.tok = s2.tok
                 GROUP BY p.doc_id, p.grp, p.phrase)
          SELECT phrase, CAST(max(score_micro) AS BIGINT) AS score_micro,
                 count(*) AS n_occurrences
          FROM pscore GROUP BY phrase
          ORDER BY score_micro DESC, phrase LIMIT 15"""))
      },
      Some(sql(s"""
        WITH toks AS (SELECT doc_id, pos, tok FROM (
                 SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS tok,
                   generate_subscripts(string_split(lower(text), ' '), 1) AS pos
                 FROM documents)
               WHERE tok <> ''),
             marked AS (SELECT doc_id, pos, tok,
                 CASE WHEN tok IN $stopInDuck THEN 1 ELSE 0 END AS st
               FROM toks),
             islands AS (SELECT doc_id, pos, tok, st,
                 SUM(st) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
               FROM marked),
             phrase_words AS (SELECT doc_id, grp, tok, pos
                              FROM islands WHERE st = 0),
             phrases AS (SELECT doc_id, grp,
                 string_agg(tok, ' ' ORDER BY pos) AS phrase,
                 count(*) AS plen
               FROM phrase_words GROUP BY doc_id, grp),
             wstats AS (SELECT w.tok, count(*) AS freq,
                 sum(p.plen) AS degree
               FROM phrase_words w JOIN phrases p
                 ON w.doc_id = p.doc_id AND w.grp = p.grp
               GROUP BY w.tok),
             wscore AS (SELECT tok,
                 CAST(degree * 1000000 // freq AS BIGINT) AS micro
               FROM wstats),
             pscore AS (SELECT p.phrase,
                 CAST(sum(s2.micro) AS BIGINT) AS score_micro
               FROM phrase_words w
               JOIN phrases p ON w.doc_id = p.doc_id AND w.grp = p.grp
               JOIN wscore s2 ON w.tok = s2.tok
               GROUP BY p.doc_id, p.grp, p.phrase)
        SELECT phrase, CAST(max(score_micro) AS BIGINT) AS score_micro,
               count(*) AS n_occurrences
        FROM pscore GROUP BY phrase
        ORDER BY score_micro DESC, phrase LIMIT 15""")))
  )
}
