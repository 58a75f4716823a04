package graft.queries

import graft.Engine.table
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.sql

/** Dedup wave 2 — PARAGRAPH-GRANULARITY corpus dedup (round 10).
  *
  * The existing layers dedup whole documents (exact/MinHash/SimHash/
  * semantic) or arbitrary-alignment token runs (dedup_exact_substr).
  * Production web-corpus pipelines (CCNet, FineWeb) also dedup at the
  * PARAGRAPH level: hash each paragraph, drop later corpus-wide
  * duplicates (keep-first) or drop paragraphs shared by too many
  * documents (boilerplate), then REASSEMBLE the surviving text per
  * document. The test corpus has no newline structure, so "paragraph"
  * is a fixed SegLen-token segment — the alignment-bucketed restatement
  * of the same algorithm (reference capability surface: RDD
  * flatMap/reduceByKey chains, core/src/main/scala/org/apache/spark/
  * rdd/RDD.scala:328; restated declaratively).
  *
  * Scale posture: ONE explode bounded by n_tokens/SegLen rows per doc
  * (an order of magnitude fewer rows than exact-substr's stride-1
  * windows), keep-first rank hash-partitioned on the 64-bit segment
  * hash (corpus-growing key — never a single-partition window), then
  * one group-back per doc_id. Reassembly is collect_list bounded by
  * tokens-per-doc, never by corpus size.
  */
object Dedup2Queries {

  /** Segment ("paragraph") length in tokens — shared by both engines. */
  private val SegLen = 12

  /** Boilerplate threshold: a segment text held by more than MaxDocs
    * distinct documents is dropped everywhere (CCNet's common-line
    * filter, restated on segments). */
  private val MaxDocs = 5

  /** (doc_id, seg, seg_text, h): one row per SegLen-token segment.
    * The trailing partial segment participates as-is — identical
    * list_slice semantics in both engines. */
  private def segments(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0L), ceil(size(col("w")) / lit(SegLen.toDouble)).cast("long") - 1))
          .as("seg"))
      .select(col("doc_id"), col("seg"),
        concat_ws(" ", slice(col("w"), (col("seg") * SegLen + 1).cast("int"), lit(SegLen))).as("seg_text"))
      .withColumn("h", Portable.stableHash64(col("seg_text")))

  private def segmentsSql: String =
    s"""docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        segs AS (SELECT doc_id,
                   unnest(range(0, CAST(ceil(len(w) / ${SegLen.toDouble}) AS BIGINT))) AS seg,
                   w FROM docs),
        st AS (SELECT doc_id, seg,
                 array_to_string(list_slice(w, CAST(seg * $SegLen + 1 AS BIGINT),
                                               CAST(seg * $SegLen + $SegLen AS BIGINT)), ' ') AS seg_text,
                 ${Portable.stableHash64Sql(s"array_to_string(list_slice(w, CAST(seg * $SegLen + 1 AS BIGINT), CAST(seg * $SegLen + $SegLen AS BIGINT)), ' ')")} AS h
               FROM segs)"""

  /** Ordered reassembly of the segments where `keep` holds: collect_list
    * drops the null branches of `when`, array_sort orders by the leading
    * struct field (seg). Empty survivor set → '' (both engines). */
  private def reassemble(keep: Column): Column =
    array_join(
      transform(array_sort(collect_list(when(keep, struct(col("seg"), col("seg_text"))))),
        x => x.getField("seg_text")), " ")

  val all: Seq[Q] = Seq(

    // PARAGRAPH KEEP-FIRST DEDUP: every segment text is kept only at its
    // corpus-first occurrence (ordered by doc_id, seg); later holders
    // lose it and their document is reassembled from the survivors.
    // Output: per-doc segment census + the 64-bit portable hash of the
    // reassembled text (hash-checkable without shipping the text).
    Q("dedup_paragraph",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        segments(s, d)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("doc_id"), col("seg"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_segs"),
            sum(when(col("rk") === 1, 1L).otherwise(0L)).as("kept_segs"),
            Portable.stableHash64(reassemble(col("rk") === 1)).as("cleaned_hash"))
      },
      Some(sql(s"""WITH $segmentsSql,
                   rk AS (SELECT doc_id, seg, seg_text,
                            row_number() OVER (PARTITION BY h ORDER BY doc_id, seg) AS rk
                          FROM st)
                   SELECT doc_id, count(*) AS n_segs,
                     CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
                     ${Portable.stableHash64Sql(
                       "COALESCE(string_agg(CASE WHEN rk = 1 THEN seg_text END, ' ' ORDER BY seg), '')")}
                       AS cleaned_hash
                   FROM rk GROUP BY doc_id"""))),

    // PARAGRAPH BOILERPLATE FILTER (CCNet common-line rule on segments):
    // a segment whose text appears in more than MaxDocs DISTINCT
    // documents is dropped from ALL of them (no survivor — unlike
    // keep-first above). The per-segment doc frequency is one partial
    // aggregate on the segment hash; the verdict joins back on the same
    // key, so both shuffles share one corpus-growing partitioning.
    Q("dedup_paragraph_common",
      (s, d) => {
        val segs = segments(s, d)
        val freq = segs.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
        segs.join(freq, "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_segs"),
            sum(when(col("df") > MaxDocs, 1L).otherwise(0L)).as("boiler_segs"),
            Portable.stableHash64(reassemble(col("df") <= MaxDocs)).as("cleaned_hash"))
      },
      Some(sql(s"""WITH $segmentsSql,
                   freq AS (SELECT h, count(DISTINCT doc_id) AS df FROM st GROUP BY h)
                   SELECT doc_id, count(*) AS n_segs,
                     CAST(sum(CASE WHEN df > $MaxDocs THEN 1 ELSE 0 END) AS BIGINT) AS boiler_segs,
                     ${Portable.stableHash64Sql(
                       "COALESCE(string_agg(CASE WHEN df <= " + MaxDocs + " THEN seg_text END, ' ' ORDER BY seg), '')")}
                       AS cleaned_hash
                   FROM st JOIN freq USING (h)
                   GROUP BY doc_id""")))
  )
}
