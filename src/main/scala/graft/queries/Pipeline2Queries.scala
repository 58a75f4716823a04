package graft.queries

import graft.Engine.table
import graft.functions.{Portable, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.sql

/** Training-data pipeline operators, wave 2 (beyond-reference flagships):
  * benchmark decontamination, PII scrubbing, sequence packing, shard
  * statistics, k-means embedding clustering (assign + update steps), and
  * intra-document repetition scoring — the remaining standard stages of a
  * large-scale LLM data pipeline, each DuckDB-oracled.
  *
  * Scale posture, per operator:
  *  - decontaminate: the eval-set n-gram index is tiny relative to the
  *    corpus → broadcast semi-join; training text never shuffles (only
  *    64-bit gram hashes do).
  *  - pii_scrub: pure per-row regex projection inside the scan stage.
  *  - pack_chunks: one shuffle keyed by shard; running offsets are a
  *    per-shard window (shard count scales with the cluster).
  *  - shard_stats: single hash aggregation keyed by shard.
  *  - kmeans: K centroids broadcast to the scan (classic assign step);
  *    the update step shuffles (cluster, dim) partial sums — K×dim rows.
  *  - repetition: per-doc n-gram counting via a (doc, gram)-keyed
  *    aggregation — cardinality bounded by total corpus grams.
  */
object Pipeline2Queries {

  /** Documents with staged whitespace tokens (split evaluated once). */
  private def docsWithToks(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").select(col("doc_id"), T.tokens(col("text")).as("toks"))

  val all: Seq[Q] = Seq(

    // Benchmark decontamination: flag training documents sharing any word
    // 3-gram with the held-out eval slice (doc_id % 20 == 0) — the
    // standard train/test contamination check, run on gram HASHES so the
    // join never moves text.
    Q("pipe_decontaminate",
      (s, d) => {
        val grams = docsWithToks(s, d)
          .select(col("doc_id"), explode(Portable.shingles3FromTokens(col("toks"))).as("g"))
          .select(col("doc_id"), Portable.stableHash64(col("g")).as("gh"))
        val evalGrams = grams.filter(col("doc_id") % 20 === 0).select(col("gh")).distinct()
        val train = grams.filter(col("doc_id") % 20 =!= 0)
        val overlap = train.join(broadcast(evalGrams), Seq("gh"))
          .groupBy(col("doc_id")).agg(countDistinct(col("gh")).as("n_overlap"))
        table(s, d, "documents").filter(col("doc_id") % 20 =!= 0).select(col("doc_id"))
          .join(overlap, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            (coalesce(col("n_overlap"), lit(0L)) > 0L).as("contaminated"))
      },
      Some(sql(s"""WITH grams AS (
                     SELECT doc_id, ${Portable.stableHash64Sql("g")} AS gh
                     FROM (SELECT doc_id, unnest(${Portable.shingles3Sql("text")}) AS g
                           FROM documents)),
                   ev AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 20 = 0),
                   ov AS (SELECT g.doc_id, count(DISTINCT g.gh) AS n_overlap
                          FROM grams g JOIN ev ON g.gh = ev.gh
                          WHERE g.doc_id % 20 <> 0 GROUP BY 1)
                   SELECT d.doc_id,
                     CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
                     coalesce(ov.n_overlap, 0) > 0 AS contaminated
                   FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
                   WHERE d.doc_id % 20 <> 0"""))),

    // PII scrubbing: redact emails / phone-like / IPv4 tokens and count
    // each. The corpus is synthetic word-soup with no natural PII, so the
    // query deterministically enriches each row from its own key first —
    // the operator under test is the count+redact expression chain.
    // mask() — Spark 3.4's built-in character-class redaction (upper→X,
    // lower→x, digit→n), the structure-preserving sibling of the regex
    // scrub below: length and punctuation survive, content doesn't.
    // Default masking plus a custom-replacement variant (otherChar '-')
    // pinned side by side; the oracle reproduces the per-class
    // substitution with three regexp_replace passes.
    Q("pipe_pii_mask",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_dmask")
        s.sql(Registry.sql("""
          SELECT doc_id,
                 mask(payload) AS masked,
                 mask(payload, 'Q', 'q', '9', '-') AS masked_custom
          FROM (SELECT doc_id,
                  concat('User ', upper(lang), ' id', CAST(doc_id AS STRING),
                         ' key 12-', CAST(doc_id % 100 AS STRING)) AS payload
                FROM graft_dmask)"""))
      },
      Some(sql("""
        WITH p AS (SELECT doc_id,
               'User ' || upper(lang) || ' id' || CAST(doc_id AS VARCHAR)
                 || ' key 12-' || CAST(doc_id % 100 AS VARCHAR) AS payload
             FROM documents)
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(payload,
            '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(payload,
            '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'), '[0-9]', '9', 'g'),
            '[^A-Za-z0-9Qq9]', '-', 'g') AS masked_custom
        FROM p"""))),

    Q("pipe_pii_scrub",
      (s, d) => {
        val id = col("doc_id")
        val enriched = concat(
          col("text"), lit(" contact user"), id.cast("string"),
          lit("@example.com call 555-"), lpad((id % 10000).cast("string"), 4, "0"),
          lit(" ip 10.0."), (id % 256).cast("string"), lit("."), (id % 100).cast("string"))
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
        val phone = "555-[0-9]{4}"
        val scrubbed = regexp_replace(
          regexp_replace(
            regexp_replace(enriched, lit(email), lit("<EMAIL>")),
            lit(ip), lit("<IP>")),
          lit(phone), lit("<PHONE>"))
        table(s, d, "documents").select(
          col("doc_id"),
          regexp_count(enriched, lit(email)).cast("long").as("n_email"),
          regexp_count(enriched, lit(ip)).cast("long").as("n_ip"),
          regexp_count(enriched, lit(phone)).cast("long").as("n_phone"),
          length(scrubbed).cast("long").as("scrub_len"),
          Portable.stableHash64(scrubbed).as("scrub_hash"))
      },
      Some {
        val enriched = "text || ' contact user' || CAST(doc_id AS VARCHAR)" +
          " || '@example.com call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')" +
          " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)"
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
        val phone = "555-[0-9]{4}"
        val scrubbed = s"regexp_replace(regexp_replace(regexp_replace(e, '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$phone', '<PHONE>', 'g')"
        sql(s"""SELECT doc_id,
                 CAST(len(regexp_extract_all(e, '$email')) AS BIGINT) AS n_email,
                 CAST(len(regexp_extract_all(e, '$ip')) AS BIGINT) AS n_ip,
                 CAST(len(regexp_extract_all(e, '$phone')) AS BIGINT) AS n_phone,
                 CAST(length($scrubbed) AS BIGINT) AS scrub_len,
                 ${Portable.stableHash64Sql(scrubbed)} AS scrub_hash
                FROM (SELECT doc_id, $enriched AS e FROM documents)""")
      }),

    // Sequence packing (concat-and-chunk): documents stream into 8 shards
    // in doc_id order; each token lands at a running offset and chunks cut
    // every 2048 tokens — the deterministic restatement of greedy
    // training-sequence packing that both engines compute exactly.
    Q("pipe_pack_chunks",
      (s, d) => {
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        docsWithToks(s, d)
          .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
            size(col("toks")).cast("long").as("n_tok"))
          .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
          .withColumn("chunk_id", floor(col("tok_offset") / 2048L))
      },
      Some(sql(s"""SELECT doc_id, shard, n_tok, tok_offset, tok_offset // 2048 AS chunk_id
                   FROM (SELECT doc_id, doc_id % 8 AS shard, n_tok,
                           CAST(coalesce(sum(n_tok) OVER (PARTITION BY doc_id % 8
                             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
                         FROM (SELECT doc_id,
                                 CAST(len(${T.tokensSql("text")}) AS BIGINT) AS n_tok
                               FROM documents))"""))),

    // Deterministic shard assignment + per-shard balance stats: the
    // write-side layout step of a corpus export (shard = hash(key) % 64).
    Q("pipe_shard_stats",
      (s, d) => table(s, d, "documents")
        .select((Portable.stableHash64(col("doc_id")) % 64).as("shard"),
          col("n_chars"), size(T.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tok")).as("total_tokens")),
      Some(sql(s"""SELECT ${Portable.stableHash64Sql("doc_id")} % 64 AS shard,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_chars) AS BIGINT) AS total_chars,
                    CAST(sum(len(${T.tokensSql("text")})) AS BIGINT) AS total_tokens
                   FROM documents GROUP BY 1"""))),

    // k-means ASSIGN step over embeddings: centroids = the first 8
    // non-degenerate vectors (deterministic seed), broadcast to the scan;
    // each vector joins its nearest centroid by cosine (ties → lowest id).
    Q("sim_kmeans_assign",
      (s, d) => {
        val nonZero = aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x) > 0.0
        val emb = table(s, d, "embeddings")
          .filter(nonZero).select(col("vec_id"), col("embedding"))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cid"),
            round(T.cosineFast(col("embedding"), col("cvec")), 6).as("cos_sim"))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"), struct(col("cos_sim"), (-col("cid")).as("nc"))).as("cluster"),
            max(col("cos_sim")).as("cos_sim"))
      },
      Some(sql(s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings
                     WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
                   cents AS (SELECT vec_id AS cid, embedding AS cvec FROM emb WHERE vec_id < 8),
                   scored AS (SELECT e.vec_id, c.cid,
                       round(${T.cosineSql("e.embedding", "c.cvec")}, 6) AS cos_sim
                     FROM emb e CROSS JOIN cents c)
                   SELECT vec_id, cid AS cluster, cos_sim FROM (
                     SELECT vec_id, cid, cos_sim,
                       row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, cid ASC) AS rk
                     FROM scored)
                   WHERE rk = 1"""))),

    // k-means UPDATE step: per-cluster mean vector via (cluster, dim)
    // partial aggregation — the shuffle carries K×64 partial sums, never
    // whole vectors; the result folds back into a '|'-joined string.
    Q("sim_kmeans_centroids",
      (s, d) => {
        val assigned = all.find(_.name == "sim_kmeans_assign").get.fn(s, d)
          .select(col("vec_id"), col("cluster"))
        val nonZero = aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x) > 0.0
        val emb = table(s, d, "embeddings").filter(nonZero)
          .select(col("vec_id"), col("embedding"))
        val perDim = emb.join(assigned, Seq("vec_id"))
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(round(avg(col("v").cast("double")), 6).as("m"))
        val centroid = perDim.groupBy(col("cluster"))
          .agg(Registry.arrDecStr(
            transform(array_sort(collect_list(struct(col("pos"), col("m")))),
              x => x.getField("m"))).as("centroid"))
        val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs"))
        counts.join(centroid, Seq("cluster"))
          .select(col("cluster"), col("n_vecs"), col("centroid"))
      },
      Some(sql(s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings
                     WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
                   cents AS (SELECT vec_id AS cid, embedding AS cvec FROM emb WHERE vec_id < 8),
                   scored AS (SELECT e.vec_id, c.cid,
                       round(${T.cosineSql("e.embedding", "c.cvec")}, 6) AS cos_sim
                     FROM emb e CROSS JOIN cents c),
                   assigned AS (SELECT vec_id, cid AS cluster FROM (
                       SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, cid ASC) AS rk
                       FROM scored) WHERE rk = 1),
                   perdim AS (SELECT a.cluster, r.range AS pos,
                       round(avg(CAST(e.embedding[r.range] AS DOUBLE)), 6) AS m
                     FROM emb e JOIN assigned a ON e.vec_id = a.vec_id, range(1, 65) r
                     GROUP BY 1, 2)
                   SELECT p.cluster, c.n_vecs,
                     array_to_string(list_transform(list(m ORDER BY pos),
                       x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|') AS centroid
                   FROM perdim p
                   JOIN (SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs
                         FROM assigned GROUP BY 1) c ON p.cluster = c.cluster
                   GROUP BY p.cluster, c.n_vecs"""))),

    // Intra-document repetition (Gopher-style quality signal): duplicate
    // word-3-gram fraction + the count of the most repeated gram.
    Q("text_repetition",
      (s, d) => {
        val g = docsWithToks(s, d)
          .select(col("doc_id"), Portable.shingles3FromTokens(col("toks")).as("grams"))
          .filter(size(col("grams")) > 0)
        val stats = g.select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
        val top = g.select(col("doc_id"), explode(col("grams")).as("gram"))
          .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_count"))
        stats.join(top, Seq("doc_id"))
          .select(col("doc_id"), col("n_grams"), col("n_distinct"),
            round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6)
              .as("dup_frac"),
            col("top_count"))
      },
      Some(sql(s"""WITH g AS (SELECT doc_id, ${Portable.shingles3Sql("text")} AS grams
                     FROM documents WHERE len(${Portable.shingles3Sql("text")}) > 0),
                   stats AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct FROM g),
                   top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_count FROM (
                       SELECT doc_id, gram, count(*) AS c
                       FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
                       GROUP BY 1, 2) GROUP BY 1)
                   SELECT s.doc_id, s.n_grams, s.n_distinct,
                     round(1.0 - CAST(s.n_distinct AS DOUBLE) / s.n_grams, 6) AS dup_frac,
                     t.top_count
                   FROM stats s JOIN top t ON s.doc_id = t.doc_id""")))
  )
}
