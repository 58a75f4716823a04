package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.{Portable, TextFunctions => T}
import Registry.sql

/** LLM-data-pipeline wave 5 — the corpus-curation controls a training
  * team turns AFTER the per-document filters and dedup layers exist:
  * source-level balance, cluster-level balance, the deterministic
  * training order, and tokenizer-efficiency telemetry.
  *
  * - per-domain cap (RefinedWeb, Penedo 2023 §3.3: bounding any single
  *   domain's share of the corpus): keep at most CAP docs per source,
  *   chosen by deterministic hash rank. The 100 TB shape is the point:
  *   a row_number window partitioned by source funnels EVERY row of a
  *   domain through one partition (a hot mega-domain = one straggler
  *   task), so the cap rides the graft_topk bounded-heap aggregate —
  *   O(CAP) state per (source, task), true partial/merge, no window.
  *
  * - cluster-balanced sampling (SemDeDup/DoReMi-adjacent: equalize
  *   cluster mass before training): per-centroid keep rates inversely
  *   proportional to cluster population, applied as a deterministic
  *   hash predicate so the sample is reproducible and oracle-checkable.
  *   Assignment reuses sim_kmeans_assign's broadcast-centroid scan —
  *   the K-row centroid table broadcasts; the corpus never shuffles.
  *
  * - deterministic training shuffle (the "global shuffle" every data
  *   loader needs): shard = hash(seed, doc) mod N_SHARDS, position =
  *   rank of the hash within the shard. Partitioning by shard is the
  *   scale story — shard count grows with the corpus (shards are sized
  *   to a fixed token budget), so the rank window's parallelism grows
  *   with the data; the order-sensitive checksum pins that BOTH engines
  *   produce the identical permutation, not just the same membership.
  *
  * - tokenizer fertility (tokens-per-word / chars-per-token by
  *   language): the telemetry that decides whether a tokenizer is
  *   acceptable for a language mix. Ratio-of-sums per language — one
  *   scan, a lang-keyed partial aggregate, nothing else.
  */
object Pipeline5Queries {

  /** Max docs retained per source (RefinedWeb-style domain cap). */
  private val DomainCap = 50

  /** Per-cluster target sample size × 100 (rate_pct numerator). */
  private val ClusterTarget = 30

  /** Training-shuffle shard count (grows with corpus size in prod). */
  private val NShards = 8L

  /** Chunking window / stride (tokens) — sized so the test corpus's
    * short docs still produce multi-chunk outputs; prod uses 2048/1024. */
  private val ChunkW = 32
  private val ChunkS = 16

  val all: Seq[Q] = Seq(

    // Per-domain cap: bounded-heap top-CAP by hash per source. The hash
    // is reduced mod 2^50 so its double image in the topk score is
    // EXACT (2^50 < 2^53) — the oracle ranks the same BIGINT, so the
    // kept set must agree element-for-element (pinned by kept_sum).
    Q("pipe_domain_cap",
      (s, d) => {
        table(s, d, "documents")
          .select(col("source"), col("doc_id"),
            (-pmod(Portable.stableHash64(col("doc_id")), lit(1L << 50))
              .cast("double")).as("nh"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"),
            expr(s"graft_topk(nh, doc_id, $DomainCap)").as("top"))
          .select(col("source"), col("n_total"),
            size(col("top")).cast("long").as("n_kept"),
            aggregate(col("top"), lit(0L), (a, x) => a + x.getField("id"))
              .as("kept_sum"))
      },
      Some(sql(s"""WITH h AS (SELECT source, doc_id,
                       (${Portable.stableHash64Sql("doc_id")} % ${1L << 50}) AS hv
                     FROM documents),
                   r AS (SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY hv ASC, doc_id ASC) AS rk
                     FROM h)
                   SELECT source, count(*) AS n_total,
                     CAST(sum(CASE WHEN rk <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                     CAST(sum(CASE WHEN rk <= $DomainCap THEN doc_id ELSE 0 END) AS BIGINT) AS kept_sum
                   FROM r GROUP BY source"""))),

    // Cluster-balanced sampling: rate_pct = min(100, ceil(100·T/n)) per
    // centroid cell, applied as the deterministic hash predicate. The
    // per-cluster counts table is K rows — broadcast back onto the
    // assignment, never a second corpus shuffle.
    Q("pipe_cluster_sample",
      (s, d) => {
        val assigned = Pipeline2Queries.all.find(_.name == "sim_kmeans_assign")
          .get.fn(s, d).select(col("vec_id"), col("cluster"))
        val counts = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_total"))
          .withColumn("rate_pct",
            least(lit(100L),
              ceil(lit(ClusterTarget * 100.0) / col("n_total"))))
        assigned.join(broadcast(counts), Seq("cluster"))
          .groupBy(col("cluster"), col("n_total"), col("rate_pct"))
          .agg(sum(when(
            pmod(Portable.stableHash64(col("vec_id")), lit(100L)) < col("rate_pct"),
            1L).otherwise(0L)).as("n_kept"))
          .select(col("cluster"), col("n_total"), col("rate_pct"), col("n_kept"))
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
                   counts AS (SELECT cluster, count(*) AS n_total,
                       least(100, CAST(ceil(${ClusterTarget * 100}.0 / count(*)) AS BIGINT)) AS rate_pct
                     FROM assigned GROUP BY cluster)
                   SELECT a.cluster, c.n_total, c.rate_pct,
                     CAST(sum(CASE WHEN (${Portable.stableHash64Sql("a.vec_id")} % 100) < c.rate_pct
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
                   FROM assigned a JOIN counts c ON a.cluster = c.cluster
                   GROUP BY a.cluster, c.n_total, c.rate_pct"""))),

    // Deterministic training shuffle: seeded hash → shard + in-shard
    // rank. ord_checksum = Σ pos·doc_id is order-SENSITIVE — it differs
    // if any two documents swap positions, so it pins the permutation
    // itself, not just shard membership.
    Q("pipe_shuffle_order",
      (s, d) => {
        val w = Window.partitionBy(col("shard"))
          .orderBy(col("hv").asc, col("doc_id").asc)
        table(s, d, "documents")
          .select(col("doc_id"),
            pmod(Portable.stableHash64(concat(lit("epoch1:"), col("doc_id").cast("string"))),
              lit(1L << 50)).as("hv"))
          .withColumn("shard", pmod(col("hv"), lit(NShards)))
          .withColumn("pos", row_number().over(w).cast("long"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pos") * col("doc_id")).as("ord_checksum"))
      },
      Some(sql(s"""WITH h AS (SELECT doc_id,
                       (${Portable.stableHash64Sql("concat('epoch1:', CAST(doc_id AS VARCHAR))")}
                        % ${1L << 50}) AS hv
                     FROM documents),
                   p AS (SELECT doc_id, hv, hv % $NShards AS shard FROM h),
                   r AS (SELECT shard, doc_id,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY hv ASC, doc_id ASC) AS pos
                     FROM p)
                   SELECT shard, count(*) AS n_docs,
                     CAST(sum(pos * doc_id) AS BIGINT) AS ord_checksum
                   FROM r GROUP BY shard"""))),

    // Tokenizer fertility by language: ratio-of-sums (not avg-of-
    // ratios) so long documents weigh in proportionally — the corpus-
    // level number a tokenizer review reads.
    Q("text_token_fertility",
      (s, d) => {
        table(s, d, "documents")
          .select(col("lang"),
            size(T.tokens(col("text"))).cast("long").as("w"),
            T.bpeTokenCount(col("text")).as("b"),
            length(col("text")).cast("long").as("c"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            round(sum(col("b")).cast("double") / sum(col("w")), 6).as("fertility"),
            round(sum(col("c")).cast("double") / sum(col("b")), 6).as("chars_per_bpe"))
      },
      Some(sql(s"""SELECT lang, count(*) AS n_docs,
                     round(CAST(sum(${T.bpeTokenCountSql("text")}) AS DOUBLE)
                           / sum(len(${T.tokensSql("text")})), 6) AS fertility,
                     round(CAST(sum(length(text)) AS DOUBLE)
                           / sum(${T.bpeTokenCountSql("text")}), 6) AS chars_per_bpe
                   FROM documents GROUP BY lang"""))),

    // Sliding-window chunking with overlap (the training-window prep
    // step between packing and the data loader): windows of ChunkW
    // tokens at stride ChunkS, last window ragged. One explode over a
    // per-doc arithmetic sequence — a pure scan-stage generator, no
    // shuffle at all; chunk count scales with token count, not document
    // count, which is exactly the property a 100 TB tokenize pass needs.
    Q("pipe_chunk_overlap",
      (s, d) => {
        table(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("toks"),
            explode(expr(s"sequence(0, size(toks) - 1, $ChunkS)")).as("s"))
          .select(col("doc_id"),
            (col("s") / ChunkS).cast("long").as("chunk_id"),
            col("s").cast("long").as("tok_start"),
            least(lit(ChunkW), size(col("toks")) - col("s")).cast("long").as("n_tok"),
            array_join(slice(col("toks"), col("s") + 1, lit(ChunkW)), " ").as("chunk"))
      },
      Some(sql(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                              FROM documents WHERE len(string_split(text, ' ')) > 0),
                   c AS (SELECT doc_id, toks,
                           unnest(range(0, len(toks), $ChunkS)) AS s FROM t)
                   SELECT doc_id, CAST(s // $ChunkS AS BIGINT) AS chunk_id,
                     CAST(s AS BIGINT) AS tok_start,
                     CAST(least($ChunkW, len(toks) - s) AS BIGINT) AS n_tok,
                     array_to_string(list_slice(toks, s + 1, s + $ChunkW), ' ') AS chunk
                   FROM c"""))),

    // FILE-COMPACTION BIN-PACKING (the OPTIMIZE/rewrite-small-files
    // planner every lakehouse runs): per-month partition row counts are
    // packed into sequential compaction bins by a running-total budget —
    // bin = (cumsum − n) div budget, the split-by-running-total window.
    // The global-window stage runs over MANIFEST rows (one per month
    // partition), not data rows — at 100 TB this is thousands of rows on
    // one task while the actual rewrite fans out per bin.
    Q("layout_compaction_bins",
      (s, d) => {
        val parts = table(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("pmonth"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("pmonth"))
        parts
          .select(col("pmonth"), col("n"),
            floor((sum(col("n")).over(w) - col("n")) / lit(5000)).as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_parts"), sum(col("n")).as("rows_"),
            min(col("pmonth")).as("first_month"), max(col("pmonth")).as("last_month"))
      },
      Some(sql("""WITH parts AS (
                    SELECT strftime(o_orderdate, '%Y-%m') AS pmonth, count(*) AS n
                    FROM orders GROUP BY 1),
                  binned AS (
                    SELECT pmonth, n,
                      CAST(floor((sum(n) OVER (ORDER BY pmonth) - n) / 5000) AS BIGINT) AS bin
                    FROM parts)
                  SELECT bin, count(*) AS n_parts, CAST(sum(n) AS BIGINT) AS rows_,
                    min(pmonth) AS first_month, max(pmonth) AS last_month
                  FROM binned GROUP BY bin"""))),

    // DATA-CONTRACT CHECKS (the dbt-test / expectation-suite shape): a
    // battery of declarative column contracts evaluated in ONE grouped
    // pass over the table — null guard, range guard, enum membership,
    // regex format, key uniqueness — each reported as a violation count
    // plus a pass flag. At 100 TB this is the write-audit-publish gate
    // that runs between producing a dataset and registering it.
    Q("pipe_data_contract",
      (s, d) => {
        val o = table(s, d, "orders")
        val checks = o.agg(
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
          sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("nonpos_price"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("bad_status"),
          sum(when(!col("o_orderpriority").rlike("^[1-5]-"), 1L).otherwise(0L)).as("bad_priority"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_keys"))
        checks.select(explode(expr(
          """map('null_custkey', null_custkey, 'nonpos_price', nonpos_price,
                 'bad_status', bad_status, 'bad_priority', bad_priority,
                 'dup_keys', dup_keys)""")).as(Seq("check", "n_violations")))
          .select(col("check"), col("n_violations"),
            (col("n_violations") === 0L).cast("int").as("pass"))
      },
      Some(sql("""WITH c AS (SELECT
                    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
                    CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
                    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
                    CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority,
                    count(*) - count(DISTINCT o_orderkey) AS dup_keys
                  FROM orders)
                  SELECT chk AS "check", v AS n_violations,
                    CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass
                  FROM (SELECT unnest(['null_custkey', 'nonpos_price', 'bad_status',
                                       'bad_priority', 'dup_keys']) AS chk,
                               unnest([null_custkey, nonpos_price, bad_status,
                                       bad_priority, dup_keys]) AS v
                        FROM c)"""))),

    // CONTENT-ADDRESSED DATASET FINGERPRINT: bit_xor of per-row content
    // hashes + row count — order- and layout-insensitive, so a physical
    // rewrite (repartition/compaction) preserves it while any single-row
    // mutation flips it. The "did OPTIMIZE change my data?" audit that
    // pairs with layout_compaction_bins; one scan per variant, partial
    // bit_xor before the 1-row final.
    Q("pipe_dataset_fingerprint",
      (s, d) => {
        def rowHash = Portable.stableHash64(concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority")))
        def fp(df: org.apache.spark.sql.DataFrame) =
          df.agg(bit_xor(rowHash).as("fp"), count(lit(1)).as("n"))
        val base = table(s, d, "orders")
        val f0 = fp(base)
        val f1 = fp(base.repartition(13)) // physical rewrite, same content
        val f2 = fp(base.withColumn("o_orderstatus",
          when(col("o_orderkey") % 97 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))) // one-in-97 mutation
        f0.select(lit("base").as("variant"), col("fp"), col("n"))
          .unionAll(f1.select(lit("rewritten").as("variant"), col("fp"), col("n")))
          .unionAll(f2.select(lit("mutated").as("variant"), col("fp"), col("n")))
      },
      Some(sql(s"""WITH h AS (SELECT
               ${Portable.stableHash64Sql(
                 "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, o_orderpriority)")} AS rh,
               ${Portable.stableHash64Sql(
                 """concat_ws('|', o_orderkey, o_custkey,
                    CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END,
                    o_orderpriority)""")} AS rm
             FROM orders)
           SELECT 'base' AS variant, bit_xor(rh) AS fp, count(*) AS n FROM h
           UNION ALL
           SELECT 'rewritten', bit_xor(rh), count(*) FROM h
           UNION ALL
           SELECT 'mutated', bit_xor(rm), count(*) FROM h"""))),

    // CONTENT-DEFINED CHUNKING (rsync/restic-style): a chunk boundary
    // opens wherever a token's content hash lands in a 1/16 residue
    // class, so chunk boundaries survive insertions and deletions —
    // unlike fixed-stride chunking (pipe_chunk_overlap), an edit only
    // reflows chunks up to the next content boundary, which is what
    // makes chunk-level dedup stable across document revisions. The
    // running boundary count per doc (a doc-partitioned window) is the
    // chunk id.
    Q("pipe_cdc_chunks",
      (s, d) => {
        table(s, d, "documents")
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .withColumn("bnd",
            (Portable.stableHash64(col("tok")) % 16 === 0).cast("long"))
          .withColumn("chunk", sum(col("bnd")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("chunk"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"), max(col("n")).as("max_len"),
            sum(col("n")).as("n_toks_total"))
      },
      Some(sql(s"""WITH toks AS (
             SELECT doc_id, i - 1 AS pos, l[i] AS tok
             FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
                   FROM (SELECT doc_id, string_split(text, ' ') AS l
                         FROM documents))),
           ch AS (SELECT doc_id, pos,
               sum(CASE WHEN ${Portable.stableHash64Sql("tok")} % 16 = 0
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS chunk
             FROM toks),
           g AS (SELECT doc_id, chunk, count(*) AS n FROM ch GROUP BY 1, 2)
           SELECT doc_id, count(*) AS n_chunks, CAST(max(n) AS BIGINT) AS max_len,
             CAST(sum(n) AS BIGINT) AS n_toks_total
           FROM g GROUP BY doc_id"""))),

    // PREFERENCE-PAIR CONSTRUCTION (the RLHF/DPO data-prep shape): per
    // source, the top-i quality doc is paired against the bottom-i doc
    // (i ≤ 3) with a strict positive margin — chosen/rejected pairs
    // built from a ranking signal, the step between curation and
    // preference-tuning. Both rankings are per-source windows with
    // mirror-consistent tiebreaks.
    Q("pipe_preference_pairs",
      (s, d) => {
        val ranked = table(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk_top", row_number().over(Window.partitionBy("source")
            .orderBy(col("n_chars").desc, col("doc_id"))))
          .withColumn("rk_bot", row_number().over(Window.partitionBy("source")
            .orderBy(col("n_chars").asc, col("doc_id").desc)))
        val top = ranked.filter(col("rk_top") <= 3)
          .select(col("source"), col("rk_top").as("pair_id"),
            col("doc_id").as("chosen_id"), col("n_chars").as("cs"))
        val bot = ranked.filter(col("rk_bot") <= 3)
          .select(col("source"), col("rk_bot").as("pair_id"),
            col("doc_id").as("rejected_id"), col("n_chars").as("rs"))
        top.join(bot, Seq("source", "pair_id"))
          .filter(col("cs") > col("rs"))
          .select(col("source"), col("pair_id").cast("long").as("pair_id"),
            col("chosen_id"), col("rejected_id"), (col("cs") - col("rs")).as("margin"))
      },
      Some(sql("""WITH ranked AS (
             SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS rk_top,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars ASC, doc_id DESC) AS rk_bot
             FROM documents)
           SELECT t.source, CAST(t.rk_top AS BIGINT) AS pair_id,
             t.doc_id AS chosen_id, b.doc_id AS rejected_id,
             t.n_chars - b.n_chars AS margin
           FROM ranked t JOIN ranked b
             ON t.source = b.source AND t.rk_top = b.rk_bot
           WHERE t.rk_top <= 3 AND b.rk_bot <= 3 AND t.n_chars > b.n_chars"""))),

    // CLUSTER PURITY (external clustering evaluation): the kmeans-style
    // assignment (broadcast 8-centroid argmax, sim_kmeans_assign's
    // shape) scored against the embeddings' label column — per-cluster
    // majority label and floor(1e6·purity), the report that says
    // whether the coarse quantizer respects the taxonomy.
    Q("sim_cluster_purity",
      (s, d) => {
        val nonZero = aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x) > 0.0
        val emb = table(s, d, "embeddings").filter(nonZero)
          .select(col("vec_id"), col("embedding"), col("label"))
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val assigned = emb.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("label"), col("cid"),
            round(T.cosineFast(col("embedding"), col("cvec")), 6).as("cs"))
          .groupBy(col("vec_id"), col("label"))
          .agg(max_by(col("cid"), struct(col("cs"), (-col("cid")).as("nc"))).as("cluster"))
        val cl = assigned.groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("cnt"))
        cl.withColumn("rk", row_number().over(Window.partitionBy("cluster")
            .orderBy(col("cnt").desc, col("label"))))
          .filter(col("rk") === 1)
          .join(cl.groupBy(col("cluster")).agg(sum(col("cnt")).as("n")), Seq("cluster"))
          .select(col("cluster"), col("n"), col("label").as("top_label"),
            col("cnt").as("top_n"),
            floor(lit(1000000.0) * col("cnt") / col("n")).as("purity_micro"))
      },
      Some(sql(s"""WITH emb AS (
             SELECT vec_id, embedding, label FROM embeddings
             WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])) > 0),
           cents AS (SELECT vec_id AS cid, embedding AS cvec FROM emb
                     WHERE vec_id < 8),
           assigned AS (SELECT vec_id, label, cid AS cluster FROM (
               SELECT e.vec_id, e.label, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY round(${graft.functions.TextFunctions.cosineSql("e.embedding", "c.cvec")}, 6) DESC,
                            c.cid ASC) AS rk
               FROM emb e CROSS JOIN cents c) WHERE rk = 1),
           cl AS (SELECT cluster, label, count(*) AS cnt
                  FROM assigned GROUP BY 1, 2),
           tot AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS n
                   FROM cl GROUP BY 1),
           top AS (SELECT cluster, label, cnt FROM (
               SELECT cluster, label, cnt,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY cnt DESC, label) AS rk FROM cl) WHERE rk = 1)
           SELECT t.cluster, tot.n, t.label AS top_label,
             CAST(t.cnt AS BIGINT) AS top_n,
             CAST(floor(CAST(1000000.0 AS DOUBLE) * t.cnt / tot.n) AS BIGINT)
               AS purity_micro
           FROM top t JOIN tot ON tot.cluster = t.cluster"""))),

    // STRATIFIED TRAIN/VAL/TEST SPLIT: deterministic hash-bucket
    // assignment (80/10/10) reported PER (source, split) — the split is
    // reproducible across runs and machines (content hash, no seed
    // state), strata keep their proportions, and the counts prove
    // disjoint-and-complete coverage (per-source split sums equal the
    // source totals by construction of the CASE).
    Q("pipe_stratified_split",
      (s, d) => {
        val bucket = pmod(Portable.stableHash64(col("doc_id")), lit(10))
        table(s, d, "documents")
          .select(col("source"),
            when(bucket < 8, lit("train"))
              .when(bucket < 9, lit("val")).otherwise(lit("test")).as("split"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n"))
      },
      Some(sql(s"""SELECT source,
             CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
                  ELSE 'test' END AS split,
             count(*) AS n
           FROM (SELECT source,
                   ((${Portable.stableHash64Sql("doc_id")} % 10) + 10) % 10 AS b
                 FROM documents)
           GROUP BY 1, 2"""))),

    // DATASET DIFF (data versioning): two versions of a table compared
    // by key — rows added, removed, changed (same key, different content
    // hash), unchanged — via ONE full outer join, the audit that pairs
    // with pipe_dataset_fingerprint when the fingerprints disagree.
    Q("pipe_dataset_diff",
      (s, d) => {
        def rowHash(st: org.apache.spark.sql.Column) =
          Portable.stableHash64(concat_ws("|", col("o_custkey"), st))
        val v1 = table(s, d, "orders")
          .select(col("o_orderkey"), rowHash(col("o_orderstatus")).as("h1"))
        val v2 = table(s, d, "orders")
          .filter(col("o_orderkey") % 101 =!= 0) // removed rows
          .select(
            col("o_orderkey"),
            rowHash(when(col("o_orderkey") % 97 === 0, lit("X"))
              .otherwise(col("o_orderstatus"))).as("h2")) // changed rows
          .unionAll(table(s, d, "orders").filter(col("o_orderkey") <= 5)
            .select((col("o_orderkey") + 9000000).as("o_orderkey"),
              rowHash(col("o_orderstatus")).as("h2"))) // added rows
        v1.join(v2, Seq("o_orderkey"), "full_outer")
          .select(when(col("h1").isNull, lit("added"))
            .when(col("h2").isNull, lit("removed"))
            .when(col("h1") === col("h2"), lit("unchanged"))
            .otherwise(lit("changed")).as("kind"))
          .groupBy(col("kind")).agg(count(lit(1)).as("n"))
      },
      Some(sql("""SELECT 'added' AS kind, count(*) AS n FROM orders
                  WHERE o_orderkey <= 5
                  UNION ALL
                  SELECT 'removed', count(*) FROM orders WHERE o_orderkey % 101 = 0
                  UNION ALL
                  SELECT 'changed', count(*) FROM orders
                  WHERE o_orderkey % 101 <> 0 AND o_orderkey % 97 = 0
                  UNION ALL
                  SELECT 'unchanged', count(*) FROM orders
                  WHERE o_orderkey % 101 <> 0 AND o_orderkey % 97 <> 0"""))),

    // EVENT-SEQUENCE DIAGNOSTICS (the telemetry-quality report behind
    // every sessionization job): per user, ordered by (ts, event_id),
    // the inter-event gaps — count, the largest gap, and how many gaps
    // exceed one hour. A per-user lag window; gap arithmetic in exact
    // microseconds.
    Q("pipe_sequence_gaps",
      (s, d) => {
        graft.Engine.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            max(col("gap_us")).as("max_gap_us"),
            sum(when(col("gap_us") > 3600L * 1000000, 1L).otherwise(0L)).as("n_gaps_1h"))
      },
      Some(sql("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
                  g AS (SELECT user_id,
                          us - lag(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap_us
                        FROM e)
                  SELECT user_id, count(*) AS n_events,
                    CAST(max(gap_us) AS BIGINT) AS max_gap_us,
                    CAST(sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_gaps_1h
                  FROM g GROUP BY user_id"""))),

    // GAINS / LIFT DECILES (the targeting report next to ROC): rows
    // ranked by score into 10 equal-count deciles (unique-key tiebreak
    // keeps ntile deterministic), cumulative positives per decile, and
    // integer-scaled cumulative capture rate.
    //
    // r17 (WindowContract census finding): the old form ran a GLOBAL
    // ntile(10) — an unpartitioned corpus-growing window that funnels
    // the whole scored table through ONE task at 100 TB. Exact ntile is
    // a pure function of (global rank, N), so the rewrite derives the
    // rank DISTRIBUTED (the sort_global lazy-rank machinery: cached
    // range-sorted snapshot, per-partition local index, data-derived
    // partition heads, broadcast offsets) and computes Spark's ntile
    // bucketing closed-form: the first N%10 buckets carry ⌈N/10⌉ rows,
    // the rest ⌊N/10⌋. The oracle still runs the verbatim ntile(10) —
    // the driver hash-compare is the equivalence proof. The only
    // unpartitioned windows left are DOMAIN-bounded: the ≤#partitions
    // heads-offset fold and the 10-row decile cumulative.
    Q("ml_gains_deciles",
      (s, d) => {
        import s.implicits._
        val sorted = table(s, d, "orders")
          // o_orderkey is the fixture's PRIMARY KEY (non-null by TPC-H
          // construction — the same guarantee every FK join row relies
          // on); o_totalprice gets a defensive coalesce anyway (r17
          // ADVICE): the primitive tuple encoder below cannot carry a
          // NULL, and MinValue keeps a hypothetical NULL price sorting
          // LAST under desc — where both engines' NULLS-LAST default
          // would place it in the verbatim ntile ordering.
          // CAVEAT (r18 ADVICE): the coalesce keeps the RANK consistent
          // but substitutes a concrete VALUE where the oracle would
          // carry NULL — this row never exposes o_totalprice in its
          // output (only the decile aggregates), which is what makes
          // the guard sound; if a future edit ever projects the
          // coalesced price directly, spell the SAME
          // coalesce(o_totalprice, -1.7976931348623157e308) in the
          // oracle SQL or the legs diverge on that value.
          .select(col("o_orderkey"),
            coalesce(col("o_totalprice"), lit(Double.MinValue)).as("o_totalprice"),
            // coalesce: a NULL status is a non-positive (the oracle's
            // CASE ... ELSE 0), and the primitive tuple encoder below
            // cannot carry a NULL long
            coalesce((col("o_orderstatus") === lit("F")).cast("long"), lit(0L))
              .as("pos"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .persist()
        val local = sorted.as[(Long, Double, Long)].mapPartitions { it =>
          val buf = it.buffered
          if (!buf.hasNext) Iterator.empty
          else {
            val (hk, hp, _) = buf.head
            buf.zipWithIndex.map { case ((k, v, pz), i) => (k, v, pz, hk, hp, i + 1L) }
          }
        }.toDF("o_orderkey", "o_totalprice", "pos", "hk", "hp", "p")
        val w = Window.orderBy(col("hp").desc, col("hk").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = local.groupBy("hk", "hp").agg(count(lit(1)).as("cnt"))
          .select(col("hk").as("ohk"),
            coalesce(sum(col("cnt")).over(w), lit(0L)).as("off"))
        val tot = broadcast(sorted.agg(count(lit(1)).as("n_tot"),
          sum(col("pos")).as("tot_p")))
        val ranked = local.join(broadcast(offs), col("hk") === col("ohk"))
          .select(col("pos"), (col("off") + col("p")).as("rn"))
          .crossJoin(tot)
        // Spark ntile(10): bs = ⌊N/10⌋, m = N%10; ranks ≤ m·(bs+1) fall
        // in the first m (bs+1)-sized buckets, the rest in bs-sized ones.
        // DIV, not / — Column./ on longs is DOUBLE division. The bs=0
        // corner (N<10) never reaches the ELSE branch: m·(bs+1)=N covers
        // every rank.
        val scored = ranked
          .withColumn("bs", expr("n_tot DIV 10"))
          .withColumn("m", col("n_tot") % 10)
          .withColumn("decile", expr(
            "CAST(CASE WHEN rn <= m * (bs + 1) THEN (rn - 1) DIV (bs + 1) + 1 " +
              "ELSE m + (rn - 1 - m * (bs + 1)) DIV bs + 1 END AS BIGINT)"))
        val byDecile = scored.groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
        byDecile
          .withColumn("cum_p", sum(col("p")).over(Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot.select(col("tot_p"))))
          .select(col("decile"), col("n"), col("p"), col("cum_p"),
            expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * cum_p / tot_p) AS BIGINT)")
              .as("capture_micro"))
      },
      Some(sql("""WITH scored AS (SELECT o_orderkey,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
                    ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
                  FROM orders),
                g AS (SELECT decile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS p
                      FROM scored GROUP BY decile),
                c AS (SELECT decile, n, p,
                        CAST(sum(p) OVER (ORDER BY decile) AS BIGINT) AS cum_p
                      FROM g),
                tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tot_p FROM scored)
                SELECT decile, n, p, cum_p,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * cum_p / tot_p) AS BIGINT)
                    AS capture_micro
                FROM c CROSS JOIN tot"""))),

    // BATCH SESSIONIZATION — the gaps-and-islands assignment behind
    // every behavioural funnel: a new session starts at the first event
    // or after a >30-minute silence; session ids are the running count
    // of session starts per user. One shuffle (partition by user), all
    // arithmetic in exact microseconds; the streaming siblings are
    // stream_session / stream_session_dynamic, this is the
    // backfill-over-history form.
    Q("pipe_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        table(s, d, "events")
          .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
          .withColumn("new_s",
            when(lag(col("us"), 1).over(w).isNull
              || col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_seq", sum(col("new_s")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(count(lit(1)).as("n_events"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
      },
      Some(sql("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
                  m AS (SELECT user_id, us,
                          CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                                 OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                    > 1800000000
                               THEN 1 ELSE 0 END AS new_s
                        FROM e),
                  x AS (SELECT user_id, us,
                          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT)
                            AS session_seq
                        FROM m)
                  SELECT user_id, session_seq, count(*) AS n_events,
                    max(us) - min(us) AS dur_us
                  FROM x GROUP BY user_id, session_seq"""))),

    // BLOOM PREFILTER DEDUP — the two-tier membership gate a streaming
    // ingest uses against a 100 TB seen-corpus: a bloom filter of the
    // corpus text-hashes broadcasts to the new batch; only MAYBE-seen
    // docs (a small superset, one-sided error) pay the exact anti-join.
    // The declared output proves both tiers: the bloom admits every
    // true duplicate (zero false negatives — the safety contract) and
    // the exact tier lands on the true duplicate set; the maybe-set
    // size is reported as data (false positives cost only re-checks,
    // never lost docs). Built via stat.bloomFilter (the
    // DataFrameStatFunctions sketch the reference era shipped).
    Q("pipe_bloom_prefilter",
      (s, d) => {
        val sq = s; import sq.implicits._
        val docs = table(s, d, "documents")
          .select(col("doc_id"), xxhash64(col("text")).as("h"))
        // "corpus" = even doc_ids; "new batch" = odd doc_ids (duplicate
        // texts across the split are the true dups to catch)
        val corpus = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
        // size the filter from the ACTUAL corpus cardinality — a fixed
        // expectedNumItems overloads the bloom as the corpus grows
        // (r15: hardcoded 1000 blew the FP rate past the bound at
        // sf0.1's ~5k corpus — the exact fragility this row exists to
        // catch; at 100 TB the seen-corpus count is pipeline-maintained
        // state, so the one count() here stands in for a lookup)
        val bloom = corpus.stat.bloomFilter("h", math.max(corpus.count(), 1000L), 0.03)
        val bcast = s.sparkContext.broadcast(bloom)
        val might = udf((h: Long) => bcast.value.mightContain(h))
        val maybe = batch.filter(might(col("h")))
        val trueDup = batch.join(corpus.select(col("h")).distinct(), Seq("h"), "left_semi")
        val missed = trueDup.join(maybe.select(col("doc_id")), Seq("doc_id"), "left_anti")
        // n_maybe itself is bloom-layout-dependent (false positives), so
        // the oracled columns are the CONTRACT: every true dup admitted
        // (zero false negatives), maybe ⊇ dup, and the FP overhead
        // bounded well above the 3% design point
        maybe.agg(count(lit(1)).as("nm"))
          .crossJoin(trueDup.agg(count(lit(1)).as("n_true_dup")))
          .crossJoin(batch.agg(count(lit(1)).as("nb")))
          .crossJoin(missed.agg((count(lit(1)) === 0).as("no_false_negatives")))
          .select(col("n_true_dup"), col("no_false_negatives"),
            (col("nm") >= col("n_true_dup")).as("maybe_is_superset"),
            (col("nm") <= col("n_true_dup")
              + ceil((col("nb") - col("n_true_dup")) * 0.10).cast("long"))
              .as("fp_overhead_bounded"))
      },
      Some(sql("""WITH c AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
                  b AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)
                  SELECT (SELECT CAST(count(*) AS BIGINT) FROM b
                          WHERE text IN (SELECT text FROM c)) AS n_true_dup,
                         TRUE AS no_false_negatives,
                         TRUE AS maybe_is_superset,
                         TRUE AS fp_overhead_bounded"""))),

    // CONSISTENT (hash-rank) SAMPLING — the reproducible fixed-size
    // sample: the k docs with the SMALLEST Portable.stableHash64(doc_id)
    // ranks. No seed state, no reservoir: re-running over a GROWN
    // corpus keeps already-sampled docs unless displaced by new smaller
    // ranks — the stable eval-set selection. graft_topk bounded heap on
    // the negated rank (O(k) partial state, no global sort); the shared
    // md5-based hash makes the selection EXACTLY oracle-checkable. The
    // rank is folded to 52 bits so the heap's DOUBLE score stays exact.
    Q("pipe_consistent_sample",
      (s, d) => {
        val k = 25
        table(s, d, "documents")
          .select(col("doc_id"),
            (Portable.stableHash64(col("doc_id")) % 4503599627370496L).as("hr"))
          .groupBy()
          .agg(expr(s"graft_topk(CAST(-hr AS DOUBLE), doc_id, $k)").as("top"))
          .select(posexplode(col("top")))
          .select(col("col.id").as("doc_id"),
            (-col("col.score")).cast("long").as("hr"),
            (col("pos") + 1).cast("long").as("rk"))
      },
      Some(sql(s"""SELECT doc_id, hr,
                     CAST(row_number() OVER (ORDER BY hr, doc_id) AS BIGINT) AS rk
                   FROM (SELECT doc_id,
                           ${Portable.stableHash64Sql("doc_id")} % 4503599627370496 AS hr
                         FROM documents ORDER BY hr, doc_id LIMIT 25) t"""))),

    // RECENCY-DECAY SAMPLE WEIGHTS — fresher data counts more: weight =
    // exp(−age/τ) with age in exact days from the corpus max timestamp
    // (broadcast 1-row), τ = 7 days. Per-user decayed engagement mass,
    // half-up micro-scaled at the end (exp is transcendental — the two
    // engines' libm may differ by an ULP, so bare floor's integer
    // knife-edge is the r15 kaplan-meier class; +0.5 moves it to
    // half-steps).
    Q("pipe_decay_weights",
      (s, d) => {
        val mx = table(s, d, "events").agg(max(unix_micros(col("ts"))).as("mx"))
        table(s, d, "events")
          .crossJoin(broadcast(mx))
          .select(col("user_id"),
            ((col("mx") - unix_micros(col("ts"))) / lit(86400000000.0)).as("age_d"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(floor(1000000.0 * sum(exp(-age_d / 7.0)) / count(*) + 0.5) AS BIGINT)")
              .as("mean_decay_micro"))
      },
      Some(sql("""WITH mx AS (SELECT max(epoch_us(ts)) AS mx FROM events),
                  a AS (SELECT user_id,
                          (mx - epoch_us(ts)) / 86400000000.0 AS age_d
                        FROM events CROSS JOIN mx)
                  SELECT user_id, count(*) AS n,
                    CAST(floor(1000000.0 * sum(exp(-age_d / 7.0)) / count(*) + 0.5) AS BIGINT)
                      AS mean_decay_micro
                  FROM a GROUP BY user_id"""))),

    // COHORT RETENTION TRIANGLE — users grouped by first-activity week,
    // tracked by weeks-since-cohort: the activation/stickiness readout
    // behind every growth dashboard. Two aggregations (first-week per
    // user, then distinct actives per cohort×offset) + a broadcast
    // cohort-size join; retention integer-scaled.
    Q("pipe_cohort_retention",
      (s, d) => {
        val weeks = table(s, d, "events")
          .select(col("user_id"),
            floor(unix_micros(col("ts")) / 604800000000.0).cast("long").as("w"))
        val cohorts = weeks.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
        val sizes = cohorts.groupBy(col("cw")).agg(countDistinct(col("user_id")).as("n_cohort"))
        weeks.join(cohorts, Seq("user_id"))
          .groupBy(col("cw"), (col("w") - col("cw")).as("offset_w"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(sizes), Seq("cw"))
          .select(col("cw"), col("offset_w"), col("n_active"), col("n_cohort"),
            expr("CAST(floor(1000000.0 * n_active / n_cohort) AS BIGINT)")
              .as("retention_micro"))
      },
      Some(sql("""WITH wk AS (SELECT user_id,
                      CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT) AS w
                    FROM events),
                  ch AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id),
                  sz AS (SELECT cw, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
                         FROM ch GROUP BY cw),
                  act AS (SELECT ch.cw, wk.w - ch.cw AS offset_w,
                            CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_active
                          FROM wk JOIN ch USING (user_id)
                          GROUP BY 1, 2)
                  SELECT act.cw, offset_w, n_active, n_cohort,
                    CAST(floor(1000000.0 * n_active / n_cohort) AS BIGINT)
                      AS retention_micro
                  FROM act JOIN sz ON act.cw = sz.cw"""))),

    // KAPLAN-MEIER SURVIVAL — per-user observation = hours from first
    // to last event (duration bucket), "event observed" = the user ever
    // purchased (others are censored at their last activity). S(t) =
    // Π(1 − d_i/n_i) over the ordered duration grid, computed in the
    // log domain (exp of a cumulative ln sum — the partial-aggregable
    // product again) over the BOUNDED bucket grid; micro-scaled.
    Q("ml_kaplan_meier",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val obs = table(s, d, "events")
          .groupBy(col("user_id"))
          .agg(floor((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
              / 86400000000.0).cast("long").as("t"),
            max(when(col("event_type") === lit("purchase"), 1L).otherwise(0L)).as("ev"))
        val grid = obs.groupBy(col("t"))
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("c"))
        val w = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withRisk = grid
          .crossJoin(broadcast(obs.agg(count(lit(1)).as("n_total"))))
          .select(col("t"), col("d"),
            (col("n_total") - sum(col("c")).over(w) + col("c")).as("n_risk"))
        // half-up micro-scaling (floor(x·1e6 + 0.5), spelled identically
        // in the oracle): floor alone puts the discretization knife-edge
        // AT integer micros, exactly where decimal-nice survival values
        // land — at sf0.1 the t=428 product is precisely 0.654000 and a
        // 1-ULP exp/ln difference between the JVM and DuckDB flipped
        // floor to 653999 (r15 sf0.1 sweep). Half-up moves the edge to
        // half-steps, the middle of the cell for such values.
        withRisk
          .select(col("t"), col("d"), col("n_risk"),
            expr("""CAST(floor(1000000.0 * exp(sum(ln(greatest(1e-300, 1.0 - CAST(d AS DOUBLE) / n_risk)))
                    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) + 0.5) AS BIGINT)""")
              .as("survival_micro"))
          .filter(col("d") > 0)
      },
      Some(sql("""WITH obs AS (SELECT user_id,
                      CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS t,
                      CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ev
                    FROM events GROUP BY user_id),
                  grid AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS c
                           FROM obs GROUP BY t),
                  tot AS (SELECT count(*) AS n_total FROM obs),
                  risk AS (SELECT t, d,
                      n_total - CAST(sum(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) + c AS n_risk
                    FROM grid CROSS JOIN tot)
                  SELECT t, d, n_risk,
                    CAST(floor(1000000.0 * exp(sum(ln(greatest(1e-300, 1.0 - CAST(d AS DOUBLE) / n_risk)))
                      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) + 0.5) AS BIGINT)
                      AS survival_micro
                  FROM risk WHERE d > 0"""))),

    // ORDERED FUNNEL — view → click → purchase with the ORDER enforced
    // (a purchase only counts if it follows the user's first click,
    // which follows their first view): per-step user counts and
    // step-to-step conversion. One grouped aggregate computing the
    // three first-times, order checked in the projection — no joins,
    // no windows.
    Q("pipe_funnel",
      (s, d) => {
        val sq = s; import sq.implicits._
        val firsts = table(s, d, "events")
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
            min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
            min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_buy"))
          .select(
            col("t_view").isNotNull.as("s1"),
            (col("t_view").isNotNull && col("t_click") > col("t_view")).as("s2"),
            (col("t_view").isNotNull && col("t_click") > col("t_view")
              && col("t_buy") > col("t_click")).as("s3"))
        firsts.agg(
            sum(col("s1").cast("long")).as("n_view"),
            sum(col("s2").cast("long")).as("n_view_click"),
            sum(col("s3").cast("long")).as("n_full_funnel"))
          .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
            expr("CAST(floor(1000000.0 * n_view_click / n_view) AS BIGINT)")
              .as("conv1_micro"),
            expr("CAST(floor(1000000.0 * n_full_funnel / n_view_click) AS BIGINT)")
              .as("conv2_micro"))
      },
      Some(sql("""WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
                      min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
                      min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tb
                    FROM events GROUP BY user_id),
                  s AS (SELECT
                      CAST(sum(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                      CAST(sum(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view_click,
                      CAST(sum(CASE WHEN tv IS NOT NULL AND tc > tv AND tb > tc
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
                    FROM f)
                  SELECT n_view, n_view_click, n_full_funnel,
                    CAST(floor(1000000.0 * n_view_click / n_view) AS BIGINT) AS conv1_micro,
                    CAST(floor(1000000.0 * n_full_funnel / n_view_click) AS BIGINT) AS conv2_micro
                  FROM s"""))),

    // ROLLING Z-SCORE anomaly flags — hourly event volume scored
    // against its own trailing 24-hour mean/stddev; |z| > 3 flags the
    // hour. Window aggregates evaluate in frame order on both engines,
    // so the stddev agrees at round-4; the grid is the bounded hour
    // spine.
    Q("win_rolling_zscore",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = table(s, d, "events")
          .groupBy(floor(unix_micros(col("ts")) / 3600000000.0).cast("long").as("h"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("h")).rowsBetween(-24, -1)
        hourly.select(col("h"), col("n"),
            round(avg(col("n")).over(w), 4).as("mu"),
            round(stddev_samp(col("n")).over(w), 4).as("sigma"))
          .withColumn("is_anomaly",
            col("sigma") > 0 && abs(col("n") - col("mu")) > col("sigma") * 3)
          .filter(col("mu").isNotNull)
      },
      Some(sql("""WITH hourly AS (SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
                      count(*) AS n
                    FROM events GROUP BY 1),
                  r AS (SELECT h, n,
                      round(avg(n) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 4) AS mu,
                      round(stddev_samp(n) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 4) AS sigma
                    FROM hourly)
                  SELECT h, n, mu, sigma,
                    sigma > 0 AND abs(n - mu) > sigma * 3 AS is_anomaly
                  FROM r WHERE mu IS NOT NULL"""))),

    // MARKOV TRANSITION MATRIX over per-user event sequences: P(next |
    // current) from lag-pairs (ties broken by event_id so the sequence
    // is total-ordered), plus the argmax next-state prediction per
    // from-state — the first-order behavioural model behind
    // next-action features. State space is the event-type domain
    // (bounded); one window + one aggregate.
    Q("pipe_markov_next_event",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = table(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val tot = pairs.groupBy(col("event_type")).agg(sum(col("n")).as("n_from"))
        pairs.join(broadcast(tot), Seq("event_type"))
          .select(col("event_type"), col("next_type"), col("n"),
            expr("CAST(floor(1000000.0 * n / n_from) AS BIGINT)").as("p_micro"))
      },
      Some(sql("""WITH seq AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_type
                    FROM events),
                  p AS (SELECT event_type, next_type, count(*) AS n
                        FROM seq WHERE next_type IS NOT NULL
                        GROUP BY 1, 2),
                  t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_from
                        FROM p GROUP BY 1)
                  SELECT p.event_type, next_type, CAST(n AS BIGINT) AS n,
                    CAST(floor(1000000.0 * n / n_from) AS BIGINT) AS p_micro
                  FROM p JOIN t ON p.event_type = t.event_type"""))),

    // LENGTH-BUCKETED BATCH ASSIGNMENT — the LLM data-loader step that
    // packs similarly-sized documents into token-budget batches (long
    // docs padded against short ones waste FLOPs): within each source
    // shard, docs sort by token count (desc, id tiebreak), batch id =
    // running-token-total DIV budget. Partitioned by source (the prod
    // within-shard pattern — parallelism grows with shard count); the
    // per-batch report pins sizes and the padding-waste ratio.
    Q("pipe_length_batching",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 2000L
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_tok").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, d, "documents")
          .select(col("source"), col("doc_id"),
            size(T.tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("batch",
            floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget.toDouble)
              .cast("long"))
          .groupBy(col("source"), col("batch"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
            max(col("n_tok")).as("max_tok"),
            expr("""CAST(floor(1000000.0 * (max(n_tok) * count(*) - sum(n_tok))
                    / (max(n_tok) * count(*))) AS BIGINT)""").as("pad_waste_micro"))
      },
      Some(sql(s"""WITH t AS (SELECT source, doc_id,
                       CAST(len(${T.tokensSql("text")}) AS BIGINT) AS n_tok
                     FROM documents),
                   a AS (SELECT source, doc_id, n_tok,
                       CAST(floor((sum(n_tok) OVER (PARTITION BY source
                           ORDER BY n_tok DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tok) / 2000.0) AS BIGINT)
                         AS batch
                     FROM t)
                   SELECT source, batch, count(*) AS n_docs,
                     CAST(sum(n_tok) AS BIGINT) AS tokens,
                     CAST(max(n_tok) AS BIGINT) AS max_tok,
                     CAST(floor(1000000.0 * (max(n_tok) * count(*) - sum(n_tok))
                       / (max(n_tok) * count(*))) AS BIGINT) AS pad_waste_micro
                   FROM a GROUP BY source, batch"""))),

    // DETERMINISTIC NEGATIVE SAMPLING — contrastive-training prep: for
    // each user with purchases, keep their k=3 hash-top non-purchase
    // events as negatives (graft_topk bounded heap per user — no
    // per-user window over the event log), plus the positive count.
    // The 52-bit hash fold keeps the heap's double score exact, so the
    // selection is element-for-element oracle-checked.
    Q("pipe_negative_sampling",
      (s, d) => {
        val ev = table(s, d, "events")
        val pos = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_pos"))
        val negs = ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_id"),
            (-pmod(Portable.stableHash64(col("event_id")), lit(1L << 50))
              .cast("double")).as("nh"))
          .groupBy(col("user_id"))
          .agg(expr("graft_topk(nh, event_id, 3)").as("top"))
          .select(col("user_id"),
            Registry.arrStr(transform(col("top"), x => x.getField("id")))
              .as("neg_ids"))
        pos.join(negs, Seq("user_id"))
      },
      Some(sql(s"""WITH pos AS (SELECT user_id, count(*) AS n_pos
                      FROM events WHERE event_type = 'purchase'
                      GROUP BY user_id),
                   n AS (SELECT user_id, event_id,
                       (${Portable.stableHash64Sql("event_id")} % ${1L << 50}) AS hv
                     FROM events WHERE event_type <> 'purchase'),
                   r AS (SELECT user_id, event_id,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY hv ASC, event_id ASC) AS rk
                     FROM n),
                   sel AS (SELECT user_id,
                       array_to_string(list(CAST(event_id AS VARCHAR)
                         ORDER BY rk), '|') AS neg_ids
                     FROM r WHERE rk <= 3 GROUP BY user_id)
                   SELECT pos.user_id, n_pos, neg_ids
                   FROM pos JOIN sel ON pos.user_id = sel.user_id""")))
  )
}
