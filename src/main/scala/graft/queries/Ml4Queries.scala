package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 4 — the reference's FEATURE TRANSFORMERS
  * (mllib/.../feature/HashingTF.scala, Normalizer.scala,
  * ChiSqSelector.scala), the remaining CLUSTERING shapes
  * (clustering/PowerIterationClustering.scala, StreamingKMeans.scala),
  * and the regularized/iterative REGRESSION steps
  * (regression/RidgeRegression.scala, classification/
  * LogisticRegression.scala via optimization/GradientDescent.scala).
  *
  * Exactness contract: every cross-row statistic is an exact integer
  * sum — real-valued inputs are quantized first (round(x·scale) as
  * BIGINT, engine-consistent; see Ml3Queries) — and IEEE double math
  * happens only AFTER aggregation, as the identical expression on both
  * engines. Scale posture: each query is one or two partial-aggregated
  * passes plus broadcast joins of K-row model tables.
  */
object Ml4Queries {

  val all: Seq[Q] = Seq(

    // Hashing trick term frequencies (mllib/.../feature/HashingTF.scala):
    // term → bucket via a deterministic arithmetic hash (first-char code
    // × 31 + length, mod 16 — expressible identically in both engines,
    // collisions and all, which is the point of the trick), then tf
    // counts per (doc, bucket). Tokens are guarded to ASCII-leading
    // (ascii(t) BETWEEN 1 AND 127): for a multibyte-leading token the
    // engines' ascii() may disagree (codepoint vs byte), but under EITHER
    // semantics such tokens fall outside 1..127 and are filtered the same
    // way, so the hash input set is engine-identical by construction.
    // One scan + one partial-agg; the sparse (doc_id, bucket, tf) triples
    // ARE the feature vectors.
    Q("ml_hashing_tf",
      (s, d) => {
        table(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) > 0 && ascii(col("t")).between(1, 127))
          .groupBy(col("doc_id"),
            ((ascii(col("t")) * 31 + length(col("t"))) % 16).as("bucket"))
          .agg(count(lit(1)).as("tf"))
      },
      Some(sql("""SELECT doc_id, (ascii(t) * 31 + length(t)) % 16 AS bucket,
                    count(*) AS tf
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                        FROM documents)
                  WHERE length(t) > 0 AND ascii(t) BETWEEN 1 AND 127
                  GROUP BY 1, 2"""))),

    // L2 Normalizer (mllib/.../feature/Normalizer.scala): micro-unit
    // quantized elements make the squared norm an exact integer sum
    // (64 · (1e6)² ≈ 6.4e13 « 2^53, so the double accumulation is exact
    // and order-independent); the unit vector is rendered through the
    // arrDecStr round-then-DECIMAL contract. An all-zero embedding is
    // guarded by nullif(norm2, 0) on BOTH engines — the unit vector and
    // norm come out NULL instead of Inf/NaN on one side and a DECIMAL
    // cast error on the other. Pure per-row expression chain — no
    // shuffle at any scale.
    Q("ml_normalizer",
      (s, d) => {
        val q = transform(col("embedding"), x => round(x.cast("double") * 1e6))
        val norm2 = nullif(aggregate(q, lit(0.0), (a, x) => a + x * x), lit(0.0))
        table(s, d, "embeddings")
          .select(col("vec_id"), q.as("q"), norm2.as("norm2"))
          .select(col("vec_id"),
            round(sqrt(col("norm2")) / 1e6, 6).as("l2_norm"),
            array_join(transform(col("q"),
              x => round(x / sqrt(col("norm2")), 6).cast("decimal(18,6)").cast("string")),
              "|").as("unit"))
      },
      Some(sql("""WITH qx AS (SELECT vec_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1e6)) AS q
                    FROM embeddings),
                  n AS (SELECT vec_id, q,
                      nullif(list_sum(list_transform(q, x -> x * x)), 0) AS norm2 FROM qx)
                  SELECT vec_id,
                    round(sqrt(norm2) / 1e6, 6) AS l2_norm,
                    array_to_string(list_transform(q,
                      x -> CAST(CAST(round(x / sqrt(norm2), 6) AS DECIMAL(18,6)) AS VARCHAR)),
                      '|') AS unit
                  FROM n"""))),

    // Chi-squared feature selection (mllib/.../feature/ChiSqSelector
    // .scala): feature = source (present/absent), label = lang. The full
    // lang×source grid (including zero cells — they DO contribute to the
    // statistic) comes from a crossJoin of the two small marginal tables
    // with the observed cells left-joined in; each cell's (O−E)²/E terms
    // are rounded to the DECIMAL(18,6) grid and then summed EXACTLY, so
    // per-source χ² is deterministic. Top-3 selection is a broadcast
    // 20-row self-join count (rank without a global window).
    Q("ml_chi2_select",
      (s, d) => {
        val docs = table(s, d, "documents")
        val cells = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
        val rt = docs.groupBy(col("lang")).agg(count(lit(1)).as("rt"))
        val ct = docs.groupBy(col("source")).agg(count(lit(1)).as("ct"))
        val n = docs.agg(count(lit(1)).as("n"))
        val grid = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
          .join(cells, Seq("lang", "source"), "left")
          .withColumn("o", coalesce(col("c"), lit(0L)))
        val e1 = col("rt") * col("ct") / col("n")
        val e0 = col("rt") * (col("n") - col("ct")) / col("n")
        val term = (col("o") - e1) * (col("o") - e1) / e1 +
          (col("rt") - col("o") - e0) * (col("rt") - col("o") - e0) / e0
        val chi = grid
          .groupBy(col("source"))
          .agg(sum(round(term, 6).cast("decimal(18,6)")).cast("double").as("chi2"))
        val rk = chi.select(col("source").as("s2"), col("chi2").as("chi2_b"))
        chi.join(broadcast(rk),
            col("chi2_b") > col("chi2") ||
              (col("chi2_b") === col("chi2") && col("s2") < col("source")),
            "left")
          .groupBy(col("source"), col("chi2"))
          .agg(count(col("s2")).as("n_above"))
          .select(col("source"), col("chi2"), (col("n_above") < 3).as("selected"))
      },
      Some(sql("""WITH cells AS (SELECT lang, source, count(*) AS c
                    FROM documents GROUP BY 1, 2),
                  rt AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
                  ct AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
                  n AS (SELECT count(*) AS n FROM documents),
                  grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct, n.n,
                      coalesce(cells.c, 0) AS o
                    FROM rt CROSS JOIN ct CROSS JOIN n
                    LEFT JOIN cells ON cells.lang = rt.lang AND cells.source = ct.source),
                  chi AS (SELECT source,
                      CAST(sum(CAST(round(
                        (o - rt*ct/n) * (o - rt*ct/n) / (rt*ct/n)
                        + (rt - o - rt*(n-ct)/n) * (rt - o - rt*(n-ct)/n) / (rt*(n-ct)/n),
                        6) AS DECIMAL(18,6))) AS DOUBLE) AS chi2
                    FROM grid GROUP BY 1)
                  SELECT a.source, a.chi2,
                    count(b.source) FILTER (WHERE b.chi2 > a.chi2
                      OR (b.chi2 = a.chi2 AND b.source < a.source)) < 3 AS selected
                  FROM chi a LEFT JOIN chi b ON TRUE
                  GROUP BY 1, 2"""))),

    // One power-iteration step (mllib/.../clustering/PowerIteration
    // Clustering.scala): affinity A(i,j) = lineitem co-occurrence counts
    // on 25×25 nodes, v0 = D/vol (PIC's degree initialization), one step
    // of the row-normalized multiply v1 = D⁻¹·A·v0. The matrix-vector
    // product is a join on j + partial-agg sum — integer-exact numerator
    // Σⱼ A(i,j)·D(j), one final division. At any scale this is the
    // aggregateMessages shape: shuffle edges once, reduce by dst.
    Q("ml_power_iteration",
      (s, d) => {
        val a = table(s, d, "lineitem")
          .groupBy((col("l_suppkey") % 25).as("i"), (col("l_partkey") % 25).as("j"))
          .agg(count(lit(1)).as("a"))
        val deg = a.groupBy(col("i")).agg(sum(col("a")).as("d"))
        val vol = deg.agg(sum(col("d")).as("vol"))
        val num = a
          .join(broadcast(deg.select(col("i").as("j"), col("d").as("dj"))), Seq("j"))
          .groupBy(col("i")).agg(sum(col("a") * col("dj")).as("num"))
        num.join(broadcast(deg), Seq("i")).crossJoin(broadcast(vol))
          .select(col("i"), col("d"),
            round(col("num").cast("double") / (col("d") * col("vol")), 9).as("v1"))
      },
      Some(sql("""WITH a AS (SELECT l_suppkey % 25 AS i, l_partkey % 25 AS j,
                      count(*) AS a FROM lineitem GROUP BY 1, 2),
                  deg AS (SELECT i, CAST(sum(a) AS BIGINT) AS d FROM a GROUP BY 1),
                  vol AS (SELECT sum(d) AS vol FROM deg),
                  num AS (SELECT a.i, sum(a.a * dj.d) AS num
                    FROM a JOIN deg dj ON a.j = dj.i GROUP BY 1)
                  SELECT num.i, deg.d,
                    round(CAST(num AS DOUBLE) / (deg.d * vol.vol), 9) AS v1
                  FROM num JOIN deg ON num.i = deg.i CROSS JOIN vol"""))),

    // StreamingKMeans decay update (mllib/.../clustering/StreamingKMeans
    // .scala update rule): 1-D features x = o_totalprice against 4 fixed
    // centroids c_k = 50k·(k+1) with prior weight n=100 and decay α=0.9:
    // c' = (c·n·α + Σ_batch x)/(n·α + m). Nearest-centroid assignment in
    // 1-D is the midpoint CASE (deterministic in both engines); batch
    // sums are exact micro-unit integers.
    Q("ml_streaming_kmeans_update",
      (s, d) => {
        val x = col("o_totalprice")
        val k = when(x < 75000, 0).when(x < 125000, 1).when(x < 175000, 2).otherwise(3)
        table(s, d, "orders")
          .select(k.cast("long").as("k"), round(x * 1e6).cast("long").as("xq"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("m"), sum(col("xq")).as("sq"))
          .select(col("k"), (lit(50000.0) * (col("k") + 1)).as("c_old"), col("m"),
            round((lit(50000.0) * (col("k") + 1) * 90.0 * 1e6 + col("sq").cast("double"))
              / ((lit(90.0) + col("m")) * 1e6), 6).as("c_new"))
      },
      Some(sql("""WITH pts AS (SELECT
                      CASE WHEN o_totalprice < 75000 THEN 0
                           WHEN o_totalprice < 125000 THEN 1
                           WHEN o_totalprice < 175000 THEN 2 ELSE 3 END AS k,
                      CAST(round(o_totalprice * 1e6) AS BIGINT) AS xq
                    FROM orders)
                  SELECT CAST(k AS BIGINT) AS k,
                    CAST(50000.0 * (k + 1) AS DOUBLE) AS c_old,
                    count(*) AS m,
                    round((50000.0 * (k + 1) * 90.0 * 1e6 + CAST(sum(xq) AS DOUBLE))
                      / ((90.0 + count(*)) * 1e6), 6) AS c_new
                  FROM pts GROUP BY k"""))),

    // Ridge regression closed form (mllib/.../regression/RidgeRegression
    // .scala): y = l_extendedprice (cents-quantized) on x = l_quantity,
    // λ = 1, both coefficients penalized. β = (X'X + λI)⁻¹X'y via the
    // explicit 2×2 inverse — the five sufficient statistics are ONE
    // partial-agg pass of exact integers (the 100 TB shape: the model
    // solve is O(features²) driver-side math expressed as literals),
    // then identical double arithmetic on both engines.
    Q("ml_ridge",
      (s, d) => {
        val stats = table(s, d, "lineitem")
          .select(round(col("l_quantity")).cast("long").as("x"),
            round(col("l_extendedprice") * 100).cast("long").as("yc"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("yc")).as("sy"),
            sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("yc")).as("sxy"))
        val (n, sx, sy, sxx, sxy) = (col("n").cast("double"), col("sx").cast("double"),
          col("sy").cast("double"), col("sxx").cast("double"), col("sxy").cast("double"))
        val det = (n + 1.0) * (sxx + 1.0) - sx * sx
        stats.select(col("n"),
          round((((sxx + 1.0) * sy - sx * sxy) / det) / 100.0, 6).as("beta0"),
          round((((n + 1.0) * sxy - sx * sy) / det) / 100.0, 6).as("beta1"))
      },
      Some(sql("""WITH s AS (SELECT count(*) AS n,
                      sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
                      sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
                      sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS sxx,
                      sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
                    FROM lineitem)
                  SELECT n,
                    round(((CAST(sxx AS DOUBLE) + 1.0) * CAST(sy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                      / ((CAST(n AS DOUBLE) + 1.0) * (CAST(sxx AS DOUBLE) + 1.0)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6) AS beta0,
                    round(((CAST(n AS DOUBLE) + 1.0) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / ((CAST(n AS DOUBLE) + 1.0) * (CAST(sxx AS DOUBLE) + 1.0)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6) AS beta1
                  FROM s"""))),

    // One logistic-regression gradient step from β = 0 (mllib/.../
    // classification/LogisticRegression.scala via optimization/
    // GradientDescent.scala): at the zero vector σ(0) = ½ EXACTLY, so
    // the first log-likelihood gradient Σ x·(y − ½) is a rational number
    // — computed here as exact integer sums of ±x (cents-quantized),
    // halved and scaled by lr = 0.1 only at the end. The model update is
    // a 2-row table (intercept + acctbal), the per-feature partial-agg
    // shape GradientDescent's treeAggregate runs each iteration.
    Q("ml_logreg_step",
      (s, d) => {
        val c = table(s, d, "customer")
          .select((when(col("c_mktsegment") === "BUILDING", 1L).otherwise(-1L)).as("sgn"),
            round(col("c_acctbal") * 100).cast("long").as("xc"))
        val g = c.agg(sum(col("sgn")).as("g0x2"), sum(col("sgn") * col("xc")).as("g1x2"))
        g.select(lit("intercept").as("feature"),
            round(col("g0x2").cast("double") / 2.0, 6).as("grad"),
            round(col("g0x2").cast("double") / 2.0 * 0.1, 6).as("beta_new"))
          .unionAll(g.select(lit("acctbal").as("feature"),
            round(col("g1x2").cast("double") / 2.0 / 100.0, 6).as("grad"),
            round(col("g1x2").cast("double") / 2.0 / 100.0 * 0.1, 6).as("beta_new")))
      },
      Some(sql("""WITH c AS (SELECT
                      CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE -1 END AS sgn,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS xc
                    FROM customer),
                  g AS (SELECT sum(sgn) AS g0x2, sum(sgn * xc) AS g1x2 FROM c)
                  SELECT 'intercept' AS feature,
                    round(CAST(g0x2 AS DOUBLE) / 2.0, 6) AS grad,
                    round(CAST(g0x2 AS DOUBLE) / 2.0 * 0.1, 6) AS beta_new
                  FROM g
                  UNION ALL
                  SELECT 'acctbal',
                    round(CAST(g1x2 AS DOUBLE) / 2.0 / 100.0, 6),
                    round(CAST(g1x2 AS DOUBLE) / 2.0 / 100.0 * 0.1, 6)
                  FROM g""")))
  )
}
