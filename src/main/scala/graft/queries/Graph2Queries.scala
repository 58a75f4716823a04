package graft.queries

import graft.Engine.table
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.10, wave 2 — the remaining GraphX library algorithms
  * (graphx/.../lib/PageRank.scala, StronglyConnectedComponents.scala,
  * LabelPropagation.scala) plus the aggregateMessages primitive that
  * underlies all of GraphOps. Graph shapes are derived from `nation` so
  * every result stays closed-form for the DuckDB oracle:
  *
  *  - PageRank runs on a per-region STAR (leaves → min-key hub): ranks
  *    after a fixed iteration count have an exact closed form per role.
  *  - SCC runs on a per-region directed CYCLE: one SCC per region.
  *  - LabelPropagation runs on the region cliques; synchronous LPA's
  *    label choice is tie-broken by hashmap iteration order upstream, so
  *    the ORACLED contract is the deterministic invariant (the converged
  *    label is a member of the vertex's own region), not the label value.
  *
  * Scale posture: identical to GraphQueries — GraphX 2D edge partitioning
  * drives billion-edge graphs; nothing collects to the driver.
  */
object Graph2Queries {

  /** Edge count of the pagerank star graph, via the SAME derivation the
    * query uses — the bench_3x logical fence reads this at three scale
    * points (r15 verdict: the driver flagged graph_pagerank at 5.39× over
    * the 3× fixture). The graph derives from `nation` alone — 25 rows at
    * EVERY TPC-H scale factor, copied VERBATIM into the 3× fixture
    * (dimensions don't grow with the corpus) — so the count is CONSTANT:
    * the row's bench_3x ratio measures two draws of fixed scheduling
    * overhead, not scaling, which is why Bench classifies a >4.5× draw on
    * it as bench_3x_env_suspect rather than bench_3x_over. */
  def pagerankEdgeCount(s: SparkSession, d: String): Long =
    nations(s, d).filter(col("cnt") >= 2 && col("k") =!= col("hub")).count()

  /** (nation key, region, per-region min key, region size) staging frame. */
  private def nations(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("n_regionkey"))
    table(s, d, "nation")
      .select(col("n_nationkey").cast("long").as("k"), col("n_regionkey"))
      .withColumn("hub", min(col("k")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
  }

  val all: Seq[Q] = Seq(

    // Static PageRank (graphx/lib/PageRank.scala) with numIter=2,
    // resetProb=0.15 on the region star graph (every non-hub nation links
    // to its region's min-key nation; hubs are dangling). Modern GraphX
    // updates EVERY vertex each sync round (rank = 0.15 + 0.85·msgSum) and
    // normalizes final ranks to sum to the vertex count, so after 2 rounds:
    //   leaf (no in-edges): 0.15,
    //   hub (k-1 leaves):   0.15 + 0.85 · (k-1) · 0.15,
    // each scaled by N / Σ(unnormalized). The oracle encodes that closed
    // form, robust to uneven region sizes.
    Q("graph_pagerank", bench = true,
      fn = (s, d) => {
        import s.implicits._
        val edges = nations(s, d).filter(col("cnt") >= 2 && col("k") =!= col("hub"))
          .select(col("k").as("src"), col("hub").as("dst"))
          .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, 1) }
        Graph.fromEdges(edges, 0).staticPageRank(2, 0.15)
          .vertices.toDF("n_nationkey", "rank")
          .select(col("n_nationkey"), round(col("rank"), 6).as("rank"))
      },
      oracle = Some(sql("""WITH v AS (SELECT n_nationkey, hub, cnt
                    FROM (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                            min(CAST(n_nationkey AS BIGINT)) OVER (PARTITION BY n_regionkey) AS hub,
                            count(*) OVER (PARTITION BY n_regionkey) AS cnt
                          FROM nation)
                    WHERE cnt >= 2),
                  u AS (SELECT n_nationkey,
                          CASE WHEN n_nationkey = hub
                               THEN 0.15 + 0.85 * 0.15 * (cnt - 1)
                               ELSE 0.15 END AS ur FROM v),
                  s AS (SELECT sum(ur) AS total, count(*) AS n FROM u)
                  SELECT u.n_nationkey, round(u.ur * s.n / s.total, 6) AS rank
                  FROM u, s"""))),

    // StronglyConnectedComponents (graphx/lib/StronglyConnectedComponents
    // .scala) on a directed cycle per region (k1→k2→…→kn→k1): exactly one
    // SCC per region, id = min member.
    Q("graph_scc",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy(col("n_regionkey")).orderBy(col("k"))
        val edges = nations(s, d).filter(col("cnt") >= 2)
          .withColumn("nxt", lead(col("k"), 1).over(w))
          .select(col("k").as("src"), coalesce(col("nxt"), col("hub")).as("dst"))
          .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, 1) }
        Graph.fromEdges(edges, 0).stronglyConnectedComponents(10)
          .vertices.toDF("n_nationkey", "scc")
      },
      Some(sql("""SELECT n_nationkey, component AS scc FROM (
                    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                      min(CAST(n_nationkey AS BIGINT)) OVER (PARTITION BY n_regionkey) AS component,
                      count(*) OVER (PARTITION BY n_regionkey) AS k
                    FROM nation)
                  WHERE k >= 2"""))),

    // aggregateMessages (GraphOps' core primitive, graphx/Graph.scala):
    // sum of neighbor ids over the region clique — closed form is the
    // region key-sum minus the vertex's own key.
    Q("graph_aggregate_messages",
      (s, d) => {
        val g = GraphQueries.nationGraph(s, d)
        val sums = g.aggregateMessages[Long](
          ctx => { ctx.sendToDst(ctx.srcId); ctx.sendToSrc(ctx.dstId) },
          _ + _)
        s.createDataFrame(sums.map { case (v, sum) => (v, sum) })
          .toDF("n_nationkey", "neighbor_sum")
      },
      Some(sql("""SELECT n_nationkey,
                    CAST(region_sum - n_nationkey AS BIGINT) AS neighbor_sum
                  FROM (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                          sum(CAST(n_nationkey AS BIGINT)) OVER (PARTITION BY n_regionkey) AS region_sum,
                          count(*) OVER (PARTITION BY n_regionkey) AS k
                        FROM nation)
                  WHERE k >= 2"""))),

    // LabelPropagation (graphx/lib/LabelPropagation.scala), 5 synchronous
    // rounds on the region cliques. The exact converged label depends on
    // upstream tie-breaking (hashmap iteration order), so the declared
    // contract is the invariant that IS deterministic: every vertex's
    // final label is one of its own region's nation keys.
    Q("graph_label_propagation",
      (s, d) => {
        import s.implicits._
        val labels = org.apache.spark.graphx.lib.LabelPropagation
          .run(GraphQueries.nationGraph(s, d), 5)
          .vertices.toDF("n_nationkey", "label")
        val regions = nations(s, d).select(col("k"), col("n_regionkey"))
        labels
          .join(regions.withColumnRenamed("k", "n_nationkey")
            .withColumnRenamed("n_regionkey", "own_region"), Seq("n_nationkey"))
          .join(regions.withColumnRenamed("k", "label")
            .withColumnRenamed("n_regionkey", "label_region"), Seq("label"))
          .select(col("n_nationkey"), (col("own_region") === col("label_region")).as("label_in_region"))
      },
      Some(sql("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, TRUE AS label_in_region
                  FROM (SELECT n_nationkey,
                          count(*) OVER (PARTITION BY n_regionkey) AS k
                        FROM nation)
                  WHERE k >= 2"""))),

    // SVDPlusPlus (graphx/lib/SVDPlusPlus.scala:39) on a bipartite rating
    // graph: each nation (user, id = key) rates its region (item,
    // id = 1000+regionkey) with rating (key mod 5)+1. The latent factors
    // are randomly initialized UPSTREAM (defaultF uses an unseeded
    // Random), so the ORACLED contract is the deterministic part of the
    // trained model: the returned global mean u (exact — integer-valued
    // ratings sum exactly in double); each USER vertex's norm attribute
    // v._4 = 1/sqrt(#ratings) = 1.0 (set from the degree aggregation and
    // carried through training); and for ITEM vertices — whose v._4 the
    // final pass overwrites with the summed squared training error — the
    // invariant 0 ≤ err ≤ deg·(maxVal-minVal)², which holds for any
    // random init because predictions are clamped to [minVal, maxVal].
    Q("graph_svdpp",
      (s, d) => {
        import s.implicits._
        val ratings = table(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("u"),
            (col("n_regionkey").cast("long") + 1000L).as("i"),
            ((col("n_nationkey") % 5) + 1).cast("double").as("r"))
          .as[(Long, Long, Double)].rdd
          .map { case (u, i, r) => Edge(u, i, r) }
        val conf = new org.apache.spark.graphx.lib.SVDPlusPlus.Conf(
          2, 2, 0.0, 5.0, 0.007, 0.007, 0.005, 0.015)
        val (g, uMean) = org.apache.spark.graphx.lib.SVDPlusPlus.run(ratings, conf)
        val verts = g.vertices.map { case (vid, (_, _, _, v4)) => (vid, v4) }
          .toDF("vid", "v4")
        val items = table(s, d, "nation").groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("cnt"))
          .select((col("n_regionkey").cast("long") + 1000L).as("vid"), col("cnt"))
        verts.join(broadcast(items), Seq("vid"), "left")
          .select(col("vid"),
            when(col("cnt").isNull, abs(col("v4") - 1.0) < 1e-9)
              .otherwise(col("v4") >= 0.0 && col("v4") <= col("cnt") * 25.0)
              .as("v4_ok"),
            round(lit(uMean), 6).as("u_mean"))
      },
      Some(sql("""WITH um AS (SELECT sum((n_nationkey % 5) + 1) * 1.0 / count(*) AS u
                              FROM nation),
                  verts AS (
                    SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation
                    UNION ALL
                    SELECT DISTINCT CAST(1000 + n_regionkey AS BIGINT) AS vid FROM nation)
                  SELECT vid, TRUE AS v4_ok, round(um.u, 6) AS u_mean
                  FROM verts CROSS JOIN um"""))),

    // HITS hubs & authorities (Kleinberg 1999) — 2 UNNORMALIZED
    // iterations over the directed region-clique graph, so every score
    // is an exact integer the oracle unrolls as SQL joins. Kleinberg's
    // update order: authorities from hubs first, then hubs from the
    // UPDATED authorities, per iteration — two aggregateMessages rounds
    // per step, never a collect.
    Q("graph_hits",
      (s, d) => {
        import s.implicits._
        val edges = GraphQueries.nationEdges(s, d).as[(Long, Long)].rdd
          .map { case (a, b) => Edge(a, b, 1) }
        var g: Graph[(Long, Long), Int] = Graph.fromEdges(edges, (1L, 1L))
        for (_ <- 1 to 2) {
          val aMsg = g.aggregateMessages[Long](t => t.sendToDst(t.srcAttr._2), _ + _)
          g = g.outerJoinVertices(aMsg)((_, attr, m) => (m.getOrElse(0L), attr._2))
          val hMsg = g.aggregateMessages[Long](t => t.sendToSrc(t.dstAttr._1), _ + _)
          g = g.outerJoinVertices(hMsg)((_, attr, m) => (attr._1, m.getOrElse(0L)))
        }
        g.vertices.map { case (id, (a, h)) => (id, a, h) }
          .toDF("n_nationkey", "authority", "hub")
      },
      Some(sql("""WITH e AS (
             SELECT CAST(a.n_nationkey AS BIGINT) AS src,
                    CAST(b.n_nationkey AS BIGINT) AS dst
             FROM nation a JOIN nation b
               ON a.n_regionkey = b.n_regionkey
              AND a.n_nationkey < b.n_nationkey),
           v AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM e UNION SELECT dst FROM e)),
           a1 AS (SELECT v.k, CAST(coalesce(t.c, 0) AS BIGINT) AS a
             FROM v LEFT JOIN (SELECT dst, count(*) AS c FROM e GROUP BY 1) t
               ON t.dst = v.k),
           h1 AS (SELECT v.k, CAST(coalesce(t.s, 0) AS BIGINT) AS h
             FROM v LEFT JOIN (SELECT e.src, sum(a1.a) AS s
                               FROM e JOIN a1 ON a1.k = e.dst GROUP BY 1) t
               ON t.src = v.k),
           a2 AS (SELECT v.k, CAST(coalesce(t.s, 0) AS BIGINT) AS a
             FROM v LEFT JOIN (SELECT e.dst, sum(h1.h) AS s
                               FROM e JOIN h1 ON h1.k = e.src GROUP BY 1) t
               ON t.dst = v.k),
           h2 AS (SELECT v.k, CAST(coalesce(t.s, 0) AS BIGINT) AS h
             FROM v LEFT JOIN (SELECT e.src, sum(a2.a) AS s
                               FROM e JOIN a2 ON a2.k = e.dst GROUP BY 1) t
               ON t.src = v.k)
           SELECT v.k AS n_nationkey, a2.a AS authority, h2.h AS hub
           FROM v JOIN a2 ON a2.k = v.k JOIN h2 ON h2.k = v.k"""))),

    // K-CORE DECOMPOSITION (beyond-ref): iterative degree peeling —
    // drop every vertex with degree < k, recompute, repeat — the graph
    // summary behind community-density filters and spam-farm detection.
    // Peeling is join/agg-shaped, so it runs as declarative DataFrame
    // rounds (a Pregel vertex program would hide the plan from
    // Catalyst): each round is one degree aggregate + two left_anti
    // joins against the sub-degree vertex set, per-round results cached
    // so round r reads round r−1's materialization, not a 3^r plan
    // blow-up. 4 declared rounds over the (orderkey,partkey) mod-2003
    // co-occurrence graph shrink 2003→1383 vertices at sf0.01 — a real
    // multi-round cascade, every round's (vertices, edges) oracled
    // against DuckDB's unrolled peel.
    Q("graph_k_core",
      (s, d) => {
        val mod = 2003L
        val k = 8L
        val rounds = 4
        val base = table(s, d, "lineitem")
          .filter(col("l_quantity") < 10)
          .select((col("l_orderkey") % mod).as("x"), (col("l_partkey") % mod).as("y"))
          .filter(col("x") =!= col("y"))
          .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
          .distinct()
        def stats(r: Int, e: DataFrame) =
          e.select(explode(array(col("a"), col("b"))).as("v"))
            .agg(countDistinct(col("v")).as("n_vertices"),
              (count(lit(1)) / 2).cast("long").as("n_edges"))
            .select(lit(r.toLong).as("round"), col("n_vertices"), col("n_edges"))
        var e = base.persist()
        var out = stats(0, e)
        for (r <- 1 to rounds) {
          val bad = e.select(explode(array(col("a"), col("b"))).as("v"))
            .groupBy(col("v")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") < k).select(col("v"))
          val next = e
            .join(bad.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
            .join(bad.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
            .select(col("a"), col("b"))
            .persist()
          out = out.unionAll(stats(r, next))
          e = next
        }
        out
      },
      Some(sql("""WITH e0 AS MATERIALIZED (
                    SELECT DISTINCT least(l_orderkey % 2003, l_partkey % 2003) AS a,
                           greatest(l_orderkey % 2003, l_partkey % 2003) AS b
                    FROM lineitem
                    WHERE l_quantity < 10 AND l_orderkey % 2003 <> l_partkey % 2003),
                  b1 AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
                        GROUP BY v HAVING count(*) < 8),
                  e1 AS MATERIALIZED (SELECT * FROM e0
                        WHERE a NOT IN (SELECT v FROM b1) AND b NOT IN (SELECT v FROM b1)),
                  b2 AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
                        GROUP BY v HAVING count(*) < 8),
                  e2 AS MATERIALIZED (SELECT * FROM e1
                        WHERE a NOT IN (SELECT v FROM b2) AND b NOT IN (SELECT v FROM b2)),
                  b3 AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
                        GROUP BY v HAVING count(*) < 8),
                  e3 AS MATERIALIZED (SELECT * FROM e2
                        WHERE a NOT IN (SELECT v FROM b3) AND b NOT IN (SELECT v FROM b3)),
                  b4 AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
                        GROUP BY v HAVING count(*) < 8),
                  e4 AS MATERIALIZED (SELECT * FROM e3
                        WHERE a NOT IN (SELECT v FROM b4) AND b NOT IN (SELECT v FROM b4))
                  SELECT CAST(0 AS BIGINT) AS round, count(DISTINCT v) AS n_vertices,
                         CAST(count(*) / 2 AS BIGINT) AS n_edges
                  FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
                  UNION ALL
                  SELECT CAST(1 AS BIGINT), count(DISTINCT v), CAST(count(*) / 2 AS BIGINT)
                  FROM (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
                  UNION ALL
                  SELECT CAST(2 AS BIGINT), count(DISTINCT v), CAST(count(*) / 2 AS BIGINT)
                  FROM (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
                  UNION ALL
                  SELECT CAST(3 AS BIGINT), count(DISTINCT v), CAST(count(*) / 2 AS BIGINT)
                  FROM (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
                  UNION ALL
                  SELECT CAST(4 AS BIGINT), count(DISTINCT v), CAST(count(*) / 2 AS BIGINT)
                  FROM (SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4)"""))),

    // BIPARTITE PROJECTION (the recsys co-occurrence staple): project
    // the order—supplier bipartite graph onto supplier—supplier edges
    // weighted by shared orders, with Jaccard affinity co/(na+nb−co).
    // The self-join is keyed on the order (corpus-growing key) and the
    // per-order pair blow-up is bounded by order width (≤ 7 lineitems)
    // — never an all-pairs stage; distinct (order, supplier) first so
    // multi-line orders don't inflate weights.
    Q("graph_cooccurrence",
      (s, d) => {
        val os = table(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val deg = os.groupBy(col("sk")).agg(count(lit(1)).as("n_orders"))
        val pairs = os.as("x").join(os.as("y"), col("x.ok") === col("y.ok")
            && col("x.sk") < col("y.sk"))
          .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
          .agg(count(lit(1)).as("co"))
          .filter(col("co") >= 3)
        pairs
          .join(deg.withColumnRenamed("sk", "a").withColumnRenamed("n_orders", "na"), Seq("a"))
          .join(deg.withColumnRenamed("sk", "b").withColumnRenamed("n_orders", "nb"), Seq("b"))
          .select(col("a"), col("b"), col("co"),
            expr("CAST(floor(1000000.0 * co / (na + nb - co)) AS BIGINT)")
              .as("jaccard_micro"))
      },
      Some(sql("""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                              FROM lineitem),
                  deg AS (SELECT sk, count(*) AS n FROM os GROUP BY sk),
                  pairs AS (SELECT x.sk AS a, y.sk AS b, count(*) AS co
                            FROM os x JOIN os y
                              ON x.ok = y.ok AND x.sk < y.sk
                            GROUP BY 1, 2 HAVING count(*) >= 3)
                  SELECT a, b, CAST(co AS BIGINT) AS co,
                    CAST(floor(1000000.0 * co / (da.n + db.n - co)) AS BIGINT)
                      AS jaccard_micro
                  FROM pairs JOIN deg da ON da.sk = a JOIN deg db ON db.sk = b"""))),

    // LOCAL CLUSTERING COEFFICIENT on the supplier co-purchase graph:
    // edges are the TOP-DECILE co-occurring supplier pairs (threshold =
    // exact p90 of pair counts, derived from the data so the graph
    // stays ~10% dense at every SF — an absolute cutoff would go
    // complete as the corpus grows). Per-node cc = 2T/(deg·(deg−1)),
    // triangles enumerated once via the ordered three-way edge join;
    // the corpus-growing work is the one basket self-join bounded by
    // order width. Exact floor-1e6 integers.
    Q("graph_clustering_coeff",
      (s, d) => {
        val os = table(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val pairs = os.as("x").join(os.as("y"),
            col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
          .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
          .agg(count(lit(1)).as("co"))
        val thr = pairs.agg(expr(
          "percentile_disc(0.9) WITHIN GROUP (ORDER BY co)").as("thr"))
        val edges = pairs.crossJoin(broadcast(thr))
          .filter(col("co") >= col("thr")).select(col("a"), col("b"))
        val deg = edges.select(col("a").as("v")).union(edges.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        val tri = edges.as("e1")
          .join(edges.as("e2"), col("e1.b") === col("e2.a"))
          .join(edges.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(explode(array(col("e1.a"), col("e1.b"), col("e2.b"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("t"))
        deg.join(tri, Seq("v"), "left")
          .filter(col("deg") >= 2)
          .select(col("v").as("supplier"), col("deg"),
            coalesce(col("t"), lit(0L)).as("triangles"),
            expr("CAST(coalesce(t, 0) * 2000000 DIV (deg * (deg - 1)) AS BIGINT)")
              .as("cc_micro"))
          .orderBy(col("supplier"))
      },
      Some(sql("""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
                   pairs AS (SELECT x.sk AS a, y.sk AS b, count(*) AS co
                     FROM os x JOIN os y ON x.ok = y.ok AND x.sk < y.sk
                     GROUP BY 1, 2),
                   thr AS (SELECT quantile_disc(co, 0.9) AS thr FROM pairs),
                   edges AS (SELECT a, b FROM pairs, thr WHERE co >= thr),
                   deg AS (SELECT v, count(*) AS deg FROM
                     (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
                     GROUP BY v),
                   tri AS (SELECT v, count(*) AS t FROM
                     (SELECT unnest([e1.a, e1.b, e2.b]) AS v
                      FROM edges e1
                      JOIN edges e2 ON e1.b = e2.a
                      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
                     GROUP BY v)
                   SELECT v AS supplier, CAST(deg AS BIGINT) AS deg,
                     CAST(COALESCE(t, 0) AS BIGINT) AS triangles,
                     COALESCE(t, 0) * 2000000 // (deg * (deg - 1)) AS cc_micro
                   FROM deg LEFT JOIN tri USING (v)
                   WHERE deg >= 2 ORDER BY supplier"""))),

    // ADAMIC-ADAR LINK PREDICTION on the same top-decile supplier
    // graph: for NON-adjacent pairs, score = Σ_z 1/ln(deg z) over
    // common neighbours z — the classic link-prediction baseline.
    // Common neighbours from one neighbour-list self-join; existing
    // edges removed with an anti-join; top-10 predicted links.
    Q("graph_adamic_adar",
      (s, d) => {
        val os = table(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        val pairs = os.as("x").join(os.as("y"),
            col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
          .groupBy(col("x.sk").as("a"), col("y.sk").as("b"))
          .agg(count(lit(1)).as("co"))
        val thr = pairs.agg(expr(
          "percentile_disc(0.9) WITHIN GROUP (ORDER BY co)").as("thr"))
        val edges = pairs.crossJoin(broadcast(thr))
          .filter(col("co") >= col("thr")).select(col("a"), col("b"))
        val nbrs = edges.select(col("a").as("v"), col("b").as("z"))
          .union(edges.select(col("b").as("v"), col("a").as("z")))
        val deg = nbrs.groupBy(col("z")).agg(count(lit(1)).as("degz"))
        val cand = nbrs.as("p").join(nbrs.as("q"),
            col("p.z") === col("q.z") && col("p.v") < col("q.v"))
          .select(col("p.v").as("a"), col("q.v").as("b"), col("p.z").as("z"))
          .join(edges, Seq("a", "b"), "left_anti")
        cand.join(broadcast(deg.filter(col("degz") >= 2)), Seq("z"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("common"),
            round(sum(lit(1.0) / log(col("degz").cast("double"))), 6).as("aa_score"))
          .orderBy(col("aa_score").desc, col("a"), col("b"))
          .limit(10)
      },
      Some(sql("""WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
                     FROM lineitem),
                   pairs AS (SELECT x.sk AS a, y.sk AS b, count(*) AS co
                     FROM os x JOIN os y ON x.ok = y.ok AND x.sk < y.sk
                     GROUP BY 1, 2),
                   thr AS (SELECT quantile_disc(co, 0.9) AS thr FROM pairs),
                   edges AS (SELECT a, b FROM pairs, thr WHERE co >= thr),
                   nbrs AS (SELECT a AS v, b AS z FROM edges
                            UNION ALL SELECT b AS v, a AS z FROM edges),
                   deg AS (SELECT z, count(*) AS degz FROM nbrs GROUP BY z),
                   cand AS (SELECT p.v AS a, q.v AS b, p.z AS z
                     FROM nbrs p JOIN nbrs q ON p.z = q.z AND p.v < q.v
                     WHERE NOT EXISTS (SELECT 1 FROM edges e
                                       WHERE e.a = p.v AND e.b = q.v))
                   SELECT a, b, count(*) AS common,
                     round(sum(1.0 / ln(CAST(degz AS DOUBLE))), 6) AS aa_score
                   FROM cand JOIN deg USING (z)
                   WHERE degz >= 2
                   GROUP BY a, b
                   ORDER BY aa_score DESC, a, b
                   LIMIT 10"""))),

    // CLOSENESS + ECCENTRICITY (round 11): all-pairs BFS distances via
    // ONE GraphX ShortestPaths run with every vertex as a landmark — the
    // Pregel frontier propagation whose per-round cost is |frontier
    // edges|, never all-pairs path enumeration. The graph is the
    // deterministic ring+chord circulant over the 25 nation keys
    // (n ↔ n+1 mod 25, n ↔ 2n+3 mod 25, diameter 5, asymmetric enough
    // that closeness sums span 53..76). Both metrics are exact INTEGER
    // sums of BFS distances. The oracle enumerates paths to the
    // diameter bound and takes min(dist) — a different algorithm
    // reaching the same exact integers.
    Q("graph_closeness",
      (s, d) => {
        import s.implicits._
        val keys = table(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("k")).as[Long].rdd
        val edges = keys.flatMap { n =>
          Seq((n, (n + 1) % 25), (n, (n * 2 + 3) % 25))
            .filter { case (a, b) => a != b }
            .flatMap { case (a, b) => Seq(Edge(a, b, 1), Edge(b, a, 1)) }
        }
        val landmarks = (0L until 25L).toSeq
        org.apache.spark.graphx.lib.ShortestPaths
          .run(Graph.fromEdges(edges, 0), landmarks)
          .vertices
          .map { case (v, m) =>
            (v, m.values.map(_.toLong).sum, m.values.map(_.toLong).max) }
          .toDF("k", "closeness_sum", "ecc")
      },
      Some(sql("""
        WITH RECURSIVE nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
             e0 AS (SELECT k AS a, (k + 1) % 25 AS b FROM nodes
                    UNION SELECT k, (k * 2 + 3) % 25 FROM nodes),
             edges AS (SELECT a, b FROM e0 WHERE a <> b
                       UNION SELECT b, a FROM e0 WHERE a <> b),
             walk(src, node, dist) AS (
               SELECT k, k, 0 FROM nodes
               UNION ALL
               SELECT w.src, e.b, w.dist + 1
               FROM walk w JOIN edges e ON w.node = e.a
               WHERE w.dist < 5),
             best AS (SELECT src, node, min(dist) AS dist
                      FROM walk GROUP BY src, node)
        SELECT src AS k, CAST(sum(dist) AS BIGINT) AS closeness_sum,
               CAST(max(dist) AS BIGINT) AS ecc
        FROM best GROUP BY src"""))),

    // DEGREE ASSORTATIVITY (Newman 2002) over the same ring+chord
    // circulant as graph_closeness: the Pearson correlation of endpoint
    // degrees across directed edge instances (both directions, the
    // standard undirected treatment). Degrees and all five sufficient
    // sums are exact integers; the coefficient is one IEEE projection —
    // negative r = hubs attach to leaves, positive = hubs to hubs.
    Q("graph_assortativity",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n_as")
        s.sql(sql("""
          WITH nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM graft_n_as),
               e0 AS (SELECT k AS a, (k + 1) % 25 AS b FROM nodes
                      UNION SELECT k, (k * 2 + 3) % 25 FROM nodes),
               edges AS (SELECT a, b FROM e0 WHERE a <> b
                         UNION SELECT b, a FROM e0 WHERE a <> b),
               deg AS (SELECT a AS k, count(*) AS dg FROM edges GROUP BY a),
               pairs AS (SELECT da.dg AS x, db.dg AS y
                         FROM edges e JOIN deg da ON e.a = da.k
                         JOIN deg db ON e.b = db.k),
               st AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                        sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
                      FROM pairs)
          SELECT CAST(m AS BIGINT) AS n_edge_ends,
                 round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                   AS assortativity
          FROM st"""))
      },
      Some(sql("""
        WITH nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
             e0 AS (SELECT k AS a, (k + 1) % 25 AS b FROM nodes
                    UNION SELECT k, (k * 2 + 3) % 25 FROM nodes),
             edges AS (SELECT a, b FROM e0 WHERE a <> b
                       UNION SELECT b, a FROM e0 WHERE a <> b),
             deg AS (SELECT a AS k, count(*) AS dg FROM edges GROUP BY a),
             pairs AS (SELECT da.dg AS x, db.dg AS y
                       FROM edges e JOIN deg da ON e.a = da.k
                       JOIN deg db ON e.b = db.k),
             st AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
                    FROM pairs)
        SELECT CAST(m AS BIGINT) AS n_edge_ends,
               round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
                 AS assortativity
        FROM st""")))
  )
}
