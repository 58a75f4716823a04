package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 3 — the reference's DISTRIBUTED LINEAR ALGEBRA
  * (mllib/.../linalg/distributed/BlockMatrix.scala, RowMatrix.scala) and
  * FREQUENT PATTERN MINING (mllib/.../fpm/FPGrowth.scala), re-expressed
  * as the join/aggregate dataflow those algorithms actually run:
  *
  *  - matrix multiply = equi-join on the inner dimension + partial-agg
  *    sum of products (BlockMatrix.multiply's shuffle, per entry);
  *  - Gramian A'A = one pass of per-row outer products, summed by (i,j)
  *    (RowMatrix.computeGramianMatrix's treeAggregate, as a groupBy);
  *  - column similarities = Gramian entries normalized by column norms
  *    (RowMatrix.columnSimilarities' exact variant — DIMSUM with no
  *    sampling);
  *  - frequent itemsets = support counting with Apriori pruning
  *    (FPGrowth's conditional-tree counting, as semi-join + self-join).
  *
  * Every statistic is exact: integer counts, and vector elements
  * quantized to integer MICRO-UNITS (round(x·1e6) as BIGINT — rounding a
  * double to an integer is engine-consistent because a double's shortest
  * representation and its exact binary expansion can never straddle a
  * half-integer, unlike the scale-6 decimal grid), so the DuckDB oracle
  * verifies bit-for-bit after the final IEEE division.
  */
object Ml3Queries {

  private val Dim = 64 // embeddings vector width

  val all: Seq[Q] = Seq(

    // Distributed matrix multiply (mllib/.../linalg/distributed/
    // BlockMatrix.scala multiply): A (8×12) from lineitem counts,
    // B (12×6) from part counts, C = A·B. The plan is the blocked
    // algorithm's per-entry reduction: shuffle both sides on the inner
    // dimension j, multiply co-partitioned entries, partial-agg the sum
    // over j by (i,k). At 100 TB the only change is coarser keys
    // (block indices i/bs, k/bs) — same join + partial aggregation, and
    // the 12-row inner dimension side would broadcast.
    Q("ml_block_matmul",
      (s, d) => {
        val a = table(s, d, "lineitem")
          .groupBy((col("l_suppkey") % 8).as("i"), (col("l_partkey") % 12).as("j"))
          .agg(count(lit(1)).as("a"))
        val b = table(s, d, "part")
          .groupBy((col("p_partkey") % 12).as("j"), (col("p_size") % 6).as("k"))
          .agg(count(lit(1)).as("b"))
        a.join(b, Seq("j"))
          .groupBy(col("i"), col("k"))
          .agg(sum(col("a") * col("b")).as("c"))
      },
      Some(sql("""WITH a AS (SELECT l_suppkey % 8 AS i, l_partkey % 12 AS j,
                      count(*) AS a FROM lineitem GROUP BY 1, 2),
                  b AS (SELECT p_partkey % 12 AS j, p_size % 6 AS k,
                      count(*) AS b FROM part GROUP BY 1, 2)
                  SELECT i, k, CAST(sum(a * b) AS BIGINT) AS c
                  FROM a JOIN b USING (j) GROUP BY 1, 2"""))),

    // Gramian G = A'A over the embeddings matrix (mllib/.../linalg/
    // distributed/RowMatrix.scala computeGramianMatrix): each row
    // contributes its outer product x·x', summed entry-wise. ONE scan,
    // no self-join: the two nested posexplodes emit the (i, j, xi·xj)
    // triples per row and a partial-aggregated groupBy(i, j) sums them —
    // exactly the treeAggregate(BDV += x·x') dataflow. Elements are
    // quantized to integer micro-units so the sums are exact; upper
    // triangle only (G is symmetric).
    Q("ml_gramian",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val pairs = e
          .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
          .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj")))
          .filter(col("i") <= col("j"))
        pairs
          .groupBy(col("i"), col("j"))
          .agg(sum(round(col("xi").cast("double") * 1e6).cast("long")
            * round(col("xj").cast("double") * 1e6).cast("long")).as("sprod"))
          .select(col("i"), col("j"),
            round(col("sprod").cast("double") / 1e12, 6).as("g"))
      },
      Some(sql(s"""WITH x AS (SELECT vec_id, CAST(i.range AS INT) - 1 AS i,
                      CAST(round(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS xi
                    FROM embeddings, range(1, ${Dim + 1}) i)
                   SELECT a.i, b.i AS j,
                     round(CAST(sum(a.xi * b.xi) AS DOUBLE) / 1e12, 6) AS g
                   FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
                   GROUP BY 1, 2"""))),

    // Column similarities (mllib/.../linalg/distributed/RowMatrix.scala
    // columnSimilarities — the exact brute-force branch that DIMSUM
    // approximates): cos(i,j) = G(i,j) / sqrt(G(i,i)·G(j,j)). The
    // Gramian pass is the same single scan as ml_gramian; the 64-entry
    // diagonal is a broadcast model table joined twice. At 100 TB the
    // Gramian shuffle carries 64²/2 cells per task — constant.
    Q("ml_col_similarities",
      (s, d) => {
        val e = table(s, d, "embeddings")
        val g = e
          .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
          .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj")))
          .filter(col("i") <= col("j"))
          .groupBy(col("i"), col("j"))
          .agg(sum(round(col("xi").cast("double") * 1e6).cast("long")
            * round(col("xj").cast("double") * 1e6).cast("long")).cast("double").as("g"))
        val diag = g.filter(col("i") === col("j"))
          .select(col("i").as("dk"), col("g").as("gd"))
        g.filter(col("i") < col("j"))
          .join(broadcast(diag), col("i") === col("dk")).drop("dk")
          .withColumnRenamed("gd", "gii")
          .join(broadcast(diag), col("j") === col("dk")).drop("dk")
          .withColumnRenamed("gd", "gjj")
          .select(col("i"), col("j"),
            round(col("g") / sqrt(col("gii") * col("gjj")), 6).as("cos"))
      },
      Some(sql(s"""WITH x AS (SELECT vec_id, CAST(i.range AS INT) - 1 AS i,
                      CAST(round(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS xi
                    FROM embeddings, range(1, ${Dim + 1}) i),
                   g AS (SELECT a.i, b.i AS j,
                       CAST(sum(a.xi * b.xi) AS DOUBLE) AS g
                     FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
                     GROUP BY 1, 2),
                   diag AS (SELECT i AS dk, g AS gd FROM g WHERE i = j)
                   SELECT g.i, g.j,
                     round(g.g / sqrt(di.gd * dj.gd), 6) AS cos
                   FROM g JOIN diag di ON g.i = di.dk
                          JOIN diag dj ON g.j = dj.dk
                   WHERE g.i < g.j"""))),

    // Frequent itemsets (mllib/.../fpm/FPGrowth.scala): transactions =
    // orders, items = l_partkey % 24, minSupport = n/42 of transactions (~2.4%).
    // Size-1 sets are one partial-agg count; size-2 candidates are
    // generated ONLY among frequent singletons (Apriori pruning — the
    // same work-skipping FPGrowth's conditional trees buy), via a
    // broadcast semi-join, then a self-join per transaction. The support
    // filter c*42 >= n is integer-exact (no division). Scale posture:
    // the self-join is keyed by transaction id (grows with the corpus)
    // and each side is pre-pruned to frequent items.
    Q("ml_fpgrowth",
      (s, d) => {
        val t = table(s, d, "lineitem")
          .select(col("l_orderkey").as("tid"), (col("l_partkey") % 24).as("item"))
          .distinct()
        val nTrans = t.select(countDistinct(col("tid")).as("n"))
        val f1 = t.groupBy(col("item")).agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(nTrans))
          .filter(col("c") * 42 >= col("n"))
        val tf = t.join(broadcast(f1.select(col("item"))), Seq("item"))
        val f2 = tf.select(col("tid"), col("item").as("ia"))
          .join(tf.select(col("tid"), col("item").as("ib")), Seq("tid"))
          .filter(col("ia") < col("ib"))
          .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(nTrans))
          .filter(col("c") * 42 >= col("n"))
        f1.select(col("item").cast("string").as("itemset"), lit(1L).as("k"), col("c"))
          .unionAll(f2.select(
            concat_ws(",", col("ia").cast("string"), col("ib").cast("string")).as("itemset"),
            lit(2L).as("k"), col("c")))
      },
      Some(sql("""WITH t AS (SELECT DISTINCT l_orderkey AS tid, l_partkey % 24 AS item
                    FROM lineitem),
                  n AS (SELECT count(DISTINCT tid) AS n FROM t),
                  f1 AS (SELECT item, count(*) AS c FROM t GROUP BY 1),
                  f1k AS (SELECT item, c FROM f1, n WHERE c * 42 >= n),
                  tf AS (SELECT tid, item FROM t WHERE item IN (SELECT item FROM f1k)),
                  f2 AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c
                         FROM tf a JOIN tf b ON a.tid = b.tid AND a.item < b.item
                         GROUP BY 1, 2),
                  f2k AS (SELECT ia, ib, c FROM f2, n WHERE c * 42 >= n)
                  SELECT CAST(item AS VARCHAR) AS itemset, CAST(1 AS BIGINT) AS k, c FROM f1k
                  UNION ALL
                  SELECT CAST(ia AS VARCHAR) || ',' || CAST(ib AS VARCHAR), CAST(2 AS BIGINT), c
                  FROM f2k"""))),

    // Association rules from the frequent pairs (the generateAssociation
    // Rules step the fpm package feeds): for each frequent pair {a,b},
    // both directed rules with confidence = supp(ab)/supp(a) and
    // lift = conf·n/supp(b). Singleton supports join in as a broadcast
    // model table; counts stay integer until the two final divisions.
    Q("ml_assoc_rules",
      (s, d) => {
        val t = table(s, d, "lineitem")
          .select(col("l_orderkey").as("tid"), (col("l_partkey") % 24).as("item"))
          .distinct()
        val nTrans = t.select(countDistinct(col("tid")).as("n"))
        val f1 = t.groupBy(col("item")).agg(count(lit(1)).as("c"))
        // Apriori prune BEFORE the pair self-join (as in ml_fpgrowth): a
        // frequent pair's items are each frequent, so semi-joining t to
        // the broadcast frequent singletons first loses nothing and keeps
        // the per-transaction self-join quadratic only in FREQUENT items.
        val f1k = f1.crossJoin(broadcast(nTrans))
          .filter(col("c") * 42 >= col("n")).select(col("item"))
        val tf = t.join(broadcast(f1k), Seq("item"))
        val pairs = tf.select(col("tid"), col("item").as("ia"))
          .join(tf.select(col("tid"), col("item").as("ib")), Seq("tid"))
          .filter(col("ia") < col("ib"))
          .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c_ab"))
          .crossJoin(broadcast(nTrans))
          .filter(col("c_ab") * 42 >= col("n"))
        val rules = pairs.select(col("ia").as("ante"), col("ib").as("cons"),
            col("c_ab"), col("n"))
          .unionAll(pairs.select(col("ib").as("ante"), col("ia").as("cons"),
            col("c_ab"), col("n")))
        rules
          .join(broadcast(f1.select(col("item").as("ante"), col("c").as("c_a"))), Seq("ante"))
          .join(broadcast(f1.select(col("item").as("cons"), col("c").as("c_b"))), Seq("cons"))
          .select(col("ante"), col("cons"), col("c_ab"),
            round(col("c_ab").cast("double") / col("c_a"), 6).as("conf"),
            round(col("c_ab").cast("double") * col("n") / (col("c_a") * col("c_b")), 6)
              .as("lift"))
      },
      Some(sql("""WITH t AS (SELECT DISTINCT l_orderkey AS tid, l_partkey % 24 AS item
                    FROM lineitem),
                  n AS (SELECT count(DISTINCT tid) AS n FROM t),
                  f1 AS (SELECT item, count(*) AS c FROM t GROUP BY 1),
                  pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c_ab
                            FROM t a JOIN t b ON a.tid = b.tid AND a.item < b.item
                            GROUP BY 1, 2),
                  pk AS (SELECT ia, ib, c_ab, n FROM pairs, n WHERE c_ab * 42 >= n),
                  rules AS (SELECT ia AS ante, ib AS cons, c_ab, n FROM pk
                            UNION ALL
                            SELECT ib, ia, c_ab, n FROM pk)
                  SELECT ante, cons, c_ab,
                    round(CAST(c_ab AS DOUBLE) / fa.c, 6) AS conf,
                    round(CAST(c_ab AS DOUBLE) * n / (fa.c * fb.c), 6) AS lift
                  FROM rules
                  JOIN f1 fa ON rules.ante = fa.item
                  JOIN f1 fb ON rules.cons = fb.item""")))
  )
}
