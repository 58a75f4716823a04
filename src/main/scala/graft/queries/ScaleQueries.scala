package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-9 wave 30 — skew mitigation at the join layer, the technique
  * family that decides whether a 100 TB fact-fact join finishes or
  * stalls on one straggler reducer.
  *
  * The reference ships skew handling as golden `skewjoin.q` tests over
  * its hash-join runtime (sql/hive/src/test/resources/golden/); Spark's
  * two idiomatic answers are both declared here:
  *
  *  - `join_salted_skew` — the MANUAL rewrite: salt the probe side with
  *    a deterministic hash, replicate the build side once per salt
  *    value, join on (key, salt). Correct by construction (every
  *    (fact row, dim row) pair meets in exactly one salt bucket) and
  *    oracled equal to the plain join.
  *  - `join_skew_aqe` — the RUNTIME answer: AQE's OptimizeSkewedJoin
  *    splits the oversized partition into advisory-sized chunks and
  *    replicates the matching build partition, no rewrite needed. The
  *    query returns the join result PLUS the executed-plan proof bit
  *    (`skew=true` on the sort-merge join), so the oracle itself pins
  *    that the split actually happened.
  */
object ScaleQueries {

  /** 75% of lineitem rows collapse onto key 0; the rest keep their
    * orderkey — one pathological reducer, the classic skew shape. */
  private def skewKey(c: org.apache.spark.sql.Column) =
    when(c % 4 =!= 0, lit(0L)).otherwise(c)

  val all: Seq[Q] = Seq(

    // MANUAL SALT-AND-REPLICATE: fact side gets salt =
    // hash(row attrs) % S (uniform, deterministic — no rand(), so the
    // query replays identically); dim side explodes each key across all
    // S salts. The hot key's 45k rows now spread over S reducers
    // instead of one. hint("merge") pins the shuffle join — salting a
    // broadcast join would be vacuous.
    Q("join_salted_skew",
      (s, d) => {
        val S = 8L
        val fact = table(s, d, "lineitem")
          .select(
            skewKey(col("l_orderkey")).as("k"),
            pmod(xxhash64(col("l_partkey"), col("l_suppkey"), col("l_linenumber")), lit(S))
              .as("f_salt"),
            col("l_quantity"))
        val dim = table(s, d, "orders")
          .select(skewKey(col("o_orderkey")).as("d_key"))
          .distinct()
          .withColumn("d_tag", pmod(col("d_key"), lit(7L)))
          .withColumn("d_salt", explode(sequence(lit(0L), lit(S - 1L))))
        fact.hint("merge")
          .join(dim, col("k") === col("d_key") && col("f_salt") === col("d_salt"))
          .groupBy(col("d_tag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 4).as("qty"))
      },
      Some(sql("""WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
                                         ELSE l_orderkey END AS k,
                                    l_quantity
                              FROM lineitem),
                       dim AS (SELECT DISTINCT
                                 CASE WHEN o_orderkey % 4 <> 0 THEN 0
                                      ELSE o_orderkey END AS d_key
                               FROM orders)
                  SELECT d_key % 7 AS d_tag, count(*) AS n,
                         round(sum(l_quantity), 4) AS qty
                  FROM f JOIN dim ON f.k = dim.d_key
                  GROUP BY d_key % 7"""))),

    // AQE RUNTIME SKEW SPLIT: same skewed shape, no rewrite — the
    // tightened thresholds stand in for the 100 TB case where the hot
    // partition dwarfs the 256 MB default. EAGER by necessity (the
    // conf window must bracket execution, and the proof bit is read off
    // the executed plan); output bounded at 7 groups — within the
    // documented declaration-time exception list. Conf is restored in
    // finally.
    Q("join_skew_aqe",
      (s, d) => {
        val sq = s; import sq.implicits._
        val tuned = Map(
          "spark.sql.adaptive.skewJoin.enabled" -> "true",
          // sf0.001's hot partition is ~tens of KB serialized; 16k
          // trips it at every test SF while the healthy partitions
          // (sub-KB..20KB) stay under factor×median
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
          // downstream re-agg needs its own exchange anyway; force=true
          // keeps the rule from bailing on the lost output partitioning
          "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
          // broadcast would dodge the shuffle entirely — disable both
          // the static and the adaptive threshold so the join stays SMJ
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
        val saved = tuned.keys.map(k => k -> s.conf.getOption(k)).toMap
        try {
          tuned.foreach { case (k, v) => s.conf.set(k, v) }
          // OptimizeSkewedJoin splits a hot partition at MAP-OUTPUT
          // granularity and matches only SMJ → Sort → bare shuffle. So:
          // (a) round-robin the fact first — the single-row-group test
          // file yields ONE mapper, and a one-chunk partition cannot be
          // split (at 100 TB the thousands of scan tasks provide this
          // for free); (b) the dim must reach the join as a plain
          // projection (a distinct() would leave its final aggregate
          // between Sort and shuffle and the rule bails) — orderkeys
          // divisible by 4 are already unique, union the lone 0-key.
          val fact = table(s, d, "lineitem")
            .select(skewKey(col("l_orderkey")).as("k"), col("l_extendedprice"))
            .repartition(16)
          val dim = table(s, d, "orders")
            .filter(col("o_orderkey") % 4 === 0)
            .select(col("o_orderkey").as("d_key"))
            .union(s.range(1).select(lit(0L).as("d_key")))
            .withColumn("d_tag", pmod(col("d_key"), lit(7L)))
          val j = fact.join(dim, col("k") === col("d_key"))
            .groupBy(col("d_tag"))
            .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
          val rows = j.collect()
          val skewApplied =
            j.queryExecution.executedPlan.toString.contains("skew=true")
          rows.toSeq
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), skewApplied))
            .toDF("d_tag", "n", "revenue", "skew_split_applied")
        } finally saved.foreach { case (k, v) =>
          v.fold(s.conf.unset(k))(s.conf.set(k, _))
        }
      },
      Some(sql("""WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
                                         ELSE l_orderkey END AS k,
                                    l_extendedprice
                              FROM lineitem),
                       dim AS (SELECT o_orderkey AS d_key FROM orders
                               WHERE o_orderkey % 4 = 0
                               UNION ALL SELECT 0)
                  SELECT d_key % 7 AS d_tag, count(*) AS n,
                         round(sum(l_extendedprice), 2) AS revenue,
                         TRUE AS skew_split_applied
                  FROM f JOIN dim ON f.k = dim.d_key
                  GROUP BY d_key % 7""")))
  )
}
