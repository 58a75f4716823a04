package graft.queries

import graft.Engine.table
import graft.functions.Portable
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.2 — projection / filter / sample / limit / sort / distinct /
  * set operations (reference: sql/core/.../execution/basicOperators.scala).
  *
  * Scale posture: project+filter are pushed into the parquet scan
  * (PushedFilters + pruned ReadSchema); top-k is TakeOrderedAndProject (no
  * global sort); set ops shuffle once on their natural key.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // Project (basicOperators.scala:33): computed columns, column pruning.
    Q("project",
      (s, d) => table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * (lit(1.0) + col("l_tax"))).as("taxed")),
      Some(sql("""SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1.0 - l_discount) AS revenue,
                   l_extendedprice * (1.0 + l_tax) AS taxed
                  FROM lineitem"""))),

    // Filter (basicOperators.scala:48): conjunctive predicates pushed to scan.
    Q("filter",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
          && col("l_quantity") > 45.0 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate")),
      Some(sql("""SELECT l_orderkey, l_partkey, l_quantity, l_shipdate FROM lineitem
                  WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                    AND l_quantity > 45.0 AND l_returnflag = 'R'"""))),

    // Sample (basicOperators.scala:62) — deterministic hash variant so the
    // oracle can reproduce it (seeded bernoulli differs across engines).
    Q("sample",
      (s, d) => table(s, d, "orders")
        .filter(Portable.deterministicSample(col("o_orderkey"), 10))
        .select(col("o_orderkey"), col("o_totalprice")),
      Some(sql(s"""SELECT o_orderkey, o_totalprice FROM orders
                   WHERE ${Portable.deterministicSampleSql("o_orderkey", 10)}"""))),

    // Union, bag semantics (basicOperators.scala:77).
    Q("union_all",
      (s, d) => {
        val o = table(s, d, "orders")
        o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"), col("o_totalprice"))
          .unionAll(o.filter(col("o_totalprice") > 200000.0).select(col("o_orderkey"), col("o_totalprice")))
      },
      Some(sql("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
                  UNION ALL
                  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000.0"""))),

    // Union + Distinct (set union).
    Q("union_distinct",
      (s, d) => {
        val o = table(s, d, "orders")
        o.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
          .union(o.filter(col("o_totalprice") > 200000.0).select(col("o_orderkey"))).distinct()
      },
      Some(sql("""SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
                  UNION
                  SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0"""))),

    // Limit + TakeOrdered (basicOperators.scala:92,:121) — top-k plans as
    // TakeOrderedAndProject: per-partition bounded heap, no global sort.
    Q("topk", bench = true,
      fn = (s, d) => table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      oracle = Some(sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                           ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))),

    // Global Sort (basicOperators.scala:144): order materialized as a rank
    // column so the (row-order-insensitive) oracle can still verify it.
    // Rank stays DISTRIBUTED (a global row_number window would collapse
    // everything into ONE partition) and — r16 verdict #4 — LAZY: the old
    // rdd.zipWithIndex fired its partition-count job at declaration. The
    // lazy restatement persists the range-partitioned sort (persist is a
    // plan annotation, no job), derives per-partition positions with a
    // mapPartitions local index, re-scans the SAME cached snapshot for
    // partition sizes, folds sizes into exclusive running offsets over
    // the ≤#partitions-row table (a DOMAIN-bounded unpartitioned window —
    // declared in DomainBoundedWindows), and broadcasts them back. The
    // persist is the price of one consistent snapshot across the two
    // scans — at 100 TB it holds only (key, sortcol) for the filtered
    // set, the same footprint zipWithIndex's two passes re-read.
    //
    // Partition identity comes from the DATA (the partition head row's
    // unique key), NOT TaskContext.getPartitionId: a downstream narrow
    // coalesce(1) — e.g. Verify's single-file write — merges many
    // structural partitions into ONE task, where every partition reports
    // task-partition-id 0 while the per-partition local index still
    // restarts, silently flattening all offsets to zero. The head key is
    // computed per STRUCTURAL partition (the mapPartitions lambda runs
    // once per parent partition even under a coalesce), is unique (one
    // row leads exactly one partition), and its sort key orders the
    // heads exactly like the range-partitioning orders the partitions.
    Q("sort_global",
      (s, d) => {
        import s.implicits._
        val sorted = table(s, d, "orders")
          .filter(col("o_totalprice") > 250000.0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .persist()
        val local = sorted.as[(Long, Double)].mapPartitions { it =>
          val buf = it.buffered
          if (!buf.hasNext) Iterator.empty
          else {
            val (hk, hp) = buf.head
            buf.zipWithIndex.map { case ((k, v), i) => (k, v, hk, hp, i + 1L) }
          }
        }.toDF("o_orderkey", "o_totalprice", "hk", "hp", "pos")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("hp").desc, col("hk").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val offs = local.groupBy("hk", "hp").agg(count(lit(1)).as("cnt"))
          .select(col("hk").as("ohk"),
            coalesce(sum(col("cnt")).over(w), lit(0L)).as("off"))
        local.join(broadcast(offs), col("hk") === col("ohk"))
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("off") + col("pos")).as("rn"))
      },
      Some(sql("""SELECT o_orderkey, o_totalprice,
                   CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
                  FROM orders WHERE o_totalprice > 250000.0"""))),

    // Distinct (basicOperators.scala:170).
    Q("distinct",
      (s, d) => table(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some(sql("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))),

    // Except (basicOperators.scala:200) — set semantics.
    Q("except_set",
      (s, d) => table(s, d, "customer").select(col("c_custkey"))
        .except(table(s, d, "orders").filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey").as("c_custkey"))),
      Some(sql("""SELECT c_custkey FROM customer
                  EXCEPT SELECT o_custkey AS c_custkey FROM orders
                  WHERE o_totalprice > 150000.0"""))),

    // ExceptAll — bag semantics (1.3's Except used RDD.subtract on bags).
    Q("except_all_bag",
      (s, d) => {
        val li = table(s, d, "lineitem")
        li.select(col("l_orderkey"), col("l_returnflag"))
          .exceptAll(li.filter(col("l_quantity") > 25.0).select(col("l_orderkey"), col("l_returnflag")))
      },
      Some(sql("""SELECT l_orderkey, l_returnflag FROM lineitem
                  EXCEPT ALL
                  SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity > 25.0"""))),

    // Rand (Rand.scala — the reference's only nondeterministic expr).
    // Seeded rand is engine-specific; the verifiable contract is the
    // bounds: every sample lies in [0, 1).
    Q("expr_rand",
      (s, d) => table(s, d, "orders")
        .select(rand(42).as("r"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("r") >= 0.0 && col("r") < 1.0, 1L).otherwise(0L)).as("n_in_bounds")),
      Some(sql("SELECT count(*) AS n_total, count(*) AS n_in_bounds FROM orders"))),

    // Sort with explicit null ordering (SortOrder.scala:32 — NULLS
    // FIRST/LAST was NOT expressible in 1.3; beyond-ref extension).
    // Same lazy distributed rank materialization as sort_global (cached
    // sorted snapshot + local index + data-derived partition heads +
    // broadcast offsets); the offsets window replays asc_nulls_last over
    // the heads' status, and the join key is the head's UNIQUE non-null
    // o_orderkey, so all-NULL-status partitions join fine.
    Q("sort_nulls_last",
      (s, d) => {
        import s.implicits._
        val sorted = table(s, d, "orders")
          .filter(col("o_totalprice") > 350000.0)
          .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("status"))
          .orderBy(col("status").asc_nulls_last, col("o_orderkey").asc)
          .persist()
        val local = sorted.as[(Long, String)].mapPartitions { it =>
          val buf = it.buffered
          if (!buf.hasNext) Iterator.empty
          else {
            val (hk, hs) = buf.head
            buf.zipWithIndex.map { case ((k, v), i) => (k, v, hk, hs, i + 1L) }
          }
        }.toDF("o_orderkey", "status", "hk", "hs", "pos")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("hs").asc_nulls_last, col("hk").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val offs = local.groupBy("hk", "hs").agg(count(lit(1)).as("cnt"))
          .select(col("hk").as("ohk"),
            coalesce(sum(col("cnt")).over(w), lit(0L)).as("off"))
        local.join(broadcast(offs), col("hk") === col("ohk"))
          .select(col("o_orderkey"), col("status"),
            (col("off") + col("pos")).as("rn"))
      },
      Some(sql("""SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status,
                   CAST(row_number() OVER (ORDER BY nullif(o_orderstatus, 'P') ASC NULLS LAST,
                        o_orderkey) AS BIGINT) AS rn
                  FROM orders WHERE o_totalprice > 350000.0"""))),

    // Intersect (basicOperators.scala:214).
    Q("intersect_set",
      (s, d) => table(s, d, "orders").select(col("o_custkey"))
        .intersect(table(s, d, "customer").filter(col("c_acctbal") > 0.0)
          .select(col("c_custkey").as("o_custkey"))),
      Some(sql("""SELECT o_custkey FROM orders
                  INTERSECT
                  SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal > 0.0""")))
  )
}
