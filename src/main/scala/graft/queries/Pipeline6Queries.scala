package graft.queries

import graft.Engine.{events, table}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.sql

/** Pipeline wave 6 (round 10) — the plumbing between curation and the
  * loader, plus the warehouse-operations layer: weighted sampling
  * without replacement (Efraimidis–Spirakis 2006, the distributed
  * restatement of the reference's RDD takeSample / sampleByKey surface
  * — core/.../rdd/PairRDDFunctions.scala:258), equal-frequency
  * binning, leakage-free grouped holdout, MRR, SCD Type-2 validity
  * intervals, entity-resolution survivorship, CDC log compaction,
  * marketing attribution, referential-integrity audit, migration
  * checksums, column profiling with data contracts, and freshness
  * SLAs.
  *
  * Determinism contract: all "randomness" is the portable md5-derived
  * hash (never seed-based RNG), selections are exact integer or
  * identical-IEEE-formula comparisons, and every double is rounded
  * only in the final projection.
  */
object Pipeline6Queries {

  /** Per-stratum sample size for the weighted sample. */
  private val SampleK = 3

  val all: Seq[Q] = Seq(

    // WEIGHTED SAMPLE WITHOUT REPLACEMENT, k per stratum (Efraimidis–
    // Spirakis): key = ln(u)/w with u = deterministic hash-uniform in
    // (0,1], w = o_totalprice; the k largest keys per o_orderpriority
    // win. Distributed shape: the E-S key turns "weighted sample" into
    // "top-k per group" — a partial TopK under a partitioned window,
    // never a global sort. Tie-break on o_orderkey pins the order.
    Q("pipe_weighted_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val keyed = table(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("w_cents"),
            ((Portable.stableHash64(col("o_orderkey")) % 1048576L + 1L).cast("double")
              / 1048576.0).as("u"))
          .withColumn("es_key", log(col("u")) / (col("w_cents").cast("double") / 100.0))
        keyed
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("o_orderpriority"))
              .orderBy(col("es_key").desc, col("o_orderkey"))))
          .filter(col("rk") <= SampleK)
          .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("w_cents"))
          .orderBy(col("o_orderpriority"), col("rk"))
      },
      Some(sql(s"""WITH keyed AS (SELECT o_orderpriority, o_orderkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
                       CAST(${Portable.stableHash64Sql("o_orderkey")} % 1048576 + 1 AS DOUBLE)
                         / 1048576.0 AS u
                     FROM orders),
                   rk AS (SELECT o_orderpriority, o_orderkey, w_cents,
                       row_number() OVER (PARTITION BY o_orderpriority
                         ORDER BY ln(u) / (CAST(w_cents AS DOUBLE) / 100.0) DESC, o_orderkey) AS rk
                     FROM keyed)
                   SELECT o_orderpriority, rk, o_orderkey, w_cents
                   FROM rk WHERE rk <= $SampleK
                   ORDER BY o_orderpriority, rk"""))),

    // EQUAL-FREQUENCY BINNING (decile feature bins) the scale-correct
    // way: 9 exact percentile_disc boundaries from ONE aggregate
    // (broadcast 1-row model), assignment as a map-side comparison sum
    // — never a global ntile window. Boundary ties bin DOWN (v > b_i
    // counts), pinned by the exact-element boundaries on both engines.
    Q("ml_quantile_binning",
      (s, d) => {
        val cents = table(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("v"))
        val boundCols = (1 to 9).map(i => expr(
          s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY v)").as(s"b$i"))
        val bounds = cents.agg(boundCols.head, boundCols.tail: _*)
        cents.crossJoin(broadcast(bounds))
          .select(col("v"),
            (lit(1L) + (1 to 9).map(i =>
              when(col("v") > col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)).as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), min(col("v")).as("lo_c"), max(col("v")).as("hi_c"))
          .orderBy(col("bin"))
      },
      Some(sql(s"""WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
                     FROM orders),
                   bounds AS (SELECT ${(1 to 9).map(i =>
                       s"quantile_disc(v, 0.$i) AS b$i").mkString(", ")} FROM cents)
                   SELECT 1 + ${(1 to 9).map(i =>
                       s"CASE WHEN v > b$i THEN 1 ELSE 0 END").mkString(" + ")} AS bin,
                     count(*) AS n, min(v) AS lo_c, max(v) AS hi_c
                   FROM cents, bounds
                   GROUP BY 1 ORDER BY bin"""))),

    // LEAKAGE-FREE GROUPED HOLDOUT: every USER (not row) lands in
    // exactly one of train/val/test by portable hash (80/10/10); the
    // leak_users column proves no user straddles splits — the grouped
    // twin of deterministicSample, the split a sequence model must use.
    Q("pipe_group_holdout",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("split",
            when(Portable.stableHash64(col("user_id")) % 10 < 8, "train")
              .when(Portable.stableHash64(col("user_id")) % 10 === 8, "val")
              .otherwise("test"))
        val leak = ev.groupBy(col("user_id"))
          .agg(countDistinct(col("split")).as("ns"))
          .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leak_users"))
        ev.groupBy(col("split"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .crossJoin(broadcast(leak))
          .orderBy(col("split"))
      },
      Some(sql(s"""WITH ev AS (SELECT user_id,
                       CASE WHEN ${Portable.stableHash64Sql("user_id")} % 10 < 8 THEN 'train'
                            WHEN ${Portable.stableHash64Sql("user_id")} % 10 = 8 THEN 'val'
                            ELSE 'test' END AS split
                     FROM events),
                   leak AS (SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS leak_users
                       FROM (SELECT user_id, count(DISTINCT split) AS ns
                             FROM ev GROUP BY user_id)),
                   agg AS (SELECT split, count(DISTINCT user_id) AS n_users,
                         count(*) AS n_events
                       FROM ev GROUP BY split)
                   SELECT split, n_users, n_events, leak_users
                   FROM agg, leak ORDER BY split"""))),

    // MEAN RECIPROCAL RANK of the first purchase under a deterministic
    // hash ranking per user — the third retrieval-eval dial next to
    // ndcg and PR curves. Rank and hit position are exact integers; the
    // only doubles are the final 1/rank average.
    Q("ml_mrr",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ranked = events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(Portable.stableHash64(col("event_id")), col("event_id"))))
        ranked.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(min(col("rk")).as("first_hit"))
          .agg(count(lit(1)).as("n_users_with_hit"),
            round(avg(lit(1.0) / col("first_hit")), 6).as("mrr"),
            sum(when(col("first_hit") === 1, 1L).otherwise(0L)).as("hits_at_1"))
      },
      Some(sql(s"""WITH ranked AS (SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ${Portable.stableHash64Sql("event_id")}, event_id) AS rk
                     FROM events),
                   fh AS (SELECT user_id, min(rk) AS first_hit
                          FROM ranked WHERE event_type = 'purchase'
                          GROUP BY user_id)
                   SELECT count(*) AS n_users_with_hit,
                     round(avg(1.0 / first_hit), 6) AS mrr,
                     CAST(sum(CASE WHEN first_hit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1
                   FROM fh"""))),

    // SCD TYPE-2 DIMENSION BUILD from a change stream: every event is a
    // new version of its user's row; validity intervals [ts, next_ts)
    // come from ONE lead() window partitioned by user (the warehouse
    // snapshot pattern — no self-join, no global window). The open
    // current version is pinned separately; covered time and the
    // current value are exact microsecond/cent integers.
    Q("pipe_scd2_intervals",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("vf"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("vt", lead(col("vf"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("vf"), col("event_id"))))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("vt").isNotNull, col("vt") - col("vf")).otherwise(0L))
              .as("covered_us"),
            max(when(col("vt").isNull, col("cents"))).as("current_cents"))
          .orderBy(col("user_id"))
      },
      Some(sql("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS vf,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       lead(epoch_us(ts)) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS vt
                     FROM events)
                  SELECT user_id, count(*) AS n_versions,
                    CAST(sum(CASE WHEN vt IS NOT NULL THEN vt - vf ELSE 0 END) AS BIGINT)
                      AS covered_us,
                    max(CASE WHEN vt IS NULL THEN cents END) AS current_cents
                  FROM v GROUP BY user_id ORDER BY user_id"""))),

    // ENTITY RESOLUTION with survivorship: the corpus is the customer
    // table plus a deterministically DIRTIED copy (upper-cased
    // underscore names, +hash%100-cent balance drift, offset keys);
    // blocking+canonicalization groups records by (nation, normalized
    // name) and the golden record survives by max balance with a
    // lowest-key tie-break. One normalize pass + one grouped aggregate
    // — block keys are corpus-growing, never a pairwise cross join.
    Q("pipe_entity_resolution",
      (s, d) => {
        val clean = table(s, d, "customer")
          .select(col("c_custkey").cast("long").as("rec_id"), col("c_name").as("name"),
            col("c_nationkey").cast("long").as("nation"),
            round(col("c_acctbal") * 100).cast("long").as("cents"))
        val dirty = clean.select(
          (col("rec_id") + 1000000L).as("rec_id"),
          upper(regexp_replace(col("name"), " ", "_")).as("name"),
          col("nation"),
          (col("cents") + Portable.stableHash64(col("rec_id")) % 100L).as("cents"))
        clean.unionByName(dirty)
          .withColumn("norm", lower(regexp_replace(col("name"), "_", " ")))
          .groupBy(col("nation"), col("norm"))
          .agg(count(lit(1)).as("n_records"),
            max(col("cents")).as("golden_cents"),
            min(col("rec_id")).as("golden_id"))
          .groupBy()
          .agg(count(lit(1)).as("n_entities"),
            sum(when(col("n_records") > 1, 1L).otherwise(0L)).as("n_merged"),
            sum(col("golden_cents")).as("sum_golden_cents"),
            sum(col("golden_id")).as("sum_golden_ids"))
      },
      Some(sql(s"""WITH clean AS (SELECT CAST(c_custkey AS BIGINT) AS rec_id, c_name AS name,
                       CAST(c_nationkey AS BIGINT) AS nation,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                     FROM customer),
                   dirty AS (SELECT rec_id + 1000000 AS rec_id,
                       upper(replace(name, ' ', '_')) AS name, nation,
                       cents + ${Portable.stableHash64Sql("rec_id")} % 100 AS cents
                     FROM clean),
                   allr AS (SELECT *, lower(replace(name, '_', ' ')) AS norm
                            FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)),
                   ents AS (SELECT nation, norm, count(*) AS n_records,
                       max(cents) AS golden_cents, min(rec_id) AS golden_id
                     FROM allr GROUP BY 1, 2)
                   SELECT count(*) AS n_entities,
                     CAST(sum(CASE WHEN n_records > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
                     CAST(sum(golden_cents) AS BIGINT) AS sum_golden_cents,
                     CAST(sum(golden_id) AS BIGINT) AS sum_golden_ids
                   FROM ents"""))),

    // CDC LOG COMPACTION (apply a change log to a materialized state):
    // the event stream becomes a per-user op log (hash-derived
    // insert/update/delete ops), and the final state is LAST-WRITE-WINS
    // per key — one partitioned rank, deletes become tombstones that
    // drop the key's value. The log-compaction semantic under every CDC
    // sink, distinct from stream_merge_upsert's increment arithmetic.
    Q("pipe_cdc_apply",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val log = events(s, d).select(col("user_id").as("k"),
          unix_micros(col("ts")).as("t"), col("event_id").as("e"),
          round(col("value") * 100).cast("long").as("cents"),
          when(Portable.stableHash64(col("event_id")) % 10 === 0, "D")
            .when(Portable.stableHash64(col("event_id")) % 10 < 3, "I")
            .otherwise("U").as("op"))
        log
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("t").desc, col("e").desc)))
          .filter(col("rk") === 1)
          .select(col("k").as("user_id"), col("op").as("last_op"),
            when(col("op") =!= "D", col("cents")).as("final_cents"))
          .orderBy(col("user_id"))
      },
      Some(sql(s"""WITH log_ AS (SELECT user_id AS k, epoch_us(ts) AS t, event_id AS e,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       CASE WHEN ${Portable.stableHash64Sql("event_id")} % 10 = 0 THEN 'D'
                            WHEN ${Portable.stableHash64Sql("event_id")} % 10 < 3 THEN 'I'
                            ELSE 'U' END AS op
                     FROM events),
                   rk AS (SELECT k, op, cents,
                       row_number() OVER (PARTITION BY k ORDER BY t DESC, e DESC) AS rk
                     FROM log_)
                   SELECT k AS user_id, op AS last_op,
                     CASE WHEN op <> 'D' THEN cents END AS final_cents
                   FROM rk WHERE rk = 1 ORDER BY user_id"""))),

    // MARKETING ATTRIBUTION (first-touch vs last-touch): every purchase
    // credits a channel (deterministic hash channel on its user's
    // click events) — last-touch takes the latest click BEFORE the
    // purchase (the as-of carry-forward window), first-touch the
    // user's earliest click overall. Purchases with no preceding click
    // fall into the 'none' bucket, keeping total credits = total
    // purchases (pinned by the credit sums). One shuffle on user_id.
    Q("pipe_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t"), col("event_type"),
          when(Portable.stableHash64(concat(col("event_id"), lit("|ch"))) % 3 === 0, "email")
            .when(Portable.stableHash64(concat(col("event_id"), lit("|ch"))) % 3 === 1, "ads")
            .otherwise("organic").as("channel"))
        val wSeq = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
        val attributed = ev
          .withColumn("last_click_ch", last(
            when(col("event_type") === "click", col("channel")), ignoreNulls = true)
            .over(wSeq.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("first_click_ch", first(
            when(col("event_type") === "click", col("channel")), ignoreNulls = true)
            .over(wSeq.rowsBetween(Window.unboundedPreceding, -1)))
          .filter(col("event_type") === "purchase")
        val credits = attributed
          .select(coalesce(col("last_click_ch"), lit("none")).as("lt"),
            coalesce(col("first_click_ch"), lit("none")).as("ft"))
        credits.select(col("lt").as("channel"), lit(1L).as("last_c"), lit(0L).as("first_c"))
          .union(credits.select(col("ft").as("channel"), lit(0L).as("last_c"),
            lit(1L).as("first_c")))
          .groupBy(col("channel"))
          .agg(sum(col("last_c")).as("last_touch"), sum(col("first_c")).as("first_touch"))
          .orderBy(col("channel"))
      },
      Some(sql(s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type,
                       CASE WHEN ${Portable.stableHash64Sql("CAST(event_id AS VARCHAR) || '|ch'")} % 3 = 0 THEN 'email'
                            WHEN ${Portable.stableHash64Sql("CAST(event_id AS VARCHAR) || '|ch'")} % 3 = 1 THEN 'ads'
                            ELSE 'organic' END AS channel
                     FROM events),
                   attributed AS (SELECT event_type,
                       last_value(CASE WHEN event_type = 'click' THEN channel END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt0,
                       first_value(CASE WHEN event_type = 'click' THEN channel END IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft0
                     FROM ev),
                   credits AS (SELECT COALESCE(lt0, 'none') AS lt, COALESCE(ft0, 'none') AS ft
                               FROM attributed WHERE event_type = 'purchase')
                   SELECT channel,
                     CAST(sum(last_c) AS BIGINT) AS last_touch,
                     CAST(sum(first_c) AS BIGINT) AS first_touch
                   FROM (SELECT lt AS channel, 1 AS last_c, 0 AS first_c FROM credits
                         UNION ALL
                         SELECT ft AS channel, 0 AS last_c, 1 AS first_c FROM credits)
                   GROUP BY channel ORDER BY channel"""))),

    // REFERENTIAL-INTEGRITY AUDIT of the star schema: per foreign-key
    // relationship, the child row count, the orphan count (children
    // whose key misses the parent — LEFT ANTI join, dims broadcast),
    // and the parent-side primary-key duplicate count. The QA report
    // every warehouse load gate runs; all counts exact.
    Q("pipe_fk_audit",
      (s, d) => {
        def rel(name: String, child: DataFrame, ck: String,
                parent: DataFrame, pk: String): DataFrame = {
          val orphans = child.join(broadcast(parent), col(ck) === col(pk), "left_anti")
          val dups = parent.groupBy(col(pk)).agg(count(lit(1)).as("c"))
            .agg(sum(when(col("c") > 1, 1L).otherwise(0L)).as("pk_dups"))
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
            .crossJoin(dups)
            .select(lit(name).as("relationship"), col("n_child"),
              col("n_orphans"), col("pk_dups"))
        }
        val t = (n: String) => table(s, d, n)
        rel("orders->customer", t("orders"), "o_custkey", t("customer"), "c_custkey")
          .unionByName(rel("lineitem->orders", t("lineitem"), "l_orderkey",
            t("orders"), "o_orderkey"))
          .unionByName(rel("lineitem->part", t("lineitem"), "l_partkey",
            t("part"), "p_partkey"))
          .unionByName(rel("lineitem->supplier", t("lineitem"), "l_suppkey",
            t("supplier"), "s_suppkey"))
          .unionByName(rel("customer->nation", t("customer"), "c_nationkey",
            t("nation"), "n_nationkey"))
          .orderBy(col("relationship"))
      },
      Some(sql("""SELECT 'customer->nation' AS relationship,
                    (SELECT count(*) FROM customer) AS n_child,
                    (SELECT count(*) FROM customer c WHERE NOT EXISTS
                      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans,
                    (SELECT count(*) FROM (SELECT n_nationkey FROM nation
                      GROUP BY 1 HAVING count(*) > 1)) AS pk_dups
                  UNION ALL
                  SELECT 'lineitem->orders',
                    (SELECT count(*) FROM lineitem),
                    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
                    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                      GROUP BY 1 HAVING count(*) > 1))
                  UNION ALL
                  SELECT 'lineitem->part',
                    (SELECT count(*) FROM lineitem),
                    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
                    (SELECT count(*) FROM (SELECT p_partkey FROM part
                      GROUP BY 1 HAVING count(*) > 1))
                  UNION ALL
                  SELECT 'lineitem->supplier',
                    (SELECT count(*) FROM lineitem),
                    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                      (SELECT 1 FROM supplier sp WHERE sp.s_suppkey = l.l_suppkey)),
                    (SELECT count(*) FROM (SELECT s_suppkey FROM supplier
                      GROUP BY 1 HAVING count(*) > 1))
                  UNION ALL
                  SELECT 'orders->customer',
                    (SELECT count(*) FROM orders),
                    (SELECT count(*) FROM orders o WHERE NOT EXISTS
                      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
                    (SELECT count(*) FROM (SELECT c_custkey FROM customer
                      GROUP BY 1 HAVING count(*) > 1))
                  ORDER BY relationship"""))),

    // ORDER-INDEPENDENT TABLE CHECKSUMS (migration parity): each
    // dimension table reduced to (row count, (Σ rowhash mod p) mod p)
    // where the row rendering is a canonical '|'-joined string with
    // money quantized to exact cents — the cross-engine "did the copy
    // arrive intact" fingerprint. Commutative sum ⇒ partition-order
    // free. The per-row residues are < 2^31 but a BIGINT sum of them
    // would wrap past ~4.3e9 rows, so the accumulation runs in
    // decimal(38,0) (matching DuckDB's HUGEINT sum) and only the final
    // mod-p projection returns to BIGINT — exact to ~1e28 rows.
    Q("pipe_table_checksum",
      (s, d) => {
        val P = 2147483647L
        def ck(name: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_rows"),
            (sum((Portable.stableHash64(col("r")) % P).cast("decimal(38,0)")) % P)
              .cast("long").as("checksum"))
            .select(lit(name).as("tbl"), col("n_rows"), col("checksum"))
        ck("customer", table(s, d, "customer").select(concat_ws("|",
            col("c_custkey"), col("c_name"), col("c_nationkey"),
            round(col("c_acctbal") * 100).cast("long")).as("r")))
          .unionByName(ck("nation", table(s, d, "nation").select(concat_ws("|",
            col("n_nationkey"), col("n_name"), col("n_regionkey")).as("r"))))
          .unionByName(ck("region", table(s, d, "region").select(concat_ws("|",
            col("r_regionkey"), col("r_name")).as("r"))))
          .unionByName(ck("supplier", table(s, d, "supplier").select(concat_ws("|",
            col("s_suppkey"), col("s_name"), col("s_nationkey"),
            round(col("s_acctbal") * 100).cast("long")).as("r"))))
          .orderBy(col("tbl"))
      },
      Some(sql(s"""SELECT 'customer' AS tbl, count(*) AS n_rows,
                     CAST(sum(${Portable.stableHash64Sql(
                       "CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR)")} % 2147483647) % 2147483647 AS BIGINT) AS checksum
                   FROM customer
                   UNION ALL
                   SELECT 'nation', count(*),
                     CAST(sum(${Portable.stableHash64Sql(
                       "CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' || CAST(n_regionkey AS VARCHAR)")} % 2147483647) % 2147483647 AS BIGINT)
                   FROM nation
                   UNION ALL
                   SELECT 'region', count(*),
                     CAST(sum(${Portable.stableHash64Sql(
                       "CAST(r_regionkey AS VARCHAR) || '|' || r_name")} % 2147483647) % 2147483647 AS BIGINT)
                   FROM region
                   UNION ALL
                   SELECT 'supplier', count(*),
                     CAST(sum(${Portable.stableHash64Sql(
                       "CAST(s_suppkey AS VARCHAR) || '|' || s_name || '|' || CAST(s_nationkey AS VARCHAR) || '|' || CAST(CAST(round(s_acctbal * 100) AS BIGINT) AS VARCHAR)")} % 2147483647) % 2147483647 AS BIGINT)
                   FROM supplier
                   ORDER BY tbl"""))),

    // COLUMN PROFILE + DATA-CONTRACT EXPECTATIONS (the Great-
    // Expectations report): per column of `events` — null count,
    // distinct count, canonical min/max rendering (timestamps as exact
    // epoch micros), and the column's contract verdict (id uniqueness,
    // non-negative values, closed event-type domain). ONE scan: every
    // profile cell is an aggregate of the same pass, unpivoted to rows.
    Q("pipe_column_profile",
      (s, d) => {
        val ev = events(s, d)
        val prof = ev.agg(
          count(lit(1)).as("n"),
          sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("nn_id"),
          countDistinct(col("event_id")).as("nd_id"),
          min(col("event_id")).cast("string").as("mn_id"),
          max(col("event_id")).cast("string").as("mx_id"),
          sum(when(col("ts").isNull, 1L).otherwise(0L)).as("nn_ts"),
          countDistinct(col("ts")).as("nd_ts"),
          min(unix_micros(col("ts"))).cast("string").as("mn_ts"),
          max(unix_micros(col("ts"))).cast("string").as("mx_ts"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nn_u"),
          countDistinct(col("user_id")).as("nd_u"),
          min(col("user_id")).cast("string").as("mn_u"),
          max(col("user_id")).cast("string").as("mx_u"),
          sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("nn_t"),
          countDistinct(col("event_type")).as("nd_t"),
          min(col("event_type")).as("mn_t"), max(col("event_type")).as("mx_t"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("nn_v"),
          countDistinct(round(col("value") * 100).cast("long")).as("nd_v"),
          min(round(col("value") * 100).cast("long")).cast("string").as("mn_v"),
          max(round(col("value") * 100).cast("long")).cast("string").as("mx_v"),
          sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_v"),
          sum(when(!col("event_type").isin("click", "error", "purchase", "signup", "view"),
            1L).otherwise(0L)).as("bad_t"))
        prof.selectExpr("""stack(5,
            'event_id',   nn_id, nd_id, mn_id, mx_id, nd_id = n,
            'event_type', nn_t,  nd_t,  mn_t,  mx_t,  bad_t = 0,
            'ts',         nn_ts, nd_ts, mn_ts, mx_ts, nn_ts = 0,
            'user_id',    nn_u,  nd_u,  mn_u,  mx_u,  nn_u = 0,
            'value',      nn_v,  nd_v,  mn_v,  mx_v,  neg_v = 0)
          AS (col_name, n_nulls, n_distinct, min_s, max_s, contract_ok)""")
          .orderBy(col("col_name"))
      },
      Some(sql("""WITH p AS (SELECT count(*) AS n,
                       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_id,
                       count(DISTINCT event_id) AS nd_id,
                       CAST(min(event_id) AS VARCHAR) AS mn_id, CAST(max(event_id) AS VARCHAR) AS mx_id,
                       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ts,
                       count(DISTINCT ts) AS nd_ts,
                       CAST(min(epoch_us(ts)) AS VARCHAR) AS mn_ts, CAST(max(epoch_us(ts)) AS VARCHAR) AS mx_ts,
                       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_u,
                       count(DISTINCT user_id) AS nd_u,
                       CAST(min(user_id) AS VARCHAR) AS mn_u, CAST(max(user_id) AS VARCHAR) AS mx_u,
                       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_t,
                       count(DISTINCT event_type) AS nd_t,
                       min(event_type) AS mn_t, max(event_type) AS mx_t,
                       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_v,
                       count(DISTINCT CAST(round(value * 100) AS BIGINT)) AS nd_v,
                       CAST(min(CAST(round(value * 100) AS BIGINT)) AS VARCHAR) AS mn_v,
                       CAST(max(CAST(round(value * 100) AS BIGINT)) AS VARCHAR) AS mx_v,
                       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_v,
                       CAST(sum(CASE WHEN event_type NOT IN
                         ('click', 'error', 'purchase', 'signup', 'view') THEN 1 ELSE 0 END) AS BIGINT) AS bad_t
                     FROM events)
                   SELECT 'event_id' AS col_name, nn_id AS n_nulls, nd_id AS n_distinct,
                     mn_id AS min_s, mx_id AS max_s, nd_id = n AS contract_ok FROM p
                   UNION ALL SELECT 'event_type', nn_t, nd_t, mn_t, mx_t, bad_t = 0 FROM p
                   UNION ALL SELECT 'ts', nn_ts, nd_ts, mn_ts, mx_ts, nn_ts = 0 FROM p
                   UNION ALL SELECT 'user_id', nn_u, nd_u, mn_u, mx_u, nn_u = 0 FROM p
                   UNION ALL SELECT 'value', nn_v, nd_v, mn_v, mx_v, neg_v = 0 FROM p
                   ORDER BY col_name"""))),

    // FRESHNESS / STALENESS SLA: per event type, the last-seen
    // timestamp and its lag behind the corpus watermark (global max ts
    // — the deterministic "now", pipe_decay_weights' trick), with a
    // 1-day SLA breach flag. Exact microsecond arithmetic, one grouped
    // aggregate + a broadcast 1-row watermark.
    Q("pipe_freshness_sla",
      (s, d) => {
        val ev = events(s, d)
        val wm = ev.agg(max(unix_micros(col("ts"))).as("wm_us"))
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(unix_micros(col("ts"))).as("last_us"))
          .crossJoin(broadcast(wm))
          .select(col("event_type"), col("n"),
            col("last_us"), (col("wm_us") - col("last_us")).as("lag_us"),
            ((col("wm_us") - col("last_us")) > 86400000000L).as("sla_breach"))
          .orderBy(col("event_type"))
      },
      Some(sql("""WITH wm AS (SELECT max(epoch_us(ts)) AS wm_us FROM events),
                   g AS (SELECT event_type, count(*) AS n,
                       max(epoch_us(ts)) AS last_us
                     FROM events GROUP BY event_type)
                   SELECT event_type, n, last_us,
                     wm_us - last_us AS lag_us,
                     (wm_us - last_us) > 86400000000 AS sla_breach
                   FROM g, wm ORDER BY event_type""")))
  )
}
