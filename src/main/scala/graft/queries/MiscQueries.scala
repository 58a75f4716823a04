package graft.queries

import graft.Engine
import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Remaining DataFrame-verb surface: JSON scalar functions over the
  * events `props` column (beyond-reference — the 1.3 fork had zero JSON
  * functions), DataFrameNaFunctions drop/fill/replace
  * (nullFunctions.scala:81 AtLeastNNonNulls + DataFrameNaFunctions
  * .scala:40-127), and typed Dataset ops (joinWith / reduceGroups — the
  * SchemaRDD→Dataset[T] mapping in SURVEY §1).
  */
object MiscQueries {

  val all: Seq[Q] = Seq(

    // JSON extraction (get_json_object + from_json round-trip).
    Q("expr_json",
      (s, d) => Engine.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k_struct"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod")),
      Some(sql("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
                  FROM events"""))),

    // na.fill + na.drop(minNonNulls) + na.replace over synthesized nulls.
    Q("na_handling",
      (s, d) => {
        val withNulls = table(s, d, "orders").select(
          col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status"),
          nullif(col("o_totalprice"), col("o_totalprice")) // always null
            .as("dead_col"),
          when(col("o_totalprice") > 300000.0, col("o_totalprice")).as("big_price"))
        withNulls
          .na.drop(1, Seq("status", "big_price")) // ≥1 non-null of the two
          .na.fill(Map("big_price" -> -1.0))
          .na.replace("status", Map("F" -> "FINISHED"))
      },
      Some(sql("""SELECT o_orderkey,
                   CASE WHEN status = 'F' THEN 'FINISHED' ELSE status END AS status,
                   CAST(NULL AS DOUBLE) AS dead_col,
                   coalesce(big_price, -1.0) AS big_price
                  FROM (SELECT o_orderkey,
                          nullif(o_orderstatus, 'P') AS status,
                          CASE WHEN o_totalprice > 300000.0 THEN o_totalprice END AS big_price
                        FROM orders)
                  WHERE status IS NOT NULL OR big_price IS NOT NULL"""))),

    // Typed Dataset path: joinWith + groupByKey/reduceGroups (the
    // Dataset[T] mapping of SchemaRDD; SURVEY §1 mapping summary).
    Q("typed_reduce_groups",
      (s, d) => {
        import s.implicits._
        val orders = table(s, d, "orders")
          .select(col("o_custkey").as("_1"), col("o_totalprice").as("_2"))
          .as[(Long, Double)]
        orders.groupByKey(_._1)
          .reduceGroups((a, b) => (a._1, a._2 + b._2))
          .map { case (k, (_, total)) => (k, math.round(total * 10000.0) / 10000.0) }
          .toDF("o_custkey", "spend")
      },
      Some(sql("""SELECT o_custkey, round(sum(o_totalprice), 4) AS spend
                  FROM orders GROUP BY o_custkey""")))
  )
}
