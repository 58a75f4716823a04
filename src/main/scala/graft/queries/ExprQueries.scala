package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.6 — the scalar expression surface
  * (catalyst/expressions/arithmetic.scala, predicates.scala,
  * stringOperations.scala, nullFunctions.scala, complexTypes.scala,
  * Cast.scala) plus the date/math extensions the reference lacked.
  *
  * Each query is a wide projection "matrix" over one table: every column
  * exercises one expression; the oracle recomputes it in DuckDB.
  * Scale posture: pure whole-stage-codegen projections over the scan —
  * no shuffle, no UDFs.
  */
object ExprQueries {

  val all: Seq[Q] = Seq(

    // Arithmetic (arithmetic.scala: Add/Subtract/Multiply/Divide:179
    // null-on-/0, Remainder:205, UnaryMinus:24, Sqrt:47, Abs:375,
    // MaxOf:327→greatest, Bitwise:234-297).
    Q("expr_arithmetic",
      (s, d) => table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") + col("l_tax")).as("add_"),
        (col("l_extendedprice") - col("l_discount")).as("sub_"),
        (col("l_quantity") * col("l_discount")).as("mul_"),
        (col("l_extendedprice") / col("l_quantity")).as("div_"),
        (col("l_quantity") / (col("l_quantity") - col("l_quantity"))).as("div_zero"), // null, not error
        (col("l_linenumber") % 3).as("mod_"),
        negate(col("l_quantity")).as("neg_"),
        sqrt(col("l_extendedprice")).as("sqrt_"),
        abs(col("l_discount") - lit(0.05)).as("abs_"),
        greatest(col("l_quantity"), col("l_extendedprice") / lit(1000.0)).as("greatest_"),
        least(col("l_quantity"), col("l_extendedprice") / lit(1000.0)).as("least_"),
        (col("l_orderkey").bitwiseAND(lit(255L))).as("band_"),
        (col("l_orderkey").bitwiseOR(lit(16L))).as("bor_"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("bxor_"),
        shiftright(col("l_orderkey"), 2).as("shr_")),
      Some(sql("""SELECT l_orderkey, l_linenumber,
                   l_extendedprice + l_tax AS add_,
                   l_extendedprice - l_discount AS sub_,
                   l_quantity * l_discount AS mul_,
                   l_extendedprice / l_quantity AS div_,
                   l_quantity / (l_quantity - l_quantity) AS div_zero,
                   l_linenumber % 3 AS mod_,
                   -l_quantity AS neg_,
                   sqrt(l_extendedprice) AS sqrt_,
                   abs(l_discount - 0.05) AS abs_,
                   greatest(l_quantity, l_extendedprice / 1000.0) AS greatest_,
                   least(l_quantity, l_extendedprice / 1000.0) AS least_,
                   l_orderkey & 255 AS band_,
                   l_orderkey | 16 AS bor_,
                   xor(l_orderkey, l_partkey) AS bxor_,
                   l_orderkey >> 2 AS shr_
                  FROM lineitem"""))),

    // Predicates (predicates.scala: In:94, If:322, CaseWhen:366, And/Or/Not,
    // comparison ops, EqualNullSafe:188).
    Q("expr_predicates",
      (s, d) => table(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderstatus").isin("F", "O").as("in_"),
        (!col("o_orderstatus").isin("F", "O")).as("not_in"),
        when(col("o_totalprice") > 200000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("case_"),
        when(col("o_orderstatus") === "F", lit(1L)).otherwise(lit(0L)).as("if_"),
        ((col("o_totalprice") > 150000.0) && (col("o_orderstatus") === "O")).as("and_"),
        ((col("o_totalprice") > 300000.0) || (col("o_orderstatus") === "P")).as("or_"),
        (col("o_custkey") <=> col("o_orderkey")).as("nseq_"),
        (col("o_totalprice") <= 100000.0).as("le_"),
        (col("o_totalprice") >= 400000.0).as("ge_"),
        (col("o_orderpriority") =!= "1-URGENT").as("neq_")),
      Some(sql("""SELECT o_orderkey,
                   o_orderstatus IN ('F','O') AS in_,
                   o_orderstatus NOT IN ('F','O') AS not_in,
                   CASE WHEN o_totalprice > 200000.0 THEN 'big'
                        WHEN o_totalprice > 100000.0 THEN 'mid'
                        ELSE 'small' END AS case_,
                   CASE WHEN o_orderstatus = 'F' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS if_,
                   o_totalprice > 150000.0 AND o_orderstatus = 'O' AS and_,
                   o_totalprice > 300000.0 OR o_orderstatus = 'P' AS or_,
                   o_custkey IS NOT DISTINCT FROM o_orderkey AS nseq_,
                   o_totalprice <= 100000.0 AS le_,
                   o_totalprice >= 400000.0 AS ge_,
                   o_orderpriority <> '1-URGENT' AS neq_
                  FROM orders"""))),

    // Strings (stringOperations.scala: Like:98, Upper:140, Lower:150,
    // Contains:186, StartsWith:194, EndsWith:202, Substring:211; plus
    // length/concat/trim extensions).
    Q("expr_strings",
      (s, d) => table(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_"),
        lower(col("p_brand")).as("lower_"),
        col("p_type").like("%BRUSHED%").as("like_"),
        col("p_type").startsWith("STANDARD").as("starts_"),
        col("p_type").endsWith("STEEL").as("ends_"),
        (instr(col("p_type"), "ANODIZED") > 0).as("contains_"),
        substring(col("p_name"), 1, 8).as("substr_"),
        substring(col("p_name"), -5, 5).as("substr_neg"),
        length(col("p_name")).cast("long").as("len_"),
        concat_ws("|", col("p_brand"), col("p_type")).as("concat_"),
        trim(col("p_name")).as("trim_"),
        instr(col("p_type"), "ED").cast("long").as("instr_"),
        col("p_name").rlike("^[a-m]").as("rlike_")),
      Some(sql("""SELECT p_partkey,
                   upper(p_name) AS upper_,
                   lower(p_brand) AS lower_,
                   p_type LIKE '%BRUSHED%' AS like_,
                   p_type LIKE 'STANDARD%' AS starts_,
                   p_type LIKE '%STEEL' AS ends_,
                   instr(p_type, 'ANODIZED') > 0 AS contains_,
                   substr(p_name, 1, 8) AS substr_,
                   CASE WHEN length(p_name) >= 5 THEN substr(p_name, length(p_name)-4, 5)
                        ELSE p_name END AS substr_neg,
                   CAST(length(p_name) AS BIGINT) AS len_,
                   concat_ws('|', p_brand, p_type) AS concat_,
                   trim(p_name) AS trim_,
                   CAST(instr(p_type, 'ED') AS BIGINT) AS instr_,
                   regexp_matches(p_name, '^[a-m]') AS rlike_
                  FROM part"""))),

    // Null handling (nullFunctions.scala: Coalesce:24, IsNull:57,
    // IsNotNull:68, AtLeastNNonNulls:81 — the df.na.* engine).
    Q("expr_nulls",
      (s, d) => table(s, d, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("nullable_st"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("UNKNOWN")).as("coalesce_"),
        nullif(col("o_orderstatus"), lit("P")).isNull.as("isnull_"),
        nullif(col("o_orderstatus"), lit("P")).isNotNull.as("isnotnull_"),
        // AtLeastNNonNulls(2) over three maybe-null columns
        ((when(nullif(col("o_orderstatus"), lit("P")).isNotNull, 1).otherwise(0)
          + when(nullif(col("o_orderpriority"), lit("1-URGENT")).isNotNull, 1).otherwise(0)
          + when(col("o_custkey").isNotNull, 1).otherwise(0)) >= 2).as("atleast2_"),
        nvl2(nullif(col("o_orderstatus"), lit("P")), lit("has"), lit("none")).as("nvl2_")),
      Some(sql("""SELECT o_orderkey,
                   nullif(o_orderstatus, 'P') AS nullable_st,
                   coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS coalesce_,
                   nullif(o_orderstatus, 'P') IS NULL AS isnull_,
                   nullif(o_orderstatus, 'P') IS NOT NULL AS isnotnull_,
                   (CASE WHEN nullif(o_orderstatus,'P') IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN nullif(o_orderpriority,'1-URGENT') IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) >= 2 AS atleast2_,
                   CASE WHEN nullif(o_orderstatus,'P') IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_
                  FROM orders"""))),

    // Cast matrix (Cast.scala:28) — ANSI off: bad casts → null (TRY_CAST in
    // the oracle); double→int truncates toward zero (trunc first in DuckDB,
    // whose CAST rounds).
    Q("expr_casts",
      (s, d) => table(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("long_to_str"),
        col("o_totalprice").cast("long").as("dbl_to_long"),
        col("o_totalprice").cast("string").as("dbl_to_str"),
        col("o_orderstatus").cast("int").as("bad_cast_null"),
        substring(col("o_orderpriority"), 1, 1).cast("int").cast("long").as("str_to_int"),
        col("o_orderdate").cast("date").as("ts_to_date"),
        col("o_orderdate").cast("date").cast("string").as("date_to_str"),
        col("o_orderkey").cast("double").as("long_to_dbl"),
        (col("o_totalprice") > 100000.0).cast("int").cast("long").as("bool_to_int")),
      Some(sql("""SELECT o_orderkey,
                   CAST(o_orderkey AS VARCHAR) AS long_to_str,
                   CAST(trunc(o_totalprice) AS BIGINT) AS dbl_to_long,
                   CAST(o_totalprice AS VARCHAR) AS dbl_to_str,
                   TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast_null,
                   CAST(TRY_CAST(substr(o_orderpriority,1,1) AS INTEGER) AS BIGINT) AS str_to_int,
                   CAST(o_orderdate AS DATE) AS ts_to_date,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_to_str,
                   CAST(o_orderkey AS DOUBLE) AS long_to_dbl,
                   CAST(CAST(o_totalprice > 100000.0 AS INTEGER) AS BIGINT) AS bool_to_int
                  FROM orders"""))),

    // Date/time (beyond-reference: 1.3 had only Cast + DateUtils).
    Q("expr_datetime",
      (s, d) => table(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")),
      Some(sql("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(day(o_orderdate) AS BIGINT) AS dom,
                   CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                   CAST(o_orderdate AS DATE) + 30 AS plus30,
                   CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
                   CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
                  FROM orders"""))),

    // Math extensions (beyond sqrt/abs — free in Spark 4, absent in 1.3).
    Q("expr_math",
      (s, d) => table(s, d, "part").select(
        col("p_partkey"),
        // divide first so the cut digit is never an exact trailing '5'
        // (Spark rounds the decimal repr, DuckDB the binary — ties differ)
        round(col("p_retailprice") / 7.0, 3).as("round3"),
        floor(col("p_retailprice")).cast("long").as("floor_"),
        ceil(col("p_retailprice")).cast("long").as("ceil_"),
        log(col("p_retailprice")).as("ln_"),
        log10(col("p_retailprice")).as("log10_"),
        exp(col("p_size").cast("double") / lit(10.0)).as("exp_"),
        pow(col("p_size").cast("double"), 2.0).as("pow_"),
        signum(col("p_retailprice") - lit(1500.0)).as("sign_")),
      Some(sql("""SELECT p_partkey,
                   round(p_retailprice / 7.0, 3) AS round3,
                   CAST(floor(p_retailprice) AS BIGINT) AS floor_,
                   CAST(ceil(p_retailprice) AS BIGINT) AS ceil_,
                   ln(p_retailprice) AS ln_,
                   log10(p_retailprice) AS log10_,
                   exp(CAST(p_size AS DOUBLE) / 10.0) AS exp_,
                   pow(CAST(p_size AS DOUBLE), 2.0) AS pow_,
                   CAST(CASE WHEN p_retailprice - 1500.0 > 0 THEN 1.0
                        WHEN p_retailprice - 1500.0 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sign_
                  FROM part"""))),

    // Complex types (complexTypes.scala: CreateArray:120, GetItem:27) over
    // a synthesized array column.
    Q("expr_complex",
      (s, d) => table(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Registry.arrDecStr(array(col("l_quantity"), col("l_discount"), col("l_tax"))).as("arr"),
        element_at(array(col("l_quantity"), col("l_discount"), col("l_tax")), 1).as("item0"),
        array_contains(array(col("l_returnflag"), col("l_linestatus")), "R").as("has_r"),
        size(array(col("l_quantity"), col("l_discount"))).cast("long").as("arr_len")),
      Some(sql("""SELECT l_orderkey, l_linenumber,
                   array_to_string(list_transform([l_quantity, l_discount, l_tax],
                     x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|') AS arr,
                   [l_quantity, l_discount, l_tax][1] AS item0,
                   list_contains([l_returnflag, l_linestatus], 'R') AS has_r,
                   CAST(len([l_quantity, l_discount]) AS BIGINT) AS arr_len
                  FROM lineitem"""))),

    // Generator / explode (generators.scala Explode:98, physical
    // Generate.scala:36; df.explode DataFrame.scala:712) — token explosion.
    Q("expr_explode",
      (s, d) => table(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token")),
      Some(sql("""SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE doc_id < 100"""))),

    // explode_outer: empty arrays keep the parent row (null-extended).
    Q("expr_explode_outer",
      (s, d) => table(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "), t => length(t) > 8)).as("long_token")),
      Some(sql("""SELECT doc_id, u.long_token FROM documents
                  LEFT JOIN LATERAL (SELECT unnest(list_filter(string_split(text,' '),
                    t -> length(t) > 8)) AS long_token) u ON true
                  WHERE doc_id < 100""")))
  )
}
