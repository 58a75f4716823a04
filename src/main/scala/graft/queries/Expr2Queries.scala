package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Extended scalar-function surface (beyond-reference §2.6 extensions:
  * the 1.3 fork reached regexp/date/array functions only through the Hive
  * UDF bridge — modern Spark has them native; declared and oracle-checked
  * here so a reference user gets the full function library).
  */
object Expr2Queries {

  val all: Seq[Q] = Seq(

    // regexp + padding + case/char surgery string functions.
    Q("expr_strings2",
      (s, d) => table(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("devoweled"),
        lpad(col("p_brand"), 12, "#").as("lpad_"),
        rpad(col("p_brand"), 12, "#").as("rpad_"),
        translate(col("p_brand"), "Bran#", "bRAN_").as("translate_"),
        initcap(lower(col("p_type"))).as("initcap_"),
        reverse(col("p_name")).as("reverse_"),
        repeat(col("p_brand"), 2).as("repeat_"),
        element_at(split(col("p_type"), " "), 1).as("split_part_"),
        left(col("p_name"), lit(6)).as("left_"),
        right(col("p_name"), lit(6)).as("right_"),
        (locate("STEEL", col("p_type")) > 0).as("locate_")),
      Some(sql("""SELECT p_partkey,
                   regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
                   regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
                   lpad(p_brand, 12, '#') AS lpad_,
                   rpad(p_brand, 12, '#') AS rpad_,
                   translate(p_brand, 'Bran#', 'bRAN_') AS translate_,
                   list_aggr(list_transform(string_split(lower(p_type), ' '),
                     w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS initcap_,
                   reverse(p_name) AS reverse_,
                   repeat(p_brand, 2) AS repeat_,
                   string_split(p_type, ' ')[1] AS split_part_,
                   p_name[:6] AS left_,
                   p_name[-6:] AS right_,
                   instr(p_type, 'STEEL') > 0 AS locate_
                  FROM part"""))),

    // Higher-order array functions (transform/filter/exists/forall/
    // aggregate/slice/flatten/sort/sequence/zip_with). Array-typed outputs
    // are flattened to '|'-joined decimal strings (Registry.arrDecStr) so
    // the harness's tabular checker can sort them.
    Q("expr_arrays",
      (s, d) => {
        import Registry.arrDecStr
        val arr = array(col("l_quantity"), col("l_discount"), col("l_tax"),
          col("l_extendedprice") / 1000.0)
        table(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          arrDecStr(transform(arr, x => round(x * 2.0, 6))).as("doubled"),
          arrDecStr(filter(arr, x => x > 1.0)).as("big_vals"),
          exists(arr, x => x > 40.0).as("any_big"),
          forall(arr, x => x >= 0.0).as("all_nonneg"),
          round(aggregate(arr, lit(0.0), (a, x) => a + x), 6).as("sum_"),
          arrDecStr(slice(sort_array(arr), 1, 2)).as("two_smallest"),
          round(element_at(sort_array(arr, asc = false), 1), 6).as("max_"),
          arrDecStr(flatten(array(arr, array(lit(0.0))))).as("flat"),
          size(sequence(lit(1), col("l_linenumber"))).cast("long").as("seq_n"),
          round(aggregate(zip_with(arr, arr, (x, y) => x * y), lit(0.0), (a, x) => a + x), 6)
            .as("self_dot"))
      },
      Some(sql("""SELECT l_orderkey, l_linenumber,
                   array_to_string(list_transform(list_transform(arr, x -> round(x * 2.0, 6)),
                     x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|') AS doubled,
                   coalesce(array_to_string(list_transform(list_filter(arr, x -> x > 1.0),
                     x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|'), '') AS big_vals,
                   len(list_filter(arr, x -> x > 40.0)) > 0 AS any_big,
                   len(list_filter(arr, x -> NOT (x >= 0.0))) = 0 AS all_nonneg,
                   round(list_sum(arr), 6) AS sum_,
                   array_to_string(list_transform(list_sort(arr)[1:2],
                     x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|') AS two_smallest,
                   round(list_sort(arr, 'DESC')[1], 6) AS max_,
                   array_to_string(list_transform(flatten([arr, [0.0]]),
                     x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), '|') AS flat,
                   CAST(l_linenumber AS BIGINT) AS seq_n,
                   round(list_sum(list_transform(arr, x -> x * x)), 6) AS self_dot
                  FROM (SELECT l_orderkey, l_linenumber,
                          [l_quantity, l_discount, l_tax, l_extendedprice / 1000.0] AS arr
                        FROM lineitem)"""))),

    // Extended datetime surface. months_between is restated on month
    // starts (both day 1 → exact integer months, the only form two
    // engines agree on); dayofweek offsets DuckDB's 0-based Sunday.
    Q("expr_datetime2",
      (s, d) => table(s, d, "orders").select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3mo"),
        months_between(lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")),
          date_trunc("month", col("o_orderdate"))).cast("long").as("mo_to_2000"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        to_date(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("parsed_date")),
      Some(sql("""SELECT o_orderkey,
                   CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
                   CAST(datediff('month', date_trunc('month', o_orderdate),
                        TIMESTAMP '2000-01-01 00:00:00') AS BIGINT) AS mo_to_2000,
                   CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
                   CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
                   strftime(o_orderdate, '%Y-%m') AS ym,
                   last_day(CAST(o_orderdate AS DATE)) AS month_end,
                   CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS parsed_date
                  FROM orders"""))),

    // Spark 4 VARIANT type (semi-structured columns without a declared
    // schema — the modern answer to the 1.3-era get_json_object UDF
    // pattern): parse once, typed path extraction, safe access to a
    // missing path, and the inferred variant schema.
    Q("expr_variant",
      (s, d) => graft.Engine.events(s, d).select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_var"),
        expr("try_variant_get(parse_json(props), '$.missing', 'bigint')").as("k_missing"),
        expr("schema_of_variant(parse_json(props))").as("vschema")),
      Some(sql("""SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_var,
                   CAST(NULL AS BIGINT) AS k_missing,
                   'OBJECT<k: BIGINT>' AS vschema
                  FROM events"""))),

    // try_* family: the explicit null-on-error forms (the 1.3-era Cast/
    // Divide semantics the engine pins globally via ansi=false, exposed
    // as per-expression opt-ins): /0, 64-bit overflow, bad cast, and
    // out-of-bounds element access all yield NULL, never an exception.
    Q("expr_try_functions",
      (s, d) => table(s, d, "nation").select(
        col("n_nationkey"),
        expr("try_divide(n_nationkey, n_nationkey % 3)").as("div3"),
        expr("try_add(9223372036854775807L, n_nationkey)").as("overflow_add"),
        expr("try_cast(n_name AS INT)").as("bad_cast"),
        expr("try_element_at(split(n_name, ' '), 99)").as("oob_elem")),
      Some(sql("""SELECT n_nationkey,
                   CASE WHEN n_nationkey % 3 = 0 THEN NULL
                        ELSE CAST(n_nationkey AS DOUBLE) / (n_nationkey % 3) END AS div3,
                   CASE WHEN n_nationkey > 0 THEN NULL
                        ELSE CAST(9223372036854775807 AS BIGINT) END AS overflow_add,
                   TRY_CAST(n_name AS INT) AS bad_cast,
                   string_split(n_name, ' ')[99] AS oob_elem
                  FROM nation"""))),

    // Temporal sequence generator: four month-starts from each order's
    // month — sequence(DATE, DATE, INTERVAL MONTH) flattened to a
    // string. Month-start anchors (day 1) sidestep the end-of-month
    // clamping divergence between stepped and multiplied interval
    // addition, pinning the shared core semantics.
    Q("expr_sequence_dates",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_sq")
        s.sql(sql("""
          SELECT o_orderkey,
                 array_join(transform(
                   sequence(m, add_months(m, 3), INTERVAL 1 MONTH),
                   x -> CAST(x AS STRING)), '|') AS months
          FROM (SELECT o_orderkey, trunc(o_orderdate, 'MM') AS m
                FROM graft_o_sq WHERE o_orderkey <= 100)"""))
      },
      Some(sql("""
        SELECT o_orderkey,
               array_to_string(list_transform(
                 generate_series(m, m + INTERVAL 3 MONTH, INTERVAL 1 MONTH),
                 x -> CAST(CAST(x AS DATE) AS VARCHAR)), '|') AS months
        FROM (SELECT o_orderkey, date_trunc('month', o_orderdate) AS m
              FROM orders WHERE o_orderkey <= 100)"""))),

    // IEEE special values in GROUP BY / comparison (the NaN golden
    // contract): NaN equals NaN for grouping, -0.0 normalizes into the
    // 0.0 group, and NaN compares GREATER than +Infinity — the
    // total-order the reference pinned in its double-aggregation rows.
    // Renderings differ ('NaN' vs 'nan'), so the oracle maps DuckDB's
    // spellings onto Spark's.
    Q("expr_double_special",
      (s, d) => {
        s.sql(sql("""
          SELECT CAST(x AS STRING) AS xs, count(*) AS n,
                 CAST(sum(CASE WHEN x > CAST('Infinity' AS DOUBLE)
                          THEN 1 ELSE 0 END) AS BIGINT) AS gt_inf
          FROM VALUES (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)),
                      (CAST('-Infinity' AS DOUBLE)), (1.5D),
                      (CAST('NaN' AS DOUBLE)), (0.0D), (-0.0D) AS t(x)
          GROUP BY x"""))
      },
      Some(sql("""
        SELECT CASE WHEN isnan(x) THEN 'NaN'
                    WHEN x = CAST('Infinity' AS DOUBLE) THEN 'Infinity'
                    WHEN x = CAST('-Infinity' AS DOUBLE) THEN '-Infinity'
                    ELSE CAST(x AS VARCHAR) END AS xs,
               count(*) AS n,
               CAST(sum(CASE WHEN x > CAST('Infinity' AS DOUBLE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS gt_inf
        FROM (VALUES (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)),
                     (CAST('-Infinity' AS DOUBLE)), (1.5),
                     (CAST('NaN' AS DOUBLE)), (0.0), (-0.0)) AS t(x)
        GROUP BY xs"""))),

    // Cryptographic digests (golden udf_md5/udf_sha2): md5 and sha2-256
    // hex digests agree across engines; crc32 is Spark-side and pinned
    // against DuckDB's bit-identical polynomial only via round-trip
    // stability — omitted here, the digest pair is the portable core.
    Q("expr_hash_digests",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_d_hd")
        s.sql(sql("""
          SELECT doc_id, md5(text) AS h_md5, sha2(text, 256) AS h_sha256
          FROM graft_d_hd WHERE doc_id < 100"""))
      },
      Some(sql("""
        SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        FROM documents WHERE doc_id < 100"""))),

    // AES round-trip (Spark 3.3 aes_encrypt/aes_decrypt): DuckDB has no
    // AES, so the oracle pins the ALGEBRAIC contract — decrypting the
    // ciphertext yields the plaintext byte-for-byte (ECB keeps the
    // ciphertext deterministic; GCM's random IV would not even
    // round-trip stably across runs of the hash compare).
    Q("expr_aes_roundtrip",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_d_aes")
        s.sql(sql("""
          SELECT doc_id,
                 CAST(aes_decrypt(aes_encrypt(text, '0000111122223333', 'ECB'),
                      '0000111122223333', 'ECB') AS STRING) AS roundtrip
          FROM graft_d_aes WHERE doc_id < 100"""))
      },
      Some(sql("""
        SELECT doc_id, text AS roundtrip
        FROM documents WHERE doc_id < 100"""))),

    // Base conversion (golden udf_conv/udf_hex): decimal→hex via conv /
    // hex and hex→decimal back, plus binary. Spark's conv emits
    // uppercase and DuckDB's printf('%x') lowercase — the lower() pins
    // the case convention; the round-trip pins correctness.
    Q("expr_conv",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_cv")
        s.sql(sql("""
          SELECT o_orderkey,
                 lower(conv(CAST(o_orderkey AS STRING), 10, 16)) AS hex_str,
                 CAST(conv(conv(CAST(o_orderkey AS STRING), 10, 16), 16, 10)
                      AS BIGINT) AS roundtrip,
                 conv(CAST(o_orderkey % 16 AS STRING), 10, 2) AS bin4
          FROM graft_o_cv WHERE o_orderkey <= 300"""))
      },
      Some(sql("""
        SELECT o_orderkey,
               printf('%x', o_orderkey) AS hex_str,
               CAST(concat('0x', printf('%x', o_orderkey)) AS BIGINT) AS roundtrip,
               bin(o_orderkey % 16) AS bin4
        FROM orders WHERE o_orderkey <= 300"""))),

    // xpath extraction (Hive golden udf_xpath family; the reference
    // routes these through HiveGenericUdf, Spark 4 has them native):
    // scalar string/int extraction and the node-list variant flattened
    // to one string, over XML built deterministically from columns. The
    // oracle inverts with regexp extraction.
    Q("expr_xpath",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n_xp")
        s.sql(sql("""
          SELECT n_nationkey,
                 xpath_string(xml, '/doc/name') AS xname,
                 CAST(xpath_int(xml, '/doc/region') AS INT) AS xregion,
                 array_join(xpath(xml, '/doc/tags/t/text()'), '|') AS xtags
          FROM (SELECT n_nationkey,
                  concat('<doc><name>', n_name, '</name><region>', n_regionkey,
                         '</region><tags><t>a', n_nationkey % 3, '</t><t>b',
                         n_nationkey % 2, '</t></tags></doc>') AS xml
                FROM graft_n_xp)"""))
      },
      Some(sql("""
        SELECT n_nationkey, n_name AS xname,
               CAST(n_regionkey AS INT) AS xregion,
               'a' || (n_nationkey % 3) || '|' || 'b' || (n_nationkey % 2) AS xtags
        FROM nation"""))),

    // Datetime convention grid (golden date_udf / udf_weekofyear
    // family): week truncation (both engines truncate to MONDAY),
    // quarter, day-of-week (Spark 1=Sunday vs DuckDB 0=Sunday — the
    // oracle shifts by one, pinning the exact convention difference),
    // month-end, and day arithmetic against a fixed epoch.
    Q("expr_datetime3",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_dt3")
        s.sql(sql("""
          SELECT o_orderkey,
                 trunc(o_orderdate, 'week') AS week_start,
                 CAST(quarter(o_orderdate) AS INT) AS qtr,
                 CAST(dayofweek(o_orderdate) AS INT) AS dow,
                 last_day(o_orderdate) AS month_end,
                 CAST(datediff(o_orderdate, DATE '2020-01-01') AS INT) AS days_since
          FROM graft_o_dt3 WHERE o_orderkey <= 200"""))
      },
      Some(sql("""
        SELECT o_orderkey,
               date_trunc('week', o_orderdate) AS week_start,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               last_day(o_orderdate) AS month_end,
               CAST(datediff('day', DATE '2020-01-01', o_orderdate) AS INT) AS days_since
        FROM orders WHERE o_orderkey <= 200"""))),

    // Negative-operand division/modulo semantics: both engines truncate
    // integer division toward zero and give % the DIVIDEND's sign;
    // pmod (always-positive modulo) exists only in Spark, so the oracle
    // restates it as ((a % b) + b) % b — the exact rewrite a porting
    // user needs.
    Q("expr_mod_semantics",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_mod")
        s.sql(sql("""
          SELECT o_orderkey,
                 (o_orderkey - 50) % 7 AS m,
                 pmod(o_orderkey - 50, 7) AS pm,
                 (o_orderkey - 50) div 7 AS dv
          FROM graft_o_mod WHERE o_orderkey <= 100"""))
      },
      Some(sql("""
        SELECT o_orderkey,
               (o_orderkey - 50) % 7 AS m,
               (((o_orderkey - 50) % 7) + 7) % 7 AS pm,
               (o_orderkey - 50) // 7 AS dv
        FROM orders WHERE o_orderkey <= 100"""))),

    // Modern string surface (Spark 3.3+ additions a reference user hits
    // first when porting): split_part, startswith/endswith/contains as
    // boolean columns, reverse, repeat, and printf-style formatting.
    Q("expr_strings3",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_d11x")
        s.sql(sql("""
          SELECT doc_id,
                 split_part(text, ' ', 2) AS second_word,
                 CAST(startswith(text, 'the') AS INT) AS starts_the,
                 CAST(endswith(source, '1') AS INT) AS src_ends_1,
                 CAST(contains(text, 'join') AS INT) AS has_join,
                 reverse(lang) AS rev_lang,
                 repeat(lang, 3) AS rep_lang,
                 format_string('%s-%d', lang, doc_id) AS tagged
          FROM graft_d11x WHERE doc_id < 50"""))
      },
      Some(sql("""
        SELECT doc_id,
               split_part(text, ' ', 2) AS second_word,
               CAST(starts_with(text, 'the') AS INT) AS starts_the,
               CAST(ends_with(source, '1') AS INT) AS src_ends_1,
               CAST(contains(text, 'join') AS INT) AS has_join,
               reverse(lang) AS rev_lang,
               repeat(lang, 3) AS rep_lang,
               printf('%s-%d', lang, doc_id) AS tagged
        FROM documents WHERE doc_id < 50"""))),

    // Map higher-order functions (transform_keys / transform_values /
    // map_filter / map_zip_with / map_concat / map_entries round-trip) —
    // the map half of the lambda surface expr_arrays covers for arrays.
    // Maps are constructed FROM base columns, so the DuckDB oracle
    // restates each transformed map directly from those columns; map
    // outputs travel as ','-joined sorted 'k=v' strings (map iteration
    // order is not a cross-engine contract, sorted rendering is).
    Q("expr_map_hof",
      (s, d) => {
        val m1 = map(lit("size"), col("p_size").cast("long"),
          lit("bucket"), pmod(col("p_partkey"), lit(7)))
        val m2 = map(lit("size"), (col("p_size") * 10).cast("long"),
          lit("extra"), lit(1L))
        def render(m: org.apache.spark.sql.Column) =
          array_join(sort_array(transform(map_entries(m),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string")))), ",")
        table(s, d, "part").filter(col("p_partkey") <= 200).select(
          col("p_partkey"),
          element_at(m1, lit("size")).as("get_size"),
          render(transform_keys(m1, (k, _) => upper(k))).as("tk"),
          render(transform_values(m1, (_, v) => v + 100)).as("tv"),
          render(map_filter(m1, (_, v) => v % 2 === 0)).as("mf"),
          render(map_zip_with(m1, m2,
            (_, v1, v2) => coalesce(v1, lit(0L)) + coalesce(v2, lit(0L)))).as("mz"),
          render(map_concat(m1, map(lit("extra"), lit(1L)))).as("mc"),
          size(map_entries(map_from_entries(map_entries(m1)))).as("ne"))
      },
      Some(sql("""
        SELECT p_partkey,
               CAST(p_size AS BIGINT) AS get_size,
               'BUCKET=' || CAST(p_partkey % 7 AS VARCHAR)
                 || ',SIZE=' || CAST(p_size AS VARCHAR) AS tk,
               'bucket=' || CAST(p_partkey % 7 + 100 AS VARCHAR)
                 || ',size=' || CAST(p_size + 100 AS VARCHAR) AS tv,
               concat_ws(',',
                 CASE WHEN p_partkey % 7 % 2 = 0
                      THEN 'bucket=' || CAST(p_partkey % 7 AS VARCHAR) END,
                 CASE WHEN p_size % 2 = 0
                      THEN 'size=' || CAST(p_size AS VARCHAR) END) AS mf,
               'bucket=' || CAST(p_partkey % 7 AS VARCHAR)
                 || ',extra=1,size=' || CAST(p_size * 11 AS VARCHAR) AS mz,
               'bucket=' || CAST(p_partkey % 7 AS VARCHAR)
                 || ',extra=1,size=' || CAST(p_size AS VARCHAR) AS mc,
               CAST(2 AS INTEGER) AS ne
        FROM part WHERE p_partkey <= 200"""))),

    // timestampadd / timestampdiff (the ANSI dateadd surface): interval
    // addition with calendar-month clamping, and COMPLETE-unit diffs
    // from a fixed anchor. The diff oracle uses epoch_us integer
    // arithmetic (integral floor-div, positive spans) — double-seconds
    // epoch() would wobble at exact unit boundaries.
    Q("expr_ts_arith",
      (s, d) => graft.Engine.events(s, d)
        .filter(col("event_id") <= 300)
        .select(col("event_id"),
          expr("timestampadd(HOUR, 5, ts)").as("plus5h"),
          expr("timestampadd(MONTH, 1, ts)").as("plus1mo"),
          expr("timestampdiff(DAY, TIMESTAMP '2024-01-01 00:00:00', ts)").as("days_since"),
          expr("timestampdiff(MINUTE, TIMESTAMP '2024-01-01 00:00:00', ts)").as("mins_since"),
          expr("timestampdiff(HOUR, ts, timestampadd(HOUR, 5, ts))").as("inv5")),
      Some(sql("""
        SELECT event_id,
               ts + INTERVAL 5 HOUR AS plus5h,
               ts + INTERVAL 1 MONTH AS plus1mo,
               (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 86400000000 AS days_since,
               (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 60000000 AS mins_since,
               CAST(5 AS BIGINT) AS inv5
        FROM events WHERE event_id <= 300"""))),

    // Array mutation + set algebra (array_insert/append/position/remove/
    // union/intersect/except/arrays_overlap): arrays are BUILT from
    // p_size, so the oracle states each result directly from the base
    // column with CASE arms for the p_size∈{6,7} collision branches —
    // no cross-engine list-function parity assumed. Order-preserving
    // dedup semantics (first occurrence wins) are part of the pin.
    Q("expr_arrays2",
      (s, d) => {
        val a1 = array(col("p_size"), col("p_size") + 1, lit(7))
        val a2 = array(lit(7), col("p_size"))
        table(s, d, "part").filter(col("p_partkey") <= 300).select(
          col("p_partkey"), col("p_size"),
          Registry.arrStr(array_insert(a1, lit(2), lit(99))).as("ins"),
          Registry.arrStr(array_append(a2, lit(5))).as("app"),
          array_position(a1, lit(7)).as("pos7"),
          Registry.arrStr(array_remove(a1, lit(7))).as("rm7"),
          Registry.arrStr(array_union(a1, a2)).as("un"),
          Registry.arrStr(array_intersect(a1, a2)).as("inter"),
          Registry.arrStr(array_except(a1, a2)).as("exc"),
          arrays_overlap(a1, a2).as("ovl"))
      },
      Some(sql("""
        SELECT p_partkey, p_size,
               p_size || '|99|' || (p_size + 1) || '|7' AS ins,
               '7|' || p_size || '|5' AS app,
               CAST(CASE WHEN p_size = 7 THEN 1
                         WHEN p_size = 6 THEN 2 ELSE 3 END AS BIGINT) AS pos7,
               CASE WHEN p_size = 7 THEN '8'
                    WHEN p_size = 6 THEN '6' ELSE p_size || '|' || (p_size + 1) END AS rm7,
               CASE WHEN p_size = 7 THEN '7|8'
                    WHEN p_size = 6 THEN '6|7'
                    ELSE p_size || '|' || (p_size + 1) || '|7' END AS un,
               CASE WHEN p_size = 7 THEN '7'
                    ELSE p_size || '|7' END AS inter,
               CASE WHEN p_size = 7 THEN '8'
                    WHEN p_size = 6 THEN '' ELSE CAST(p_size + 1 AS VARCHAR) END AS exc,
               true AS ovl
        FROM part WHERE p_partkey <= 300"""))),

    // Byte-level and surgical string functions: octet/bit/char length,
    // ascii/chr round-trip, overlay (restated in DuckDB as substr
    // surgery — it has no OVERLAY), and btrim with a custom char set.
    Q("expr_strings4",
      (s, d) => table(s, d, "part").filter(col("p_partkey") <= 200).select(
        col("p_partkey"),
        octet_length(col("p_name")).as("olen"),
        bit_length(col("p_name")).as("blen"),
        char_length(col("p_name")).as("clen"),
        ascii(col("p_brand")).as("first_code"),
        chr(ascii(col("p_brand")) + lit(1)).as("next_char"),
        overlay(col("p_brand"), lit("__"), lit(2)).as("ov"),
        expr("btrim(p_brand, 'B#153')").as("bt")),
      Some(sql("""
        SELECT p_partkey,
               CAST(strlen(p_name) AS INTEGER) AS olen,
               CAST(bit_length(p_name) AS INTEGER) AS blen,
               CAST(length(p_name) AS INTEGER) AS clen,
               CAST(ascii(p_brand) AS INTEGER) AS first_code,
               chr(ascii(p_brand) + 1) AS next_char,
               substr(p_brand, 1, 1) || '__' || substr(p_brand, 4) AS ov,
               trim(p_brand, 'B#153') AS bt
        FROM part WHERE p_partkey <= 200"""))),

    // date_format pattern grid vs strftime: month/day-name
    // abbreviations, day-of-year, AM/PM, and 12-hour clock — the
    // report-formatting surface where Java patterns (MMM, EEE, DDD, a,
    // hh) and C patterns (%b, %a, %j, %p, %I) must agree under the
    // default locale. Day-of-year is zero-padded on the C side, so the
    // Java pattern is padded DDD.
    Q("expr_datetime4",
      (s, d) => graft.Engine.events(s, d)
        .filter(col("event_id") <= 200)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso"),
          date_format(col("ts"), "MMM").as("mon"),
          date_format(col("ts"), "EEE").as("dow"),
          date_format(col("ts"), "DDD").as("doy"),
          date_format(col("ts"), "a").as("ampm"),
          date_format(col("ts"), "hh").as("h12")),
      Some(sql("""SELECT event_id,
                    strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso,
                    strftime(ts, '%b') AS mon,
                    strftime(ts, '%a') AS dow,
                    strftime(ts, '%j') AS doy,
                    strftime(ts, '%p') AS ampm,
                    strftime(ts, '%I') AS h12
                  FROM events WHERE event_id <= 200"""))),

    // format_number (thousands-grouped report rendering) against
    // DuckDB's Python-style format('{:,.2f}') — o_totalprice already
    // carries exactly 2 decimals, so no rounding-mode divergence can
    // enter the comparison.
    Q("expr_format_number",
      (s, d) => table(s, d, "orders").filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          format_number(col("o_totalprice"), 2).as("pretty")),
      Some(sql("""SELECT o_orderkey,
                    format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) || '.' ||
                    lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100
                         AS VARCHAR), 2, '0') AS pretty
                  FROM orders WHERE o_orderkey <= 300"""))),

    // arrays_zip: positional struct-zip of parallel arrays (the
    // columns-to-records pivot for co-indexed sequences), including the
    // ragged case where the shorter side null-pads. Rendered as
    // '|'-joined 'a:b' pairs; the oracle rebuilds the pairs from the
    // generating formulas.
    Q("expr_arrays_zip",
      (s, d) => {
        val a1 = sequence(lit(1), col("p_size") % 4 + 2)     // 2..5 elements
        val a2 = transform(sequence(lit(1), lit(3)), x => x * 10)
        table(s, d, "part").filter(col("p_partkey") <= 200).select(
          col("p_partkey"), (col("p_size") % 4 + 2).as("len1"),
          Registry.arrStr(transform(arrays_zip(a1, a2),
            e => concat_ws(":",
              coalesce(e.getField("0").cast("string"), lit("null")),
              coalesce(e.getField("1").cast("string"), lit("null"))))).as("zipped"))
      },
      Some(sql("""WITH t AS (SELECT p_partkey,
                    p_size % 4 + 2 AS len1 FROM part WHERE p_partkey <= 200)
                  SELECT p_partkey, CAST(len1 AS INTEGER) AS len1,
                    array_to_string(list_transform(
                      range(1, greatest(len1, 3) + 1),
                      i -> (CASE WHEN i <= len1 THEN CAST(i AS VARCHAR)
                                 ELSE 'null' END) || ':' ||
                           (CASE WHEN i <= 3 THEN CAST(i * 10 AS VARCHAR)
                                 ELSE 'null' END)), '|') AS zipped
                  FROM t"""))),

    // Nested-struct surgery (Column.withField / dropFields): add a
    // field, replace a field in place, and drop one — WITHOUT
    // rebuilding the struct by hand, the ergonomics that make deep
    // event-schema evolution writable. The surgered struct travels as
    // its field values.
    Q("expr_struct_surgery",
      (s, d) => {
        val base = struct(col("n_nationkey").as("k"), col("n_regionkey").as("r"),
          col("n_name").as("nm"))
        table(s, d, "nation").select(
          col("n_nationkey"),
          base.withField("dbl", col("n_nationkey") * 2)      // add
            .withField("r", col("n_regionkey") + 100)        // replace
            .dropFields("nm")                                // drop
            .as("st"))
          .select(col("n_nationkey"), col("st.k").as("k"), col("st.r").as("r"),
            col("st.dbl").as("dbl"),
            size(expr("array(st.*)")).cast("int").as("n_fields"))
      },
      Some(sql("""SELECT n_nationkey, n_nationkey AS k,
                    n_regionkey + 100 AS r, n_nationkey * 2 AS dbl,
                    CAST(3 AS INTEGER) AS n_fields
                  FROM nation"""))),

    // sentences(): locale-aware sentence + word segmentation (the
    // BreakIterator bridge) — the pre-tokenization split a text
    // pipeline needs before sentence-level dedup or chunking. Pinned on
    // fixed rows (LocalTableScan) because the test corpus is
    // punctuation-free word soup; the oracle enumerates the expected
    // (doc, sentence index, words) grid.
    Q("expr_sentences",
      (s, _) => {
        val sq = s; import sq.implicits._
        Seq((1L, "Spark is fast. It scales well!"),
            (2L, "Hello world? Yes. Ok"),
            (3L, "One sentence only"))
          .toDF("id", "t")
          .select(col("id"), posexplode(sentences(col("t"))))
          .select(col("id"), col("pos").cast("long").as("sent_idx"),
            array_join(col("col"), " ").as("words"))
      },
      Some(sql("""SELECT id, sent_idx, words FROM (VALUES
                    (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'Spark is fast'),
                    (1, 1, 'It scales well'),
                    (2, 0, 'Hello world'),
                    (2, 1, 'Yes'),
                    (2, 2, 'Ok'),
                    (3, 0, 'One sentence only')
                  ) AS t(id, sent_idx, words)"""))),

    // CSV EXPRESSION family (from_csv / to_csv / schema_of_csv) — the
    // per-row CSV bridge for string columns that EMBED csv (log lines,
    // composite keys), distinct from the src_csv_* file sources. Round
    // trip proven per row; inference pinned on a literal.
    Q("expr_from_csv",
      (s, d) => {
        val csvSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("nm",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("r",
            org.apache.spark.sql.types.LongType)))
        table(s, d, "nation")
          .select(col("n_nationkey"),
            concat_ws(",", col("n_nationkey"), col("n_name"), col("n_regionkey"))
              .as("line"))
          .select(col("n_nationkey"),
            from_csv(col("line"), csvSchema, Map.empty[String, String]).as("p"),
            col("line"))
          .select(col("n_nationkey"),
            col("p.k").as("k"), col("p.nm").as("nm"), col("p.r").as("r"),
            (to_csv(col("p")) === col("line")).as("rt_ok"),
            schema_of_csv(lit("7,Bolivia,1")).as("inferred"))
      },
      Some(sql("""SELECT n_nationkey, CAST(n_nationkey AS BIGINT) AS k,
                    n_name AS nm, CAST(n_regionkey AS BIGINT) AS r,
                    TRUE AS rt_ok,
                    'STRUCT<_c0: INT, _c1: STRING, _c2: INT>' AS inferred
                  FROM nation"""))),

    // to_number / try_to_number FORMAT PARSING — grouping separators,
    // currency anchor, trailing sign, and the try_ null-on-mismatch
    // contract. The contract under test is the format PARSING, so every
    // output is cast to DOUBLE on both sides: the raw DECIMAL(p,s)
    // results (to_number('99,999') types as DECIMAL(5,0)) round-trip
    // identically through parquet but hash differently in decimal
    // canonicalization layers — the r10 red row. The result TYPES are
    // pinned separately as typeof strings in the same row.
    Q("expr_to_number",
      (s, _) => s.sql(sql("""
        SELECT CAST(to_number('12,454', '99,999') AS DOUBLE) AS a,
               CAST(to_number('$78.12', '$99.99') AS DOUBLE) AS b,
               CAST(to_number('454-', '999S') AS DOUBLE) AS c,
               CAST(try_to_number('xyz', '999') AS DOUBLE) AS d,
               typeof(to_number('12,454', '99,999')) AS ta,
               typeof(to_number('$78.12', '$99.99')) AS tb""")),
      Some(sql("""SELECT CAST(12454 AS DOUBLE) AS a,
                    CAST(78.12 AS DOUBLE) AS b,
                    CAST(-454 AS DOUBLE) AS c,
                    CAST(NULL AS DOUBLE) AS d,
                    'decimal(5,0)' AS ta, 'decimal(4,2)' AS tb"""))),

    // array_sort with a CUSTOM comparator lambda — sort by length then
    // alphabetically, a two-key comparator no plain sort expresses.
    // DuckDB's list_sort has no comparator, so the oracle rebuilds the
    // same order through a rank subquery.
    Q("expr_array_sort_lambda",
      (s, d) => table(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(collect_list(col("n_name")).as("names"))
        .select(col("n_regionkey"),
          array_join(
            array_sort(col("names"), (l, r) =>
              when(length(l) < length(r), -1)
                .when(length(l) > length(r), 1)
                .when(l < r, -1).when(l > r, 1).otherwise(0)),
            "|").as("by_len_then_alpha")),
      Some(sql("""SELECT n_regionkey,
                    string_agg(n_name, '|' ORDER BY length(n_name), n_name)
                      AS by_len_then_alpha
                  FROM nation GROUP BY n_regionkey"""))),

    // XML EXPRESSION family (Spark 4's from_xml / to_xml /
    // schema_of_xml — the per-row XML bridge, sibling of expr_from_csv;
    // the xpath_* fragment extractors are expr_xpath): build an XML
    // fragment per row, parse it back, prove the field round-trip and
    // pin the inferred schema on a literal.
    Q("expr_from_xml",
      (s, d) => {
        val xmlSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("nm",
            org.apache.spark.sql.types.StringType)))
        table(s, d, "nation")
          .select(col("n_nationkey"),
            concat(lit("<r><k>"), col("n_nationkey"), lit("</k><nm>"),
              col("n_name"), lit("</nm></r>")).as("frag"))
          .select(col("n_nationkey"),
            from_xml(col("frag"), xmlSchema,
              new java.util.HashMap[String, String]()).as("p"),
            schema_of_xml(lit("<r><k>7</k><nm>x</nm></r>")).as("inferred"))
          .select(col("n_nationkey"), col("p.k").as("k"), col("p.nm").as("nm"),
            col("inferred"))
      },
      Some(sql("""SELECT n_nationkey, CAST(n_nationkey AS BIGINT) AS k,
                    n_name AS nm,
                    'STRUCT<k: BIGINT, nm: STRING>' AS inferred
                  FROM nation"""))),

    // BOUNDED levenshtein (Spark 3.5's threshold arg): the scale form —
    // the O(len²) DP early-exits once distance exceeds the bound and
    // returns -1, which is what makes edit-distance verification
    // affordable inside candidate loops (dedup_edit_distance bounds by
    // candidates; this bounds per-pair work). The oracle restates -1 as
    // CASE over the unbounded distance.
    Q("expr_levenshtein_bounded",
      (s, d) => table(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .crossJoin(broadcast(
          table(s, d, "region").select(col("r_name"))))
        .select(col("n_nationkey"), col("r_name"),
          levenshtein(col("n_name"), col("r_name")).as("dist"),
          levenshtein(col("n_name"), col("r_name"), 5).as("dist_capped")),
      Some(sql("""SELECT n_nationkey, r_name,
                    CAST(levenshtein(n_name, r_name) AS INT) AS dist,
                    CAST(CASE WHEN levenshtein(n_name, r_name) > 5 THEN -1
                         ELSE levenshtein(n_name, r_name) END AS INT) AS dist_capped
                  FROM nation CROSS JOIN region"""))),

    // convert_timezone (Spark 3.4) — named-zone wall-clock conversion
    // incl. a DST boundary (2024-07-01 is EDT, UTC−4; Tokyo has no
    // DST, UTC+9): rendered as strings so the oracle can rebuild the
    // same instants through DuckDB's timezone machinery.
    Q("expr_convert_timezone",
      (s, d) => table(s, d, "nation").select(
        col("n_nationkey"),
        date_format(expr(
          "convert_timezone('UTC', 'America/New_York', TIMESTAMP '2024-07-01 12:00:00')"),
          "yyyy-MM-dd HH:mm").as("nyc"),
        date_format(expr(
          "convert_timezone('UTC', 'Asia/Tokyo', TIMESTAMP '2024-07-01 12:00:00')"),
          "yyyy-MM-dd HH:mm").as("tokyo"),
        date_format(expr(
          "convert_timezone('UTC', 'America/New_York', TIMESTAMP '2024-01-15 12:00:00')"),
          "yyyy-MM-dd HH:mm").as("nyc_winter")),
      Some(sql("""SELECT n_nationkey,
                    '2024-07-01 08:00' AS nyc,
                    '2024-07-01 21:00' AS tokyo,
                    '2024-01-15 07:00' AS nyc_winter
                  FROM nation""")))
  )
}
