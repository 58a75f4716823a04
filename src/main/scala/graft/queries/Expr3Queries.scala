package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Registry.sql

/** Expression wave 3 (round 10) — the try_* scalar arithmetic family
  * and str_to_map: remaining scalar surfaces of the reference's
  * expression layer (sql/catalyst/.../expressions/arithmetic.scala —
  * whose 1.3 semantics are "wrap silently / null on bad input", exactly
  * what ANSI-off Spark 4 + the explicit try_* family pin down; Hive's
  * str_to_map UDF surface).
  *
  * Both queries are literal-frame contract pins (driver-local VALUES,
  * no table input) in the style of agg_try_sum: the capability IS the
  * documented edge-case grid, so the oracle states the expected
  * constants directly.
  */
object Expr3Queries {

  val all: Seq[Q] = Seq(

    // try_* scalar arithmetic: overflow/zero/bounds cases return NULL
    // where the ANSI-off plain operators silently wrap (the 1.3
    // Add/Multiply contract) or also null (Divide). The plain-operator
    // wrap values are pinned as data next to the try_* NULLs. DuckDB
    // would raise on BIGINT overflow, so the oracle states the expected
    // constants (agg_try_sum pattern).
    Q("expr_try_arith",
      (s, _) => s.sql(sql("""
        SELECT try_divide(7, 0) IS NULL                          AS try_div_zero_null,
               CAST(7 / 0 AS DOUBLE) IS NULL                     AS plain_div_zero_null,
               try_add(9223372036854775807L, 1L) IS NULL         AS try_add_ovf_null,
               9223372036854775807L + 1L                         AS plain_add_wraps,
               try_multiply(4611686018427387904L, 4L) IS NULL    AS try_mul_ovf_null,
               4611686018427387904L * 4L                         AS plain_mul_wraps,
               try_subtract(CAST('-9223372036854775808' AS BIGINT), 1L) IS NULL AS try_sub_ovf_null,
               try_element_at(array(11, 22, 33), 5)              AS try_elem_oob,
               try_element_at(array(11, 22, 33), 2)              AS try_elem_ok,
               CAST(try_divide(9.0, 2.0) AS DOUBLE)              AS try_div_ok""")),
      Some(sql("""SELECT TRUE  AS try_div_zero_null,
                    TRUE  AS plain_div_zero_null,
                    TRUE  AS try_add_ovf_null,
                    CAST(-9223372036854775808 AS BIGINT) AS plain_add_wraps,
                    TRUE  AS try_mul_ovf_null,
                    CAST(0 AS BIGINT)  AS plain_mul_wraps,
                    TRUE  AS try_sub_ovf_null,
                    CAST(NULL AS INT)  AS try_elem_oob,
                    22    AS try_elem_ok,
                    CAST(4.5 AS DOUBLE) AS try_div_ok"""))),

    // str_to_map: the delimited-KV parser (Hive str_to_map surface) —
    // entry and key/value delimiters, lookup of present and absent
    // keys, and the reconstructed ordered key/value lists. DuckDB has
    // no str_to_map, so the oracle rebuilds each projection from
    // string_split primitives.
    Q("expr_str_to_map",
      (s, _) => s.sql(sql("""
        SELECT element_at(m, 'b')                      AS v_b,
               element_at(m, 'zz')                     AS v_missing,
               CAST(size(m) AS BIGINT)                 AS n_entries,
               array_join(map_keys(m), '|')            AS keys_joined,
               array_join(map_values(m), '|')          AS vals_joined
        FROM (SELECT str_to_map('a:1,b:2,c:3', ',', ':') AS m)""")),
      Some(sql("""WITH t AS (SELECT string_split('a:1,b:2,c:3', ',') AS kvs)
                  SELECT
                    string_split(list_filter(kvs, p -> string_split(p, ':')[1] = 'b')[1], ':')[2] AS v_b,
                    CAST(NULL AS VARCHAR) AS v_missing,
                    CAST(len(kvs) AS BIGINT) AS n_entries,
                    array_to_string(list_transform(kvs, p -> string_split(p, ':')[1]), '|') AS keys_joined,
                    array_to_string(list_transform(kvs, p -> string_split(p, ':')[2]), '|') AS vals_joined
                  FROM t"""))),

    // Higher-order-function QUANTIFIERS + indexed lambdas + the
    // seed/merge/finish fold — the remaining HOF surfaces next to the
    // transform/zip_with/aggregate rows the earlier waves pinned.
    // DuckDB rebuilds forall/exists from list_filter lengths and the
    // indexed filter via list_select over a filtered index list.
    Q("expr_hof_quantifiers",
      (s, _) => s.sql(sql("""
        SELECT forall(a, x -> x > 0)                        AS all_pos,
               forall(a, x -> x % 2 = 0)                    AS all_even,
               exists(a, x -> x > 7)                        AS any_gt7,
               exists(a, x -> x < 0)                        AS any_neg,
               array_join(filter(a, (x, i) -> i % 2 = 0), '|') AS even_pos_elems,
               aggregate(a, 0, (acc, x) -> acc + x, acc -> acc * 10) AS sum_x10,
               aggregate(a, 1, (acc, x) -> acc * x)         AS product
        FROM (SELECT array(3, 8, 1, 6) AS a)""")),
      Some(sql("""WITH t AS (SELECT [3, 8, 1, 6] AS a)
                  SELECT len(list_filter(a, x -> x <= 0)) = 0 AS all_pos,
                    len(list_filter(a, x -> x % 2 <> 0)) = 0 AS all_even,
                    len(list_filter(a, x -> x > 7)) > 0 AS any_gt7,
                    len(list_filter(a, x -> x < 0)) > 0 AS any_neg,
                    array_to_string(list_select(a,
                      list_filter(range(1, len(a) + 1), i -> i % 2 = 1)), '|') AS even_pos_elems,
                    CAST(list_sum(a) * 10 AS INT) AS sum_x10,
                    CAST(list_reduce(a, (acc, x) -> acc * x) AS INT) AS product
                  FROM t"""))),

    // STRING CODECS + phonetic/checksum scalars: base64 and URL
    // percent-encoding round-trips, hex, initcap, soundex, the Luhn
    // checksum, bit_count/getbit, and crc32 — each pinned to its
    // standard constant (expected-literal oracle, agg_try_sum pattern).
    Q("expr_codec_grid",
      (s, _) => s.sql(sql("""
        SELECT base64(CAST('spark' AS BINARY))                  AS b64,
               CAST(unbase64(base64(CAST('spark' AS BINARY))) AS STRING) AS b64_rt,
               hex(CAST('abc' AS BINARY))                       AS hex_abc,
               CAST(unhex('616263') AS STRING)                  AS unhex_rt,
               url_encode('a b&c')                              AS urlenc,
               url_decode(url_encode('a b&c'))                  AS urlenc_rt,
               initcap('hello spark world')                     AS ic,
               soundex('Robert')                                AS sdx,
               luhn_check('79927398713')                        AS luhn_ok,
               luhn_check('79927398710')                        AS luhn_bad,
               CAST(bit_count(255L) AS INT)                     AS bits255,
               CAST(getbit(5L, 0) AS INT)                       AS bit0_of_5,
               crc32(CAST('spark' AS BINARY))                   AS crc""")),
      Some(sql("""SELECT 'c3Bhcms=' AS b64, 'spark' AS b64_rt,
                    '616263' AS hex_abc, 'abc' AS unhex_rt,
                    'a+b%26c' AS urlenc, 'a b&c' AS urlenc_rt,
                    'Hello Spark World' AS ic, 'R163' AS sdx,
                    TRUE AS luhn_ok, FALSE AS luhn_bad,
                    8 AS bits255, 1 AS bit0_of_5,
                    CAST(2635321133 AS BIGINT) AS crc"""))),

    // IPv4 / CIDR ARITHMETIC (network-log analytics — no builtin in
    // either engine, so both sides compute the same dotted-quad
    // integer algebra): address → uint32, the /26 network containing
    // it, its broadcast address, and membership tests for two probe
    // addresses. Pure integer shifts — exact everywhere.
    Q("expr_ipv4_cidr",
      (s, _) => s.sql(sql("""
        WITH ip AS (SELECT
            CAST(split(a, '[.]')[0] AS BIGINT) * 16777216
            + CAST(split(a, '[.]')[1] AS BIGINT) * 65536
            + CAST(split(a, '[.]')[2] AS BIGINT) * 256
            + CAST(split(a, '[.]')[3] AS BIGINT) AS ip32
          FROM (SELECT '203.0.113.77' AS a)),
        net AS (SELECT ip32, ip32 DIV 64 * 64 AS network, ip32 DIV 64 * 64 + 63 AS bcast
                FROM ip)
        SELECT ip32, network, bcast,
               concat_ws('.', CAST(network DIV 16777216 AS STRING),
                 CAST(network DIV 65536 % 256 AS STRING),
                 CAST(network DIV 256 % 256 AS STRING),
                 CAST(network % 256 AS STRING)) AS network_str,
               3405803840 BETWEEN network AND bcast AS probe1_in,
               3405803905 BETWEEN network AND bcast AS probe2_in
        FROM net""")),
      Some(sql("""WITH ip AS (SELECT
                      CAST(string_split(a, '.')[1] AS BIGINT) * 16777216
                      + CAST(string_split(a, '.')[2] AS BIGINT) * 65536
                      + CAST(string_split(a, '.')[3] AS BIGINT) * 256
                      + CAST(string_split(a, '.')[4] AS BIGINT) AS ip32
                    FROM (SELECT '203.0.113.77' AS a)),
                  net AS (SELECT ip32, ip32 // 64 * 64 AS network, ip32 // 64 * 64 + 63 AS bcast
                          FROM ip)
                  SELECT ip32, network, bcast,
                    (CAST(network // 16777216 AS VARCHAR) || '.' ||
                     CAST(network // 65536 % 256 AS VARCHAR) || '.' ||
                     CAST(network // 256 % 256 AS VARCHAR) || '.' ||
                     CAST(network % 256 AS VARCHAR)) AS network_str,
                    3405803840 BETWEEN network AND bcast AS probe1_in,
                    3405803905 BETWEEN network AND bcast AS probe2_in
                  FROM net"""))),

    // DATE_TRUNC GRID: every granularity the warehouse calendar uses
    // (year/quarter/month/week/day/hour) on a fixed timestamp, rendered
    // as exact epoch micros. Spark and DuckDB share the ISO-Monday week
    // convention.
    Q("expr_datetrunc_grid",
      (s, _) => s.sql(sql("""
        SELECT unix_micros(date_trunc('YEAR', t))    AS y_us,
               unix_micros(date_trunc('QUARTER', t)) AS q_us,
               unix_micros(date_trunc('MONTH', t))   AS mo_us,
               unix_micros(date_trunc('WEEK', t))    AS wk_us,
               unix_micros(date_trunc('DAY', t))     AS d_us,
               unix_micros(date_trunc('HOUR', t))    AS h_us
        FROM (SELECT TIMESTAMP '2024-05-15 13:47:31.123456' AS t)""")),
      Some(sql("""SELECT epoch_us(date_trunc('year', t))    AS y_us,
                    epoch_us(date_trunc('quarter', t)) AS q_us,
                    epoch_us(date_trunc('month', t))   AS mo_us,
                    epoch_us(date_trunc('week', t))    AS wk_us,
                    epoch_us(date_trunc('day', t))     AS d_us,
                    epoch_us(date_trunc('hour', t))    AS h_us
                  FROM (SELECT TIMESTAMP '2024-05-15 13:47:31.123456' AS t)"""))),

    // LONG-TAIL SCALARS: substring_index, regexp_count, byte-vs-char
    // length on multibyte text, factorial, hypot/cbrt, the expm1/log1p
    // precision pair, find_in_set, elt, repeat — the remaining odds and
    // ends of the function registry, literal-pinned where DuckDB lacks
    // the twin.
    Q("expr_scalar_longtail",
      (s, _) => s.sql(sql("""
        SELECT substring_index('a.b.c.d', '.', 2)        AS si_lead,
               substring_index('a.b.c.d', '.', -1)       AS si_tail,
               CAST(regexp_count('ababab', 'ab') AS INT) AS re_count,
               CAST(char_length('héllo') AS INT)         AS n_chars,
               CAST(octet_length('héllo') AS INT)        AS n_bytes,
               factorial(10)                             AS fact10,
               CAST(hypot(3, 4) AS DOUBLE)               AS hyp,
               CAST(cbrt(27.0) AS DOUBLE)                AS cbrt27,
               round(expm1(0.5), 10)                     AS expm1_half,
               round(log1p(0.5), 10)                     AS log1p_half,
               CAST(find_in_set('c', 'a,b,c,d') AS INT)  AS fis,
               elt(2, 'x', 'y', 'z')                     AS elt2,
               repeat('ab', 3)                           AS rep""")),
      Some(sql("""SELECT 'a.b' AS si_lead, 'd' AS si_tail,
                    3 AS re_count, 5 AS n_chars, 6 AS n_bytes,
                    CAST(3628800 AS BIGINT) AS fact10,
                    CAST(5.0 AS DOUBLE) AS hyp, CAST(3.0 AS DOUBLE) AS cbrt27,
                    CAST(0.6487212707 AS DOUBLE) AS expm1_half,
                    CAST(0.4054651081 AS DOUBLE) AS log1p_half,
                    3 AS fis, 'y' AS elt2, 'ababab' AS rep"""))),

    // ARRAY EDIT OPERATIONS + struct→JSON rendering: position, remove,
    // insert-at, append/prepend (the Spark 3.4/3.5 array-edit family),
    // and to_json of a named struct — literal-pinned (the capability is
    // the documented edit semantics: 1-based positions, insert shifts
    // right, remove deletes ALL occurrences).
    Q("expr_array_edits",
      (s, _) => s.sql(sql("""
        SELECT CAST(array_position(a, 22) AS INT)          AS pos22,
               array_join(array_remove(a, 22), '|')        AS removed,
               array_join(array_insert(a, 2, 99), '|')     AS inserted,
               array_join(array_append(a, 44), '|')        AS appended,
               array_join(array_prepend(a, 0), '|')        AS prepended,
               to_json(named_struct('a', 1, 'b', 'x'))     AS js
        FROM (SELECT array(11, 22, 33, 22) AS a)""")),
      Some(sql("""SELECT 2 AS pos22, '11|33' AS removed,
                    '11|99|22|33|22' AS inserted,
                    '11|22|33|22|44' AS appended,
                    '0|11|22|33|22' AS prepended,
                    '{"a":1,"b":"x"}' AS js""")))
  )
}
