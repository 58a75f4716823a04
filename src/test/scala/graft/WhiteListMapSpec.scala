package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Machine-checked accounting of the reference Hive-compatibility
  * whiteList (reference sql/hive/compatibility/src/test/scala/org/
  * apache/spark/sql/hive/execution/HiveCompatibilitySuite.scala:246,
  * 743 entries) — the r14 verdict's demand #2. The r13/r14 COVERAGE
  * sweep classified every entry in prose; this spec turns that prose
  * into an invariant no future round can silently regress:
  *
  *  Every whiteList entry must resolve to at least one of
  *   (a) a CLASS RULE naming live registry rows that measure the
  *       class's semantics (each cited row is checked against
  *       SparkEntry.queries at run time — renaming or deleting a
  *       measuring query fails this spec, not just the prose);
  *   (b) a VERBATIM mention in COVERAGE.md (the per-wave mapping
  *       tables name hundreds of entries directly — deleting a
  *       mapping row orphans its entries and fails the spec);
  *   (c) a DOCUMENTED DISMISSAL anchor phrase that must still be
  *       present in COVERAGE.md.
  *
  * The spec fails with the exact list of unaccounted entries. Rules
  * that match nothing ("dead rules") fail too, so the table cannot
  * rot into over-broad patterns, and the entry count is pinned so a
  * silent parse regression cannot vacuously pass.
  *
  * A separate test machine-checks the largest dismissal class: every
  * `udf_<fn>` entry must name a function the ENGINE's
  * FunctionRegistry resolves (Hive spellings mapped to their Spark
  * registrations — operators, cast aliases, renamed functions — and
  * the three EWAH bitmap-INDEX internals documented as dismissed,
  * Hive dropped the index machinery upstream and Spark never shipped
  * them; see COVERAGE "udf_bitmap_and/or/empty").
  */
class WhiteListMapSpec extends AnyFunSuite {

  private val refFile =
    "/root/reference/sql/hive/compatibility/src/test/scala/org/apache/" +
      "spark/sql/hive/execution/HiveCompatibilitySuite.scala"

  private lazy val entries: Vector[String] = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(refFile)), "UTF-8")
    val start = src.indexOf("override def whiteList = Seq(")
    assert(start >= 0, "whiteList marker not found in the reference suite")
    val body = src.substring(start, src.indexOf("\n  )", start))
    "\"([^\"]+)\"".r.findAllMatchIn(body).map(_.group(1)).toVector
  }

  private lazy val coverage: String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/COVERAGE.md")), "UTF-8")

  private def mentionedInCoverage(e: String): Boolean =
    ("(?<![\\w])" + java.util.regex.Pattern.quote(e) + "(?![\\w])").r
      .findFirstIn(coverage).isDefined

  /** (class name, full-match pattern, measuring registry rows,
    * optional COVERAGE dismissal anchor). Rows are the SEMANTIC
    * account: the registry queries whose oracles measure what the
    * Hive tests in the class measured. */
  private val rules: Seq[(String, scala.util.matching.Regex, Seq[String], Option[String])] = Seq(
    ("numbered join doc tests",
      ("^(auto_)?join(\\d+|_nulls|_hive_\\d+|_casesensitive|_empty|_view|_vc" +
        "|_star|_thrift|_literals.*|_filters.*)?(_hadoop20)?$").r,
      Seq("join_inner", "join_left_outer", "join_full_outer", "join_left_semi",
        "join_left_anti", "jn_on_vs_where", "sql_join_filters_grid", "join_star"), None),
    ("inner/cross joins", "^(innerjoin|cross_join|cross_product_check_\\d)$".r,
      Seq("join_inner", "join_cross"), None),
    ("join reorder / CBO",
      "^(join_reorder\\d|auto_join_reordering_values|mergejoins|multi_join_union)$".r,
      Seq("sql_cbo_join_reorder", "sql_union_join_gby"), None),
    ("mapjoin / broadcast",
      "^(mapjoin_\\w+|join_map_ppr|cp_mj_rc|join_rc|leftsemijoin_mr|query_with_semi|multiMapJoin2)$".r,
      Seq("join_broadcast", "join_broadcast_chain", "sql_mapjoin_distinct",
        "join_left_semi", "sql_semijoin", "src_rcfile_roundtrip"), None),
    ("SMB / bucketed joins",
      "^((auto_)?(smb_mapjoin_?\\d+|sortmerge_join_\\d+)|sort_merge_join_desc_\\d)$".r,
      Seq("src_bucketed_join", "src_bucket_coalesce_join", "sql_agg_bucketed_zero_shuffle"), None),
    ("skew join", "^skewjoinopt\\d+$".r,
      Seq("join_salted_skew", "sql_join_skew_aqe_split", "join_skew_aqe"), None),
    ("join predicate pushdown",
      ("^(ppd_outer_join\\d?|ppd_join\\d?|louter_join_ppr|router_join_ppr" +
        "|outer_join_ppr|filter_join_breaktask2?|optional_outer|ppd_gby_join)$").r,
      Seq("sql_ppd_outer_join", "sql_ppd_join_filter", "sql_ppd_grid"), None),
    ("groupby config variants (the r14 measured class)",
      ("^(groupby\\d+.*|groupby_(map_ppr|ppr|neg_float|distinct_samekey|sort_\\d+" +
        "|sort_skew_\\d+|sort_test_\\d+|sort_test|bigdata|complex_types.*|position" +
        "|cube1|rollup1))$").r,
      Seq("q1_agg", "sql_agg_config_grid", "sql_agg_forced_skew",
        "sql_rs_dedup_chain", "agg_cube", "agg_rollup"), None),
    ("grouping sets / grouping_id", "^groupby_grouping_(sets\\d|id\\d)$".r,
      Seq("agg_grouping_sets", "agg_rollup", "agg_cube"), None),
    ("multi-insert group-bys",
      ("^(groupby_multi_single_reducer\\d?|multigroupby_singlemr" +
        "|groupby_mutli_insert_common_distinct|multi_insert_gby\\d?|multi_insert.*)$").r,
      Seq("sql_multi_insert", "sql_multi_insert_distinct",
        "sql_multi_insert_dynpart", "sql_multi_insert_lv"), None),
    ("udaf doc tests", "^udaf_\\w+$".r,
      Seq("agg_corr_covar", "agg_collect", "agg_histogram_numeric", "agg_stats"), None),
    ("null groups / null input", "^(nullgroup\\d?|nullinput\\d?)$".r,
      Seq("agg_nullgroup_grid"), None),
    ("having / fetch task", "^(having|fetch_aggregation)$".r,
      Seq("agg_having", "sql_having_no_groupby"), None),
    ("reduce-sink dedup / correlation optimizer",
      ("^(reducesink_dedup|reduce_deduplicate_exclude_(gby|join)" +
        "|nonblock_op_deduplicate|correlationoptimizer\\d+)$").r,
      Seq("sql_rs_dedup_chain", "sql_rs_dedup_join"), None),
    ("input doc tests (scan/projection/insert singles)",
      "^(input\\d+.*|input_part\\d+(_win)?|input_limit|input_testsequencefile|inputddl\\d)$".r,
      Seq("project", "filter", "src_text_roundtrip", "src_sequence_file",
        "src_ppr_prefix_vals", "sql_show_create_roundtrip"), None),
    ("load / dynamic partition insert",
      ("^(load_dyn_part\\d+(_win)?|loadpart1|load_file_with_space_in_the_name" +
        "|insert_compressed|infer_bucket_sort_dyn_part)$").r,
      Seq("sql_dynpart_overwrite_modes", "sql_dynpart_many_partitions",
        "sql_multi_insert_dynpart"), None),
    ("union doc tests",
      "^(union\\d+|union_date|union_lateralview|union_ppr|union_script|union_remove_\\d+)$".r,
      Seq("union_all", "union_distinct", "sql_union_flatten",
        "sql_union_insert_parallel", "sql_union_coerce", "sql_groupby_ppd_union"), None),
    ("scalar predicate pushdown singles",
      ("^(ppd\\d|ppd_(clusterby|constant_expr|constant_where|repeated_alias|udf_col" +
        "|union|gby\\d?)|ppr_allchildsarenull|ppr_pushdown\\d?|limit_pushdown_negative" +
        "|transform_ppr\\d)$").r,
      Seq("sql_ppd_grid", "src_ppr_expr", "sql_transform"), None),
    ("MAP/REDUCE script transform", "^mapreduce\\d$".r,
      Seq("sql_map_reduce_syntax", "sql_transform", "udf_pipe"), None),
    ("udf singles (function surface — see the registry test below)",
      "^(udf_\\w+|udf\\d)$".r,
      Seq("expr_log_nvl_grid", "expr_inverse_trig", "expr_xpath_grid"),
      Some("`udf_*` singles")),
    ("timestamp grid", "^timestamp(_\\d|_comparison|_lazy|_null|_udf)?$".r,
      Seq("ts_compare_grid", "ts_cast_grid", "ts_arith_grid", "sql_timestamp_casts"), None),
    ("date/decimal/cast/literal typing",
      ("^(date_\\d|date_comparison|decimal_\\d|cast1|type_cast_1|type_widening" +
        "|implicit_cast1?|convert_enum_to_string|binary_constant" +
        "|literal_(double|ints|string)|unicode_notation)$").r,
      Seq("sql_alias_literal_trivia", "ts_cast_grid"), None),
    ("parser trivia (the r14 measured class)",
      ("^(escape_(order|sort|cluster|distribute)by1?|notable_alias\\d|noalias_subq1?" +
        "|alias_casted_column|nomore_ambiguous_table_col|ambiguous_col|select_as_omitted" +
        "|select_unquote_(and|not|or)|tablename_with_select|parenthesis_star_by|quote\\d" +
        "|subq2|order2?|disallow_incompatible_type_change_off)$").r,
      Seq("sql_escaped_by_grid", "sql_alias_literal_trivia",
        "sql_quoted_idents", "sql_groupby_alias"), None),
    ("alter / add-partition DDL",
      ("^(alter\\d|alter_index|alter_merge_2|alter_partition_with_whitelist" +
        "|alter_varchar2|alter_view_as_select|add_part_multiple|add_part_exist" +
        "|add_partition_(no|with)_whitelist|ct_case_insensitive)$").r,
      Seq("sql_catalog_ddl", "sql_partition_lifecycle", "sql_partition_custom_location"), None),
    ("create DDL",
      ("^(create_(insert_outputformat|like_tbl_props|nested_type|skewed_table1?" +
        "|struct_table|view_translate)|describe_formatted_view_partitioned)$").r,
      Seq("sql_create_table_like", "sql_show_create_roundtrip",
        "sql_view_layers", "sql_describe_query"), None),
    ("drop DDL",
      ("^drop_(database_removes_partition_dirs|function|index" +
        "|index_removes_partition_dirs|multi_partitions|partitions_filter\\d?" +
        "|partitions_ignore_protection|table\\d?|table_removes_partition_dirs|view)$").r,
      Seq("sql_partition_lifecycle", "sql_catalog_ddl"), None),
    ("show/describe/explain & exec-machinery singles",
      ("^(show_create_table_\\w+|show_describe_func_quotes|show_partitions|plan_json" +
        "|explain_rearrange|lineage1|progress_1|parallel|merge\\d|combine1)$").r,
      Seq("sql_show_create_roundtrip", "sql_show_catalog_grid"), None),
    ("table/column statistics",
      ("^(annotate_stats_\\w+|compute_stats_\\w+|stats\\d+" +
        "|stats_(aggregator_error_?1|publisher_error_?1|empty_partition|noscan_\\d)" +
        "|distinct_stats)$").r,
      Seq("sql_analyze_stats", "sql_analyze_columns", "sql_analyze_column_stats",
        "sql_empty_partition_agg"), None),
    ("file formats / serde / partition metadata",
      ("^(fileformat_mix|fileformat_text|diff_part_input_formats" +
        "|disable_file_format_check|partition_serde_format|partition_schema1" +
        "|partition_type_check|partition_wise_fileformat\\d+|part_inherit_tbl_props.*" +
        "|partcols1|serde_regex|serde_reported_schema|binarysortable_1|nullscript" +
        "|orc_dictionary_threshold|orc_empty_files" +
        "|rcfile_(columnar|lazydecompress|null_value|toleratecorruptions|union))$").r,
      Seq("src_rcfile_roundtrip", "src_orc_roundtrip",
        "sql_partition_custom_location", "sql_catalog_ddl"), None),
    ("views / varchar / lateral view",
      "^(view|view_cast|view_inputs|varchar_2|varchar_join1|varchar_union1|lateral_view_cp)$".r,
      Seq("sql_view_layers", "sql_char_varchar", "sql_lateral_view"), None)
  )

  test("reference whiteList parse is pinned") {
    assert(entries.size === 743, s"whiteList entry count drifted: ${entries.size}")
    assert(entries.head === "add_part_exist" && entries.last === "view_inputs")
  }

  test("every whiteList entry resolves to a measuring row, a COVERAGE mapping, or a documented dismissal") {
    val registry = SparkEntry.queries.keySet
    // (1) every rule's cited rows must be LIVE registry queries and its
    // anchor (if any) still present in COVERAGE.md
    for ((name, _, rows, anchor) <- rules) {
      val missing = rows.filterNot(registry)
      assert(missing.isEmpty,
        s"rule '$name' cites registry rows that do not exist: ${missing.mkString(", ")}")
      anchor.foreach { a =>
        assert(coverage.contains(a),
          s"rule '$name' cites a COVERAGE.md dismissal anchor that is gone: $a")
      }
    }
    // (2) no dead rules — a pattern matching nothing means the table
    // drifted from the reference list
    val dead = rules.collect {
      case (name, rx, _, _) if !entries.exists(e => rx.matches(e)) => name
    }
    assert(dead.isEmpty, s"rules matching no whiteList entry: ${dead.mkString(", ")}")
    // (3) the accounting itself
    val unaccounted = entries.filterNot { e =>
      rules.exists(_._2.matches(e)) || mentionedInCoverage(e)
    }
    assert(unaccounted.isEmpty,
      s"${unaccounted.size} whiteList entries unaccounted (no class rule, no COVERAGE " +
        s"mention): ${unaccounted.mkString(", ")}")
    info(s"${entries.size} whiteList entries accounted " +
      s"(${entries.count(e => rules.exists(_._2.matches(e)))} via class rules, " +
      s"rest via verbatim COVERAGE mappings)")
  }

  /** Hive spelling → the Spark FunctionRegistry name. Operators and
    * cast aliases ARE registered functions in Spark (`+`, `&`,
    * `bigint`, …); genuinely renamed surfaces map to their Spark
    * counterpart. */
  private val hiveSpelling = Map(
    "E" -> "e", "PI" -> "pi",
    "add" -> "+", "subtract" -> "-", "modulo" -> "%",
    // != is parser sugar for Not(EqualTo) — both components registered
    "equal" -> "=", "notequal" -> "=",
    "lessthan" -> "<", "lessthanorequal" -> "<=",
    "greaterthan" -> ">", "greaterthanorequal" -> ">=",
    "not" -> "!", "notop" -> "not", "or" -> "or",
    "case" -> "when", "when" -> "when", "if" -> "if",
    "bitwise_and" -> "&", "bitwise_or" -> "|",
    "bitwise_not" -> "~", "bitwise_xor" -> "^",
    // Hive's index(arr, i) / field(x, …) — positional access/search;
    // Spark's registrations of the semantics:
    "index" -> "element_at", "field" -> "array_position",
    // Hive-internal cast UDFs → Spark cast aliases
    "to_byte" -> "tinyint", "to_short" -> "smallint",
    "to_long" -> "bigint", "to_double" -> "double", "to_float" -> "float",
    // doc-test names that exercise a function under a suffixed title
    "10_trims" -> "trim", "round_3" -> "round",
    "concat_insert1" -> "concat", "concat_insert2" -> "concat",
    "reflect2" -> "reflect")

  /** EWAH bitmap-INDEX internals: Hive dropped the index machinery
    * upstream and Spark never shipped the UDFs — documented dismissal
    * (COVERAGE "udf_bitmap_and/or/empty"). */
  private val dismissedUdfs = Set("bitmap_and", "bitmap_or", "bitmap_empty")

  test("every udf_* whiteList entry names a function the engine's registry resolves") {
    assert(coverage.contains("udf_bitmap_and/or/empty"),
      "the bitmap-UDF dismissal note left COVERAGE.md")
    val reg = TestSpark.spark.sessionState.functionRegistry
    val udfs = entries.filter(_.startsWith("udf_")).map(_.stripPrefix("udf_"))
    val unresolved = udfs
      .filterNot(dismissedUdfs)
      .map(n => n -> hiveSpelling.getOrElse(n, n))
      .filterNot { case (_, fn) => reg.functionExists(FunctionIdentifier(fn)) }
    assert(unresolved.isEmpty,
      s"udf_* entries whose function the engine does not resolve: " +
        unresolved.map { case (h, s) => s"udf_$h (tried '$s')" }.mkString(", "))
    info(s"${udfs.size} udf_* entries resolved against the FunctionRegistry " +
      s"(${dismissedUdfs.size} documented dismissals)")
  }
}
