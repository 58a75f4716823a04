package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.7 — the extensibility surface: scalar UDF registration
  * (ScalaUdf/UDFRegistration analog), typed Aggregator UDAF (strict
  * superset of 1.3's Hive-UDAF-bridge-only story), generator/UDTF
  * (Explode/Generate + df.explode analog via posexplode + flatMap), and
  * ScriptTransformation parity via RDD.pipe (TRANSFORM ... USING 'cmd',
  * rdd/PipedRDD.scala).
  *
  * Scale posture: UDFs are the documented escape hatch, NOT the default —
  * every other query group uses codegen'd built-ins. The pipe query
  * bounds external processes to one per partition.
  */
object UdfQueries {

  /** Typed UDAF: geometric mean (proves the Aggregator[IN,BUF,OUT]
    * surface the reference lacked natively). */
  private val geoMean = new Aggregator[Double, (Double, Long), Double] {
    def zero = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)) = math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  private def register(s: SparkSession): Unit =
    // once per session: re-registering emits "replaced a previously
    // registered function" WARNs on every query
    if (!s.catalog.functionExists("graft_revenue")) {
      s.udf.register("graft_revenue",
        (price: Double, discount: Double) => price * (1.0 - discount))
      s.udf.register("graft_priority_rank",
        (p: String) => p.substring(0, 1).toInt)
      s.udf.register("graft_geomean", udaf(geoMean))
    }

  val all: Seq[Q] = Seq(

    // Scalar UDF through the SQL registry (UDFRegistration.register).
    Q("udf_scalar",
      (s, d) => {
        register(s)
        table(s, d, "lineitem").createOrReplaceTempView("graft_li_udf")
        s.sql(sql("""SELECT l_orderkey, l_linenumber,
                      round(graft_revenue(l_extendedprice, l_discount), 4) AS revenue
                     FROM graft_li_udf WHERE l_quantity > 45.0"""))
      },
      Some(sql("""SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1.0 - l_discount), 4) AS revenue
                  FROM lineitem WHERE l_quantity > 45.0"""))),

    // Scalar UDF in a grouping key + aggregation over UDF output.
    Q("udf_in_groupby",
      (s, d) => {
        register(s)
        table(s, d, "orders").createOrReplaceTempView("graft_ord_udf")
        s.sql(sql("""SELECT graft_priority_rank(o_orderpriority) AS prio, count(*) AS n,
                      round(sum(o_totalprice), 4) AS total
                     FROM graft_ord_udf GROUP BY 1"""))
      },
      Some(sql("""SELECT CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio,
                   count(*) AS n, round(sum(o_totalprice), 4) AS total
                  FROM orders GROUP BY 1"""))),

    // Typed Aggregator UDAF (geometric mean of order prices per status).
    Q("udf_aggregator",
      (s, d) => {
        register(s)
        table(s, d, "orders").createOrReplaceTempView("graft_ord_udaf")
        s.sql(sql("""SELECT o_orderstatus, round(graft_geomean(o_totalprice), 4) AS geo_price
                     FROM graft_ord_udaf GROUP BY o_orderstatus"""))
      },
      Some(sql("""SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 4) AS geo_price
                  FROM orders GROUP BY o_orderstatus"""))),

    // Generator / UDTF: one row per token WITH ordinal (posexplode — the
    // Generate/Explode physical path; df.explode's typed analog).
    Q("udf_generator",
      (s, d) => table(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token")),
      Some(sql("""SELECT doc_id,
                   CAST(unnest(range(0, len(string_split(text,' ')))) AS BIGINT) AS pos,
                   unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE doc_id < 50"""))),

    // ScriptTransformation parity: pipe rows through an external command
    // (TRANSFORM ... USING 'tr a-z A-Z'); one process per partition.
    Q("udf_pipe",
      (s, d) => {
        import s.implicits._
        val lines = table(s, d, "documents")
          .filter(col("doc_id") < 50)
          .select(concat_ws("\t", col("doc_id"), col("lang")))
          .as(Encoders.STRING)
        val piped = lines.rdd.pipe("tr a-z A-Z")
        piped.map { line =>
          val Array(id, lang) = line.split("\t", 2)
          (id.toLong, lang)
        }.toDF("doc_id", "lang_upper")
      },
      Some(sql("""SELECT doc_id, upper(lang) AS lang_upper
                  FROM documents WHERE doc_id < 50"""))),

    // The Hive UDF/UDAF bridge itself (reference hive/hiveUdfs.scala:76
    // HiveSimpleUdf, :139 HiveGenericUdf, :192 HiveGenericUdaf): register
    // REAL Hive function classes from hive-exec through `CREATE TEMPORARY
    // FUNCTION` and run all three bridge paths in one statement —
    // UDFHex extends UDF (simple bridge, with Hive's implicit int→long
    // coercion), GenericUDFUpper extends GenericUDF, GenericUDAFSum is a
    // GenericUDAFResolver. The golden-corpus HiveQL suites lean on this
    // surface constantly; until now it was the one §2.7 row with no
    // declared query.
    Q("sql_hive_udf",
      (s, d) => {
        if (!s.catalog.functionExists("graft_hive_upper")) {
          s.sql("CREATE TEMPORARY FUNCTION graft_hive_upper AS " +
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper'")
          s.sql("CREATE TEMPORARY FUNCTION graft_hive_hex AS " +
            "'org.apache.hadoop.hive.ql.udf.UDFHex'")
          s.sql("CREATE TEMPORARY FUNCTION graft_hive_sum AS " +
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFSum'")
        }
        table(s, d, "customer").createOrReplaceTempView("graft_cust_hudf")
        s.sql(sql("""SELECT graft_hive_upper(c_mktsegment) AS seg,
                       graft_hive_hex(c_nationkey) AS nk_hex,
                       count(*) AS n,
                       graft_hive_sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal_cents
                     FROM graft_cust_hudf GROUP BY 1, 2"""))
      },
      Some(sql("""SELECT upper(c_mktsegment) AS seg,
                    hex(c_nationkey) AS nk_hex,
                    count(*) AS n,
                    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
                  FROM customer GROUP BY 1, 2"""))),

    // The Hive UDTF bridge (reference hive/hiveUdfs.scala HiveGenericUdtf
    // — the third and last Hive function class kind): a REAL
    // GenericUDTFPosExplode from hive-exec registered via CREATE
    // TEMPORARY FUNCTION and consumed through LATERAL VIEW with a
    // two-column AS alias list — the generator path the golden corpus'
    // udtf_* / lateral_view* families run.
    Q("sql_hive_udtf",
      (s, d) => {
        if (!s.catalog.functionExists("graft_hive_posexplode")) {
          s.sql("CREATE TEMPORARY FUNCTION graft_hive_posexplode AS " +
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFPosExplode'")
        }
        table(s, d, "part").createOrReplaceTempView("graft_part_hudtf")
        s.sql(sql("""SELECT p_brand, pos, w, count(*) AS n
                     FROM graft_part_hudtf
                     LATERAL VIEW graft_hive_posexplode(split(p_name, ' ')) t AS pos, w
                     WHERE w <> ''
                     GROUP BY p_brand, pos, w"""))
      },
      Some(sql("""SELECT p_brand, CAST(pos AS INTEGER) AS pos, w, count(*) AS n
                  FROM (SELECT p_brand,
                          unnest(string_split(p_name, ' ')) AS w,
                          unnest(range(len(string_split(p_name, ' ')))) AS pos
                        FROM part)
                  WHERE w <> ''
                  GROUP BY 1, 2, 3"""))),

    // asNondeterministic() — the OPTIMIZER-FENCE contract: a UDF
    // declared nondeterministic must not be pushed through joins,
    // duplicated, or collapsed (rand()-like semantics even when the
    // body happens to be pure). Result equality is oracled here (both
    // variants filter identically); the PLAN half — deterministic
    // filter pushes below the join, nondeterministic stays above — is
    // asserted in PlanSpec ("nondeterministic UDF filters stay put").
    Q("udf_nondeterministic",
      (s, d) => {
        val det = udf((k: Long) => k % 7 == 0)
        val nondet = udf((k: Long) => k % 7 == 0).asNondeterministic()
        val j = table(s, d, "orders")
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        j.filter(det(col("o_orderkey"))).agg(count(lit(1)).as("n_det"))
          .crossJoin(
            j.filter(nondet(col("o_orderkey"))).agg(count(lit(1)).as("n_nondet")))
      },
      Some(sql("""SELECT n AS n_det, n AS n_nondet FROM
                    (SELECT count(*) AS n FROM orders JOIN customer
                     ON o_custkey = c_custkey WHERE o_orderkey % 7 = 0)""")))
  )
}
