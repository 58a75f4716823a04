package graft

/** Dumps the formatted physical plan of every bench-flagged query (and
  * any extra names passed as args) — the plan-review loop the build
  * methodology requires: after correctness, iterate until the plan is the
  * one you'd want at 100 TB. Output goes to stdout (redirect to a file). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // Optional per-query file dump (r21): SPARK_GRAFT_EXPLAIN_DIR=<dir>
    // writes <dir>/<query>_<suffix>.txt per query (suffix from
    // SPARK_GRAFT_EXPLAIN_SUFFIX, default "plan") — the plans/rNN
    // before/after evidence files, captured without scraping sbt's
    // interleaved stdout.
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "plan")
    val spark = Engine.session("graft-explain", Some("local[4]"))
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.benchQueries.map(_.name) ++ Seq(
        "join_inner", "dedup_simhash_hamming", "join_asof_native",
        "join_range", "src_dsv2_pushdown", "src_jdbc_read",
        "pipe_decontaminate", "pipe_quality_gate", "sim_pq_encode",
        "sim_recall_at_k", "sql_distribute_by", "ml_linreg",
        "join_salted_skew", "graph_k_core", "pipe_sessionize",
        "sim_mips_transform", "src_bucket_coalesce_join")
    names.foreach { name =>
      println(s"\n===== $name =====")
      val text =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      println(text)
      outDir.foreach { dir =>
        val w = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$suffix.txt"))
        try w.println(text) finally w.close()
      }
    }
    spark.stop()
  }
}
