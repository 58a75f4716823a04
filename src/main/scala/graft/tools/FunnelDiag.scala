package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r15 lever #1 adjudication): the containment funnel in
  * three honest numbers — gram-level join matches ("candidates"),
  * distinct pairs entering the verify ("verify_rows"), and TRUE answer
  * rows — plus the per-pair match multiplicity. A pair-level suffix
  * filter can only cut (verify_rows − answer_pairs); if that gap is
  * small the candidates:answer ratio is match MULTIPLICITY of true
  * pairs, which no pair filter can touch.
  * Usage: `runMain graft.tools.FunnelDiag [sfDir]`. */
object FunnelDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.withHive(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val df = graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
    val answer = df.count()
    // fill THIS QueryExecution's metrics
    val dfm = graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
    dfm.collect(): Unit
    val joinRows = graft.plans.PlanWalk.nodes(dfm.queryExecution.executedPlan).collect {
      case j: SortMergeJoinExec => j.metrics.get("numOutputRows")
      case j: ShuffledHashJoinExec => j.metrics.get("numOutputRows")
      case j: BroadcastHashJoinExec => j.metrics.get("numOutputRows")
    }.flatten.map(_.value)
    val candidates = joinRows.foldLeft(0L)(math.max)
    val verifyRows = joinRows.headOption.getOrElse(0L)
    println(s"FUNNEL answer=$answer verify_rows=$verifyRows candidates=$candidates")
    println(f"FUNNEL ratios: cand/verify=${candidates.toDouble / verifyRows}%.2f " +
      f"verify/answer=${verifyRows.toDouble / answer}%.3f cand/answer=${candidates.toDouble / answer}%.2f")
    spark.stop()
  }
}
