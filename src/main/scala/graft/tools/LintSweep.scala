package graft.tools

/** Registry-wide oracle-text lint sweep (no Spark session): prints every
  * knife-edge violation across SparkEntry.oracleSql and a final count
  * line. The enforcing gate is RegistrySpec (which also runs the
  * plan-side twin with each query's analyzed plan in hand); this main is
  * the fast triage loop for lint changes — 721 oracles in <1 s vs the
  * full spec's minutes. */
object LintSweep {
  def main(args: Array[String]): Unit = {
    val hits = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (n, o) => graft.queries.OracleLint.knifeEdge(n, o)
    }
    hits.foreach(println)
    println(s"LINTSWEEP violations=${hits.size}")
  }
}
