package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability: a Spark query + (optionally) the equivalent
  * DuckDB SQL the driver's t2 harness hash-compares against.
  *
  * `bench = true` marks the headline queries Bench.scala times at sf0.1.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  /** Collapse whitespace so oracle SQL survives JSON + logs cleanly. */
  def sql(s: String): String = s.replaceAll("\\s+", " ").trim
}
