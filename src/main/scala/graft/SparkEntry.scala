package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full capability registry lives in graft.queries.*; this object is
  * the flat façade the driver enumerates.
  */
object SparkEntry {

  /** Every declared capability, in SURVEY §2 order. */
  def registry: Seq[Q] =
    RelationalQueries.all ++
      JoinQueries.all ++
      AggQueries.all ++
      ExprQueries.all ++
      WindowQueries.all ++
      TextQueries.all ++
      Text2Queries.all ++
      DedupQueries.all ++
      Dedup2Queries.all ++
      SimilarityQueries.all ++
      RetrievalQueries.all ++
      SourceQueries.all ++
      Source2Queries.all ++
      JdbcQueries.all ++
      UdfQueries.all ++
      RddQueries.all ++
      StreamingQueries.all ++
      MultimodalQueries.all ++
      MiscQueries.all ++
      GeoQueries.all ++
      GraphQueries.all ++
      Graph2Queries.all ++
      Expr2Queries.all ++
      Expr3Queries.all ++
      PipelineQueries.all ++
      Pipeline2Queries.all ++
      Pipeline3Queries.all ++
      Pipeline4Queries.all ++
      Pipeline5Queries.all ++
      Pipeline6Queries.all ++
      Pipeline7Queries.all ++
      Pipeline8Queries.all ++
      Sql2Queries.all ++
      Sql3Queries.all ++
      Sql4Queries.all ++
      Sql5Queries.all ++
      Sql6Queries.all ++
      Sql7Queries.all ++
      Sql8Queries.all ++
      Sql9Queries.all ++
      Sql10Queries.all ++
      Sql11Queries.all ++
      Sql12Queries.all ++
      Sql13Queries.all ++
      Sql14Queries.all ++
      Sql15Queries.all ++
      Sql16Queries.all ++
      Sql17Queries.all ++
      ScaleQueries.all ++
      MlQueries.all ++
      Ml2Queries.all ++
      Ml8Queries.all ++
      Text3Queries.all ++
      Text4Queries.all ++
      Window2Queries.all ++
      Streaming2Queries.all ++
      Source3Queries.all ++
      Source4Queries.all ++
      Sql18Queries.all ++
      Sql19Queries.all ++
      Sql20Queries.all ++
      Sql21Queries.all ++
      Pipeline9Queries.all ++
      Ml3Queries.all ++
      Ml4Queries.all ++
      Ml5Queries.all ++
      Ml6Queries.all ++
      Ml7Queries.all ++
      Sql22Queries.all ++
      Sql23Queries.all ++
      Sql24Queries.all ++
      Sql25Queries.all ++
      Sql26Queries.all ++
      Sql27Queries.all ++
      Sql28Queries.all ++
      FuzzQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "join_star").get.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline queries Bench.scala times at sf0.1. */
  def benchQueries: Seq[Q] = registry.filter(_.bench)
}
