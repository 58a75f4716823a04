package graft.queries

import graft.Engine.table
import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.10 — GraphX surface (Graph/VertexRDD/EdgeRDD/GraphOps +
  * algorithms, graphx/.../lib/): re-exported, not rebuilt, exactly as the
  * survey prescribes. The declared graph is nations connected when they
  * share a region (disjoint cliques), which keeps the algorithmic results
  * SQL-expressible for the oracle: connected components = per-region min
  * key, triangle count on a k-clique = C(k-2, 2) per vertex, degree = k-1.
  *
  * Scale posture: GraphX partitions edges via PartitionStrategy (2D edge
  * cut) — the same code drives billion-edge graphs; nothing here collects
  * to the driver.
  */
object GraphQueries {

  /** Edges: nation pairs sharing a region, canonical src < dst. */
  private[queries] def nationEdges(s: SparkSession, d: String): DataFrame = {
    val nn = table(s, d, "nation").select(col("n_nationkey").cast("long").as("k"), col("n_regionkey"))
    nn.as("a").join(nn.as("b"),
      col("a.n_regionkey") === col("b.n_regionkey") && col("a.k") < col("b.k"))
      .select(col("a.k").as("src"), col("b.k").as("dst"))
  }

  private[queries] def nationGraph(s: SparkSession, d: String): Graph[Int, Int] = {
    import s.implicits._
    val edges = nationEdges(s, d).as[(Long, Long)].rdd
      .map { case (a, b) => Edge(a, b, 1) }
    Graph.fromEdges(edges, 0).partitionBy(PartitionStrategy.RandomVertexCut)
  }

  val all: Seq[Q] = Seq(

    // ConnectedComponents (graphx/lib/ConnectedComponents.scala analog):
    // component id = min vertex id of the region clique.
    Q("graph_connected_components",
      (s, d) => {
        import s.implicits._
        nationGraph(s, d).connectedComponents()
          .vertices.toDF("n_nationkey", "component")
      },
      Some(sql("""SELECT n_nationkey, component FROM (
                    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                      min(CAST(n_nationkey AS BIGINT))
                        OVER (PARTITION BY n_regionkey) AS component,
                      count(*) OVER (PARTITION BY n_regionkey) AS k
                    FROM nation)
                  WHERE k >= 2"""))),

    // TriangleCount (graphx/lib/TriangleCount.scala): each vertex of a
    // k-clique sits in C(k-1, 2) triangles.
    Q("graph_triangle_count",
      (s, d) => {
        import s.implicits._
        nationGraph(s, d).triangleCount()
          .vertices.toDF("n_nationkey", "n_triangles")
          .select(col("n_nationkey"), col("n_triangles").cast("long").as("n_triangles"))
      },
      Some(sql("""SELECT n_nationkey, (k - 1) * (k - 2) // 2 AS n_triangles FROM (
                    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                      count(*) OVER (PARTITION BY n_regionkey) AS k
                    FROM nation)
                  WHERE k >= 2"""))),

    // GraphOps.degrees: k-1 inside the clique.
    Q("graph_degrees",
      (s, d) => {
        import s.implicits._
        nationGraph(s, d).degrees.toDF("n_nationkey", "degree")
          .select(col("n_nationkey"), col("degree").cast("long").as("degree"))
      },
      Some(sql("""SELECT n_nationkey, k - 1 AS degree FROM (
                    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                      count(*) OVER (PARTITION BY n_regionkey) AS k
                    FROM nation)
                  WHERE k >= 2"""))),

    // Pregel-backed ShortestPaths (graphx/lib/ShortestPaths.scala) from a
    // landmark vertex: distance 0 at the landmark, 1 inside its clique.
    Q("graph_shortest_paths",
      (s, d) => {
        import s.implicits._
        val landmark = 0L
        // ShortestPaths propagates along edge direction: feed it the
        // bidirected edge set (the canonical src<dst graph would make the
        // landmark unreachable from higher-keyed vertices).
        val bidirected = Graph.fromEdges(
          nationEdges(s, d).as[(Long, Long)].rdd
            .flatMap { case (a, b) => Seq(Edge(a, b, 1), Edge(b, a, 1)) }, 0)
        org.apache.spark.graphx.lib.ShortestPaths.run(bidirected, Seq(landmark))
          .vertices
          .map { case (v, m) => (v, m.get(landmark).map(_.toLong).getOrElse(-1L)) }
          .toDF("n_nationkey", "dist")
      },
      Some(sql("""SELECT n_nationkey,
                   CASE WHEN n_nationkey = 0 THEN 0
                        WHEN n_regionkey = (SELECT n_regionkey FROM nation WHERE n_nationkey = 0)
                        THEN 1 ELSE -1 END AS dist
                  FROM (SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_regionkey,
                          count(*) OVER (PARTITION BY n_regionkey) AS k
                        FROM nation)
                  WHERE k >= 2""")))
  )
}
