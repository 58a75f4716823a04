package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.001"
    val spark = Engine.withHive(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Registry.dropManaged
    dropManaged(spark, "g_stats")
    spark.sql(s"CREATE TABLE g_stats USING parquet AS SELECT o_orderkey, o_totalprice FROM parquet.`$d/orders.parquet`")
    try {
      spark.sql("ANALYZE TABLE g_stats COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_totalprice")
      spark.sql("DESCRIBE EXTENDED g_stats o_orderkey").show(20, false)
    } catch { case e: Throwable => println("ANALYZE FAIL " + e.getMessage.take(300)) }
    dropManaged(spark, "g_addcol")
    spark.sql(s"CREATE TABLE g_addcol USING parquet AS SELECT r_regionkey AS k FROM parquet.`$d/region.parquet`")
    try {
      spark.sql("ALTER TABLE g_addcol ADD COLUMNS (extra INT)")
      spark.sql("INSERT INTO g_addcol VALUES (99, 7)")
      spark.table("g_addcol").orderBy("k").show()
      println("ADDCOL OK")
    } catch { case e: Throwable => println("ADDCOL FAIL " + e.getMessage.take(300)) }
    // date roundtrip across formats
    val dates = spark.read.parquet(s"$d/orders.parquet")
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("dt")).distinct()
    for (fmt <- Seq("parquet", "csv", "json", "orc")) {
      try {
        val p = s"/tmp/graft_io/scratch_dates_$fmt"
        graft.queries.Registry.rmTree(new java.io.File(p))
        dates.write.format(fmt).option("header", "true").save(p)
        val rd = spark.read.format(fmt).option("header", "true")
          .schema("dt DATE").load(p)
        val r = rd.agg(count(lit(1)), min("dt"), max("dt")).collect()(0)
        println(s"DATEFMT $fmt -> $r")
      } catch { case e: Throwable => println(s"DATEFMT $fmt FAIL " + e.getMessage.take(200)) }
    }
    spark.stop()
    println("SCRATCH-DONE")
  }
}
