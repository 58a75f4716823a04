package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Deterministic rotation slice (r18 verdict #3 — the standing
    * third-scale-point protocol): `slice:k/n` selects the rows whose
    * name falls in rotation class k of n. Keyed on String.hashCode
    * (SPEC-FIXED in Java — s[0]*31^(n-1)+…— so the same k/n selects the
    * same rows on every JVM and every round), floorMod for negatives.
    * Used to run a rotating quarter of the registry against the derived
    * 3× corpus each round; the cursor lives in COVERAGE.md. */
  private def inSlice(spec: String, name: String): Boolean = spec match {
    case s if s.startsWith("slice:") =>
      // fail fast with a usage message on a malformed spec (r19 ADVICE:
      // `slice:a/b` threw NumberFormatException and `slice:0/0` threw
      // ArithmeticException from deep inside the run) — reject before
      // any query executes rather than aborting mid-dump.
      val kn = s.stripPrefix("slice:").split("/")
      val parsed = kn match {
        case Array(ks, ns) => (ks.toIntOption, ns.toIntOption) match {
          case (Some(k), Some(n)) if n > 0 && k >= 0 && k < n => Some((k, n))
          case _ => None
        }
        case _ => None
      }
      parsed match {
        case Some((k, n)) => java.lang.Math.floorMod(name.hashCode, n) == k
        case None =>
          System.err.println(
            s"[verify] bad slice spec '$s': expected slice:k/n with n > 0 and 0 <= k < n")
          sys.exit(2)
      }
    case _ => spec == name
  }
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.withHive(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(inSlice(_, name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
