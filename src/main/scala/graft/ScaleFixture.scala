package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Third scale point for the ScaleGrowthSpec fences (r13 verdict #2):
  * two-point (sf0.01 → sf0.1) growth checks cannot distinguish linear
  * from n·log n or from small-quadratic-with-offset. The driver ships no
  * sf0.3, so this fixture DERIVES one deterministically from sf0.1 —
  * three replicas with disjoint key ranges (offset 10^7 = 2^7·5^7,
  * divisible by every modulus the FENCED queries take over these
  * tables: 2, 4, 10, 50 — NOT by 211 or 997, so the dynpart/%997 rows
  * must not be pointed at this fixture without changing the offset):
  *
  *   - customer/orders: key-offset copies. FK structure, NULL-stripe
  *     fractions (c_custkey % 50 = 7 etc.) and group moduli are
  *     preserved exactly, so the null-safe join fences see a genuine 3×
  *     corpus.
  *   - documents, in TWO text modes:
  *
  *     DISJOINT (default): replicas 1 and 2 Caesar-shifted (translate
  *     over [a-z] AND [A-Z] — r14 ADVICE #3: uppercase passing through
  *     unshifted left grams containing them shared across replicas).
  *     Token structure, lengths and per-replica gram statistics are
  *     identical to sf0.1, but the three replicas occupy disjoint gram
  *     spaces — a 3×-bigger corpus of the same generative character,
  *     NOT 3 exact copies of every doc (exact replication would triple
  *     every gram's df and multiply same-source pair groups ~9×,
  *     turning the fence's "answer" term quadratic in the replica
  *     count — a fixture artifact, not a property of the engine).
  *
  *     OVERLAP (r14 verdict #3): docs with doc_id % 10 < 3 keep their
  *     ORIGINAL text in every replica (the offset is divisible by 10,
  *     so the class is replica-stable); the other 70% shift as above.
  *     The shared 30% triples its grams' document frequencies — the
  *     df-GROWTH regime of a real 3× web corpus, where rarity-ordered
  *     prefixes shift — and creates genuine cross-replica duplicate
  *     pairs, so the ANSWER grows faster than 3× while candidates must
  *     track it (the disjoint mode cannot see df-growth effects at
  *     all; ScaleGrowthSpec fences both modes).
  *
  * Staged once per (mode, source fingerprint) via the shared Staging
  * protocol (atomic rename; concurrent JVMs converge on one copy). The
  * staging key carries a fixture VERSION — staging is keyed by source
  * fingerprint, so a semantic change to the derivation (like the
  * uppercase shift fix) must bump it or stale stagings replay.
  */
object ScaleFixture {

  val Offset = 10000000L

  // v2: shift covers [A-Z]; overlap mode added.
  // v3: COMPLETE corpus — lineitem/events/embeddings replicated with
  //     FK-preserving key offsets, dims copied as-is — so bench_3x can
  //     run every headline row, not just the documents/customer/orders
  //     families (6 of 12 bench rows errored on the v2 fixture).
  private val Version = 3

  private def shift(c: Column, by: Int): Column = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val ABC = abc.toUpperCase(java.util.Locale.ROOT)
    translate(c, abc + ABC,
      abc.drop(by) + abc.take(by) + ABC.drop(by) + ABC.take(by))
  }

  /** Stage (if absent) and return the derived-3× directory.
    * `overlap = true` selects the shared-vocabulary text mode. */
  def dir(spark: SparkSession, src: String = "/root/testdata/sf0.1",
      overlap: Boolean = false): String = {
    // every COPIED source participates in the staging key — the six
    // replicated tables AND the four dims copied verbatim below (review
    // finding r14 for the replicated set; r15 ADVICE extended it to the
    // dims: a regenerated nation.parquet must re-stage even when every
    // fact is untouched, or the stale staged copy silently feeds
    // bench_3x and the ScaleGrowthSpec fences). Digested, not
    // concatenated: ten fingerprints would make the /tmp dir name
    // unwieldy.
    val fp = {
      val all = Seq("documents", "customer", "orders",
        "lineitem", "events", "embeddings",
        "region", "nation", "supplier", "part")
        .map(t => Staging.fingerprint(s"$src/$t.parquet")).mkString("_")
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(all.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"${b & 0xff}%02x").mkString
    }
    val mode = if (overlap) "ov" else "dj"
    val dest = java.nio.file.Paths.get(
      s"/tmp/graft_scale/sf0p3_v${Version}_${mode}_$fp")
    Staging.once(dest) { t =>
      def replicate(name: String, keyCols: Seq[String],
          textShift: Boolean): Unit = {
        val base = Engine.table(spark, src, name)
        val reps = (0 to 2).map { r =>
          val keyed = keyCols.foldLeft(base) { (df, k) =>
            df.withColumn(k, col(k) + lit(r * Offset)) }
          if (textShift && r > 0) {
            val shifted = shift(col("text"), 5 * r)
            keyed.withColumn("text",
              if (overlap)
                when(col("doc_id") % 10 < 3, col("text")).otherwise(shifted)
              else shifted)
          } else keyed
        }
        reps.reduce((a: DataFrame, b: DataFrame) => a.unionAll(b))
          .write.mode(SaveMode.Overwrite).parquet(s"$t/$name.parquet")
      }
      replicate("documents", Seq("doc_id"), textShift = true)
      replicate("customer", Seq("c_custkey"), textShift = false)
      replicate("orders", Seq("o_orderkey", "o_custkey"), textShift = false)
      // facts: keys offset in step with their FK parents (l_orderkey
      // tracks o_orderkey); l_partkey/l_suppkey and the nation keys stay
      // unchanged — dimensions do NOT grow with the corpus, which is the
      // realistic 3× shape (3× fact rows per supplier/part, not 3× more
      // suppliers)
      replicate("lineitem", Seq("l_orderkey"), textShift = false)
      replicate("events", Seq("event_id", "user_id"), textShift = false)
      replicate("embeddings", Seq("vec_id"), textShift = false)
      // dimensions copied verbatim
      for (name <- Seq("region", "nation", "supplier", "part"))
        Engine.table(spark, src, name).write.mode(SaveMode.Overwrite)
          .parquet(s"$t/$name.parquet")
    }
    dest.toString
  }
}
