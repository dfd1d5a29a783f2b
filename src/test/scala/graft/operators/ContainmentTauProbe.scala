package graft.operators

import graft.{Storage, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the q167 suite-posture decision (run with
  * `Test/runMain graft.operators.ContainmentTauProbe`): does lifting the
  * containment threshold shrink the clone-dense corpus's output?
  *
  * MEASURED NEGATIVE (2026-08-15, sf0.1): the answer is NO — the pair
  * count is IDENTICAL at τ = 0.98 / 0.99 / 0.995 (2,237,167 pairs,
  * 12–18 s each), because the corpus's clones are near-exact and
  * essentially every qualifying pair has containment ≈ 1.0. A τ lift is
  * a dead lever here; the only true output reducers are a subject
  * filter (q168's watchlist shape — the containment BENCH signal) or a
  * different corpus. Consequence: q167 is excluded from the bench suite
  * ([[graft.SparkEntry.benchExclude]]) rather than replaced by a
  * same-cost τ sibling; its correctness stays gated at sf0.001/sf0.01
  * through Verify.
  */
object ContainmentTauProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    for (tau <- Seq(0.98, 0.99, 0.995)) {
      val t0 = System.nanoTime()
      val n = SetSimJoin.joinSelfContainment(docs, "doc_id", "toks",
        tau = tau).count()
      println(s"[tauprobe] tau=$tau pairs=$n secs=${(System.nanoTime() - t0) / 1e9}")
      Storage.releaseAll(spark)
    }
    spark.stop()
  }
}
