package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Manual measurement harness for the native winnowing selection
  * (VERDICT_r11 directive #2; not part of the suite — timings are
  * load-sensitive):
  *
  * {{{ sbt -batch "Test/runMain graft.operators.WinnowPerfProbe [sfDir]" }}}
  *
  * Runs the q170 token-gram selection over the documents corpus with
  * both formulations — the pinned HOF `aggregate`-fold reference
  * ([[Winnowing.fingerprintsHof]], O(n·w) interpreted lambdas) and the
  * native monotonic-deque expression ([[Winnowing.fingerprints]], one
  * compiled O(n) pass) — min-of-3 each, and prints both times plus a
  * row-count equality check. Measured numbers are recorded in NEXT.md.
  */
object WinnowPerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

    def time(label: String, f: () => Long): Long = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f(); val ms = (System.nanoTime() - t0) / 1000000
        (ms, n)
      }
      println(s"$label: min ${times.map(_._1).min} ms (runs ${times.map(_._1).mkString(", ")}), rows ${times.head._2}")
      times.head._2
    }
    val nNat = time("native ", () =>
      Winnowing.fingerprints(docs, "doc_id", "toks", k = 3, w = 4).count())
    val nHof = time("hof    ", () =>
      Winnowing.fingerprintsHof(docs, "doc_id", "toks", k = 3, w = 4).count())
    println(s"rowcount match: ${nNat == nHof}")
    spark.stop()
  }
}
