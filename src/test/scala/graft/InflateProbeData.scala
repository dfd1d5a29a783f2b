package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale-probe data builder (VERDICT_r10 directive #8): inflates
  * the sf0.1 testdata ~10× into `target/sf1probe` so the gate suite can be
  * exercised at an sf1-equivalent volume without touching the read-only
  * driver testdata.
  *
  * {{{ sbt -batch "Test/runMain graft.InflateProbeData" }}}
  *
  * Method: 10 replicas, every entity key offset by replica·10⁸ so the
  * star-schema joins stay referentially intact and the replicas are
  * DISJOINT key spaces. Content that similarity operators compare is made
  * replica-disjoint too — document tokens get a replica prefix, supplier
  * names a replica suffix (edit distance ≥ 2 across replicas), embedding
  * coordinates a replica offset — so the probe measures a clean 10×
  * scale-up of each operator's work rather than an artificial
  * clones-of-everything corpus whose pair space explodes quadratically.
  * region/nation stay as-is (dimension tables). This is an OPERATIONAL
  * probe (ceilings: OOM, single-task stalls, driver collects, runtimes),
  * not a statistical sf1 — the driver's generator owns that distribution.
  */
object InflateProbeData {
  private val K = 100000000L

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/sf1probe")
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    def inflate(t: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      val reps = (0 until 10).map(r => tx(base, r))
      reps.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[inflate] $t done")
    }

    for (t <- Seq("region", "nation"))
      read(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    inflate("customer")((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * K)))
    inflate("orders")((d, r) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * K))
      .withColumn("o_custkey", col("o_custkey") + lit(r * K)))
    inflate("lineitem")((d, r) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(r * K))
      .withColumn("l_partkey", col("l_partkey") + lit(r * K))
      .withColumn("l_suppkey", col("l_suppkey") + lit(r * K)))
    inflate("part")((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * K)))
    inflate("supplier")((d, r) => d
      .withColumn("s_suppkey", col("s_suppkey") + lit(r * K))
      // two replica-distinct suffix chars: within-replica pairwise edit
      // distances are unchanged (common suffix), cross-replica >= 2 — the
      // fuzzy-link radius d<=1 never pairs across replicas
      .withColumn("s_name", concat(col("s_name"), lit("#"),
        lit(('A' + r).toChar.toString), lit(('A' + r).toChar.toString))))
    inflate("events")((d, r) => d
      .withColumn("event_id", col("event_id") + lit(r * K))
      .withColumn("user_id", col("user_id") + lit(r * K)))
    inflate("documents")((d, r) => {
      val keyed = d.withColumn("doc_id", col("doc_id") + lit(r * K))
      // Replica 0 keeps the base text VERBATIM (the embedding-replica
      // convention): bare corpus terms stay findable at sf1 — the
      // round-15 proximity-search evidence was vacuous because an
      // all-prefixed corpus contains no bare probe term. Replicas 1-9
      // get replica-prefixed tokens, so the vocabularies of all 10
      // replicas remain pairwise disjoint and similarity joins/dedup
      // still see 10 independent corpora.
      if (r == 0) keyed
      else keyed
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"r${r}x$$1"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    inflate("embeddings")((d, r) => d
      .withColumn("vec_id", col("vec_id") + lit(r * K))
      // Per-replica deterministic SIGN FLIPS (replica 0 = the base
      // corpus verbatim): negation is exact in IEEE floats, so every
      // within-replica cosine — including the planted near-dup pairs —
      // is preserved bit-for-bit, while a cross-replica pair sees ~half
      // its coordinate products sign-scrambled and lands near 0.
      //
      // The previous scheme (x + r·16) was MEASURED degenerate
      // (2026-08-16): the shared DC offset dominated every dot product,
      // putting 81% of ALL 200M pairs above cosine 0.5 (the base corpus
      // has NO pair above 0.61), so any operator keyed on a moderate
      // cosine threshold saw a quadratic pair space that the real
      // corpus doesn't have — q236's eps=0.35 ε-graph materialized
      // 126M edges and OOMed, and the single-linkage wmax cut grew an
      // 11.5k-node component. Sign flips keep similarity work linear in
      // the replica count, which is the probe's stated contract.
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(lit(r) === 0 || pmod(hash(lit(r), i), lit(2)) === 0, x)
            .otherwise(-x))))

    spark.stop()
  }
}
