package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi join by key salting — the join-side twin of
  * [[Relational.saltedSum]]. When a handful of hot keys dominate the fact
  * side, a plain shuffle join lands each hot key on ONE reducer; salting
  * spreads it over `factor` reducers: the fact side gets a deterministic
  * salt in [0, factor) hashed from per-row discriminator columns, the
  * other side is replicated across all `factor` salt values, and the join
  * runs on (keys :+ salt). Result is row-identical to the plain join.
  *
  * When to reach for it: the replicated side is too big to broadcast but
  * far smaller than the fact side (replication costs ×factor of it), and
  * AQE's skew-join splitting hasn't rescued the plan (AQE only splits a
  * partition AFTER materializing the map side; salting prevents the skew
  * at shuffle time and also covers full-outer/left joins AQE won't
  * split). The salt is a pure function of the discriminator columns — no
  * rand() — so retries and speculative tasks stay deterministic.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, other: DataFrame, keys: Seq[String],
                 discriminators: Seq[String], factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor > 1, "factor must be > 1 (1 is just the plain join)")
    require(discriminators.nonEmpty, "need discriminator columns to derive the salt")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(discriminators.map(col): _*), lit(factor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
