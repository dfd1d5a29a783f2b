package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Semi join with a Bloom-filter runtime pre-filter — the shuffle-reduction
  * pattern Spark's own `InjectRuntimeFilter` rule applies, expressed as an
  * explicit operator so a pipeline can use it where the optimizer's
  * heuristics don't fire (e.g. the build side is only known to be selective
  * by the author, or the join is produced programmatically).
  *
  * Phase 1 aggregates the build side's keys into one Bloom filter
  * (`DataFrameStatFunctions.bloomFilter` — a distributed treeAggregate;
  * only the filter's bytes, sized by `expectedItems`/`fpp` and NOT by the
  * data, reach the driver — the same bounded-artifact contract as the IVF
  * centroids). Phase 2 embeds those bytes as a literal in a
  * `might_contain` predicate (Spark's native `BloomFilterMightContain`,
  * codegen'd) and filters the probe BEFORE its shuffle: at 100 TB the
  * exchange only carries probe rows whose key might match, turning a
  * full-corpus shuffle into a selectivity-proportional one. The final
  * left-semi join makes the result EXACT — Bloom false positives survive
  * the pre-filter but die in the join, so the filter affects bytes
  * shuffled, never the answer.
  */
object BloomJoin {

  /** Exact `probe LEFT SEMI JOIN build` on integral keys, Bloom-pre-filtered.
    * `expectedItems` sizes the filter (overestimate is safe: more bits,
    * same answer); `fpp` trades filter size against wasted shuffle.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    // Enforce the integral-key contract loudly: stat.bloomFilter inserts
    // string keys via putBinary, while the probe below checks the LONG
    // domain (mightContainLong) — a string build key would silently drop
    // (nearly) every probe row instead of erroring.
    def integral(df: DataFrame, name: String): Boolean = {
      import org.apache.spark.sql.types._
      df.schema(name).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    require(integral(build, buildKey) && integral(probe, probeKey),
      s"bloomSemiJoin requires integral key columns; got " +
        s"$buildKey: ${build.schema(buildKey).dataType.simpleString}, " +
        s"$probeKey: ${probe.schema(probeKey).dataType.simpleString}")
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // stat.bloomFilter inserts integral keys via putLong; mightContainLong
    // probes the same domain, so the probe key is cast to long to match.
    val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      GraftColumnBridge.expression(col(probeKey).cast("long"))))
    val prefiltered = probe.filter(mightContain)
    prefiltered.join(build, prefiltered(probeKey) === build(buildKey), "left_semi")
  }
}
