package graft.operators

import graft.functions.{IntOps, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketching (Flajolet et al. 2007) over the
  * portable 60-bit hash family: 2^p registers, each holding the maximum
  * "rank" (leading-zero count + 1 of the hash suffix) seen — a
  * fixed-size distinct-count summary of an unbounded stream.
  *
  * The REGISTER TABLE is the operator's output: all-integer state, built
  * with one map-side-combined `groupBy(register).max(rank)` whose
  * exchange carries at most 2^p rows per task — and, being integers from
  * the portable family, replayed bit-identically by the DuckDB oracle
  * (the rank uses `length(bin(x))` for bit-length, which both engines
  * define identically on positives). The floating-point cardinality
  * ESTIMATE is a driver-side fold over ≤ 2^p registers
  * ([[estimateFromRegisters]]) — deliberately not a column expression,
  * so no cross-engine float comparison is needed.
  *
  * Merging sketches of two corpora = per-register max ([[merge]]) —
  * like the count-min merge, an ingest pipeline never rescans.
  */
object HyperLogLog {

  /** Rank of a 60-bit hash under precision p: leading zeros of the
    * (60−p)-bit suffix, plus one. Suffix 0 (all zeros) gets the maximum
    * rank 61−p.
    */
  private def rankOf(h: Column, p: Int): Column = {
    val s = IntOps.intDiv(h, lit(1L << p))
    when(s === 0, lit(61 - p))
      .otherwise(lit(60 - p) - length(bin(s)) + 1)
  }

  /** Register table (register, max_rank) for the values of `keyCol`;
    * at most 2^p rows (only observed registers appear).
    */
  def registers(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    require(p >= 2 && p <= 30, s"p out of range: $p")
    // Stage the md5-family hash ONCE per row (the staged-projection
    // discipline): register and rank both reference it, and rankOf's
    // when/otherwise branches reference its suffix again — inlining the
    // hash60 tree would re-run md5 ~3x per row.
    val h = col("__h60")
    df.select(PortableHash.hash60(col(keyCol).cast("string")).as("__h60"))
      .select((h % lit(1L << p)).as("register"),
        // long, matching SQL engines where length() is BIGINT
        rankOf(h, p).cast("long").as("rank"))
      .groupBy(col("register"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** SQL (DuckDB) replay of [[registers]] for expression `e`. */
  def registersSql(e: String, p: Int, from: String): String = {
    val m = 1L << p
    s"""SELECT register, max(rank) AS max_rank FROM (
       |  SELECT h % $m AS register,
       |    CASE WHEN h // $m = 0 THEN ${61 - p}
       |         ELSE ${60 - p} - length(bin(h // $m)) + 1 END AS rank
       |  FROM (SELECT ${PortableHash.hash60Sql(e)} AS h FROM $from)
       |) GROUP BY register""".stripMargin
  }

  /** HLL merge: the union's sketch is the per-register max. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("register"))
      .agg(max(col("max_rank")).as("max_rank"))

  /** GROUPED register tables: one HLL sketch per value of `groupCol` —
    * approximate distinct-per-group (distinct users per page, distinct
    * n-grams per source) in ONE pass with bounded state. The exchange
    * key widens to (group, register), so each map task emits at most
    * groups × 2^p partial rows — still sketch-sized per group, and the
    * answer for G groups is G fixed-size sketches instead of a
    * `distinct` shuffle of every (group, key) pair. Merging two runs
    * stays per-(group, register) max. Output (group, register,
    * max_rank) is all-integer — the oracle replays it exactly;
    * per-group estimates fold driver-side from each group's ≤ 2^p rows
    * ([[estimateFromRegisters]]).
    */
  def registersByGroup(df: DataFrame, groupCol: String, keyCol: String,
                       p: Int): DataFrame = {
    require(p >= 2 && p <= 30, s"p out of range: $p")
    val h = col("__h60")
    df.select(col(groupCol),
        PortableHash.hash60(col(keyCol).cast("string")).as("__h60"))
      .select(col(groupCol),
        (h % lit(1L << p)).as("register"),
        rankOf(h, p).cast("long").as("rank"))
      .groupBy(col(groupCol), col("register"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** SQL (DuckDB) replay of [[registersByGroup]]; `groupName` must match
    * the Spark side's group column name (the compare is name-keyed).
    */
  def registersByGroupSql(groupExpr: String, groupName: String, e: String,
                          p: Int, from: String): String = {
    val m = 1L << p
    s"""SELECT g AS $groupName, register, max(rank) AS max_rank FROM (
       |  SELECT g, h % $m AS register,
       |    CASE WHEN h // $m = 0 THEN ${61 - p}
       |         ELSE ${60 - p} - length(bin(h // $m)) + 1 END AS rank
       |  FROM (SELECT $groupExpr AS g, ${PortableHash.hash60Sql(e)} AS h FROM $from)
       |) GROUP BY g, register""".stripMargin
  }

  /** Driver-side cardinality estimate from a collected register table:
    * the standard HLL raw estimate with the small-range (linear
    * counting) correction. Plain Scala — the distributed artifact is the
    * integer register table, not this float.
    */
  def estimateFromRegisters(regs: Seq[(Long, Long)], p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val byReg = regs.toMap
    val sum = (0 until m).map(r =>
      math.pow(2.0, -byReg.getOrElse(r.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = m - regs.count(_._2 > 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
