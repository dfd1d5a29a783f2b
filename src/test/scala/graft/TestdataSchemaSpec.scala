package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard over the REAL driver testdata (not fixtures).
  *
  * Round 8 lesson: the driver regenerated events.parquet with
  * TIMESTAMP(MICROS) where rounds ≤7 carried TIMESTAMP(NANOS), and the
  * reader's hardcoded nanos→micros division broke 11 gate queries at
  * analysis time — silently, because nothing in `sbt test` read the real
  * files. This suite pins every table's column inventory and the
  * normalized events timestamp semantics against `/root/testdata/sf0.001`,
  * so the NEXT testdata drift fails loudly here instead of silently in
  * the correctness gate.
  */
class TestdataSchemaSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(sfDir).isDirectory
  private lazy val tables = Tables(spark, sfDir)

  private val expectedColumns = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label")
  )

  test("every driver table carries the expected column inventory") {
    assume(available, s"$sfDir not present in this environment")
    expectedColumns.foreach { case (name, cols) =>
      val got = tables.t(name).schema.fieldNames.toSeq
      assert(got == cols, s"table $name drifted: got $got")
    }
  }

  test("normalized events.ts is TIMESTAMP_NTZ with values in the generated epoch") {
    assume(available, s"$sfDir not present in this environment")
    val ev = tables.events
    assert(ev.schema("ts").dataType == TimestampNTZType,
      s"Tables.events must surface ts as TIMESTAMP_NTZ, got ${ev.schema("ts").dataType}")
    // A unit-scale bug (nanos read as micros or vice versa) moves timestamps
    // by 1000× — out of any plausible generated-data year. Pin the range so
    // the conversion branch, not just the type, is verified on real data.
    import org.apache.spark.sql.functions._
    val row = ev.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"),
      count(lit(1)).as("n")).head()
    val (lo, hi, n) = (row.getInt(0), row.getInt(1), row.getLong(2))
    assert(n > 0, "events table is empty")
    assert(lo >= 2000 && hi <= 2100, s"events.ts years [$lo,$hi] outside plausible range " +
      "— timestamp unit conversion is wrong for the current testdata layout")
  }

  test("raw events.ts layout is one normalizeEventTs handles — at EVERY scale factor") {
    // round-8's drift happened to hit all three sf dirs identically, but
    // the generator could change one at a time — check each that exists.
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).isDirectory)
    assume(dirs.nonEmpty, "no testdata present in this environment")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dirs.foreach { d =>
      val t = spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
      assert(t == LongType || t == TimestampType || t == TimestampNTZType,
        s"$d events.ts raw type $t is not handled by Tables.normalizeEventTs — extend it")
      val ev = Tables(spark, d).events
      assert(ev.schema("ts").dataType == TimestampNTZType, d)
    }
  }

  test("initEventCompat sets the nanos flag once and never overrides an explicit setting") {
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    // getOption surfaces registered defaults — detect EXPLICIT settings
    val prior = if (spark.sessionState.conf.contains(flag))
      Some(spark.conf.get(flag)) else None
    try {
      // unset session → the initializer supplies true
      spark.conf.unset(flag)
      Tables.initEventCompat(spark)
      assert(spark.conf.get(flag) == "true")
      // idempotent
      Tables.initEventCompat(spark)
      assert(spark.conf.get(flag) == "true")
      // an EXPLICIT caller setting is respected, not overridden
      spark.conf.set(flag, "false")
      Tables.initEventCompat(spark)
      assert(spark.conf.get(flag) == "false",
        "the initializer must no-op on a deliberately configured session")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(flag, v)
        case None => spark.conf.unset(flag)
      }
    }
  }

  test("streaming events reader surfaces a session-tz timestamp on real testdata") {
    assume(available, s"$sfDir not present in this environment")
    val st = streaming.EventStreams.readEventsStream(spark, sfDir).schema
    assert(st("ts").dataType == TimestampType,
      s"streaming ts must be TimestampType (watermark input), got ${st("ts").dataType}")
    assert(st.fieldNames.toSeq == expectedColumns("events"))
  }

  test("date columns read as timestamps (orders, lineitem)") {
    assume(available, s"$sfDir not present in this environment")
    def isTs(dt: DataType): Boolean = dt == TimestampType || dt == TimestampNTZType
    assert(isTs(tables.orders.schema("o_orderdate").dataType))
    assert(isTs(tables.lineitem.schema("l_shipdate").dataType))
  }
}
