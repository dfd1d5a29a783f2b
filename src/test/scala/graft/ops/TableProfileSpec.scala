package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class TableProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("profiles counts, nulls, exact NDV, and kind-mapped min/max in one pass") {
    val df = Seq(
      (1L, Some(2.5), Some("b"), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
      (2L, None, Some("a"), Some(Timestamp.valueOf("2024-06-01 12:00:00"))),
      (3L, Some(2.5), None, None),
      (4L, Some(-1.0), Some("a"), Some(Timestamp.valueOf("2024-01-01 00:00:00")))
    ).toDF("id", "v", "s", "ts")
    val got = TableProfile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "v", "s", "ts"))
    got.values.foreach(r => assert(r.getLong(1) == 4L))
    val v = got("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 2L)
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 2.5)
    assert(v.isNullAt(6) && v.isNullAt(7))
    val s = got("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "b")
    val ts = got("ts")
    assert(ts.getLong(2) == 1L && ts.getLong(3) == 2L)
    assert(ts.getDouble(4) == 1.7040672e15) // 2024-01-01T00:00Z in µs
    val id = got("id")
    assert(id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
  }

  test("rejects unsupported column types instead of profiling them approximately") {
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      TableProfile.profile(df)
    }
    assert(e.getMessage.contains("arr"))
    assert(TableProfile.profile(df, Seq("id")).count() == 1L)
  }

  test("leadingDigitProfile: exact histogram, ppm shares, zero/null/negative excluded") {
    val df = Seq(("g", 1L), ("g", 19L), ("g", 123L), ("g", 900L), ("g", 95L),
      ("g", 0L), ("g", -5L), ("h", 777L))
      .toDF("g", "v")
      .unionByName(Seq(("h", None: Option[Long])).toDF("g", "v"))
    val got = TableProfile.leadingDigitProfile(df, Seq("g"), "v")
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // group g: digits 1×3 (1, 19, 123), 9×2 (900, 95); zero and -5 excluded
    assert(got(("g", 1L)) == ((3L, 600000L)))
    assert(got(("g", 9L)) == ((2L, 400000L)))
    assert(got(("h", 7L)) == ((1L, 1000000L)))
    assert(got.size == 3)
  }
}
