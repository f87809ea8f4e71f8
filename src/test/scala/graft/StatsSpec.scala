package graft

import graft.operators.Stats

class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("groupOls: exact fit recovered, noisy fit hand-checked") {
    val exact = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("grp", "x", "y")
    val r = Stats.groupOls(exact, "grp", "x", "y").collect().head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 2.0)   // slope
    assert(r.getDouble(3) === 0.0)   // intercept
    assert(r.getDouble(4) === 1.0)   // r2 of a perfect line
    // y = 1 + x with one off-line point: slope from hand-computed sums
    // x = 1,2,3 ; y = 2,3,5 → cov = 1.5, var(x) = 1 → slope 1.5,
    // intercept = ȳ − 1.5·x̄ = 10/3 − 3 = 1/3
    val noisy = Seq(("g", 1.0, 2.0), ("g", 2.0, 3.0), ("g", 3.0, 5.0))
      .toDF("grp", "x", "y")
    val n = Stats.groupOls(noisy, "grp", "x", "y").collect().head
    assert(n.getDouble(2) === 1.5)
    assert(n.getDouble(3) === 0.333333)
  }

  test("groupOls: singleton and zero-x-variance groups yield nulls, not NaN") {
    val df = Seq(("solo", 1.0, 5.0),
      ("flat", 2.0, 1.0), ("flat", 2.0, 9.0)).toDF("grp", "x", "y")
    val out = Stats.groupOls(df, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("solo").isNullAt(2) && out("solo").isNullAt(4))
    assert(out("flat").isNullAt(2) && out("flat").isNullAt(3) &&
      out("flat").isNullAt(4))
  }

  test("madOutliers flags only far points; MAD=0 groups flag nothing") {
    // g: values 1..9 plus 100 → median 5.5, deviations 0.5..4.5 & 94.5
    // → MAD = 2.5; robust z of 100 = 94.5/(2.5·1.4826) ≈ 25.5 — the only
    // point past z=3 (next largest is 4.5/(2.5·1.4826) ≈ 1.21)
    val g = (1 to 9).map(v => ("g", v.toDouble)) :+ (("g", 100.0))
    // flat: >half identical → MAD = 0 → nothing flagged, not divide-by-0
    val flat = Seq(("flat", 7.0), ("flat", 7.0), ("flat", 7.0), ("flat", 99.0))
    val df = (g ++ flat).toDF("grp", "v")
    val out = Stats.madOutliers(df, "grp", "v").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("grp") === "g" &&
      out.head.getAs[Double]("v") === 100.0)
    assert(out.head.getAs[Double]("med") === 5.5 &&
      out.head.getAs[Double]("mad") === 2.5)
  }
}
