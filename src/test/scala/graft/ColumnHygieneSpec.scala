package graft

import graft.operators.ColumnHygiene
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Name-sanitization rules from reference/chat.py:21-31 and duplicate/
  * backfill handling from reference/main.py:85-87,125. */
class ColumnHygieneSpec extends AnyFunSuite {

  // Hand-rolled property driver (no scalatest+scalacheck bridge in the
  // offline cache): deterministic seeds, 200 cases per property.
  private def forAllSampled[A](gen: Gen[A], cases: Int = 200)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("sanitize replaces non-alphanumerics, prefixes digits, truncates at 300") {
    assert(ColumnHygiene.sanitizeName("número do ticket") === "n_mero_do_ticket")
    assert(ColumnHygiene.sanitizeName("99 pedidos") === "_99_pedidos")
    assert(ColumnHygiene.sanitizeName("ok_name") === "ok_name")
    assert(ColumnHygiene.sanitizeName("a" * 400).length === 300)
    assert(ColumnHygiene.sanitizeName("1" + "b" * 400).length === 300)
  }

  test("sanitize output always matches BigQuery-style name rules (property)") {
    val gen = Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString)
    forAllSampled(gen) { name =>
      val out = ColumnHygiene.sanitizeName(name)
      assert(out.matches("^[A-Za-z_][0-9A-Za-z_]{0,299}$"), s"input=$name out=$out")
    }
  }

  test("sanitize is idempotent (property)") {
    val gen = Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString)
    forAllSampled(gen) { name =>
      val once = ColumnHygiene.sanitizeName(name)
      assert(ColumnHygiene.sanitizeName(once) === once)
    }
  }
}

class ColumnHygieneSparkSpec extends SparkSuite {
  import spark.implicits._

  test("dropDuplicateColumns keeps first occurrence") {
    val df = Seq((1, "a", 9.0)).toDF("k", "v", "x")
      .select($"k", $"v", $"x".as("v"))
    val out = ColumnHygiene.dropDuplicateColumns(df)
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.collect().head.getString(1) === "a")
  }

  test("backfill adds only the missing expected columns as typed nulls") {
    val df = Seq((1, "x")).toDF("id", "present")
    val out = ColumnHygiene.backfill(df,
      Seq("present" -> StringType, "missing" -> StringType))
    assert(out.columns.toSeq === Seq("id", "present", "missing"))
    val row = out.collect().head
    assert(row.getString(1) === "x")
    assert(row.isNullAt(2))
  }

  test("sanitizeColumns renames via sanitizeName") {
    val df = Seq((1, 2)).toDF("99 número", "b#c")
    assert(ColumnHygiene.sanitizeColumns(df).columns.toSeq ===
      Seq("_99_n_mero", "b_c"))
  }

  test("columnProfile: exact null/distinct/min/max per audited column") {
    val df = Seq(
      (Option("a"), Option(10L)),
      (Option("b"), Option(20L)),
      (Option("a"), Option.empty[Long]),
      (Option.empty[String], Option(20L))).toDF("s", "n")
    val out = ColumnHygiene.columnProfile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    // countDistinct ignores nulls; min/max as strings
    assert(out("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(out("n") === ((4L, 1L, 2L, Some("10"), Some("20"))))
  }

  test("checkExpectations: one-scan report, null counts as violation") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Option(1L), 5.0), (Option(2L), -1.0), (Option.empty[Long], 3.0)
    ).toDF("id", "v")
    val out = ColumnHygiene.checkExpectations(df, Seq(
        ColumnHygiene.Expectation("id_not_null", col("id").isNotNull, critical = true),
        ColumnHygiene.Expectation("v_positive", col("v") > 0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out("id_not_null") === ((3L, 1L, true, false)))
    assert(out("v_positive") === ((3L, 1L, false, false)))
  }

  test("requireExpectations: critical failure throws with names, else returns") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Option(1L), 5.0), (Option.empty[Long], 3.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      ColumnHygiene.requireExpectations(df, Seq(
        ColumnHygiene.Expectation("id_not_null", col("id").isNotNull, critical = true)))
    }
    assert(e.getMessage.contains("id_not_null"))
    // non-critical violations only → report returned, no throw
    val rep = ColumnHygiene.requireExpectations(df, Seq(
      ColumnHygiene.Expectation("id_not_null", col("id").isNotNull)))
    assert(rep.collect().length === 1)
  }

  test("kAnonymity flags only quasi-identifier groups below k") {
    val df = Seq(
      ("NY", 10), ("NY", 10), ("NY", 10),      // size 3 → safe at k=3
      ("SF", 20), ("SF", 20),                  // size 2 → violation
      ("LA", 30)).toDF("city", "age")          // size 1 → violation
    val out = ColumnHygiene.kAnonymity(df, Seq("city", "age"), 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(("SF", 20) -> 2L, ("LA", 30) -> 1L))
    // k must be meaningful and quasiCols non-empty
    intercept[IllegalArgumentException] {
      ColumnHygiene.kAnonymity(df, Seq.empty, 3)
    }
    intercept[IllegalArgumentException] {
      ColumnHygiene.kAnonymity(df, Seq("city"), 1)
    }
  }

  test("lDiversity: homogeneous groups flagged, null sensitive values don't count") {
    val df = Seq(
      ("NY", Some("flu")), ("NY", Some("cold")),          // 2 distinct → diverse at l=2
      ("SF", Some("flu")), ("SF", Some("flu")),           // 1 distinct → homogeneous
      ("LA", Some("hiv")), ("LA", None)                   // null ignored → 1 distinct
    ).toDF("city", "diagnosis")
    val out = ColumnHygiene.lDiversity(df, Seq("city"), "diagnosis", 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out === Map(
      "NY" -> ((2L, 2L, true)),
      "SF" -> ((2L, 1L, false)),
      "LA" -> ((2L, 1L, false))))
    intercept[IllegalArgumentException] {
      ColumnHygiene.lDiversity(df, Seq.empty, "diagnosis", 2)
    }
    intercept[IllegalArgumentException] {
      ColumnHygiene.lDiversity(df, Seq("city"), "diagnosis", 1)
    }
  }

  test("benford: leading digits via %.10e, zeros/nulls excluded, chi2 hand-check") {
    val df = Seq(Some(1.0), Some(1.5), Some(25.0), Some(-3.2), Some(0.0), None)
      .toDF("v")
    val out = ColumnHygiene.benford(df, "v").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet === Set(1, 2, 3))
    val e1 = ColumnHygiene.benfordShares.head
    val dev = 2.0 - 4.0 * e1
    assert(out(1) === ((2L, 0.5, r6(e1), r6(dev * dev / (4.0 * e1)))))
    assert(out(2)._1 === 1L && out(2)._2 === 0.25)
    assert(out(3)._1 === 1L, "negative value contributes via abs")
  }

  test("benford: %.10e digit behavior is the documented parity contract") {
    // values ≥ 5e-11 relative below a power of ten keep their true digit;
    // values INSIDE that window carry to digit 1 — deliberately, because
    // both engines' %.10e agree there while %.16e would split them (the
    // JVM formats from the padded shortest rep, C from the exact
    // expansion — e.g. the double nearest 1e-7 prints digit 1 in Java
    // and digit 9 in C at 16 fractional digits)
    val df = Seq(
      9.9999999996,         // 9.99999…e0, 11 sig digits: no carry → 9
      1e-7,                 // shortest rep crosses the decade: stays 1
      9.99999999996         // inside the 5e-11 window: documented carry → 1
    ).toDF("v")
    val out = ColumnHygiene.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(9 -> 1L, 1 -> 2L), out.toString)
  }

  test("riOrphans: dangling FKs counted per key, null FKs excluded") {
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(9L),
      Option(9L), Option.empty[Long]).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = ColumnHygiene.riOrphans(child, parent, "fk", "pk")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(9L -> 2L))
    // a clean child produces an empty report
    assert(ColumnHygiene.riOrphans(
      child.filter($"fk".isin(1L, 2L)), parent, "fk", "pk").count() === 0L)
  }

  test("skewReport: exact shares and skew factors, bounded deterministic top-k") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++ Seq("cold", "cool"))
      .toDF("k")
    val out = ColumnHygiene.skewReport(df, "k", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toSeq
    // 10 rows, 4 keys → mean 2.5; top-3 with count-desc then key-asc order
    assert(out === Seq(
      "hot" -> ((6L, 0.6, 2.4)),
      "warm" -> ((2L, 0.2, 0.8)),
      "cold" -> ((1L, 0.1, 0.4))))
  }

  test("checkExpectations on an empty frame: zero rows, checks pass") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2.0)).toDF("id", "v").filter(col("id") < 0)
    val out = ColumnHygiene.checkExpectations(df,
        Seq(ColumnHygiene.Expectation("v_positive", col("v") > 0)))
      .collect().head
    assert(out.getLong(1) === 0L)   // n_rows
    assert(out.getLong(2) === 0L)   // n_violations (sum over empty → 0)
    assert(out.getBoolean(5) === true)
  }

  test("noisyCounts: deterministic, near the true count, epsilon-scaled") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(100)("a") ++ Seq.fill(50)("b")).toDF("g")
    val run1 = ColumnHygiene.noisyCounts(df, "g", 1.0, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val run2 = ColumnHygiene.noisyCounts(df, "g", 1.0, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run1 === run2)                      // same release on rerun
    assert(math.abs(run1("a") - 100.0) < 25)   // Laplace(1) tail is tiny
    assert(run1("a") !== 100.0)                // but noise is real
    // 10× larger epsilon → 10× smaller noise, same sign (same u draw)
    val tight = ColumnHygiene.noisyCounts(df, "g", 10.0, "s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(tight("a") - 100.0) * 10 - math.abs(run1("a") - 100.0)
      < 1e-4, s"$tight vs $run1")
    intercept[IllegalArgumentException](
      ColumnHygiene.noisyCounts(df, "g", 0.0, "s"))
  }

  test("fdViolations: only multi-valued determinants survive; nulls count") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),            // holds
      (2L, Some("x")), (2L, Some("y")),            // violated
      (3L, Some("x")), (3L, None: Option[String])  // {x, null} → ambiguous
    ).toDF("k", "v")
    val out = ColumnHygiene.fdViolations(df, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))), out.toString)
  }

  test("debounce keeps first rows and value changes only, null-safe") {
    import spark.implicits._
    import graft.operators.Relational
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val df = Seq(
      (1L, ts(1), 10L, Some("open")), (1L, ts(2), 11L, Some("open")),
      (1L, ts(3), 12L, Some("closed")), (1L, ts(4), 13L, Some("closed")),
      (1L, ts(5), 14L, Some("open")),
      (2L, ts(1), 20L, None: Option[String]), (2L, ts(2), 21L, None),
      (2L, ts(3), 22L, Some("open"))
    ).toDF("k", "ts", "id", "v")
    val kept = Relational.debounce(df, "k", "ts", "id", "v")
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L, 14L, 20L, 22L), kept.toString)
  }

  test("profileDrift: null-rate delta, distinct ratio, range movement") {
    import spark.implicits._
    val oldDf = Seq((1L, Some("x")), (2L, Some("y")))
      .toDF("id", "v")
    val newDf = Seq((1L, Some("x")), (2L, Some("y")), (3L, Some("z")),
      (4L, None: Option[String])).toDF("id", "v")
    val out = ColumnHygiene.profileDrift(oldDf, newDf, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = out("v")
    assert(v.getLong(1) === 2L && v.getLong(2) === 4L)
    assert(v.getDouble(3) === 0.25)        // null rate 0 → 1/4
    assert(v.getDouble(4) === 1.5)         // distinct 2 → 3
    assert(!v.getBoolean(5) && v.getBoolean(6))  // min x..x, max y→z
    val id = out("id")
    assert(id.getDouble(4) === 2.0 && id.getBoolean(6))
  }

  test("noisyMeans: clipping binds, noise matches the md5 construction exactly") {
    import graft.operators.ColumnHygiene
    // values 10 and 3000 clipped to [0, 10] → both clip to 10, mean = 10
    val df = Seq(("g", 10L), ("g", 3000L)).toDF("src", "v")
    val out = ColumnHygiene.noisyMeans(df, "src", "v",
      lo = 0.0, hi = 10.0, epsilon = 1.0, salt = "s").collect().head
    assert(out.getLong(1) === 2L)
    // replicate hashUnit + Laplace inverse-CDF double-for-double
    def hu(key: String, salt: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val u = hu("g", "s") - 0.5
    val noise = -10.0 * math.signum(u) *
      math.log(math.max(1.0 - 2.0 * math.abs(u), 1.0 / 4294967296.0)) / 2
    val expected = BigDecimal(10.0 + noise)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(2) === expected)
    // deterministic release: a rerun yields the identical figure
    val again = ColumnHygiene.noisyMeans(df, "src", "v", 0.0, 10.0, 1.0, "s")
      .collect().head.getDouble(2)
    assert(again === out.getDouble(2))
    // a different salt draws different noise
    val other = ColumnHygiene.noisyMeans(df, "src", "v", 0.0, 10.0, 1.0, "s2")
      .collect().head.getDouble(2)
    assert(other !== out.getDouble(2))
    intercept[IllegalArgumentException](
      ColumnHygiene.noisyMeans(df, "src", "v", 5.0, 5.0, 1.0, "s"))
    intercept[IllegalArgumentException](
      ColumnHygiene.noisyMeans(df, "src", "v", 0.0, 10.0, 0.0, "s"))
  }
  test("tCloseness: TVD hand-check, absent values fold in, nulls excluded") {
    // global sensitive dist (nulls out): x:3, y:3 -> q = (1/2, 1/2).
    // Group A = [x,x,x,y]: p=(3/4,1/4) -> tvd = (1/4+1/4)/2... computed
    // via the gridless identity: s1 = .25+.25 = .5, s2 = 1 -> tvd = .25.
    // Group B = [y,y]: value x ABSENT -> s1 = |1-.5| = .5, s2 = .5 ->
    // tvd = (.5 + (1-.5))/2 = .5 -- the absent value contributes its
    // global mass without a grid row.
    val df = (Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq.fill(2)(("B", "y")) :+ (("A", null: String)))
      .toDF("grp", "s")
    val out = ColumnHygiene.tCloseness(df, Seq("grp"), "s", 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out === Map("A" -> ((4L, 0.25, true)), "B" -> ((2L, 0.5, false))))
    intercept[IllegalArgumentException](
      ColumnHygiene.tCloseness(df, Seq("grp"), "s", 1.5))
    intercept[IllegalArgumentException](
      ColumnHygiene.tCloseness(df, Seq.empty, "s", 0.3))
  }

  test("keyCandidates: unique key verified, null/dup combos rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "y"),
      (3L, None, "x"), (4L, Some("b"), "y"))
      .toDF("id", "grp", "tag")
    val out = ColumnHygiene.keyCandidates(df,
        Seq(Seq("id"), Seq("grp"), Seq("grp", "tag")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    // id: 4 distinct over 4 rows, no nulls → the real key
    assert(out("id") === ((4L, 0L, 4L, 1.0, true)))
    // grp: one null row; the null is a DISTINCT struct value (a, b, null)
    assert(out("grp") === ((4L, 1L, 3L, 0.75, false)))
    // grp+tag: all four combos distinct but a null component blocks is_key
    assert(out("grp+tag") === ((4L, 1L, 4L, 1.0, false)))
    // duplicate struct values collapse: two (a,·) rows under grp alone
    intercept[IllegalArgumentException](
      ColumnHygiene.keyCandidates(df, Seq.empty))
    intercept[IllegalArgumentException](
      ColumnHygiene.keyCandidates(df, Seq(Seq.empty)))
  }
}
