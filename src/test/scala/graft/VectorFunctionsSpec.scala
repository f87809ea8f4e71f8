package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Native codegen expressions vs their HOF/hand-computed specifications. */
class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.5f, 2.5f, 0.5f), Array(2.0f, -1.0f, 4.0f))
  ).toDF("id", "a", "b")

  test("native dot product equals HOF formulation and hand values") {
    val rows = vecs.select(
      col("id"),
      VectorFunctions.dotProduct(col("a"), col("b")).as("native"),
      VectorFunctions.dotProductHof(col("a"), col("b")).as("hof"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (_, n, h) => assert(math.abs(n - h) < 1e-12) }
    assert(rows.find(_._1 == 1L).get._2 === 32.0)
  }

  test("native cosine equals HOF formulation incl. zero-norm guard") {
    val rows = vecs.select(
      col("id"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("native"),
      VectorFunctions.cosineSimilarityHof(col("a"), col("b")).as("hof"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (_, n, h) => assert(math.abs(n - h) < 1e-12) }
    assert(rows.find(_._1 == 2L).get._2 === 0.0) // zero-norm → 0, not NaN
  }

  test("native dot handles mixed float/double sides without lossy casts") {
    val plane = Seq(0.1, -0.2, 0.3)
    val got = vecs.select(
      VectorFunctions.dotProduct(col("a"), array(plane.map(lit): _*)).as("d"))
      .collect().map(_.getDouble(0))
    val expected = Seq(
      1.0 * 0.1 + 2.0 * -0.2 + 3.0 * 0.3,
      0.0,
      -1.5 * 0.1 + 2.5 * -0.2 + 0.5 * 0.3)
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("length mismatch yields null, matching the HOF spec (no silent prefix dot)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("native_dot"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("native_cos"),
      VectorFunctions.dotProductHof(col("a"), col("b")).as("hof_dot"))
      .collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.isNullAt(2)) // the spec formulation agrees
  }

  test("a null element yields null, matching the HOF spec") {
    val df = Seq((Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))))
      .toDF("a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("native_dot"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("native_cos"),
      VectorFunctions.dotProductHof(col("a"), col("b")).as("hof_dot"))
      .collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("null inputs propagate as null") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("rolling hash matches the reference recurrence") {
    def ref(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % 1000000007L)
      h
    }
    val inputs = Seq("", "a", "hello world", "Número do ticket 📎")
    val got = inputs.toDF("s")
      .select(TextFunctions.rollingHash(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq === inputs.map(ref))
  }

  test("hamming distance is popcount of xor") {
    val df = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0x0fL, 0xf0L))
      .toDF("x", "y")
    val got = df.select(VectorFunctions.hammingDistance(col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 1L, 64L, 8L))
  }

  test("jaroWinkler: classic reference values through the codegen path") {
    val pairs = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // Winkler's canonical example
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("ab", "ba", 0.0),                          // window 0: nothing matches
      ("aaaaabbbbb", "aaaaaccccc", 0.6666666666666666), // jaro ≤ 0.7: no boost
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0)                               // DuckDB's empty-empty convention
    )
    val got = pairs.toDF("a", "b", "want")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")).as("jw"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1), r.toString))
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaroWinkler: interpreted path agrees with codegen") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""))
      .toDF("a", "b")
    val viaCodegen = pairs
      .select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interpreted = pairs
        .select(TextFunctions.jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(interpreted.toSeq === viaCodegen.toSeq)
    }
  }

  test("interpreted eval path agrees with codegen (expressions used in agg keys)") {
    // Force the interpreted path by evaluating via a literal-only projection
    // with codegen disabled for this plan.
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val rows = vecs.select(
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"),
        VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
        .collect()
      assert(math.abs(rows.head.getDouble(1) - 32.0) < 1e-12)
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
