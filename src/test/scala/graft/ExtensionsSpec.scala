package graft

/** SQL surface of the native expressions: after GraftExtensions.install the
  * same codegen'd Catalyst expressions plan from SQL text as from the
  * Column API (the Column parity values are pinned in VectorFunctionsSpec). */
class ExtensionsSpec extends SparkSuite {

  test("install registers the native functions for SQL") {
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT graft_hamming64(7L, 1L) AS h")
      .head().getLong(0) === 2L)
    // 'a'=97, 'b'=98 → 97*31 + 98 = 3105
    assert(spark.sql("SELECT graft_rolling_hash('ab') AS h")
      .head().getLong(0) === 3105L)
    val cos = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS j")
      .head().getDouble(0) === 0.9611111111111111)
    assert(spark.sql("SELECT graft_strip_accents('café') AS s")
      .head().getString(0) === "cafe")
    // decomposed e + U+0301 in, precomposed U+00E9 out
    assert(spark.sql("SELECT graft_unicode_nfc('café') AS s")
      .head().getString(0) === "café")
  }

  test("install is idempotent and SQL matches the Column API") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs")
      .head().getDouble(0)
    val viaCol = df.select(
      org.apache.spark.sql.graft.expressions.cosineSimilarity(col("a"), col("b")))
      .head().getDouble(0)
    assert(viaSql === viaCol)
  }

  test("wrong arity fails with a clear message") {
    GraftExtensions.install(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hamming64(1L)").collect()
    }
    assert(e.getMessage.contains("graft_hamming64"))
  }

  test("GroupTopK operator matches the window formulation exactly") {
    GraftExtensions.install(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.graft.GroupTopK
    val df = Tables.orders(spark, sf)
    val custom = GroupTopK.topKPerGroup(df, Seq("o_orderstatus"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(custom.count() === expected.count())
    assert(custom.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(custom).count() === 0)
  }

  test("GroupTopK plans partial+final heaps with no SortExec") {
    GraftExtensions.install(spark)
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.GroupTopK
    val df = Tables.orders(spark, sf)
    val custom = GroupTopK.topKPerGroup(df, Seq("o_orderstatus"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    val planStr = custom.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(planStr).size >= 2,
      s"expected partial+final GroupTopKExec:\n$planStr")
    assert(!planStr.contains("SortExec") && !planStr.contains("Window"),
      s"custom top-k must not sort full groups:\n$planStr")
  }

  test("GroupTopK handles k > group size, ties, and singleton groups") {
    GraftExtensions.install(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.GroupTopK
    val df = Seq(
      ("a", 3.0, 1L), ("a", 3.0, 2L), ("a", 1.0, 3L),
      ("b", 9.0, 4L)).toDF("g", "v", "id")
    val out = GroupTopK.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 10)
      .as[(String, Double, Long)].collect().toSet
    assert(out.size === 4, "k larger than any group keeps everything")
    val top1 = GroupTopK.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), 1)
      .as[(String, Double, Long)].collect().toSet
    assert(top1 === Set(("a", 3.0, 1L), ("b", 9.0, 4L)),
      "tie resolves by the id tiebreak")
  }
}
