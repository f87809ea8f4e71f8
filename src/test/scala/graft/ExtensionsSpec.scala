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
    import org.apache.spark.sql.functions.{col, rank}
    import org.apache.spark.sql.graft.GroupTopK
    val df = Tables.orders(spark, sf)
    val custom = GroupTopK.topKPerGroup(df, Seq("o_orderstatus"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
    // baseline via rank() — GroupTopKRewrite only matches row_number, so
    // this stays a REAL window plan (equal semantics: the order is total,
    // so rank == row_number); a row_number baseline would itself be
    // rewritten and the comparison would be custom-vs-custom
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = df.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(expected.queryExecution.executedPlan.toString.contains("Window"),
      "baseline must actually plan a Window")
    assert(custom.count() === expected.count())
    assert(custom.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(custom).count() === 0)
  }

  test("GroupTopKRewrite: idiomatic row_number filter plans the heap operator") {
    GraftExtensions.install(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, rank, row_number}
    val df = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // the rank column SURVIVES the rewrite (re-emitted under the original
    // exprId), so select it and check values, not just membership
    val rewritten = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(plan).size >= 2,
      s"expected partial+final GroupTopKExec:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window("),
      s"rewrite must replace the window path:\n$plan")
    val baseline = df.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 4)
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
    assert(rewritten.count() === baseline.count())
    assert(rewritten.exceptAll(baseline).count() === 0)
    assert(baseline.exceptAll(rewritten).count() === 0)
    // extra conjuncts survive above the node; equality-to-1 is top-1
    val top1even = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("o_orderkey") % 2 === 0)
    val t1plan = top1even.queryExecution.executedPlan.toString
    assert("GroupTopK \\[".r.findAllIn(t1plan).size >= 2)
    val t1base = df.withColumn("rn", rank().over(w))
      .filter(col("rn") === 1 && col("o_orderkey") % 2 === 0)
    assert(top1even.exceptAll(t1base).count() === 0)
    assert(t1base.exceptAll(top1even).count() === 0)
    // guard: rank() filters do NOT rewrite (ties)
    val rankPlan = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 4)
      .queryExecution.executedPlan.toString
    assert(!rankPlan.contains("GroupTopK"),
      "rank() admits ties — must stay a window plan")
    // a CAST rank still rewrites: UnwrapCastInBinaryComparison +
    // filter-pushdown normalize `cast(rn) <= 4L` back into the bare
    // pattern before user rules run — verify values through the cast
    val casted = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 4L)
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
    assert(casted.queryExecution.executedPlan.toString.contains("GroupTopK"))
    val castBase = df.withColumn("rn", rank().over(w).cast("long"))
      .filter(col("rn") <= 4L)
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
    assert(casted.exceptAll(castBase).count() === 0)
    assert(castBase.exceptAll(casted).count() === 0)
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
