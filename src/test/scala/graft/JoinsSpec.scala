package graft

import graft.operators.Joins

/** Join-shaped operators: entity merge suffixing (reference/chat.py:119-132),
  * dedup-vs-destination (reference/manutencao.py:12-62), upsert (K3). */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  test("fullOuterMerge suffixes collisions and coalesces keys") {
    val chats = Seq(("10", "open"), ("11", "closed")).toDF("cust", "status")
    val tickets = Seq(("11", "Resolvido"), ("12", "Aberto")).toDF("cust2", "status")
    val out = Joins.fullOuterMerge(chats, tickets, "cust", "cust2")
    assert(out.columns.toSeq === Seq("merge_key", "status_chat", "status_ticket"))
    val rows = out.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows === Set(
      ("10", Some("open"), None),
      ("11", Some("closed"), Some("Resolvido")),
      ("12", None, Some("Aberto"))))
  }

  test("dedupAgainst drops rows whose key exists in destination, per key") {
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("n_ticket", "v")
    val dest = Seq((2L, "x")).toDF("n_ticket", "other")
    val out = Joins.dedupAgainst(batch, dest, Seq("n_ticket"))
    assert(out.select("n_ticket").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("dedupAgainst is idempotent") {
    val batch = Seq((1L, "a"), (2L, "b")).toDF("n_ticket", "v")
    val dest = Seq((2L, "x")).toDF("n_ticket", "other")
    val once = Joins.dedupAgainst(batch, dest, Seq("n_ticket"))
    val twice = Joins.dedupAgainst(once, dest, Seq("n_ticket"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("dedupAgainst ignores null destination keys") {
    val batch = Seq((1L, "a")).toDF("n_ticket", "v")
    val dest = Seq((Option.empty[Long], "x")).toDF("n_ticket", "other")
    assert(Joins.dedupAgainst(batch, dest, Seq("n_ticket")).count() === 1)
  }

  test("upsert replaces matched keys and appends unmatched updates") {
    val dest = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val updates = Seq((1L, "new"), (9L, "ins")).toDF("k", "v")
    val out = Joins.upsert(dest, updates, "k").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "new"), (2L, "keep"), (9L, "ins")))
  }

  test("unionSlices tolerates column drift") {
    val s1 = Seq((1L, "x")).toDF("k", "a")
    val s2 = Seq((2L, 5.0)).toDF("k", "b")
    val out = Joins.unionSlices(Seq(s1, s2))
    assert(out.columns.sorted.toSeq === Seq("a", "b", "k"))
    assert(out.count() === 2)
  }

  test("enrichLeftWithError keeps misses with the error marker (chat.py:234-236)") {
    val fact = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("num", "title")
    val dim = Seq((1L, "open"), (3L, "closed")).toDF("num", "status")
    val out = Joins.enrichLeftWithError(fact, dim, "num")
    assert(out.count() === 3, "misses must be kept, not dropped")
    val rows = out.select("num", "status", "error").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows === Set(
      (1L, Some("open"), None),
      (2L, None, Some("chat not found")),
      (3L, Some("closed"), None)))
  }

  test("enrichLeftWithError rejects an error-column collision") {
    val fact = Seq((1L, "boom")).toDF("num", "error")
    val dim = Seq((1L, "open")).toDF("num", "status")
    intercept[IllegalArgumentException] {
      Joins.enrichLeftWithError(fact, dim, "num")
    }
  }

  test("empty-input guard shape: empty frame with expected schema unions cleanly") {
    // reference/main.py:73-83: one empty source → synthesize empty DF
    val s1 = Seq((1L, "x")).toDF("k", "a")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s1.schema)
    assert(Joins.unionSlices(Seq(s1, empty)).count() === 1)
  }
}
