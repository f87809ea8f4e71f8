package graft

import graft.operators.{Joins, TextAnalytics}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any right row
      (4L, "u2", ts("2024-01-01 10:30:00"))
    ).toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 10.0),
      ("u1", ts("2024-01-01 11:00:00"), 20.0),
      ("u2", ts("2024-01-01 10:30:00"), 30.0)  // exact tie with left id=4
    ).toDF("user", "ts", "v")

    val out = Joins.asOfJoin(left, right, "user", "ts", "ts", Seq("ts", "v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.toString), Option(r.get(4)))).toMap

    assert(out(1L)._2 === Some(10.0)) // 10:00 sees 09:30
    assert(out(2L)._2 === Some(20.0)) // 12:00 sees 11:00
    assert(out(3L)._2 === None)       // nothing before 09:00
    assert(out(4L)._2 === Some(30.0)) // tie: right row at same ts is visible
  }

  test("asOfJoin carries the picked columns atomically — a null field in the " +
    "latest right row is not overwritten by an older non-null row") {
    val left = Seq((1L, "u", ts("2024-01-01 11:00:00"))).toDF("id", "user", "ts")
    val right = Seq(
      ("u", ts("2024-01-01 09:00:00"), Some(5.0)),
      ("u", ts("2024-01-01 10:00:00"), None: Option[Double]) // latest, null v
    ).toDF("user", "ts", "v")
    val row = Joins.asOfJoin(left, right, "user", "ts", "ts", Seq("ts", "v"))
      .collect().head
    assert(row.getTimestamp(3).toString.startsWith("2024-01-01 10:00:00"))
    assert(row.isNullAt(4), "null value from the matched row must survive")
  }

  test("asOfJoin keeps all left rows and columns") {
    val left = Seq((1L, "u1", ts("2024-01-01 10:00:00"), "extra"))
      .toDF("id", "user", "ts", "payload")
    val right = Seq(("u9", ts("2024-01-01 09:00:00"), 1.0)).toDF("user", "ts", "v")
    val out = Joins.asOfJoin(left, right, "user", "ts", "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "user", "ts", "payload", "asof_v"))
    assert(out.count() === 1)
    assert(out.collect().head.isNullAt(4)) // no matching key → null carry
  }

  test("asOfJoin matches a naive per-row reference on randomized inputs") {
    val rnd = new scala.util.Random(42)
    val leftRows = (1 to 120).map { i =>
      (i.toLong, s"u${rnd.nextInt(6)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    }
    val rightRows = (1 to 40).map { _ =>
      (s"u${rnd.nextInt(6)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), rnd.nextInt(1000).toDouble)
    }.distinct
      // unique per (key, ts): keep max value like the operator contract asks
      .groupBy(r => (r._1, r._2)).map { case (_, g) => g.maxBy(_._3) }.toSeq

    val left = leftRows.toDF("id", "user", "ts")
    val right = rightRows.toDF("user", "ts", "v")
    val got = Joins.asOfJoin(left, right, "user", "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

    leftRows.foreach { case (id, u, lts) =>
      val expected = rightRows
        .filter(r => r._1 == u && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3))
        .lastOption.map(_._3)
      assert(got(id) === expected, s"row $id user $u ts $lts")
    }
  }

  test("tfIdf: shared terms get zero idf, unique terms positive") {
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry")).toDF("id", "text")
    val out = TextAnalytics.tfIdf(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out((1L, "apple")) === 0.0)           // in both docs: ln(2/2)=0
    assert(out((1L, "banana")) === math.log(2.0)) // in one doc: 1*ln(2/1)
    assert(out((2L, "cherry")) === math.log(2.0))
  }

  test("termFrequencies counts raw occurrences, not distinct") {
    val docs = Seq((1L, "a a b")).toDF("id", "text")
    val tf = TextAnalytics.termFrequencies(docs, "id", "text")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(tf === Map("a" -> 2L, "b" -> 1L))
  }
}
