package graft

import graft.operators.Sinks
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling at write time: two tables bucketed on the same
  * key co-locate matching rows, so the join plans WITHOUT a shuffle on
  * either side — the 100 TB recipe for repeated large-table joins (pay the
  * shuffle once at ingest, never at query time). */
class BucketedJoinSpec extends SparkSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val orders = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val customer = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))

    Sinks.writeBucketed(orders, "o_custkey", 8, "b_orders")
    Sinks.writeBucketed(customer, "c_custkey", 8, "b_customer")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected no shuffle for co-bucketed join, got:\n${joined.queryExecution.executedPlan}")
      // and it still computes the same result as the shuffled join
      assert(joined.count() === orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
