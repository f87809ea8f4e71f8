package graft

import graft.operators.Sinks
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling at write time: two tables bucketed on the same
  * key co-locate matching rows, so the join plans WITHOUT a shuffle on
  * either side — the 100 TB recipe for repeated large-table joins (pay the
  * shuffle once at ingest, never at query time). */
class BucketedJoinSpec extends SparkSuite {

  test("partitioned writes prune partitions at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = java.nio.file.Files.createTempDirectory("part-").toString + "/orders"
    val orders = Tables.orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, "order_year", path)

    val pruned = spark.read.parquet(path).filter(col("order_year") === 1997)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "expected a planning-time partition filter")
    // only the 1997 directory is read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.values.getInt(0) === 1997))
    assert(pruned.count() ===
      orders.filter(col("order_year") === 1997).count())
  }

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
