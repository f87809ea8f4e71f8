package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Scratch: one-off probe main (not part of the driver contract).
  * Current probe: reproduce the PlanAuditSpec q_bcubed flake — build
  * every registry query first (operator-internal .cache() calls pollute
  * the shared CacheManager exactly like the audits loop does), then
  * trace the collapsedInput proof over q_bcubed's optimized plan. */
object Scratch {
  private def collapsedInput(p: LogicalPlan, depth: Int): Boolean = {
    val r = p match {
      case _ if p.maxRows.exists(_ <= 4096L) => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Distinct => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Generate => false
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
        l.maxRows.exists(_ <= 4096L)
      case j: Join => collapsedInput(j.left, depth + 1) && collapsedInput(j.right, depth + 1)
      case other => other.children.nonEmpty &&
        other.children.forall(c => collapsedInput(c, depth + 1))
    }
    println(("  " * depth) + s"${p.getClass.getSimpleName} maxRows=${p.maxRows} -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"

    def trace(tag: String): Unit = {
      val df = SparkEntry.queries("q_bcubed")(spark, d)
      val qe = df.queryExecution
      val intrinsic = spark.sessionState.optimizer.execute(
        qe.commandExecuted.clone())
      val iuws = intrinsic.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      val ibad = iuws.exists(w => !collapsedInput(w.child, 0))
      println(s"[$tag/intrinsic] unpartitioned=${iuws.size} uncollapsed=$ibad")
      val uws = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      val bad = uws.exists(w => !collapsedInput(w.child, 0))
      println(s"[$tag] unpartitioned=${uws.size} uncollapsed=$bad")
      if (bad) println(qe.optimizedPlan.treeString)
    }

    trace("clean")
    // pollute: build every registry frame in registry order (no collect)
    var built = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      if (name != "q_bcubed") {
        try { fn(spark, d).queryExecution.optimizedPlan; built += 1 }
        catch { case e: Throwable => println(s"build fail $name: $e") }
      } else {
        println(s"--- reached q_bcubed after $built builds; tracing in-loop ---")
        trace("in-loop")
      }
    }
    println(s"built $built frames")
    trace("post-pollution")
    spark.stop()
  }
}
