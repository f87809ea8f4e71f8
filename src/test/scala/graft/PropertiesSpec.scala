package graft

import graft.operators.{Joins, Relational}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over sampled inputs (SURVEY.md §5.3):
  * window-split coverage, anti-join-dedup and upsert idempotence. */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def forAllSampled[A](gen: Gen[A], cases: Int = 50)(check: A => Unit): Unit =
    (1 to cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("udf() surface: a registered scalar UDF matches the driver-side rule") {
    // The engine prefers driver-side renames / native expressions, but the
    // udf() escape hatch must exist for row-scoped custom logic (SURVEY.md
    // §2b UDF surface). Wrap sanitizeName as a UDF and pin parity.
    import graft.operators.ColumnHygiene
    val slug = udf((s: String) => ColumnHygiene.sanitizeName(s))
    spark.udf.register("graft_slug", slug)
    val names = Seq("99 número-do pedido", "ok_name", "line#no", "", "a" * 400)
    val viaUdf = names.toDF("n").select(slug(col("n")))
      .collect().map(_.getString(0)).toSeq
    assert(viaUdf === names.map(ColumnHygiene.sanitizeName))
    // and via SQL registration
    names.toDF("n").createOrReplaceTempView("names_v")
    val viaSql = spark.sql("SELECT graft_slug(n) FROM names_v")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql === names.map(ColumnHygiene.sanitizeName))
  }

  test("timeBucket covers every instant exactly once (no gaps, no overlap)") {
    val gen = for {
      ts <- Gen.chooseNum(0L, 4102444800L) // 1970..2100 epoch seconds
      width <- Gen.oneOf(3600L, 86400L, 7L * 86400L)
    } yield (ts, width)
    forAllSampled(gen) { case (ts, width) =>
      val df = Seq(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(ts)))
        .toDF("ts")
      val bucket = df.select(Relational.timeBucket(col("ts"), width)).head().getLong(0)
      assert(bucket % width === 0)           // aligned to the grid
      assert(bucket <= ts && ts < bucket + width) // contains its instant
    }
  }

  test("splitWindows covers [start,end) exactly: no gaps, no overlap") {
    val gen = for {
      start <- Gen.chooseNum(0L, 1000000L)
      span <- Gen.chooseNum(0L, 500000L)
      width <- Gen.chooseNum(1L, 100000L)
    } yield (start, start + span, width)
    forAllSampled(gen) { case (start, end, width) =>
      val ws = Relational.splitWindows(start, end, width)
      if (start >= end) assert(ws.isEmpty)
      else {
        assert(ws.head._1 === start)
        assert(ws.last._2 === end)
        ws.foreach { case (lo, hi) => assert(lo < hi && hi - lo <= width) }
        ws.sliding(2).foreach {
          case Seq((_, hi1), (lo2, _)) => assert(hi1 === lo2) // contiguous
          case _ =>
        }
      }
    }
  }

  test("dedupAgainst is idempotent and removes exactly the overlap") {
    val gen = for {
      batch <- Gen.listOfN(30, Gen.chooseNum(0L, 20L))
      dest <- Gen.listOfN(15, Gen.chooseNum(0L, 20L))
    } yield (batch, dest)
    forAllSampled(gen, cases = 20) { case (batchKeys, destKeys) =>
      val batch = batchKeys.toDF("k")
      val dest = destKeys.toDF("k")
      val once = Joins.dedupAgainst(batch, dest, Seq("k"))
      val twice = Joins.dedupAgainst(once, dest, Seq("k"))
      val got = once.as[Long].collect().sorted.toSeq
      assert(got === batchKeys.filterNot(destKeys.toSet).sorted)
      assert(twice.as[Long].collect().sorted.toSeq === got)
    }
  }

  test("upsert is idempotent and keeps exactly one row per key") {
    val gen = for {
      destKeys <- Gen.listOfN(20, Gen.chooseNum(0L, 15L))
      updKeys <- Gen.listOfN(8, Gen.chooseNum(0L, 15L))
    } yield (destKeys.distinct, updKeys.distinct)
    forAllSampled(gen, cases = 20) { case (destKeys, updKeys) =>
      val dest = destKeys.map(k => (k, s"old-$k")).toDF("k", "v")
      val upd = updKeys.map(k => (k, s"new-$k")).toDF("k", "v")
      val once = Joins.upsert(dest, upd, "k")
      val twice = Joins.upsert(once, upd, "k")
      val rows = once.as[(Long, String)].collect().toMap
      assert(rows.keySet === (destKeys ++ updKeys).toSet)
      updKeys.foreach(k => assert(rows(k) === s"new-$k"))
      destKeys.filterNot(updKeys.toSet).foreach(k => assert(rows(k) === s"old-$k"))
      assert(twice.as[(Long, String)].collect().toMap === rows)
    }
  }

  test("heavyHitters equals GROUP BY/HAVING on random zipf-ish streams") {
    // The MG sketch only prunes; the recount must make the final answer
    // EXACTLY the SQL definition for any stream and any k.
    val gen = for {
      nHot <- Gen.choose(0, 3)
      hot <- Gen.listOfN(nHot, Gen.choose(50, 200))
      nCold <- Gen.choose(5, 40)
      k <- Gen.choose(2, 12)
    } yield (hot, nCold, k)
    forAllSampled(gen, cases = 15) { case (hot, nCold, k) =>
      val rows = hot.zipWithIndex.flatMap { case (c, i) =>
        Seq.fill(c)(s"hot$i")
      } ++ (0 until nCold).flatMap(i => Seq.fill(1 + i % 4)(s"cold$i"))
      val df = rows.zipWithIndex.sortBy(_._2 % 11).map(_._1).toDF("item")
        .repartition(4)
      val got = graft.operators.Corpus.heavyHitters(df, "item", k)
        .as[(String, Long)].collect().toMap
      val n = rows.size
      val expected = rows.groupBy(identity).view
        .mapValues(_.size.toLong)
        .filter { case (_, c) => c * (k + 1) > n }.toMap
      assert(got === expected, s"k=$k n=$n")
    }
  }

  test("ksStatistic is symmetric-in-magnitude and bounded in [0, 1]") {
    val gen = for {
      a <- Gen.nonEmptyListOf(Gen.choose(0, 20))
      b <- Gen.nonEmptyListOf(Gen.choose(0, 20))
    } yield (a, b)
    forAllSampled(gen, cases = 15) { case (a, b) =>
      val df = (a.map(("a", _)) ++ b.map(("b", _)))
        .map { case (s, v) => (s, v.toDouble) }.toDF("side", "v")
      val ks = graft.operators.Stats.ksStatistic(df, "side", "v", "a", "b")
        .collect().head.getDouble(2)
      val flipped = graft.operators.Stats.ksStatistic(df, "side", "v", "b", "a")
        .collect().head.getDouble(2)
      assert(ks >= 0.0 && ks <= 1.0, s"ks=$ks")
      assert(ks === flipped)  // |ECDF gap| is side-order invariant
      // disjoint supports → ks = 1
      val disjoint = (a.map(x => ("a", x.toDouble)) ++
        b.map(x => ("b", x.toDouble + 1000))).toDF("side", "v")
      assert(graft.operators.Stats.ksStatistic(disjoint, "side", "v", "a", "b")
        .collect().head.getDouble(2) === 1.0)
    }
  }

  test("matchScore stays within [0, weight-sum] and 1.0 means all-match") {
    val gen = Gen.listOfN(6, Gen.alphaLowerStr.map(_.take(8)))
    forAllSampled(gen, cases = 15) { texts =>
      val ents = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
        .toDF("id", "text", "src")
      val cands = (for {
        i <- texts.indices; j <- texts.indices if i < j
      } yield (i.toLong, j.toLong)).toDF("id_a", "id_b")
      val out = graft.operators.Dedup.matchScore(cands, ents, "id",
        Seq(("text", "lev", 0.7), ("src", "exact", 0.3)), threshold = 0.0)
        .collect()
      out.foreach { r =>
        val s = r.getDouble(2)
        assert(s >= 0.0 && s <= 1.0 + 1e-9, r.toString)
      }
      // identical texts + identical src must score exactly 1.0
      val dup = Seq((1L, "same", "s"), (2L, "same", "s")).toDF("id", "text", "src")
      val one = graft.operators.Dedup.matchScore(
        Seq((1L, 2L)).toDF("id_a", "id_b"), dup, "id",
        Seq(("text", "lev", 0.7), ("src", "exact", 0.3)), 0.0)
        .collect().head.getDouble(2)
      assert(one === 1.0)
    }
  }

  test("rocAuc is bounded in [0,1] and label inversion reflects it around 1/2") {
    import graft.operators.Stats
    val gen = Gen.listOfN(24, for {
      s <- Gen.chooseNum(0, 100)
      y <- Gen.oneOf(true, false)
    } yield (s / 100.0, y))
    forAllSampled(gen, cases = 10) { pts =>
      val df = pts.toDF("s", "y")
      val r = Stats.rocAuc(df, "s", "y").collect().head
      if (!r.isNullAt(2)) {
        val auc = r.getDouble(2)
        assert(auc >= 0.0 && auc <= 1.0, pts.toString)
        // flipping every label must mirror the metric: AUC' = 1 − AUC
        val flipped = Stats.rocAuc(df.withColumn("y", not(col("y"))),
          "s", "y").collect().head.getDouble(2)
        assert(math.abs((1.0 - auc) - flipped) < 2e-6,
          s"auc=$auc flipped=$flipped")
      }
    }
  }

  test("giniConcentration stays in [0, 1) and is invariant to uniform duplication") {
    import graft.operators.TextAnalytics
    val gen = Gen.listOfN(8, Gen.chooseNum(1, 6))
    forAllSampled(gen, cases = 10) { counts =>
      val text = counts.zipWithIndex
        .map { case (c, i) => (s"t$i " * c).trim }.mkString(" ")
      val df = Seq((1L, "g", text)).toDF("doc_id", "grp", "text")
      val g = TextAnalytics.giniConcentration(df, "grp", "text")
        .collect().head.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"$counts → $g")
      // doubling EVERY count rescales frequencies uniformly: same gini
      val doubled = counts.zipWithIndex
        .map { case (c, i) => (s"t$i " * (2 * c)).trim }.mkString(" ")
      val g2 = TextAnalytics.giniConcentration(
        Seq((1L, "g", doubled)).toDF("doc_id", "grp", "text"), "grp", "text")
        .collect().head.getDouble(3)
      assert(math.abs(g - g2) < 2e-6, s"$g vs $g2")
    }
  }

  test("bootstrapMeans replicate means always bracket the metric's range") {
    import graft.operators.Corpus
    val gen = Gen.listOfN(40, Gen.chooseNum(1L, 1000L))
    forAllSampled(gen, cases = 5) { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val out = Corpus.bootstrapMeans(df, "id", "v", replicates = 8).collect()
      out.filter(!_.isNullAt(2)).foreach { r =>
        val m = r.getDouble(2)
        assert(m >= vals.min.toDouble && m <= vals.max.toDouble,
          s"replicate mean $m outside [${vals.min}, ${vals.max}]")
      }
    }
  }

  test("jaroWinkler kernel: symmetric, bounded, 1 iff equal non-empty (property)") {
    import org.apache.spark.sql.graft.expressions.jaroWinklerSim
    val str = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    forAllSampled(Gen.zip(str, str), cases = 200) { case (a, b) =>
      val s = jaroWinklerSim(a, b)
      assert(s === jaroWinklerSim(b, a), s"asymmetric on $a/$b")
      assert(s >= 0.0 && s <= 1.0, s"out of range on $a/$b: $s")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
    assert(jaroWinklerSim("", "") === 0.0, "empty-empty pins to 0 (DuckDB parity)")
  }

  test("ranking-eval coefficient tables are positive and strictly ordered (property)") {
    import graft.operators.{Similarity, TimeSeries, ColumnHygiene}
    val discs = Similarity.ndcgDiscounts(10)
    assert(discs.head === 1.0 && discs === discs.sorted.reverse)
    assert(discs.forall(d => d > 0 && d <= 1.0))
    // RBO suffix sums strictly decrease and S(k) = last coefficient > 0
    val sums = Similarity.rboSuffixSums(10, 0.9)
    assert(sums === sums.sorted.reverse && sums.last > 0)
    assert(sums.zip(sums.tail).forall { case (x, y) => x > y })
    // decay weights decrease from exactly 1 toward 0, never negative
    val ws = TimeSeries.decayWeights(120, 6.0)
    assert(ws.head === 1.0 && ws === ws.sorted.reverse && ws.forall(_ >= 0))
    // Benford shares are a near-partition of 1 (snapping error ≤ 9·2⁻²⁰)
    val sh = ColumnHygiene.benfordShares
    assert(sh.length === 9 && sh === sh.sorted.reverse)
    assert(math.abs(sh.sum - 1.0) <= 9.0 / (1 << 20))
  }

  test("jsDivergence: total in [0, ln 2] on random counts; 0 iff same distribution") {
    import graft.operators.Stats
    val gen = for {
      k <- Gen.chooseNum(2, 8)
      ref <- Gen.listOfN(k, Gen.chooseNum(0, 50))
      cur <- Gen.listOfN(k, Gen.chooseNum(0, 50))
    } yield (ref, cur)
    forAllSampled(gen, cases = 10) { case (refC, curC) =>
      val bins = refC.indices.map(i => s"b$i")
      def expand(cs: Seq[Int]) =
        bins.zip(cs).flatMap { case (b, c) => Seq.fill(c)(b) }
      val (refRows, curRows) = (expand(refC), expand(curC))
      if (refRows.nonEmpty && curRows.nonEmpty) {
        val out = Stats.jsDivergence(refRows.toDF("bin"), curRows.toDF("bin"),
          "bin").collect()
        val total = out.map(_.getDouble(5)).sum
        assert(out.forall(_.getDouble(5) >= 0.0), s"ref=$refC cur=$curC")
        assert(total >= 0.0 && total <= math.log(2.0) + 1e-9,
          s"total=$total ref=$refC cur=$curC")
        // scaling a distribution does not move its JSD against itself: 0
        val self = Stats.jsDivergence(refRows.toDF("bin"),
          (refRows ++ refRows).toDF("bin"), "bin").collect()
        assert(self.forall(_.getDouble(5) == 0.0))
      }
    }
  }

  test("quantileRank: a pct_rank >= q gate keeps ~ (1-q) of each group on distinct values") {
    import graft.operators.Corpus
    val gen = for {
      n <- Gen.chooseNum(5, 60)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L))
    } yield vals.distinct
    forAllSampled(gen, cases = 10) { vals =>
      if (vals.size >= 5) {
        val df = vals.map(("g", _)).toDF("src", "v")
        val kept = Corpus.quantileRank(df, "src", "v")
          .filter(col("pct_rank") >= 0.2).count()
        // exact: ranks 0..n-1 scaled by (n-1); keep iff (r-1)/(n-1) >= 0.2
        val n = vals.size
        val expected = (0 until n).count(r => r.toDouble / (n - 1) >= 0.2)
        assert(kept === expected.toLong, s"n=$n kept=$kept expected=$expected")
      }
    }
  }

  test("incrementalClusters equals full-graph CC on random graphs") {
    import graft.operators.Dedup
    // prior = CC over the first edge wave (so it is min-rooted, the
    // documented contract); folding the second wave incrementally must
    // equal one CC over BOTH waves — on random graphs, including merges
    // across prior clusters, brand-new ids, and intra-cluster no-ops
    val gen = for {
      n <- Gen.chooseNum(5, 30)
      e1 <- Gen.chooseNum(0, 25)
      e2 <- Gen.chooseNum(1, 25)
      edges1 <- Gen.listOfN(e1, for {
        a <- Gen.chooseNum(0L, n.toLong); b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
      edges2 <- Gen.listOfN(e2, for {
        a <- Gen.chooseNum(0L, n.toLong + 10); b <- Gen.chooseNum(0L, n.toLong + 10)
      } yield (a, b))
    } yield (n, edges1.filter(p => p._1 != p._2), edges2.filter(p => p._1 != p._2))
    forAllSampled(gen, cases = 10) { case (n, edges1, edges2) =>
      val nodes1 = (0L to n.toLong).toDF("id")
      val prior = Dedup.duplicateClusters(nodes1,
        edges1.toDF("id_a", "id_b"), "id")
        .withColumnRenamed("cluster", "cluster")
      val batch = edges2.toDF("id_a", "id_b")
      val incremental = Dedup.incrementalClusters(prior, "id", "cluster", batch)
        .as[(Long, Long)].collect().toMap
      val allIds = ((0L to n.toLong) ++
        edges2.flatMap(p => Seq(p._1, p._2))).distinct
      val full = Dedup.duplicateClusters(allIds.toDF("id"),
        (edges1 ++ edges2).toDF("id_a", "id_b"), "id")
        .as[(Long, Long)].collect().toMap
      assert(incremental === full,
        s"n=$n e1=$edges1 e2=$edges2")
    }
  }

  test("friedmanTest T1 is invariant to per-block level shifts") {
    // The operator's whole selling point vs Kruskal–Wallis: adding an
    // arbitrary constant to every response IN A BLOCK (a day-level
    // traffic shift) must leave within-block ranks — hence T1 — intact.
    import graft.operators.Stats
    val gen = for {
      b <- Gen.chooseNum(2, 5)
      vals <- Gen.listOfN(b * 3, Gen.chooseNum(0, 9))
      shifts <- Gen.listOfN(b, Gen.chooseNum(-1000, 1000))
    } yield (b, vals, shifts)
    forAllSampled(gen, cases = 12) { case (b, vals, shifts) =>
      val cells = for {
        blk <- 0 until b; trt <- 0 until 3
      } yield (blk, trt, vals(blk * 3 + trt).toDouble)
      val shifted = cells.map { case (blk, trt, v) =>
        (blk, trt, v + shifts(blk))
      }
      val t0 = Stats.friedmanTest(cells.toDF("b", "t", "v"), "b", "t", "v")
        .select("t1").distinct().collect().map(r => r.get(0)).toSeq
      val t1 = Stats.friedmanTest(shifted.toDF("b", "t", "v"), "b", "t", "v")
        .select("t1").distinct().collect().map(r => r.get(0)).toSeq
      assert(t0 === t1, s"b=$b vals=$vals shifts=$shifts")
    }
  }

  test("clusterAgreement is invariant to relabeling either partition") {
    // ARI/NMI must depend only on the grouping, never the label names —
    // the permutation-invariance contract that distinguishes them from
    // Cohen's kappa.
    import graft.operators.Stats
    val gen = for {
      n <- Gen.chooseNum(4, 24)
      a <- Gen.listOfN(n, Gen.chooseNum(0, 3))
      b <- Gen.listOfN(n, Gen.chooseNum(0, 3))
    } yield (a, b)
    forAllSampled(gen, cases = 15) { case (a, b) =>
      val relabelA = Map(0 -> "x9", 1 -> "q", 2 -> "zz", 3 -> "m")
      val relabelB = Map(0 -> 70, 1 -> 7, 2 -> 700, 3 -> 77)
      val base = a.zip(b).toDF("a", "b")
      val renamed = a.zip(b).map { case (x, y) => (relabelA(x), relabelB(y)) }
        .toDF("a", "b")
      val r0 = Stats.clusterAgreement(base, "a", "b").collect().head
      val r1 = Stats.clusterAgreement(renamed, "a", "b").collect().head
      assert(r0.get(3) === r1.get(3) && r0.get(4) === r1.get(4),
        s"a=$a b=$b")
      // and swapping the two partitions is symmetric
      val r2 = Stats.clusterAgreement(base.select(col("b").as("a"),
        col("a").as("b")), "a", "b").collect().head
      assert(r0.get(3) === r2.get(3) && r0.get(4) === r2.get(4))
    }
  }

  test("energyDistance: nonnegative, zero iff identical histograms") {
    import graft.operators.Stats
    val gen = for {
      na <- Gen.chooseNum(2, 12)
      nb <- Gen.chooseNum(2, 12)
      a <- Gen.listOfN(na, Gen.chooseNum(0, 6))
      b <- Gen.listOfN(nb, Gen.chooseNum(0, 6))
    } yield (a, b)
    // a single shared support point has no gap segments → null, the
    // wasserstein1 family convention; read through it as 0
    def eDist(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Stats.energyDistance(df, "s", "v", "a", "b").collect().head
      if (r.isNullAt(2)) 0.0 else r.getDouble(2)
    }
    forAllSampled(gen, cases = 15) { case (a, b) =>
      val df = (a.map(("a", _)) ++ b.map(("b", _)))
        .map { case (s, v) => (s, v.toDouble) }.toDF("s", "v")
      assert(eDist(df) >= 0.0, s"a=$a b=$b")
      // identical DISTRIBUTIONS (same normalized histogram) → exactly 0;
      // use each sample against itself to pin the metric's identity axiom
      val self = (a.map(("a", _)) ++ a.map(("b", _)))
        .map { case (s, v) => (s, v.toDouble) }.toDF("s", "v")
      assert(eDist(self) === 0.0)
    }
  }

  test("jonckheereTerpstra J + reversed-order J is n_a*n_b-complete") {
    // Reversing the group order maps every strict pair to its mirror
    // and fixes ties, so J(order) + J(reverse) = Σ_{i<j} n_i·n_j —
    // pinning both the pair accounting and the midrank ½-weights.
    import graft.operators.Stats
    val gen = for {
      sizes <- Gen.listOfN(3, Gen.chooseNum(1, 6))
      vals <- Gen.listOfN(18, Gen.chooseNum(0, 4))
    } yield (sizes, vals)
    forAllSampled(gen, cases = 12) { case (sizes, vals) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => (g, vals((g * 6 + i) % vals.size).toDouble))
      }
      val fwd = Stats.jonckheereTerpstra(rows.toDF("g", "v"), "g", "v")
        .collect().head.getDouble(1)
      val rev = Stats.jonckheereTerpstra(
        rows.map { case (g, v) => (-g, v) }.toDF("g", "v"), "g", "v")
        .collect().head.getDouble(1)
      val pairs = (for {
        i <- sizes.indices; j <- sizes.indices if i < j
      } yield sizes(i).toLong * sizes(j)).sum.toDouble
      assert(fwd + rev === pairs, s"sizes=$sizes vals=$vals")
    }
  }
}
