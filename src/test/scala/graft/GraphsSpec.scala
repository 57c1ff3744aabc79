package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** Integer-micro PageRank: hand-computed ranks, fixed points, edge
 * dedup, and the dangling / no-inbound corners. */
class GraphsSpec extends AnyFunSuite with SparkFixture {

  private def ranks(edges: DataFrame, iters: Int): Map[String, Long] =
    Graphs.pageRankMicro(edges, "s", "d", iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("hand-computed two iterations: feeder, cycle, dangling-source") {
    import spark.implicits._
    // A <-> B cycle, C feeds A and receives nothing
    val e = Seq(("a", "b"), ("b", "a"), ("c", "a")).toDF("s", "d")
    // iter 1: in(a) = r(b)/1 + r(c)/1 = 2e6 -> 150000 + 1700000
    //         in(b) = r(a)/1 = 1e6     -> 150000 + 850000
    //         in(c) = none             -> 150000
    assert(ranks(e, 1) == Map(
      "a" -> 1850000L, "b" -> 1000000L, "c" -> 150000L))
    // iter 2: in(a) = 1000000 + 150000 = 1150000 -> 150000 + 977500
    //         in(b) = 1850000           -> 150000 + 1572500
    //         in(c) = none              -> 150000
    assert(ranks(e, 2) == Map(
      "a" -> 1127500L, "b" -> 1722500L, "c" -> 150000L))
  }

  test("a symmetric cycle is a fixed point; duplicate edges collapse") {
    import spark.implicits._
    val cycle = Seq(("x", "y"), ("y", "x")).toDF("s", "d")
    // each node passes its full mass around the 2-cycle: 150000 +
    // (1e6 * 85) / 100 = 1e6 exactly, at every iteration
    assert(ranks(cycle, 1) == Map("x" -> 1000000L, "y" -> 1000000L))
    assert(ranks(cycle, 7) == Map("x" -> 1000000L, "y" -> 1000000L))
    // duplicated edge rows must not double mass or out-degree
    val dup = Seq(("x", "y"), ("x", "y"), ("y", "x"), ("y", "x"))
      .toDF("s", "d")
    assert(ranks(dup, 3) == ranks(cycle, 3))
  }

  test("out-degree splits mass by integer division; null edges drop") {
    import spark.implicits._
    // h fans out to two sinks with an ODD rank after round 1 so the
    // integer division is visible: give h an inbound feeder first
    val e = Seq(("f", "h"), ("h", "p"), ("h", "q"),
      (null.asInstanceOf[String], "p"), ("q", null.asInstanceOf[String]))
      .toDF("s", "d")
    // iter 1: in(h) = 1e6 -> r(h) = 1000000; in(p) = in(q) = 1e6 DIV 2
    //   = 500000 -> 150000 + 425000 = 575000; f gets nothing -> 150000
    assert(ranks(e, 1) == Map(
      "f" -> 150000L, "h" -> 1000000L, "p" -> 575000L, "q" -> 575000L))
    // iter 2: f decayed to its base 150000, so in(h) = 150000 ->
    //   r(h) = 150000 + 127500; h's iter-1 mass 1000000 splits to p/q
    //   as 500000 each -> 575000 again (q's own mass has nowhere to go
    //   — its null edge dropped)
    assert(ranks(e, 2) == Map(
      "f" -> 150000L, "h" -> 277500L,
      "p" -> 575000L, "q" -> 575000L))
  }

  test("bucketed-edge PageRank: ranks bit-equal, edge side never shuffles") {
    import spark.implicits._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val e = Seq(("a", "b"), ("b", "a"), ("c", "a"), ("a", "c"),
      ("c", "b"), ("d", "a")).toDF("s", "d")
    val plain = Graphs.pageRankMicro(e, "s", "d", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the pin proves the bucketed layout (a broadcast of
      // the tiny rank table would hide a broken bucket co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Graphs.pageRankMicroBucketed(spark, e, "s", "d",
        iterations = 4, buckets = 4, table = "graft_pr_spec")
      assert(bucketed.collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap == plain, "bucketed ranks drifted from the plain form")
      // the pin covers every loop round of both variants: the loop body
      // IS Graphs.iteration, so pin its plan over the bucketed table
      val eo = spark.table("graft_pr_spec")
      // the loop always materializes ranks before the next round — the
      // localCheckpoint mirrors that, so the join's ONLY file scan is
      // the edge table (a lazily-built rank side would re-read the
      // bucketed table and confuse the side detection below)
      val rk = eo.select(col("src").as("node"))
        .unionByName(eo.select(col("dst").as("node"))).distinct()
        .withColumn("rank_micro", lit(1000000L))
        .localCheckpoint()
      val round = Graphs.iteration(eo, rk, 85)
      round.collect()
      val smjs = deepCollect(round.queryExecution.executedPlan) {
        case j: SortMergeJoinExec => j
      }
      // the rank->edge join is the one whose side holds the bucketed
      // file scan DIRECTLY (the outer update join sees the same scan,
      // but through the contrib join — skip those via the no-nested-join
      // guard); that side must carry NO exchange of any kind
      val edgeSides = smjs.flatMap(j => Seq(j.left, j.right)).filter(s =>
        deepCollect(s) { case f: FileSourceScanExec if f.bucketedScan => f }
          .nonEmpty &&
        deepCollect(s) { case n if n.nodeName.contains("Join") => n }.isEmpty)
      assert(edgeSides.nonEmpty,
        s"edge side lost its bucketed scan:\n${round.queryExecution.executedPlan}")
      edgeSides.foreach { s =>
        assert(deepCollect(s) {
            case n if n.nodeName.contains("Exchange") ||
              n.nodeName.contains("ShuffleQueryStage") => n
          }.isEmpty,
          s"a shuffle feeds the bucketed edge table:\n$s")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS graft_pr_spec")
    }
  }

  test("invalid arguments throw before any side effects") {
    import spark.implicits._
    val e = Seq(("a", "b")).toDF("s", "d")
    intercept[IllegalArgumentException] {
      Graphs.pageRankMicro(e, "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRankMicro(e, "s", "d", iterations = 3,
        earlyStopDeltaMicro = Some(-1L))
    }
    // the bucketed form must refuse BEFORE writing or registering the
    // edge table (and before pinning any cache)
    intercept[IllegalArgumentException] {
      Graphs.pageRankMicroBucketed(spark, e, "s", "d", iterations = 0,
        table = "graft_pr_never")
    }
    assert(!spark.catalog.tableExists("graft_pr_never"),
      "a rejected call must not leave the edge table behind")
  }

  /** Driver-side mirror of the integer power loop — the independent
   * arithmetic the redistribution and early-stop specs compare against
   * (same truncating long division, same left-to-right update). */
  private def mirror(edges: Seq[(String, String)], iters: Int,
                     redistribute: Boolean): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum }
      val dm = if (redistribute)
        nodes.filterNot(outdeg.contains).map(r).sum else 0L
      r = nodes.map(v => v -> (150000L +
        (in.getOrElse(v, 0L) + (if (redistribute) dm / n else 0L))
          * 85L / 100L)).toMap
    }
    r
  }

  test("dangling-mass redistribution matches the integer mirror") {
    import spark.implicits._
    // c receives from everyone and has no out-edge: the dangling node
    val edges = Seq(("a", "c"), ("b", "c"), ("a", "b"))
    val e = edges.toDF("s", "d")
    for (iters <- Seq(1, 3, 5)) {
      val got = Graphs.pageRankMicro(e, "s", "d", iterations = iters,
          redistributeDangling = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == mirror(edges, iters, redistribute = true),
        s"redistributed ranks drifted from the mirror at $iters rounds")
    }
    // the knob genuinely changes the answer on a dangling graph, and
    // off-by-default stays the documented mass-dropping variant
    assert(ranks(e, 3) == mirror(edges, 3, redistribute = false))
    assert(ranks(e, 3) != mirror(edges, 3, redistribute = true))
  }

  test("a graph with no dangling nodes is knob-invariant") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a"), ("c", "a"), ("a", "c")).toDF("s", "d")
    val plain = ranks(e, 4)
    val redis = Graphs.pageRankMicro(e, "s", "d", iterations = 4,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(redis == plain, "zero dangling mass must redistribute nothing")
  }

  test("early-stop halts once no rank moves more than eps") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "a"))
    val e = edges.toDF("s", "d")
    val eps = 450000L // the fixture's L-inf delta first dips under at round 5
    // find the stop round in the mirror: first round whose L-inf delta
    // from the previous round is within eps
    val stopRound = (1 to 10).find { k =>
      val prev = mirror(edges, k - 1, redistribute = false)
      val cur = mirror(edges, k, redistribute = false)
      cur.keys.map(v => math.abs(cur(v) - prev(v))).max <= eps
    }.get
    assert(stopRound > 1 && stopRound < 10,
      s"fixture must converge mid-loop to prove the stop (got $stopRound)")
    val got = Graphs.pageRankMicro(e, "s", "d", iterations = 10,
        earlyStopDeltaMicro = Some(eps))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == mirror(edges, stopRound, redistribute = false),
      "early-stop must freeze ranks exactly at the stop round")
    assert(got != mirror(edges, 10, redistribute = false),
      "fixture still moving at 10 rounds — the stop was never exercised")
    // a fixed point stops immediately: the 2-cycle never moves
    val cyc = Seq(("x", "y"), ("y", "x")).toDF("s", "d")
    assert(Graphs.pageRankMicro(cyc, "s", "d", iterations = 7,
        earlyStopDeltaMicro = Some(0L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("x" -> 1000000L, "y" -> 1000000L))
  }

  test("bucketed twin: knobs bit-equal, caller-supplied edge path honored") {
    import spark.implicits._
    val edges = Seq(("a", "c"), ("b", "c"), ("a", "b"), ("c2", "a"))
    val e = edges.toDF("s", "d")
    val plain = Graphs.pageRankMicro(e, "s", "d", iterations = 3,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pr-path").toString
    try {
      val bucketed = Graphs.pageRankMicroBucketed(spark, e, "s", "d",
          iterations = 3, buckets = 2, table = "graft_pr_path_spec",
          path = Some(dir), redistributeDangling = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == plain,
        "bucketed redistributed ranks drifted from the plain form")
      val files = new java.io.File(dir).listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".parquet")),
        s"edge index files must land at the caller's path $dir")
    } finally spark.sql("DROP TABLE IF EXISTS graft_pr_path_spec")
  }
}
