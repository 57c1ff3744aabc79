package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Layout

/**
 * Z-order clustering: Morton-key correctness and the property it exists
 * for — file/row-group pruning stays effective on EVERY clustered
 * dimension, where a single-column sort prunes only its own column.
 */
class LayoutSpec extends AnyFunSuite with SparkFixture {

  test("morton interleave puts a's bits on odd positions") {
    import spark.implicits._
    val got = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.interleave2(col("a"), col("b"), 2).as("z"))
      .head().getLong(0)
    // a=0b11 -> bits 3,1; b=0b01 -> bit 0 => z = 0b1011 = 11
    assert(got == 11L)
  }

  test("3-D morton interleave keeps declared significance within bit groups") {
    import spark.implicits._
    val got = Seq((3L, 1L, 2L)).toDF("a", "b", "c")
      .select(Layout.interleave(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .head().getLong(0)
    // bit i of dim j -> position i*3 + (2-j):
    //   a=0b11 -> positions 2, 5; b=0b01 -> position 1; c=0b10 -> position 3
    // => z = 0b101110 = 46
    assert(got == 46L)
  }

  test("interleave rejects keys wider than a long") {
    assertThrows[IllegalArgumentException] {
      Layout.interleave(Seq(col("a"), col("b"), col("c"), col("d")), 16)
    }
  }

  test("bucketRank clips outliers and caps the top edge into range") {
    import spark.implicits._
    val ranks = Seq(-5.0, 0.0, 511.0, 1023.0, 2000.0).toDF("v")
      .select(Layout.bucketRank(col("v"), 0.0, 1023.0, 8).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(ranks.head == 0L && ranks(1) == 0L)
    assert(ranks(3) == 255L && ranks(4) == 255L, s"got $ranks")
    assert(ranks.forall(r => r >= 0 && r <= 255))
  }

  test("z-clustered layout prunes on BOTH dimensions; x-sorted only on x") {
    import spark.implicits._
    // two independent uniform dimensions, deterministic
    val n = 65536
    val df = spark.range(n).select(
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(1023)).as("x"),
      (hash(col("id"), lit(2)).cast("long").bitwiseAND(1023)).as("y"))

    val base = Files.createTempDirectory("graft-layout").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/by_x")
    Layout.cluster(df, "x", "y", files = 16,
        aRange = Some((0.0, 1023.0)), bRange = Some((0.0, 1023.0)), bits = 8)
      .write.parquet(s"$base/by_z")

    // rows emitted by the scan = rows in row groups that SURVIVED
    // min/max pruning (the post-scan Filter then re-applies the predicate)
    def scanned(path: String, cond: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(path).filter(cond)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case s: FileSourceScanExec => s }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      scans.map(_.metrics("numOutputRows").value).sum
    }

    val yBox = col("y") >= 100 && col("y") < 150
    val xBox = col("x") >= 100 && col("x") < 150
    // x-sorted layout: pruning works on x ...
    assert(scanned(s"$base/by_x", xBox) < n / 4)
    // ... but y stats span everything per file -> zero pruning on y
    assert(scanned(s"$base/by_x", yBox) == n)
    // z-clustered layout: meaningful pruning on EITHER dimension alone
    val zx = scanned(s"$base/by_z", xBox)
    val zy = scanned(s"$base/by_z", yBox)
    assert(zx < n / 2, s"z layout should prune x-only scans, read $zx of $n")
    assert(zy < n / 2, s"z layout should prune y-only scans, read $zy of $n")
    // and correctness: same answers from both layouts
    assert(spark.read.parquet(s"$base/by_z").filter(xBox && yBox).count() ==
      spark.read.parquet(s"$base/by_x").filter(xBox && yBox).count())
  }

  test("3-D z-clustered layout prunes on EVERY dimension") {
    import spark.implicits._
    // the common (time x entity x quality) cut: three independent uniform
    // dimensions, deterministic
    val n = 65536
    val df = spark.range(n).select(
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(1023)).as("x"),
      (hash(col("id"), lit(2)).cast("long").bitwiseAND(1023)).as("y"),
      (hash(col("id"), lit(3)).cast("long").bitwiseAND(1023)).as("z"))

    val base = Files.createTempDirectory("graft-layout3").toString
    // ranges inferred here — exercises the one-scan multi-column inference
    Layout.cluster(df, Seq("x" -> None, "y" -> None, "z" -> None), files = 64)
      .write.parquet(s"$base/by_z3")

    def scanned(cond: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(s"$base/by_z3").filter(cond)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case s: FileSourceScanExec => s }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
      scans.map(_.metrics("numOutputRows").value).sum
    }

    // a narrow box on ANY single dimension must skip most files: 64 files
    // split on the top 6 interleaved bits, i.e. each dimension's top two
    // bucket bits, so per-file min/max spans ~1/4 of every dimension —
    // and the equal-width z split makes that boundary EXACT (the box
    // ranks 25..37 sit inside every dimension's first quarter), so the
    // bound is deterministic, not a sampling-dependent coin flip
    for (dim <- Seq("x", "y", "z")) {
      val read = scanned(col(dim) >= 100 && col(dim) < 150)
      assert(read < n / 3,
        s"3-D z layout should prune $dim-only scans, read $read of $n")
    }
    // correctness: clustering is a pure re-layout
    assert(spark.read.parquet(s"$base/by_z3").count() == n)
    assert(spark.read.parquet(s"$base/by_z3")
      .filter(col("x") >= 100 && col("x") < 150 &&
        col("y") >= 100 && col("y") < 150).count() ==
      df.filter(col("x") >= 100 && col("x") < 150 &&
        col("y") >= 100 && col("y") < 150).count())
  }

  test("writeClustered + readPruned: exact answers from a file-pruned plan") {
    import spark.implicits._
    val n = 32768
    val df = spark.range(n).select(
      col("id"),
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(1023)).as("x"),
      (hash(col("id"), lit(2)).cast("long").bitwiseAND(1023)).as("y"))
    val base = Files.createTempDirectory("graft-zm").toString
    Layout.writeClustered(df, s"$base/t",
      Seq("x" -> Some((0.0, 1023.0)), "y" -> Some((0.0, 1023.0))), files = 64)
    // the manifest exists and carries one (file, dim) line per pair
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/t", "_graft_stats.tsv")))
    val box = Map("x" -> ((100.0, 150.0)), "y" -> ((100.0, 150.0)))
    val pruned = Layout.readPruned(spark, s"$base/t", box)
    val expect = spark.read.parquet(s"$base/t")
      .filter(col("x").between(100, 150) && col("y").between(100, 150))
    // exactness: the pruned read equals the full-scan filter
    assert(pruned.exceptAll(expect).count() == 0 &&
      expect.exceptAll(pruned).count() == 0)
    assert(pruned.count() > 0)
    // pruning: the 2-D box plans a small fraction of the 64 files —
    // each dimension's quarter-span stats cut ~3/4, the box needs both
    val all = spark.read.parquet(s"$base/t").inputFiles.length
    val planned = pruned.inputFiles.length
    assert(planned < all / 2, s"planned $planned of $all files")
    // an impossible box returns an empty, schema-true frame
    val none = Layout.readPruned(spark, s"$base/t",
      Map("x" -> ((5000.0, 6000.0))))
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("id", "x", "y"))
    // a range on an UNCLUSTERED column prunes nothing but filters exactly
    val byId = Layout.readPruned(spark, s"$base/t",
      Map("id" -> ((0.0, 99.0))))
    assert(byId.count() ==
      spark.read.parquet(s"$base/t").filter(col("id") <= 99).count())
  }

  test("inferred ranges auto-clip a heavy-tailed dimension") {
    import spark.implicits._
    // 99.9% of values in [0, 100], a few outliers at 10^9: equal-width
    // ranks over the inferred min/max would put the whole table in the
    // lowest bucket and one file would swallow the table. Inference
    // auto-clips to the 1%-99% quantile range instead (not a hard fail:
    // percentile_approx is approximate, so a borderline distribution
    // must not flip between working and failing across runs).
    val skewed = spark.range(2000).select(
      when(col("id") < 1995, col("id") % 100)
        .otherwise(lit(1000000000L)).as("x"),
      col("id").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-ht").toString
    Layout.writeClustered(skewed, s"$base/t",
      Seq("x" -> None, "y" -> None), files = 8)
    val written = spark.read.parquet(s"$base/t")
    assert(written.count() == 2000)
    // the layout did NOT collapse: the bulk of the files carry narrow
    // in-range x stats (outliers saturate the top edge rank only)
    val stats = Layout.readSidecarLines(spark, s"$base/t",
        Layout.StatsFile, "writeClustered")
      .map(_.split('\t')).filter(_(1) == "x")
    assert(stats.count(s => s(3).toDouble <= 100.0) > stats.size / 2,
      s"auto-clipped layout still skewed: ${stats.map(_.mkString(",")).mkString("; ")}")
    // and a box read over the clipped layout stays exact
    val pruned = Layout.readPruned(spark, s"$base/t",
      Map("x" -> ((10.0, 20.0))))
    val expect = written.filter(col("x").between(10, 20))
    assert(pruned.exceptAll(expect).count() == 0 &&
      expect.exceptAll(pruned).count() == 0)
    // an explicit quantile clip range still works (outliers saturate the edge)
    val ok = Layout.cluster(skewed,
      Seq("x" -> Some((0.0, 100.0)), "y" -> None), files = 8)
    assert(ok.count() == 2000)
    // the one shape auto-clip cannot save: a POINT-MASS bulk (zero-width
    // quantile range) with outliers — silently using the full range
    // would write the one-file layout the clip exists to prevent, so
    // inference fails fast with guidance instead
    val point = spark.range(2000).select(
      when(col("id") < 1995, lit(5L)).otherwise(lit(1000000000L)).as("x"),
      col("id").as("y"))
    val e = intercept[IllegalArgumentException] {
      Layout.cluster(point, Seq("x" -> None, "y" -> None), files = 8).count()
    }
    assert(e.getMessage.contains("point mass"))
  }

  test("parquet-sidecar pruning == TSV pruning on a synthetic 1e5-entry manifest") {
    import spark.implicits._
    // deterministic synthetic zone map: 50k files x 2 dims; dim ranges
    // derive from the file index so boxes cut real fractions, with some
    // files missing one dim's stats (the conservative-keep edge)
    val nFiles = 50000
    val rows = (0 until nFiles).flatMap { i =>
      val a = Seq(("f%05d.parquet".format(i), "x",
        (i % 1000).toDouble, (i % 1000).toDouble + 5.0))
      val b = if (i % 17 == 0) Nil // every 17th file: no stats for y
        else Seq(("f%05d.parquet".format(i), "y",
          (i / 50).toDouble, (i / 50).toDouble + 3.0))
      a ++ b
    }
    val tsvDir = Files.createTempDirectory("graft-zm-tsv").toString
    val pqDir = Files.createTempDirectory("graft-zm-pq").toString
    Layout.writeSidecar(spark, tsvDir, Layout.StatsFile,
      rows.map { case (f, d, mn, mx) => s"$f\t$d\t$mn\t$mx" }.mkString("\n"))
    rows.toDF("f", "dim", "mn", "mx").repartition(8)
      .write.parquet(s"$pqDir/${Layout.StatsPqDir}")
    for (ranges <- Seq(
        Map("x" -> ((100.0, 140.0))),
        Map("x" -> ((100.0, 140.0)), "y" -> ((200.0, 260.0))),
        Map("y" -> ((0.0, 5.0))),
        Map("z" -> ((0.0, 1.0))), // unclustered dim: nothing prunes
        Map("x" -> ((-50.0, -10.0))))) { // impossible box: empty
      val tsv = Layout.pruneSet(spark, tsvDir, ranges)
      val pq = Layout.pruneSet(spark, pqDir, ranges)
      assert(tsv == pq, s"prune sets diverged for $ranges")
    }
    // and the sets are non-trivial: the 2-D box keeps a real subset
    val subset = Layout.pruneSet(spark, pqDir,
      Map("x" -> ((100.0, 140.0)), "y" -> ((200.0, 260.0))))
    assert(subset.nonEmpty && subset.size < nFiles / 10)
  }

  test("writeClustered above the inline bound: distributed sidecar, same reads") {
    import spark.implicits._
    val df = spark.range(4096).select(
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(255)).as("x"),
      (hash(col("id"), lit(2)).cast("long").bitwiseAND(255)).as("y"))
    val base = Files.createTempDirectory("graft-zm-dist").toString
    // bound 0 forces the parquet sidecar at any layout size
    Layout.writeClustered(df, s"$base/t",
      Seq("x" -> Some((0.0, 255.0)), "y" -> Some((0.0, 255.0))),
      files = 16, statsInlineBound = 0)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/t", Layout.StatsPqDir)))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/t", Layout.StatsFile)))
    val box = Map("x" -> ((50.0, 90.0)), "y" -> ((50.0, 90.0)))
    val pruned = Layout.readPruned(spark, s"$base/t", box)
    val expect = spark.read.parquet(s"$base/t")
      .filter(col("x").between(50, 90) && col("y").between(50, 90))
    assert(pruned.exceptAll(expect).count() == 0 &&
      expect.exceptAll(pruned).count() == 0)
    assert(pruned.count() > 0)
    val all = spark.read.parquet(s"$base/t").inputFiles.length
    assert(pruned.inputFiles.length < all, "distributed sidecar never pruned")
    // re-layout UNDER the bound replaces the parquet sidecar with TSV
    Layout.writeClustered(df, s"$base/t",
      Seq("x" -> Some((0.0, 255.0)), "y" -> Some((0.0, 255.0))), files = 16)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/t", Layout.StatsFile)))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/t", Layout.StatsPqDir)))
    // the old `expect` plan pins the replaced files — re-derive it
    val expect2 = spark.read.parquet(s"$base/t")
      .filter(col("x").between(50, 90) && col("y").between(50, 90))
    val again = Layout.readPruned(spark, s"$base/t", box)
    assert(again.exceptAll(expect2).count() == 0 &&
      expect2.exceptAll(again).count() == 0)
  }

  test("cluster layout is deterministic and contiguous regardless of session history") {
    import spark.implicits._
    // repartitionByRange's bound sampler seeds from the RDD id, so the
    // SAME cluster() call used to lay data out differently depending on
    // how many RDDs the session had created before — a rerun of a 100 TB
    // layout job would shift every file boundary. The equal-width z
    // split is a pure expression of the row, so layout must be
    // bit-identical across session history, and every output partition
    // must hold ONE contiguous, disjoint z range (no hash collisions —
    // the bijective-token routing's contract).
    val n = 4096
    val df = spark.range(n).select(
      (hash(col("id"), lit(1)).cast("long").bitwiseAND(255)).as("x"),
      (hash(col("id"), lit(2)).cast("long").bitwiseAND(255)).as("y"))
    def layout(): Map[Int, Seq[(Long, Long)]] =
      Layout.cluster(df, "x", "y", files = 16,
          aRange = Some((0.0, 255.0)), bRange = Some((0.0, 255.0)), bits = 8)
        .withColumn("pid", spark_partition_id())
        .collect()
        .map(r => (r.getInt(2), (r.getLong(0), r.getLong(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val first = layout()
    // shift the session's RDD id counter the way a busy session would
    (1 to 40).foreach(_ => spark.range(8).rdd.count())
    val second = layout()
    assert(first == second, "layout moved with session history")
    // contiguity: the partitions' z intervals are pairwise disjoint
    val zOf = (xy: (Long, Long)) =>
      Layout.zValue(Seq((lit(xy._1).cast("long"), (0.0, 255.0)),
        (lit(xy._2).cast("long"), (0.0, 255.0))), 8)
    val zs = first.toSeq.map { case (pid, rows) =>
      val vals = spark.range(1).select(array(rows.map(zOf): _*)).head()
        .getSeq[Long](0)
      (vals.min, vals.max)
    }.sortBy(_._1)
    zs.sliding(2).foreach {
      case Seq((_, e1), (s2, _)) =>
        assert(e1 < s2, s"partition z ranges overlap: $zs")
      case _ =>
    }
  }
}
