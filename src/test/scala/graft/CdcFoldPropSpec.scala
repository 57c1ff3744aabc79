package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.CdcModel
import graft.operators.ChangeLogApplier._

/**
 * Property-style tests for the CDC fold (SURVEY §5 plan): against randomly
 * generated event logs (seeded — reproducible), the fold must (a) agree
 * with an independent in-JVM reference model, (b) agree with the last-wins
 * fast path, and (c) be invariant to input row order (it sorts by pos).
 */
class CdcFoldPropSpec extends AnyFunSuite with SparkFixture {

  private val tSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)) ++ CdcModel.adminFields)
  private val payload = StructType(Seq(
    StructField("ID", IntegerType), StructField("NAME", StringType)))
  private val evSchema = StructType(Seq(
    StructField("table", StringType), StructField("op_type", StringType),
    StructField("op_ts", StringType), StructField("pos", StringType),
    StructField("before", payload), StructField("after", payload),
    StructField("after_hash", IntegerType), StructField("before_hash", IntegerType)))

  private def mkTarget(rows: Seq[(Int, String)]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (id, nm) => Row(id, nm, 0, "0" * 20, null, null) }), tSchema)

  private def mkEvents(evs: Seq[(Int, String, String, Int)]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(
      evs.map { case (id, nm, op, pos) =>
        val img = Row(id, nm)
        Row("S.T", op, "2022-09-26 14:57:13.817732", f"$pos%020d",
          if (op == "I") null else img, if (op == "D") null else img, 0, 0)
      }), evSchema)

  private def foldResult(t: DataFrame, e: DataFrame): Map[Int, String] =
    applyFold(t, mapEvents(e, tSchema), "id", chainVerified = false)
      .select("id", "name").collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  /** reference model: the last event per key (pos order) decides — exact
   * for no-chain mode, including seeded new keys. */
  private def lastOpModel(target: Seq[(Int, String)],
                          evs: Seq[(Int, String, String, Int)]): Map[Int, String] = {
    val byKey = evs.groupBy(_._1)
    (target.map(_._1) ++ evs.map(_._1)).distinct.flatMap { id =>
      byKey.get(id) match {
        case None => target.find(_._1 == id).map(id -> _._2)
        case Some(ks) =>
          val last = ks.maxBy(_._4)
          if (last._3 == "D") None else Some(id -> last._2)
      }
    }.toMap
  }

  test("fold matches the reference model on 10 random seeded logs") {
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val target = (1 to 5).filter(_ => rnd.nextBoolean()).map(i => i -> s"t$i")
      var pos = 0
      val evs = (1 to 8).flatMap { id =>
        (0 until rnd.nextInt(4)).map { _ =>
          pos += 1
          (id, s"v$pos", Seq("I", "U", "D")(rnd.nextInt(3)), pos)
        }
      }
      val got = foldResult(mkTarget(target), mkEvents(evs))
      assert(got == lastOpModel(target, evs), s"seed=$seed target=$target evs=$evs")
    }
  }

  test("scalacheck: fold matches the model on arbitrary generated logs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEvents: Gen[List[(Int, String, String, Int)]] = for {
      n <- Gen.choose(0, 10)
      ids <- Gen.listOfN(n, Gen.choose(1, 6))
      ops <- Gen.listOfN(n, Gen.oneOf("I", "U", "D"))
    } yield ids.zip(ops).zipWithIndex.map { case ((id, op), i) =>
      (id, s"v${i + 1}", op, i + 1)
    }
    val genTarget: Gen[Seq[(Int, String)]] =
      Gen.someOf(1 to 5).map(_.map(i => i -> s"t$i").toSeq)
    val prop = Prop.forAll(genTarget, genEvents) { (target, evs) =>
      foldResult(mkTarget(target), mkEvents(evs)) == lastOpModel(target, evs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("fold is invariant to input row order (it sorts by pos)") {
    val rnd = new Random(99)
    val target = Seq(1 -> "a", 2 -> "b")
    val evs = Seq((1, "x", "U", 3), (1, "y", "U", 1), (2, "z", "D", 2),
      (7, "n", "I", 4), (7, "m", "U", 5))
    val a = foldResult(mkTarget(target), mkEvents(evs))
    val b = foldResult(mkTarget(target), mkEvents(rnd.shuffle(evs)))
    assert(a == b)
    assert(a == Map(1 -> "x", 7 -> "m"))
  }

  test("fold and last-wins fast path agree on random logs") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(100 + seed)
      val target = (1 to 4).map(i => i -> s"t$i")
      var pos = 0
      val evs = (1 to 6).flatMap { id =>
        (0 until rnd.nextInt(3)).map { _ =>
          pos += 1
          (id, s"v$pos", Seq("I", "U", "D")(rnd.nextInt(3)), pos)
        }
      }
      val t = mkTarget(target)
      val e = mkEvents(evs)
      val mapped = mapEvents(e, tSchema)
      val fold = applyFold(t, mapped, "id", chainVerified = false)
        .select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      val fast = applyLastWins(t, mapped, "id")
        .select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(fold == fast, s"seed=$seed evs=$evs")
    }
  }
}
