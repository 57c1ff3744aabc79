package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Skew-salted join: the salt must never change the join's result. */
class JoinsSpec extends AnyFunSuite with SparkFixture {
  private val sf = "/root/testdata/sf0.001"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")
  private lazy val ord = spark.read.parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_orderpriority")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted

  test("salted inner join equals the plain inner join exactly") {
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    val salted = Joins.saltedEquiJoin(li, ord, "l_orderkey", "o_orderkey", salt = 4)
    assert(rows(salted) == rows(plain))
  }

  test("salted left join keeps unmatched big rows exactly once") {
    val someOrders = ord.filter(col("o_orderkey") % 2 === 0)
    val plain = li.join(someOrders, li("l_orderkey") === someOrders("o_orderkey"), "left")
    val salted = Joins.saltedEquiJoin(li, someOrders,
      "l_orderkey", "o_orderkey", salt = 4, joinType = "left")
    assert(salted.count() == plain.count())
    assert(salted.filter(col("o_orderpriority").isNull).count() ==
      plain.filter(col("o_orderpriority").isNull).count())
  }

  test("asOfJoin: latest right row at-or-before each left row, else null") {
    import spark.implicits._
    val l = Seq((1, 5, 100), (1, 10, 101), (1, 2, 102), (2, 7, 103))
      .toDF("k", "t", "lid")
    val r = Seq((1, 5, 200), (1, 8, 201), (1, 1, 202), (3, 1, 203))
      .toDF("k", "rt", "rid")
    val got = graft.operators.Joins
      .asOfJoin(l, r, "k", "t", "rt", Seq("rid"), "m_t")
      .select("lid", "rid", "m_t").collect()
      .map(x => (x.getInt(0), Option(x.get(1)), Option(x.get(2)))).toSet
    // matches DuckDB ASOF LEFT JOIN on the same data (inclusive ties)
    assert(got == Set(
      (100, Some(200), Some(5)), // tie at t=5 matches inclusively
      (101, Some(201), Some(8)),
      (102, Some(202), Some(1)),
      (103, None, None)))        // key 2 has no right rows
  }

  test("asOfJoin: a NULL right value is carried, not torn from an older row") {
    import spark.implicits._
    val l = Seq((1, 4, 10)).toDF("k", "t", "lid")
    val r = Seq((1, 1, Some(5)), (1, 3, None)).toDF("k", "rt", "rid")
    val got = graft.operators.Joins
      .asOfJoin(l, r, "k", "t", "rt", Seq("rid"), "m_t")
      .select("lid", "rid", "m_t").head
    // the matched row is (t=3, rid=NULL): value and time from the SAME row
    assert(got.getInt(0) == 10)
    assert(got.isNullAt(1))
    assert(got.getInt(2) == 3)
  }

  test("bandJoin: exactly the pairs within tolerance, each once") {
    import spark.implicits._
    val l = Seq((1, 100, 10), (1, 400, 11), (2, 100, 12)).toDF("k", "lt", "lid")
    val r = Seq((1, 150, 20), (1, 399, 21), (1, 1000, 22), (2, 500, 23))
      .toDF("k", "rt", "rid")
    // cast epoch ints to timestamps for the time columns
    val lt = l.withColumn("lt", col("lt").cast("timestamp"))
    val rt = r.withColumn("rt", col("rt").cast("timestamp"))
    val got = graft.operators.Joins.bandJoin(lt, rt, "k", "lt", "rt", 300)
      .select("lid", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
    val brute = for {
      (kl, t1, lid) <- Seq((1, 100, 10), (1, 400, 11), (2, 100, 12))
      (kr, t2, rid) <- Seq((1, 150, 20), (1, 399, 21), (1, 1000, 22), (2, 500, 23))
      if kl == kr && math.abs(t1 - t2) <= 300
    } yield (lid, rid)
    assert(got.sorted == brute.sorted) // each qualifying pair exactly once
    assert(got.nonEmpty)
  }

  test("right/full joins are rejected (salting would duplicate small rows)") {
    intercept[IllegalArgumentException] {
      Joins.saltedEquiJoin(li, ord, "l_orderkey", "o_orderkey", 4, "right")
    }
  }
}
