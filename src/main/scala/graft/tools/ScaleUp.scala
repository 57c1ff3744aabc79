package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Synthesize a larger scale factor from an existing one for SCALE
 * validation runs (`sbt "runMain graft.tools.ScaleUp <srcDir> <outDir>
 * [factor]"`): `factor` copies of every board table (`documents`,
 * `embeddings`, `orders`, `lineitem`, `customer`, `part`, `supplier`,
 * `events`; `nation`/`region` stay fixed — TPC-H dimension semantics)
 * with ids offset per copy and CONTENT decorrelated across copies, so the
 * derived corpus keeps the source's per-copy duplicate/near-dup RATE
 * instead of turning every row into a 10-way near-duplicate (which
 * would blow the dedup families' candidate sets up for data reasons
 * and poison any scaling ratio read off the run):
 *
 *  - documents: a copy-specific marker token is spliced after every
 *    4th word, so EVERY >=5-token shingle of a copied text differs
 *    from the original's — MinHash/SimHash/n-gram machinery sees the
 *    copies as unrelated documents, while in-copy near-dup families
 *    survive verbatim (every member gets the same treatment).
 *  - embeddings: each copy's vectors pass through a copy-specific
 *    positive per-dimension scaling, which preserves in-copy cosine
 *    geometry ONLY approximately but decorrelates cross-copy twins;
 *    copy 0 is the untouched source.
 *
 * Copy 0 is byte-identical to the source for both tables, so the
 * source scale factor is a subset of the derived one. This is NOT the
 * driver's generator — derived data is for throughput-scaling reads
 * (sec-per-query vs sf), never for correctness oracles.
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 2 && factor <= 100, "factor in [2, 100]")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Stride = 100000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCopies = (0 until factor).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * Stride)).as("doc_id"),
        // marker after every 4th word, PLUS an unconditional trailing
        // marker: the splice regex needs whitespace after the 4th word,
        // so a <=4-token doc would otherwise copy byte-identically and
        // inflate the exact-duplicate rate 10x
        concat(
          regexp_replace(col("text"), "((\\S+\\s+){4})", s"$$1zcp$i "),
          lit(s" zcp$i")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docCopies.reduce(_ unionByName _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // orders + customer feed the STORE lifecycle family (q65..q77):
    // keys offset per copy (PK uniqueness and the per-copy join rate
    // survive — o_custkey moves with c_custkey), every value column
    // verbatim so predicate selectivity RATES are scale-invariant;
    // key types are preserved so derived-sf schemas match the source
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val okT = orders.schema("o_orderkey").dataType
    val ocT = orders.schema("o_custkey").dataType
    (0 until factor).map { i =>
      if (i == 0) orders
      else orders
        .withColumn("o_orderkey",
          (col("o_orderkey") + lit(i * Stride)).cast(okT))
        .withColumn("o_custkey",
          (col("o_custkey") + lit(i * Stride)).cast(ocT))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // lineitem feeds the composite-PK store fixtures (q85) and the
    // TPC-H family: the (l_orderkey, l_linenumber) key stays unique
    // when l_orderkey offsets per copy, and the part/supplier FOREIGN
    // keys offset with the SAME stride so each copy joins its own
    // copy's dimensions — per-copy join selectivity and fan-out are
    // scale-invariant (keeping them at copy 0 would fan 10x the rows
    // into a tenth of the keys: manufactured skew, poisoned ratios)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    def offsetKeys(df: org.apache.spark.sql.DataFrame, i: Int,
                   keys: String*): org.apache.spark.sql.DataFrame =
      keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, (col(k) + lit(i * Stride)).cast(df.schema(k).dataType))
      }
    (0 until factor).map { i =>
      if (i == 0) li
      else offsetKeys(li, i, "l_orderkey", "l_partkey", "l_suppkey")
    }.reduce(_ unionByName _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // part + supplier scale with the fact (TPC-H semantics), keys on
    // the shared stride; nation + region are FIXED dimensions at every
    // scale factor (also TPC-H semantics) and copy verbatim
    val part = spark.read.parquet(s"$src/part.parquet")
    (0 until factor).map { i =>
      if (i == 0) part else offsetKeys(part, i, "p_partkey")
    }.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    val supp = spark.read.parquet(s"$src/supplier.parquet")
    (0 until factor).map { i =>
      if (i == 0) supp else offsetKeys(supp, i, "s_suppkey")
    }.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    Seq("nation", "region").foreach { tbl =>
      spark.read.parquet(s"$src/$tbl.parquet")
        .write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    }

    // events feed the sessionize/window/stream-shaped families:
    // event_id/user_id offset per copy (per-user session shapes and
    // per-copy cardinalities survive), timestamps verbatim so window
    // and watermark selectivity RATES are scale-invariant. Read under
    // nanosAsLong for TIMESTAMP(NANOS)-written sources; the events()
    // reader handles either spelling
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    (0 until factor).map { i =>
      if (i == 0) ev else offsetKeys(ev, i, "event_id", "user_id")
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ccT = cust.schema("c_custkey").dataType
    (0 until factor).map { i =>
      if (i == 0) cust
      else cust.withColumn("c_custkey",
        (col("c_custkey") + lit(i * Stride)).cast(ccT))
    }.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embCopies = (0 until factor).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i * Stride)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> CAST(x * " +
          s"(0.6 + 0.1 * pmod(j * 7 + $i * 3, 9)) AS FLOAT))")
          .as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[scaleup] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
