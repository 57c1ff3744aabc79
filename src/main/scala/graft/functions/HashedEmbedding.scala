package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native Catalyst expression for the feature-hashing embedding fold
 * (the t24 operator): dimension j of a document is the bag-of-words sum
 * over tokens of the 16-bit md5 slice at byte offset 2j, mapped to
 * [−1000, 1000] milli-units (`slice % 2001 − 1000`). The
 * `aggregate(zip_with(...))` higher-order-function form evaluates
 * interpreted — one lambda frame per (token, dim) plus a hex round-trip
 * through `conv(substring(md5(...)))` — where this expression is one
 * compiled loop per row with a reused digest instance, and it stays
 * inside whole-stage codegen. Bit-identical to the HOF form
 * (spec-asserted) and to the external oracle's nibble-parse arithmetic.
 *
 * Null semantics mirror the HOF fold exactly: a null token array yields
 * NULL; a null ELEMENT yields an array of d NULL coordinates (zip_with's
 * `acc + null` poisons every element, never the array itself).
 */
case class HashedBowEmbeddingMilli(child: Expression, d: Int)
    extends UnaryExpression with Serializable {

  require(d >= 1 && d <= 8,
    "one 128-bit digest carries 8 16-bit slices; 1 <= d <= 8")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow_embedding expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "hashed_bow_embedding"
  override def nullable: Boolean = true

  // one digest per THREAD, reused across rows. Expression trees are
  // normally per-task copies evaluated single-threaded, but the
  // interpreted path cannot rely on that: the same instance can be
  // evaluated from more than one thread (driver-side eval over a local
  // relation, an InterpretedProjection cached across threads), and a
  // shared MessageDigest interleaves state and produces wrong vectors
  // SILENTLY. ThreadLocal keeps per-row cost at one map lookup while
  // making cross-thread reuse safe; the codegen path has per-instance
  // mutable state and is unaffected.
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(tokens: Any): Any = {
    val digest = md5.get()
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](d)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return new GenericArrayData(new Array[Any](d))
      // digest(bytes) both updates and resets — no explicit reset needed
      val dg = digest.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < d) {
        val hi = ((dg(2 * j) & 0xff) << 8) | (dg(2 * j + 1) & 0xff)
        sums(j) += hi % 2001 - 1000
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val digest = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val dg = ctx.freshName("dg")
      val hi = ctx.freshName("hi")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $a.numElements();
         |long[] $sums = new long[$d];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $poisoned = true; break; }
         |  byte[] $dg = $digest.digest($a.getUTF8String($i).getBytes());
         |  for (int $j = 0; $j < $d; $j++) {
         |    int $hi = (($dg[2 * $j] & 0xff) << 8) | ($dg[2 * $j + 1] & 0xff);
         |    $sums[$j] += $hi % 2001 - 1000;
         |  }
         |}
         |${ev.value} = $poisoned
         |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$d])
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedBowEmbeddingMilli = copy(child = newChild)
}

/**
 * [[HashedBowEmbeddingMilli]] with LEARNED per-term weights: dimension j
 * of a document is the bag-of-words sum over tokens of the term's weight
 * vector from a broadcast table, falling back to the md5-slice stand-in
 * arithmetic for terms the table does not carry — so an EMPTY table is
 * bit-identical to the hashed twin, and a trained table overrides it
 * exactly where training spoke. This is the learned-model seam the
 * hashed stand-ins document: a production classifier/embedder loads its
 * trained weights (parquet → driver → broadcast) and nothing else in the
 * plumbing moves.
 *
 * The weight map rides the TORRENT broadcast — shipped once per
 * executor, not serialized into the plan or per task — and is keyed by
 * [[UTF8String]] so the per-token lookup needs no string conversion.
 * Null semantics mirror the hashed twin: null array → NULL, null element
 * → an array of d NULL coordinates.
 */
case class WeightedBowEmbeddingMilli(
    child: Expression, d: Int,
    weights: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]])
    extends UnaryExpression with Serializable {

  require(d >= 1 && d <= 8,
    "one 128-bit digest carries 8 16-bit fallback slices; 1 <= d <= 8")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"weighted_bow_embedding expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "weighted_bow_embedding"
  override def nullable: Boolean = true

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(tokens: Any): Any = {
    val digest = md5.get()
    val map = weights.value
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](d)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return new GenericArrayData(new Array[Any](d))
      val tk = arr.getUTF8String(i)
      val w = map.get(tk)
      var j = 0
      if (w != null) {
        while (j < d) { sums(j) += w(j); j += 1 }
      } else {
        val dg = digest.digest(tk.getBytes)
        while (j < d) {
          val hi = ((dg(2 * j) & 0xff) << 8) | (dg(2 * j + 1) & 0xff)
          sums(j) += hi % 2001 - 1000
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftWeights", weights,
      "org.apache.spark.broadcast.Broadcast")
    val wmap = ctx.addMutableState("java.util.HashMap", "graftWmap",
      v => s"$v = (java.util.HashMap) $bcRef.value();")
    val digest = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val tk = ctx.freshName("tk")
      val w = ctx.freshName("w")
      val dg = ctx.freshName("dg")
      val hi = ctx.freshName("hi")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $a.numElements();
         |long[] $sums = new long[$d];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $poisoned = true; break; }
         |  org.apache.spark.unsafe.types.UTF8String $tk = $a.getUTF8String($i);
         |  long[] $w = (long[]) $wmap.get($tk);
         |  if ($w != null) {
         |    for (int $j = 0; $j < $d; $j++) { $sums[$j] += $w[$j]; }
         |  } else {
         |    byte[] $dg = $digest.digest($tk.getBytes());
         |    for (int $j = 0; $j < $d; $j++) {
         |      int $hi = (($dg[2 * $j] & 0xff) << 8) | ($dg[2 * $j + 1] & 0xff);
         |      $sums[$j] += $hi % 2001 - 1000;
         |    }
         |  }
         |}
         |${ev.value} = $poisoned
         |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$d])
         |  : new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): WeightedBowEmbeddingMilli = copy(child = newChild)
}

object HashedEmbedding {
  /** Codegen'd feature-hashing embedding over an `array<string>` token
   * column: d integer milli-unit coordinates. */
  def hashedBowMilli(tokens: Column, d: Int): Column =
    ColumnBridge.column(
      HashedBowEmbeddingMilli(ColumnBridge.expression(tokens), d))

  /** [[hashedBowMilli]] with learned weights: a broadcast term → d-long
   * weight-vector map overriding the md5 arithmetic term by term. */
  def weightedBowMilli(tokens: Column, d: Int,
      weights: org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]])
      : Column =
    ColumnBridge.column(
      WeightedBowEmbeddingMilli(ColumnBridge.expression(tokens), d, weights))
}
