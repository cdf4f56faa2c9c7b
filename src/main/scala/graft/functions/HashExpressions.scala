package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the hash-sketch hot paths.
 *
 * Composing these from `transform`/`aggregate` higher-order functions
 * works but evaluates interpreted, allocating a lambda frame and an
 * intermediate array per (row × permutation) — measured ~30× slower on
 * the minhash path. These expressions do one tight JVM loop per row
 * over the raw `ArrayData`/`UTF8String`, using Spark's own XXH64.
 *
 * `eval` is the tight loop; codegen emits a direct call to it via a
 * static-style helper (no per-element Catalyst machinery), so rows stay
 * inside whole-stage codegen.
 */
object HashExpressions {

  /** One-pass MinHash: for seeds 0..perms-1, min of XXH64(elem, seed). */
  def minhashSignature(elems: Array[UTF8String], perms: Int): ArrayData = {
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < elems.length) {
      val s = elems(i)
      if (s != null) {
        var p = 0
        while (p < perms) {
          val h = XXH64.hashUTF8String(s, p.toLong)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** One-pass 64-bit SimHash over element hashes (bit-vote majority). */
  def simhash(elems: Array[UTF8String]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < elems.length) {
      val s = elems(i)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /**
   * Rolling fingerprints: XXH64 over every k-byte sliding window of
   * the string's UTF-8 bytes, mod-sampled (h % mod == 0) and
   * deduplicated. Zero-copy: windows hash straight out of the
   * UTF8String's backing memory.
   */
  def rollingFingerprints(s: UTF8String, k: Int, mod: Int): ArrayData = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val seen = new java.util.TreeSet[java.lang.Long]()
    if (n <= k) {
      val h = XXH64.hashUnsafeBytes(base, off, n, 0L)
      if (java.lang.Math.floorMod(h, mod.toLong) == 0L) seen.add(h)
    } else {
      var i = 0
      while (i <= n - k) {
        val h = XXH64.hashUnsafeBytes(base, off + i, k, 0L)
        if (java.lang.Math.floorMod(h, mod.toLong) == 0L) seen.add(h)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def rollingFpEval(input: Any, k: Int, mod: Int): ArrayData =
    rollingFingerprints(input.asInstanceOf[UTF8String], k, mod)

  private def toUtf8Array(input: Any): Array[UTF8String] = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    out
  }

  def minhashEval(input: Any, perms: Int): ArrayData =
    minhashSignature(toUtf8Array(input), perms)

  def simhashEval(input: Any): Long = simhash(toUtf8Array(input))
}

/** `minhash_signature(array<string>, perms) -> array<long>` */
case class MinHashSignatureExpr(child: Expression, perms: Int)
    extends UnaryExpression {
  require(perms > 0 && perms <= 512, s"perms out of range: $perms")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashExpressions.minhashEval(input, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressions.minhashEval($c, $perms);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** `simhash64(array<string>) -> long` */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashExpressions.simhashEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressions.simhashEval($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `rolling_fingerprints(string, k, mod) -> array<long>` (sorted set) */
case class RollingFingerprintsExpr(child: Expression, k: Int, mod: Int)
    extends UnaryExpression {
  require(k > 0 && mod > 0, s"invalid k=$k mod=$mod")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprints expects string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashExpressions.rollingFpEval(input, k, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressions.rollingFpEval($c, $k, $mod);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_fingerprints"
}

/** Column-API front door for the custom expressions. */
object functions {

  /** MinHash signature of a string-array column (seeds 0..perms-1). */
  def minhash_signature(c: Column, perms: Int): Column =
    GraftBridge.toColumn(MinHashSignatureExpr(GraftBridge.toExpression(c), perms))

  /** 64-bit SimHash of a string-array column. */
  def simhash64(c: Column): Column =
    GraftBridge.toColumn(SimHash64Expr(GraftBridge.toExpression(c)))

  /** Sorted set of mod-sampled rolling k-byte-gram hashes. */
  def rolling_fingerprints(c: Column, k: Int, mod: Int): Column =
    GraftBridge.toColumn(RollingFingerprintsExpr(GraftBridge.toExpression(c), k, mod))

  /** Cosine similarity of two float/double array columns (double). */
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSimExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Dot product of two float/double array columns (double). */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProductExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Sign-random-projection bucket id over deterministic hyperplanes. */
  def srp_bucket(emb: Column, planes: Int): Column =
    GraftBridge.toColumn(SrpBucketExpr(GraftBridge.toExpression(emb), planes))

  // ---- the h60 (md5-derived, DuckDB-reproducible) sketch family ----

  /** h60 from SQL builtins: first 15 hex digits of md5 as a long.
    * Oracle equivalent: `('0x'||substr(md5(x),1,15))::BIGINT`. */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  }

  /** 60-bit SimHash of a string-array column (h60 token hashes). */
  def simhash60(c: Column): Column =
    GraftBridge.toColumn(SimHash60Expr(GraftBridge.toExpression(c)))

  /** MinHash signature over affine permutations of h60 element hashes. */
  def minhash60(c: Column, perms: Int): Column =
    GraftBridge.toColumn(MinHash60Expr(GraftBridge.toExpression(c), perms))

  /** Sorted set of mod-sampled rolling polynomial k-gram hashes. */
  def rolling_poly_fp(c: Column, k: Int, mod: Int): Column =
    GraftBridge.toColumn(RollingPolyFpExpr(GraftBridge.toExpression(c), k, mod))

  /** All h60 LSH band buckets of a minhash signature, one pass. */
  def lsh_bands(sig: Column, bands: Int): Column =
    GraftBridge.toColumn(LshBandsExpr(GraftBridge.toExpression(sig), bands))

  /** PG hstore text form of a map column (keys sorted, one pass). */
  def hstore_render(m: Column): Column =
    GraftBridge.toColumn(HstoreRenderExpr(GraftBridge.toExpression(m)))

  /** All length-n character windows of a string column, one pass. */
  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(CharNgramsExpr(GraftBridge.toExpression(c), n))

  /** Distinct word k-grams of normalized text, one pass. */
  def word_shingles(c: Column, k: Int): Column =
    GraftBridge.toColumn(WordShinglesExpr(GraftBridge.toExpression(c), k))

  /** Sum of element character counts of a string array, one pass. */
  def array_total_strlen(c: Column): Column =
    GraftBridge.toColumn(ArrayTotalStrlenExpr(GraftBridge.toExpression(c)))

  /** Occurrences of array elements belonging to a fixed set, one pass. */
  def count_in_set(c: Column, set: Seq[String]): Column =
    GraftBridge.toColumn(CountInSetExpr(GraftBridge.toExpression(c), set))

  /** Intersection size of two SORTED string-set arrays (linear merge). */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.toColumn(SortedIntersectSizeExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
