package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The cross-engine "h60" hash family: the first 15 hex digits of MD5
 * parsed as a 60-bit non-negative long — chosen because BOTH Spark and
 * DuckDB can compute it from SQL builtins
 * (`conv(substr(md5(s),1,15),16,10)` / `('0x'||substr(md5(s),1,15))::BIGINT`),
 * which turns the sketch operators built on it (SimHash, MinHash + LSH,
 * rolling fingerprints) into fully DuckDB-oracle-verifiable queries.
 *
 * The expressions below are the fast JVM path: one MessageDigest call
 * (or none — the rolling fingerprint is pure arithmetic) and a tight
 * loop per row, no interpreted higher-order lambdas. xxhash64-based
 * siblings in [[HashExpressions]] remain the rawest-throughput option;
 * the engine's verified surface uses h60.
 */
object H60 {

  /** 2³¹−1, the Mersenne prime used for MinHash permutations and the
    * rolling polynomial hash: products of two values < P stay < 2⁶²,
    * so plain BIGINT arithmetic is exact in both engines. */
  val P: Long = 2147483647L

  /** Rolling-hash base (prime, < 2²¹ so base·P < 2⁶³). */
  val B: Long = 1000003L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** h60 of raw bytes: first 15 hex digits of MD5 as a long. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** h60 of a string's UTF-8 bytes (plain Scala — usable at oracle-SQL
    * generation time with no session). */
  def hash(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  /** MinHash permutation coefficients, derived from h60 itself so the
    * identical literals can be embedded in oracle SQL:
    * aⱼ = h60("a:j") mod (P−1) + 1 (non-zero), bⱼ = h60("b:j") mod P. */
  def permA(j: Int): Long = hash(s"a:$j") % (P - 1) + 1
  def permB(j: Int): Long = hash(s"b:$j") % P

  // Coefficients cached per perm count: deriving them is itself an md5
  // each, which must happen once per signature width — NOT inside the
  // per-element hot loop (measured 10× on the whole minhash stage).
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def permTables(n: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(n, m =>
      (Array.tabulate(m)(permA), Array.tabulate(m)(permB)))

  /** SimHash over 60-bit token hashes: bit-vote majority (ties → 0). */
  def simhash(elems: Array[UTF8String]): Long = {
    val votes = new Array[Int](60)
    var i = 0
    while (i < elems.length) {
      val s = elems(i)
      if (s != null) {
        val h = hash(s)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** MinHash signature: sigⱼ = min over elems of (aⱼ·x + bⱼ) mod P,
    * x = h60(elem) mod P. Empty input → all-P sentinel (P is above any
    * real value, so it is the identity for elementwise-min union). */
  def minhash(elems: Array[UTF8String], perms: Int): ArrayData = {
    val (pa, pb) = permTables(perms)
    val mins = Array.fill(perms)(P)
    var i = 0
    while (i < elems.length) {
      val s = elems(i)
      if (s != null) {
        val x = hash(s) % P
        var j = 0
        while (j < perms) {
          val v = (pa(j) * x + pb(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /**
   * Rolling polynomial fingerprints over every `k`-byte window:
   * h = fold(h·B + byte mod P), mod-sampled (h % mod == 0, winnowing
   * style), deduplicated, sorted. O(1) per window via the rolling
   * update; a text shorter than `k` (including empty → h 0) hashes
   * whole. Byte == character for ASCII, which is what makes the DuckDB
   * `ord(substr(...))`-based oracle equivalent.
   */
  def rollingFingerprints(s: UTF8String, k: Int, mod: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val seen = new java.util.TreeSet[java.lang.Long]()
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
      if (h % mod == 0L) seen.add(h)
    } else {
      // B^(k-1) mod P, for removing the outgoing byte
      var bk = 1L
      var e = 0
      while (e < k - 1) { bk = (bk * B) % P; e += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
      if (h % mod == 0L) seen.add(h)
      while (i < n) {
        val out = (bytes(i - k) & 0xffL) * bk % P
        h = ((h - out + P) % P * B + (bytes(i) & 0xffL)) % P
        if (h % mod == 0L) seen.add(h)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /**
   * All LSH band buckets in one pass: band b's bucket is
   * h60("b:sig[b·r+1],…,sig[b·r+r]") with r = |sig|/bands — the exact
   * string `concat(b, ':', concat_ws(',', slice(sig, …)))` builds, but
   * with the signature child evaluated ONCE per row. (Composing this
   * from a per-band `transform` lambda re-evaluates everything inside
   * the lambda — including the minhash signature — once per band.)
   */
  def lshBands(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    require(bands > 0 && n >= bands && n % bands == 0,
      s"signature length $n must be a positive multiple of bands=$bands" +
        " (rows = 0 would give every row the identical bucket)")
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder()
      sb.append(b).append(':')
      var i = 0
      while (i < rows) {
        if (i > 0) sb.append(',')
        sb.append(sig.getLong(b * rows + i))
        i += 1
      }
      out(b) = hash(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def lshBandsEval(input: Any, bands: Int): ArrayData =
    lshBands(input.asInstanceOf[ArrayData], bands)

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

  def simhashEval(input: Any): Long = simhash(toUtf8Array(input))
  def minhashEval(input: Any, perms: Int): ArrayData =
    minhash(toUtf8Array(input), perms)
  def rollingFpEval(input: Any, k: Int, mod: Int): ArrayData =
    rollingFingerprints(input.asInstanceOf[UTF8String], k, mod)
}

/** `simhash60(array<string>) -> long` (60-bit, oracle-verifiable) */
case class SimHash60Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = H60.simhashEval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.simhashEval($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash60"
}

/** `minhash60(array<string>, perms) -> array<long>` (oracle-verifiable) */
case class MinHash60Expr(child: Expression, perms: Int) extends UnaryExpression {
  require(perms > 0 && perms <= 512, s"perms out of range: $perms")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash60 expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = H60.minhashEval(input, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.minhashEval($c, $perms);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash60"
}

/** `char_ngrams(string, n) -> array<string>`: every length-n character
  * window; a string shorter than n (including empty) yields itself as
  * the single element — mirroring `substr(text, i, n)` over
  * `generate_series(1, greatest(len-n+1, 1))`. One JVM pass; the
  * `transform(sequence(...), i -> substr(...))` composition evaluates
  * an interpreted lambda per window. (Char = UTF-16 code unit here;
  * identical to SQL substr semantics for BMP text.) */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 64, s"n out of range: $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgramsExpr.compute($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

object CharNgramsExpr {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val t = s.toString
    if (t.length <= n) new GenericArrayData(Array[Any](UTF8String.fromString(t)))
    else {
      val count = t.length - n + 1
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(t.substring(i, i + n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `array_total_strlen(array<string>) -> long`: sum of element
  * character counts (codepoints, = SQL `length`) — one pass replacing
  * the interpreted `aggregate(toks, 0, (acc, t) -> acc + length(t))`
  * lambda; identical to DuckDB's
  * `list_sum(list_transform(l, t -> length(t)))`. */
case class ArrayTotalStrlenExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_total_strlen expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ArrayTotalStrlenExpr.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayTotalStrlenExpr.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "array_total_strlen"
}

object ArrayTotalStrlenExpr {
  def compute(arr: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) total += arr.getUTF8String(i).numChars()
      i += 1
    }
    total
  }
}

/** `count_in_set(array<string>, set...) -> int`: occurrences of array
  * elements that belong to a fixed string set — one hash probe per
  * element, replacing the interpreted `size(filter(toks, t ->
  * t.isin(...)))` lambda (set-size × array-size interpreted compares).
  * Identical to DuckDB's `len(list_filter(l, t -> t IN (...)))`. */
case class CountInSetExpr(child: Expression, set: Seq[String])
    extends UnaryExpression {
  require(set.nonEmpty, "count_in_set needs a non-empty set")
  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set expects array<string>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    CountInSetExpr.compute(input.asInstanceOf[ArrayData], lookup)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInSet", lookup, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInSetExpr.compute($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

object CountInSetExpr {
  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var count = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) count += 1
      i += 1
    }
    count
  }
}

/** `sorted_intersect_size(array<string>, array<string>) -> long`: the
  * intersection cardinality of two string SETS already sorted in
  * binary (`sort_array`) order — one linear merge instead of
  * `size(array_intersect(a, b))`'s per-pair hash-set build over the
  * full arrays. PPJoin verification spends ~all its CPU here
  * (candidate pairs × full shingle arrays), so this is the verify
  * kernel; the caller guarantees sortedness (sort once at the shingle
  * build, not once per candidate pair). Merge compare is
  * UTF8String.compare — the same binary ordering `sort_array`
  * produces — and elements are assumed distinct (sets). */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects two array<string>, got $l, $r")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSizeExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectSizeExpr.compute($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_size"
}

object SortedIntersectSizeExpr {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

/** `word_shingles(normalized_string, k) -> array<string>`: the DISTINCT
  * word k-grams of a single-space-separated string, first-occurrence
  * order — one JVM pass replacing the
  * `array_distinct(transform(sequence(...), i -> concat_ws(slice(...))))`
  * composition, whose interpreted per-window lambda dominated every
  * shingle-based operator's runtime. Fewer than k words (including the
  * empty string) yield the whole input as the single shingle —
  * identical to the SQL fallback branch and to DuckDB's
  * `list_distinct(list_transform(generate_series(...), ...))` replay. */
case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 64, s"k out of range: $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesExpr.compute($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val t = s.toString
    // single-space tokenization (the input contract: normalized text);
    // limit -1 matches Spark's split(str, " ") on trailing empties
    val toks = t.split(" ", -1)
    if (toks.length < k)
      return new GenericArrayData(Array[Any](UTF8String.fromString(t)))
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    // token start offsets let each shingle be one substring, not k
    // joins: shingle i spans [start(i), end(i+k-1))
    val starts = new Array[Int](toks.length)
    var pos = 0
    var i = 0
    while (i < toks.length) {
      starts(i) = pos
      pos += toks(i).length + 1
      i += 1
    }
    i = 0
    val count = toks.length - k + 1
    while (i < count) {
      val from = starts(i)
      val until = starts(i + k - 1) + toks(i + k - 1).length
      seen.add(t.substring(from, until))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** `lsh_bands(array<long>, bands) -> array<long>` (h60 band buckets) */
case class LshBandsExpr(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0 && bands <= 256, s"bands out of range: $bands")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands expects array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = H60.lshBandsEval(input, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.lshBandsEval($c, $bands);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lsh_bands"
}

/** `rolling_poly_fp(string, k, mod) -> array<long>` (sorted set,
  * oracle-verifiable polynomial rolling hash) */
case class RollingPolyFpExpr(child: Expression, k: Int, mod: Int)
    extends UnaryExpression {
  require(k > 0 && mod > 0, s"invalid k=$k mod=$mod")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_poly_fp expects string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = H60.rollingFpEval(input, k, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.H60.rollingFpEval($c, $k, $mod);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_poly_fp"
}
