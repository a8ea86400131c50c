package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Batch kernels for the hot per-document array pipelines.
  *
  * Catalyst does no common-subexpression elimination inside higher-order-
  * function lambdas and evaluates lambda bodies on the INTERPRETED path —
  * so `transform(shingles, s => md5(s))` pays interpreted-eval overhead
  * per array element, per row. These expressions replace each whole
  * per-row array pipeline with ONE codegen'd static call running a tight
  * JVM loop: measured 3-10× on the dedup/similarity bench queries.
  *
  * Every kernel is BIT-IDENTICAL to the Column-expression form it
  * replaces (the HOF forms remain as equivalence-test twins), so the
  * DuckDB oracles — which replay the md5/xxhash64 arithmetic in SQL —
  * stay green unchanged.
  */
object BatchKernelUtil {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of an md5 digest as a long — equals
    * `conv(substring(md5(x), 1, 15), 16, 10)`: bytes 0-6 plus the high
    * nibble of byte 7 (60 bits, always non-negative).
    */
  private def hexPrefix15(dig: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (dig(i) & 0xFFL); i += 1 }
    (acc << 4) | ((dig(7) >> 4) & 0xFL)
  }

  /** Hex chars 17-30 (1-based) of an md5 digest as a long — equals
    * `conv(substring(md5(x), 17, 14), 16, 10)`: bytes 8-14 (56 bits).
    */
  private def hexMid14(dig: Array[Byte]): Long = {
    var acc = 0L
    var i = 8
    while (i < 15) { acc = (acc << 8) | (dig(i) & 0xFFL); i += 1 }
    acc
  }

  /** MinHash signature straight from the shingle array: one md5 per
    * shingle seeds the Kirsch-Mitzenmacher family `g_j = h1 + j·h2`;
    * `sig[j] = min over shingles of g_j`. Null shingles are skipped
    * (array_min semantics); an all-null/empty input yields null elements
    * (`array_min(empty) = NULL`). All values < 2^61: no overflow on any
    * engine.
    */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        val h1 = hexPrefix15(dig)
        val h2 = hexMid14(dig)
        var j = 0
        while (j < numHashes) {
          val g = h1 + j * h2
          if (g < mins(j)) mins(j) = g
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes)) // all nulls
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** `array_sort(transform(arr, s => xxhash64(s)))` in one pass: Spark's
    * XXH64 over each string's UTF-8 bytes with the xxhash64 SQL seed (42);
    * a null element hashes to the bare seed, exactly as the XxHash64
    * expression leaves the running hash untouched for null children.
    */
  def xxSortedHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing k-gram hashes in one pass over the text — equals
    * `transform(sequence(1, greatest(len-k+1, 1)),
    *            i => conv(substring(md5(substr(text,i,k)),1,15),16,10))`:
    * character-based substrings (UTF8String.substringSQL, what `substr`
    * compiles to), one md5 each, 60-bit prefix as the hash.
    */
  def kgramHashes(text: UTF8String, k: Int): ArrayData = {
    val len = text.numChars()
    val n = math.max(len - k + 1, 1)
    val out = new Array[Long](n)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      out(i) = hexPrefix15(md.digest(text.substringSQL(i + 1, k).getBytes))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Hashed n-gram feature buckets for DSIR importance scoring
    * ([[graft.textops.Classifier.dsirScore]]): tokenize on ASCII
    * whitespace (the `TextOps.tokens` boundaries — safe on UTF-8,
    * see [[wordKgramXx]]), then emit `md5-fold % nBuckets` for every
    * unigram and every adjacent bigram ("tok1 tok2", digested over
    * the joined BYTES — no joined string ever allocates). Equals
    * `transform(concat(toks, bigrams),
    *   f => pmod(conv(substring(md5(f), 1, 15), 16, 10), B))`
    * bit for bit (the [[graft.util.Sampling.md5Bucket]] fold on
    * each feature string); pinned by an equivalence spec. Output
    * order: unigrams then bigrams — downstream is aggregation, but
    * the equivalence spec pins it anyway.
    */
  def dsirBuckets(text: UTF8String, nBuckets: Int): ArrayData = {
    val nBytes = text.numBytes()
    var starts = new Array[Int](32)
    var ends = new Array[Int](32)
    var n = 0
    var tokStart = -1
    var i = 0
    while (i <= nBytes) {
      val ws = i == nBytes || {
        val b = text.getByte(i); b == 32 || (b >= 9 && b <= 13) }
      if (!ws) { if (tokStart < 0) tokStart = i }
      else if (tokStart >= 0) {
        if (n == starts.length) {
          starts = java.util.Arrays.copyOf(starts, n * 2)
          ends = java.util.Arrays.copyOf(ends, n * 2)
        }
        starts(n) = tokStart; ends(n) = i; n += 1; tokStart = -1
      }
      i += 1
    }
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val md = mdLocal.get()
    val base = text.getBytes
    val out = new Array[Long](n + (if (n >= 2) n - 1 else 0))
    var j = 0
    while (j < n) {
      md.reset()
      md.update(base, starts(j), ends(j) - starts(j))
      out(j) = hexPrefix15(md.digest()) % nBuckets
      j += 1
    }
    j = 0
    while (j < n - 1) {
      md.reset()
      md.update(base, starts(j), ends(j) - starts(j))
      md.update(' '.toByte)
      md.update(base, starts(j + 1), ends(j + 1) - starts(j + 1))
      out(n + j) = hexPrefix15(md.digest()) % nBuckets
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing fingerprint SET of a document in one pass — equals the
    * relational formulation in `TextOps.winnowingViaWindow` (hash every
    * character k-gram via [[kgramHashes]]'s md5-prefix hash, keep the
    * min of each full sliding window of `w` hashes — truncated to the
    * whole array when fewer than `w` k-grams exist — then dedupe),
    * pinned by an equivalence spec. Sliding min is the monotonic-deque
    * algorithm, O(k-grams) amortized; dedup is per-document, which
    * equals the relational DISTINCT because document ids are unique.
    *
    * The point is plan shape, not arithmetic: the windowed form
    * explodes O(chars) rows per document through a (doc)-keyed Window
    * exchange plus a global DISTINCT exchange just to compute a
    * per-document value — this kernel keeps the whole computation
    * inside the scan stage and emits only the final fingerprints.
    */
  def winnowFps(text: UTF8String, k: Int, w: Int): ArrayData = {
    val len = text.numChars()
    val n = math.max(len - k + 1, 1)
    val h = new Array[Long](n)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      h(i) = hexPrefix15(md.digest(text.substringSQL(i + 1, k).getBytes))
      i += 1
    }
    if (n <= w) {
      var m = Long.MaxValue; i = 0
      while (i < n) { if (h(i) < m) m = h(i); i += 1 }
      return UnsafeArrayData.fromPrimitiveArray(Array(m))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](n)
    var head = 0; var tail = 0
    i = 0
    while (i < n) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(h(dq(head)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Distinct word shingles from a token array — equals
    * `array_distinct(when(size < n, array(array_join(toks, " ")))
    *   .otherwise(transform(seq, i => array_join(slice(toks,i+1,n), " "))))`
    * including array_join's skip-nulls rule and array_distinct's
    * first-occurrence order.
    */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val sep = UTF8String.fromString(" ")
    def joinRange(from: Int, until: Int): UTF8String = {
      val parts = new Array[UTF8String](until - from)
      var i = from
      while (i < until) { parts(i - from) = toks.getUTF8String(i); i += 1 }
      UTF8String.concatWs(sep, parts: _*) // skips nulls, like array_join
    }
    if (m < n) return new GenericArrayData(Array[Any](joinRange(0, m)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) { seen.add(joinRange(i, i + n)); i += 1 }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  /** Positional word-k-gram hashes for exact-substring dedup: tokenize
    * on the ASCII whitespace bytes (the same boundaries as
    * [[TextGateStatsUtil.gateStats]] — safe because ASCII whitespace
    * never occurs inside multi-byte UTF-8 sequences), xxhash64 each
    * token in place (no token strings allocate), then fold k
    * consecutive token hashes with an LCG combine. Element i is the
    * hash of tokens i..i+k-1; fewer than k tokens yields an empty
    * array. Two positions collide iff their k token hash sequences
    * collide — the oracle joins on the literal gram STRING, so the
    * 64-bit hash only has to be collision-free on the data, the same
    * contract every hashed candidate generator in this file relies on.
    */
  def wordKgramXx(text: UTF8String, k: Int): ArrayData = {
    val nBytes = text.numBytes()
    var th = new Array[Long](32)
    var n = 0
    var tokStart = -1
    var i = 0
    while (i <= nBytes) {
      val ws = i == nBytes || {
        val b = text.getByte(i); b == 32 || (b >= 9 && b <= 13) }
      if (!ws) { if (tokStart < 0) tokStart = i }
      else if (tokStart >= 0) {
        if (n == th.length) th = java.util.Arrays.copyOf(th, n * 2)
        th(n) = XXH64.hashUnsafeBytes(text.getBaseObject,
          text.getBaseOffset + tokStart, i - tokStart, 42L)
        n += 1
        tokStart = -1
      }
      i += 1
    }
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s <= n - k) {
      var acc = 42L
      var j = 0
      while (j < k) { acc = acc * 6364136223846793005L + th(s + j); j += 1 }
      out(s) = acc
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Positional CHARACTER k-grams, hashed: `out[p]` is the XXH64 of the
    * UTF-8 bytes of the k-CODE-POINT window starting at code point `p`
    * (0-based). The character-granularity twin of [[wordKgramXx]] for
    * Lee-et-al. ExactSubstr dedup: catches verbatim runs that start or
    * end mid-word (templated boilerplate with interpolated values),
    * which word grams structurally miss. Code points — not bytes — so
    * the DuckDB oracle's character-indexed `substr` enumerates the
    * same positions; hashing the raw byte window (no normalization)
    * keeps "exact" exact.
    *
    * One pass to mark code-point starts (a non-continuation byte,
    * `(b & 0xC0) != 0x80`), then one XXH64 per position over the byte
    * range — O(n·k) bytes hashed in the scan stage; text never leaves
    * the scan.
    */
  def charKgramXx(text: UTF8String, k: Int): ArrayData = {
    val nBytes = text.numBytes()
    // byte offsets of each code-point start, plus the end sentinel
    var offs = new Array[Int](math.max(32, nBytes / 2))
    var n = 0
    var i = 0
    while (i < nBytes) {
      if ((text.getByte(i) & 0xC0) != 0x80) {
        if (n == offs.length) offs = java.util.Arrays.copyOf(offs, n * 2)
        offs(n) = i
        n += 1
      }
      i += 1
    }
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    if (n == offs.length) offs = java.util.Arrays.copyOf(offs, n + 1)
    offs(n) = nBytes
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      out(p) = XXH64.hashUnsafeBytes(text.getBaseObject,
        text.getBaseOffset + offs(p), offs(p + k) - offs(p), 42L)
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Cosine similarity of `vec` against every centroid of a literal
    * matrix, in one pass: the vector unpacks once and its norm computes
    * once for ALL centroids. Arithmetic is bit-identical to the expanded
    * `cosinePre(dot(v, cᵢ), norm(v), ‖cᵢ‖)` column form (left-to-right
    * accumulation, min-length truncation, 0.0 when either norm is zero),
    * so the DuckDB oracle that replays that form stays green.
    */
  def centroidSims(vec: ArrayData, cents: Array[Array[Double]],
                   cnorms: Array[Double]): ArrayData = {
    val x = vec.toDoubleArray()
    var vn = 0.0
    var j = 0
    while (j < x.length) { vn += x(j) * x(j); j += 1 }
    vn = math.sqrt(vn)
    val out = new Array[Double](cents.length)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(x.length, c.length)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += x(k) * c(k); k += 1 }
      val nn = vn * cnorms(i)
      out(i) = if (nn == 0.0) 0.0 else acc / nn
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Sign-bit hyperplane signature: bit i set iff
    * `dot(vec, planes(i)) > 0` with the same left-to-right
    * float-widened-to-double accumulation as [[VectorOpsUtil.dotFloat]]
    * (and the DuckDB oracle). One vector unpack serves ALL planes — the
    * expanded form re-unpacked the vector once per plane.
    */
  def hyperplaneSig(vec: ArrayData, planes: Array[Array[Float]]): Long = {
    val x = vec.toFloatArray()
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(x.length, p.length)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += x(j).toDouble * p(j).toDouble; j += 1 }
      if (acc > 0.0) sig |= 1L << i
      i += 1
    }
    sig
  }
}

/** `minhash_sig(shingles, numHashes)` — see [[BatchKernelUtil.minhashSig]]. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.minhashSig($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, numHashes: Int): Column =
    GraftColumnBridge.toColumn(
      new MinHashSigExpr(GraftColumnBridge.toExpression(c), numHashes))
}

/** `xx_sorted_hashes(arr)` — see [[BatchKernelUtil.xxSortedHashes]]. */
case class XxSortedHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xx_sorted_hashes needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.xxSortedHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.xxSortedHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object XxSortedHashesExpr {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(
      new XxSortedHashesExpr(GraftColumnBridge.toExpression(c)))
}

/** `kgram_hashes(text, k)` — see [[BatchKernelUtil.kgramHashes]]. */
case class KgramHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.kgramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.kgramHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KgramHashesExpr {
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      new KgramHashesExpr(GraftColumnBridge.toExpression(c), k))
}

/** `dsir_buckets(text, nBuckets)` — see [[BatchKernelUtil.dsirBuckets]]. */
case class DsirBucketsExpr(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.dsirBuckets(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.dsirBuckets($c, $nBuckets);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirBucketsExpr {
  def apply(c: Column, nBuckets: Int): Column =
    GraftColumnBridge.toColumn(
      new DsirBucketsExpr(GraftColumnBridge.toExpression(c), nBuckets))
}

/** `winnow_fps(text, k, w)` — see [[BatchKernelUtil.winnowFps]]. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")
  require(w > 0, s"w must be positive, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.winnowFps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.winnowFps($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFpsExpr {
  def apply(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.toColumn(
      new WinnowFpsExpr(GraftColumnBridge.toExpression(c), k, w))
}

/** `word_kgram_xx(text, k)` — see [[BatchKernelUtil.wordKgramXx]]. */
case class WordKgramXxExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_kgram_xx needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.wordKgramXx(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.wordKgramXx($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordKgramXxExpr {
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      new WordKgramXxExpr(GraftColumnBridge.toExpression(c), k))
}

/** `char_kgram_xx(text, k)` — see [[BatchKernelUtil.charKgramXx]]. */
case class CharKgramXxExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_kgram_xx needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.charKgramXx(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.charKgramXx($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharKgramXxExpr {
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      new CharKgramXxExpr(GraftColumnBridge.toExpression(c), k))
}

/** `word_shingles(tokens, n)` — see [[BatchKernelUtil.wordShingles]]. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(
      new WordShinglesExpr(GraftColumnBridge.toExpression(c), n))
}

/** `hyperplane_sig(vec)` against a fixed plane matrix — see
  * [[BatchKernelUtil.hyperplaneSig]]. The planes ride along as a node
  * parameter (they are index constants, not data), shipped to generated
  * code via a codegen reference object.
  */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.hyperplaneSig(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.hyperplaneSig($c, $planesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigExpr {
  def apply(c: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.toColumn(
      new HyperplaneSigExpr(GraftColumnBridge.toExpression(c),
        planes.map(_.map(_.toFloat))))
}

/** `centroid_sims(vec)` against a fixed centroid matrix — see
  * [[BatchKernelUtil.centroidSims]]. Centroid norms are folded on the
  * driver with the same left-to-right summation the kernel (and
  * [[VectorOpsUtil]]) uses, so they equal the engine-side `norm`.
  */
case class CentroidSimsExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private lazy val cnorms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"centroid_sims needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BatchKernelUtil.centroidSims(input.asInstanceOf[ArrayData], cents, cnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BatchKernelUtil.centroidSims($c, $centsRef, $normsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidSimsExpr {
  def apply(c: Column, cents: Array[Array[Double]]): Column =
    GraftColumnBridge.toColumn(
      new CentroidSimsExpr(GraftColumnBridge.toExpression(c), cents))
}

/** Product-quantization codebooks: per subspace `m`, a parallel pair of
  * (code ids, centroids). Codes keep their ORIGINAL ids when a Lloyd
  * pass empties a cell (mirroring [[graft.simops.Ivf]]'s survivor
  * semantics), so the arrays may be shorter than K but never renumber.
  */
object PqKernelUtil {

  /** Best (lowest-distance, ties → lowest code id) code for subspace `m`
    * of `x`: squared-L2 against each centroid with left-to-right
    * accumulation; vector elements past `x.length` read as 0.0 (ragged
    * corpora). Returns the INDEX into the books(m) arrays.
    */
  def bestIdx(x: Array[Double], m: Int,
              books: Array[Array[Array[Double]]]): Int = {
    val book = books(m)
    val subDim = if (book.isEmpty) 0 else book(0).length
    val off = m * subDim
    var best = 0
    var bestD = Double.MaxValue
    var k = 0
    while (k < book.length) {
      val c = book(k)
      var acc = 0.0
      var d = 0
      while (d < c.length) {
        val xv = if (off + d < x.length) x(off + d) else 0.0
        val diff = xv - c(d)
        acc += diff * diff
        d += 1
      }
      if (acc < bestD) { bestD = acc; best = k }
      k += 1
    }
    best
  }

  /** All M subspace codes of `vec` as an int array. */
  def pqCodes(vec: ArrayData, codes: Array[Array[Int]],
              books: Array[Array[Array[Double]]]): ArrayData = {
    val x = vec.toDoubleArray()
    val out = new Array[Int](books.length)
    var m = 0
    while (m < books.length) {
      out(m) = codes(m)(bestIdx(x, m, books))
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Total squared reconstruction error of `vec` under its best codes
    * (same argmin as [[pqCodes]], summed across subspaces).
    */
  def pqErr(vec: ArrayData, books: Array[Array[Array[Double]]]): Double = {
    val x = vec.toDoubleArray()
    var total = 0.0
    var m = 0
    while (m < books.length) {
      val book = books(m)
      val subDim = if (book.isEmpty) 0 else book(0).length
      val off = m * subDim
      val c = book(bestIdx(x, m, books))
      var acc = 0.0
      var d = 0
      while (d < c.length) {
        val xv = if (off + d < x.length) x(off + d) else 0.0
        val diff = xv - c(d)
        acc += diff * diff
        d += 1
      }
      total += acc
      m += 1
    }
    total
  }

  /** Assignment for the Lloyd pass: subspace `m`'s best ORIGINAL code id
    * for `vec` under the current books.
    */
  def pqAssign(vec: ArrayData, m: Int, codes: Array[Array[Int]],
               books: Array[Array[Array[Double]]]): Int =
    codes(m)(bestIdx(vec.toDoubleArray(), m, books))
}

/** `pq_codes(vec)` against fixed per-subspace codebooks — one kernel
  * call encodes all M subspaces (argmin squared-L2 per subspace, ties
  * to the lowest code id, mirroring the DuckDB oracle's
  * `ORDER BY d2, code` tiebreak).
  */
case class PqCodesExpr(child: Expression, codes: Array[Array[Int]],
                       books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PqKernelUtil.pqCodes(input.asInstanceOf[ArrayData], codes, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("pqcodes", codes, "int[][]")
    val booksRef = ctx.addReferenceObj("pqbooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernelUtil.pqCodes($c, $codesRef, $booksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodesExpr {
  def apply(c: Column, codes: Array[Array[Int]],
            books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.toColumn(
      new PqCodesExpr(GraftColumnBridge.toExpression(c), codes, books))
}

/** `pq_err(vec)` — total squared reconstruction error under the books'
  * best codes; see [[PqKernelUtil.pqErr]].
  */
case class PqErrExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_err needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PqKernelUtil.pqErr(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqbooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernelUtil.pqErr($c, $booksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqErrExpr {
  def apply(c: Column, books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.toColumn(
      new PqErrExpr(GraftColumnBridge.toExpression(c), books))
}

/** `pq_assign(vec, m)` — Lloyd-pass assignment for one (exploded)
  * subspace index under the current books.
  */
case class PqAssignExpr(left: Expression, right: Expression,
                        codes: Array[Array[Int]],
                        books: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_assign needs (array<double>, int), got $other")
    }

  override def nullSafeEval(vec: Any, m: Any): Any =
    PqKernelUtil.pqAssign(vec.asInstanceOf[ArrayData],
      m.asInstanceOf[Int], codes, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codesRef = ctx.addReferenceObj("pqcodes", codes, "int[][]")
    val booksRef = ctx.addReferenceObj("pqbooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.PqKernelUtil.pqAssign($v, $m, $codesRef, $booksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAssignExpr {
  def apply(v: Column, m: Column, codes: Array[Array[Int]],
            books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.toColumn(
      new PqAssignExpr(GraftColumnBridge.toExpression(v),
        GraftColumnBridge.toExpression(m), codes, books))
}

/** Asymmetric-distance (ADC) kernel for PQ-compressed search: squared
  * L2 between a FULL query vector and a candidate's RECONSTRUCTION
  * (per-subspace codebook centroid for its code). `idx(m)(codeId)`
  * maps original code ids to positions in `books(m)` (codebooks keep
  * original ids when Lloyd empties a cell). Accumulation is
  * left-to-right within each subspace and subspaces sum in order —
  * the same fold as the DuckDB oracle's chained `l2(...) + l2(...)`.
  */
object PqAdcUtil {
  def adc(qv: ArrayData, codes: ArrayData, idx: Array[Array[Int]],
          books: Array[Array[Array[Double]]]): Double = {
    val x = qv.toDoubleArray()
    var total = 0.0
    var m = 0
    while (m < books.length) {
      val book = books(m)
      val subDim = if (book.isEmpty) 0 else book(0).length
      val off = m * subDim
      val c = book(idx(m)(codes.getInt(m)))
      var acc = 0.0
      var d = 0
      while (d < c.length) {
        val xv = if (off + d < x.length) x(off + d) else 0.0
        val diff = xv - c(d)
        acc += diff * diff
        d += 1
      }
      total += acc
      m += 1
    }
    total
  }
}

/** `pq_adc(query_vec, codes)` against fixed codebooks — see
  * [[PqAdcUtil.adc]].
  */
case class PqAdcExpr(left: Expression, right: Expression,
                     idx: Array[Array[Int]],
                     books: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<double>, array<int>), got $other")
    }

  override def nullSafeEval(qv: Any, codes: Any): Any =
    PqAdcUtil.adc(qv.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], idx, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("pqidx", idx, "int[][]")
    val booksRef = ctx.addReferenceObj("pqbooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqAdcUtil.adc($q, $c, $idxRef, $booksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcExpr {
  def apply(qv: Column, codes: Column, idx: Array[Array[Int]],
            books: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.toColumn(
      new PqAdcExpr(GraftColumnBridge.toExpression(qv),
        GraftColumnBridge.toExpression(codes), idx, books))
}

/** One-pass token/char/punct/stopword counts — see
  * [[TextGateStatsUtil.gateStats]].
  */
object TextGateStatsUtil {

  /** Build the lookup set once per expression instance; entries are the
    * dictionary words exactly as given (callers pass lowercase words).
    */
  def buildDict(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def maxBytes(words: Seq[String]): Int =
    if (words.isEmpty) 0
    // 3x slack: membership is tested on the LOWERCASED token, and a
    // Unicode case fold can shrink a code point from 3 bytes to 1
    // (U+212A KELVIN SIGN -> 'k'), so a raw token up to 3x the longest
    // dict entry can still fold into the dict. The prefilter only needs
    // to be sound, not tight — it exists to skip paragraph-length
    // "tokens" (URLs, base64 runs), not to be exact.
    else words.map(w => UTF8String.fromString(w).numBytes()).max * 3

  /** Single byte-scan over the UTF-8 payload computing, together:
    *
    *   - `n_tokens`: maximal runs of non-whitespace bytes, where
    *     whitespace is Java regex `\s` = `[ \t\n\x0B\f\r]` (bytes
    *     9-13 and 32) — exactly `size(filter(split(text, "\\s+"),
    *     t => t != ""))`, because ASCII whitespace bytes never occur
    *     inside multi-byte UTF-8 sequences;
    *   - `n_chars`: code points (bytes that are not 10xxxxxx
    *     continuations) — exactly `length(text)`;
    *   - `n_punct`: bytes in the ASCII ranges `!-/`, `:-@`, `` [-` ``,
    *     `{-~` — exactly `length(regexp_replace(text,
    *     "[^!-/:-@\\[-`{-~]", ""))` (the class is pure ASCII, so code
    *     points and bytes coincide);
    *   - `n_stop`: tokens whose lowercase form (Spark's own
    *     `UTF8String.toLowerCase`, the `lower()` runtime) is in `dict`
    *     — exactly `size(filter(tokens(lower(text)), t =>
    *     array_contains(dict, t)))` for any text where lowercasing
    *     preserves token boundaries (no Unicode lowercase mapping
    *     produces whitespace). Tokens longer than `maxTokBytes` skip
    *     the allocation + lookup entirely.
    *
    * Replaces the two `split` passes, two `regexp_replace` passes and
    * the whole-string `lower` the Column form pays per document —
    * the quality/token/gate family becomes one pass over the bytes.
    */
  def gateStats(text: UTF8String,
                dict: java.util.HashSet[UTF8String],
                maxTokBytes: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val nBytes = text.numBytes()
    var nTok = 0
    var nChars = 0
    var nPunct = 0
    var nStop = 0
    var tokStart = -1
    var i = 0
    while (i < nBytes) {
      val b = text.getByte(i)
      if ((b & 0xC0) != 0x80) nChars += 1
      val ws = b == 32 || (b >= 9 && b <= 13)
      if (!ws) {
        if ((b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
            (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) nPunct += 1
        if (tokStart < 0) tokStart = i
      } else if (tokStart >= 0) {
        nTok += 1
        if (i - tokStart <= maxTokBytes &&
            dictHit(text, tokStart, i - tokStart, dict)) nStop += 1
        tokStart = -1
      }
      i += 1
    }
    if (tokStart >= 0) {
      nTok += 1
      if (nBytes - tokStart <= maxTokBytes &&
          dictHit(text, tokStart, nBytes - tokStart, dict)) nStop += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nChars, nPunct, nStop))
  }

  private def dictHit(text: UTF8String, start: Int, len: Int,
                      dict: java.util.HashSet[UTF8String]): Boolean = {
    val buf = new Array[Byte](len)
    var j = 0
    while (j < len) { buf(j) = text.getByte(start + j); j += 1 }
    dict.contains(UTF8String.fromBytes(buf).toLowerCase)
  }
}

/** `text_gate_stats(text)` — see [[TextGateStatsUtil.gateStats]]. The
  * dictionary rides the expression as a literal parameter (reference
  * object in codegen), so the struct is a pure function of the text and
  * common-subexpression elimination collapses repeated uses inside one
  * projection to a single scan.
  */
case class TextGateStatsExpr(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  @transient private lazy val dictSet = TextGateStatsUtil.buildDict(dict)
  private val maxTokBytes = TextGateStatsUtil.maxBytes(dict)

  override def dataType: DataType = TextGateStatsExpr.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_gate_stats needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextGateStatsUtil.gateStats(input.asInstanceOf[UTF8String], dictSet,
      maxTokBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("gateDict", dictSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextGateStatsUtil.gateStats($c, " +
        s"$dictRef, $maxTokBytes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextGateStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  def apply(c: Column, dict: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      new TextGateStatsExpr(GraftColumnBridge.toExpression(c), dict))
}

/** Word n-gram kernels — see [[WordNgramUtil]]. */
object WordNgramUtil {

  private val sep = UTF8String.fromString(" ")

  private def joinRange(toks: ArrayData, from: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      parts(j) = if (toks.isNullAt(from + j)) null
                 else toks.getUTF8String(from + j)
      j += 1
    }
    UTF8String.concatWs(sep, parts: _*) // skips nulls, like concat_ws
  }

  /** All order-preserving word n-grams (duplicates kept), EMPTY when the
    * doc has fewer than `n` tokens — equals
    * `when(size(toks) >= n, transform(sequence(1, size - n + 1),
    *    i => concat_ws(" ", toks[i], ..., toks[i+n-1]))).otherwise(array())`
    * without the per-element interpreted-lambda cost.
    */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) { out(i) = joinRange(toks, i, n); i += 1 }
    new GenericArrayData(out)
  }

  /** The document's DISTINCT n-gram xxhash64 set in one pass —
    * `array_distinct(transform(word_ngrams(toks, n), g => xxhash64(g)))`
    * (first-occurrence order, Spark's XXH64 seed 42). Exploding this is
    * exactly the `(doc, hash)`-distinct frame the df-style corpus
    * aggregates start from, WITHOUT the corpus-sized distinct exchange:
    * the doc id is in that distinct key, so the dedup is per-document
    * and per-document work belongs in the scan stage, not a shuffle.
    */
  def ngramXxSet(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m - n) {
      val g = joinRange(toks, i, n)
      seen.add(XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset,
        g.numBytes, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `word_ngrams(toks, n)` — see [[WordNgramUtil.wordNgrams]]. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramUtil.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramUtil.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramsExpr {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(
      new WordNgramsExpr(GraftColumnBridge.toExpression(c), n))
}

/** `ngram_xx_set(toks, n)` — see [[WordNgramUtil.ngramXxSet]]. */
case class NgramXxSetExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_xx_set needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramUtil.ngramXxSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramUtil.ngramXxSet($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramXxSetExpr {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.toColumn(
      new NgramXxSetExpr(GraftColumnBridge.toExpression(c), n))
}

/** Per-document word counts — see [[WordCountsUtil.wordCounts]]. */
object WordCountsUtil {

  /** The document's per-token occurrence counts in one pass,
    * first-occurrence order: `array<struct<term, tf>>` equal as an
    * UNORDERED multiset to `groupBy(doc, term).count()` restricted to
    * this doc. Any aggregation whose grouping key contains the document
    * id is per-document work — this moves it into the scan stage, so
    * the exploded output is already (doc, term)-unique and the
    * corpus-sized first shuffle of the tf/df family disappears.
    */
  def wordCounts(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      val prev = counts.get(t)
      counts.put(t, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_counts(toks)` — see [[WordCountsUtil.wordCounts]]. */
case class WordCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_counts needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WordCountsUtil.wordCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordCountsUtil.wordCounts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordCountsExpr {
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(
      new WordCountsExpr(GraftColumnBridge.toExpression(c)))
}

/** Second-level (within-coarse-cell) nearest-sub-centroid assignment for
  * the hierarchical IVF index ([[graft.simops.Ivf]] `fitHier` /
  * [[graft.simops.Embed.semanticDedupHier]]).
  *
  * The flat index's `nlist` argmax is O(nlist·dim) per row, which caps
  * how far `nlist` can grow with the corpus; splitting the index into
  * C = ⌈√nlist⌉ coarse cells × S = ⌈nlist/C⌉ sub-centroids makes the
  * full assignment O((C+S)·dim) = O(√nlist·dim) per row, so nlist can
  * honor the `autoNlist` contract (nlist ∝ corpus size) at any scale.
  *
  * `subCents(coarseId)` is that cell's sub-centroid matrix in ascending
  * local-sub-id order (possibly sparse after Lloyd survivor drops —
  * `subIds(coarseId)` carries the surviving ids); cosine uses the same
  * left-to-right multiply-accumulate fold as
  * [[BatchKernelUtil.centroidSims]] (and the DuckDB oracle's
  * `list_sum(list_transform(...))`), zero-norm → 0.0; strict `>` keeps
  * the FIRST max, so ties break to the lowest surviving sub id —
  * `row_number() OVER (ORDER BY cos DESC, sub_id)` in SQL.
  */
object SubNearestUtil {
  def nearestSub(vec: ArrayData, coarseId: Int,
                 subCents: Array[Array[Array[Double]]],
                 subNorms: Array[Array[Double]],
                 subIds: Array[Array[Int]]): Int = {
    val cents = subCents(coarseId)
    if (cents.isEmpty) return 0
    val x = vec.toDoubleArray()
    var vn = 0.0
    var j = 0
    while (j < x.length) { vn += x(j) * x(j); j += 1 }
    vn = math.sqrt(vn)
    val norms = subNorms(coarseId)
    var best = 0
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(x.length, c.length)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += x(k) * c(k); k += 1 }
      val nn = vn * norms(i)
      val sim = if (nn == 0.0) 0.0 else acc / nn
      if (sim > bestSim) { bestSim = sim; best = i }
      i += 1
    }
    subIds(coarseId)(best)
  }
}

/** `sub_nearest(vec, coarse_id)` against a fixed two-level centroid
  * forest — see [[SubNearestUtil.nearestSub]]. The centroids ride as
  * codegen reference objects (index constants, like
  * [[CentroidSimsExpr]]), so generated-code size stays O(1) no matter
  * how large `nlist` grows.
  */
case class SubNearestExpr(left: Expression, right: Expression,
                          subCents: Array[Array[Array[Double]]],
                          subIds: Array[Array[Int]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private lazy val subNorms: Array[Array[Double]] =
    subCents.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    })

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sub_nearest needs (array<double>, int), got $other")
    }

  override def nullSafeEval(vec: Any, coarse: Any): Any =
    SubNearestUtil.nearestSub(vec.asInstanceOf[ArrayData],
      coarse.asInstanceOf[Int], subCents, subNorms, subIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("subcents", subCents, "double[][][]")
    val normsRef = ctx.addReferenceObj("subnorms", subNorms, "double[][]")
    val idsRef = ctx.addReferenceObj("subids", subIds, "int[][]")
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.SubNearestUtil.nearestSub(" +
        s"$v, $c, $centsRef, $normsRef, $idsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SubNearestExpr {
  def apply(v: Column, coarseId: Column,
            subCents: Array[Array[Array[Double]]],
            subIds: Array[Array[Int]]): Column =
    GraftColumnBridge.toColumn(
      new SubNearestExpr(GraftColumnBridge.toExpression(v),
        GraftColumnBridge.toExpression(coarseId), subCents, subIds))
}

/** `count_below(value, cuts)` — how many elements of `cuts` are
  * STRICTLY below `value`; the range-bucket assignment of
  * [[graft.lagops.EventAnalytics.distributionStats]]. Identical
  * semantics to `size(filter(cuts, c -> value > c))` (NULL elements
  * are not counted, matching the HOF filter's three-valued logic) but
  * as one codegen'd loop instead of an interpreted per-element lambda
  * — the cuts array rides every corpus row, so the lambda overhead is
  * corpus-sized.
  */
object CountBelowUtil {
  def countBelow(value: Double, cuts: ArrayData): Int = {
    var n = 0
    var i = 0
    val len = cuts.numElements()
    while (i < len) {
      if (!cuts.isNullAt(i) && value > cuts.getDouble(i)) n += 1
      i += 1
    }
    n
  }
}

case class CountBelowExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_below needs (double, array<double>), got $other")
    }

  override def nullSafeEval(value: Any, cuts: Any): Any =
    CountBelowUtil.countBelow(value.asInstanceOf[Double],
      cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.CountBelowUtil.countBelow($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountBelowExpr {
  def apply(value: Column, cuts: Column): Column =
    GraftColumnBridge.toColumn(
      new CountBelowExpr(GraftColumnBridge.toExpression(value),
        GraftColumnBridge.toExpression(cuts)))
}

/** `bloom_contains(fp64)` against a fixed membership sketch — the
  * ingest-time prefilter of [[graft.dedup.BloomStore]]. The sketch has
  * NO false negatives, so filtering the broadcast side of the exact
  * verify join to bloom-positives can never change the decision — it
  * only shrinks the broadcast from O(increment) fingerprints to
  * O(dups + fpp·increment). The filter rides as a codegen reference
  * object (index constant, like the centroid forests); evaluation is
  * a handful of hash probes per row, no allocation.
  */
case class BloomContainsExpr(child: Expression,
                             bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains needs bigint, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomContainsExpr {
  def apply(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftColumnBridge.toColumn(
      new BloomContainsExpr(GraftColumnBridge.toExpression(c), bloom))
}

/** Language-ID kernel — see [[LangIdExpr]]. */
object LangIdUtil {

  final class Dict(langs: Seq[(String, Seq[String])]) extends Serializable {
    /** lowercase marker token → bitmask of language indexes (langs are
      * few; an Int mask is plenty). */
    val tokenMask: java.util.HashMap[UTF8String, Integer] = {
      val m = new java.util.HashMap[UTF8String, Integer]()
      langs.zipWithIndex.foreach { case ((_, words), i) =>
        words.foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, Integer.valueOf(
            (if (prev == null) 0 else prev.intValue()) | (1 << i)))
        }
      }
      m
    }
    val langCodes: Array[UTF8String] =
      langs.map(l => UTF8String.fromString(l._1)).toArray
    val und: UTF8String = UTF8String.fromString("und")
    val maxTokBytes: Int =
      if (langs.forall(_._2.isEmpty)) 0
      else langs.flatMap(_._2)
        .map(w => UTF8String.fromString(w).numBytes()).max
  }

  /** One fused pass replacing the per-language Column pipeline
    * `array_max(array(struct(markerHits(text, words_i), lang_i)))`
    * where `markerHits = size(filter(array_distinct(tokens(lower(
    * text))), t => array_contains(dict_i, t)))`:
    *
    *   - lowercase ONCE via `UTF8String.toLowerCase` (the `lower()`
    *     runtime — bit-identical by construction);
    *   - tokenize the lowered bytes by maximal non-`\s` runs (ASCII
    *     whitespace bytes never occur inside multi-byte UTF-8
    *     sequences, so this equals `split(lowered, "\\s+")` minus
    *     empties);
    *   - DISTINCT tokens via a seen-set (array_distinct semantics:
    *     repeated filler counts once per language);
    *   - per distinct token, one map lookup bumps every language whose
    *     dictionary contains it (tokens longer than the longest dict
    *     entry skip the allocation + lookup);
    *   - the winner replays `array_max` over `struct(hits, lang)`
    *     EXACTLY: highest hits, ties to the binary-GREATEST lang code;
    *     zero hits everywhere → "und".
    *
    * The Column form recomputed tokenize+lower+distinct once per
    * LANGUAGE in interpreted HOF lambdas.
    */
  def langId(text: UTF8String, dict: Dict): UTF8String = {
    val lowered = text.toLowerCase
    val n = lowered.numBytes()
    val base = lowered.getBaseObject
    val off = lowered.getBaseOffset
    val hits = new Array[Int](dict.langCodes.length)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      // skip \s run (9-13, 32 — never part of a multi-byte sequence)
      var b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == 32 || (b >= 9 && b <= 13)) { i += 1 }
      else {
        val start = i
        var done = false
        while (!done && i < n) {
          b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
          if (b == 32 || (b >= 9 && b <= 13)) done = true else i += 1
        }
        val len = i - start
        if (len <= dict.maxTokBytes) {
          val t = UTF8String.fromAddress(base, off + start, len)
          if (seen.add(t)) {
            val mask = dict.tokenMask.get(t)
            if (mask != null) {
              var m = mask.intValue()
              var k = 0
              while (m != 0) {
                if ((m & 1) != 0) hits(k) += 1
                m >>>= 1
                k += 1
              }
            }
          }
        }
      }
    }
    var best = -1
    var bestHits = 0
    var k = 0
    while (k < hits.length) {
      if (hits(k) > 0 && (best < 0 || hits(k) > bestHits ||
          (hits(k) == bestHits &&
            dict.langCodes(k).compareTo(dict.langCodes(best)) > 0))) {
        best = k
        bestHits = hits(k)
      }
      k += 1
    }
    if (best < 0) dict.und else dict.langCodes(best)
  }
}

/** `lang_id(text)` — see [[LangIdUtil.langId]]. Bit-identical to the
  * per-language Column pipeline it replaces (LangIdKernelSpec pins
  * equality; the Column form stays as [[graft.textops.TextOps
  * .langIdViaColumns]]).
  */
case class LangIdExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression {

  @transient private lazy val dict = new LangIdUtil.Dict(langs)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id needs a string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    LangIdUtil.langId(input.asInstanceOf[UTF8String], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("langDict", dict,
      "graft.functions.LangIdUtil.Dict")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangIdUtil.langId($c, $dictRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {
  def apply(c: Column, langs: Seq[(String, Seq[String])]): Column =
    GraftColumnBridge.toColumn(
      new LangIdExpr(GraftColumnBridge.toExpression(c), langs))
}
