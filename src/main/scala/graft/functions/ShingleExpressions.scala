package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static eval helpers for the shingle-family expressions — a
  * top-level object without a companion class so scalac emits true
  * static forwarders callable from generated Java (the Md5Hash rule).
  *
  * Why these exist (optimization r16, guide §1.2 step 2 "per-task
  * work"): the composable shingle stage —
  *
  *   transform(sequence(0, …), i -> md5_words(array_join(slice(tk, i+1, L), ' ')))
  *
  * — evaluates OUTSIDE whole-stage codegen: `transform` is a
  * HigherOrderFunction (interpreted per-element lambda dispatch), and
  * each element pays a `slice` ArrayData allocation plus an
  * `array_join` UTF8String build before the digest. At ~500 shingles
  * per document that interpreted per-element overhead was the single
  * largest CPU line left in the suite after r16's md5_words landed
  * (text_ngram_jaccard 33 executor-CPU-s, dedup family ~90 s
  * aggregate). [[ShingleHash.words]] does the whole per-document stage
  * in one codegen-reachable call: token bytes are materialized ONCE
  * per document (each token is reused by up to L shingles), each
  * shingle digests token bytes + ' ' separators directly off those
  * arrays (byte-identical to md5(array_join(slice(...), ' ')) — md5 of
  * a UTF-8 string is md5 of its bytes, and the join's bytes are
  * exactly tokens interleaved with 0x20), and no intermediate string
  * or sliced array is ever allocated.
  *
  * [[ShingleHash.minhashSigs]] collapses the 12-expression signature
  * stage — array_min(transform(hs, h -> (h[0] + k*h[1]) % 2^32)) per
  * k — into one pass over the shingle-word array (12 interpreted
  * transforms → one tight loop). Values are bit-identical: same
  * Kirsch–Mitzenmacher g_k = (h1 + k·h2) mod 2^32 in exact long
  * arithmetic (max h1 + 11·h2 < 12·2^32 ≪ 2^63, and both words are
  * non-negative, so Java % == the SQL % it replaces).
  */
object ShingleHash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val Space = ' '.toByte

  /** The [h1, h2] md5 words of every length-L token shingle of `tk`,
    * start positions 0 .. min(max(n-L, 0), maxStarts-1) — exactly the
    * transform(sequence(...)) form's bounds (always ≥ 1 start: a
    * shorter-than-L document yields one shingle of all its tokens,
    * an empty array one empty-string shingle). Null tokens are
    * skipped with their separators collapsed, mirroring array_join. */
  def words(tk: ArrayData, shingleLen: Int, maxStarts: Int): ArrayData = {
    val n = tk.numElements()
    val nStarts = math.min(math.max(n - shingleLen, 0), maxStarts - 1) + 1
    // token bytes once per document — each token is re-digested by up
    // to shingleLen shingles, so this is the amortization that pays
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!tk.isNullAt(i)) toks(i) = tk.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val out = new Array[ArrayData](nStarts)
    var s = 0
    while (s < nStarts) {
      d.reset()
      val end = math.min(s + shingleLen, n)
      var j = s
      var first = true
      while (j < end) {
        if (toks(j) != null) {
          if (!first) d.update(Space)
          d.update(toks(j))
          first = false
        }
        j += 1
      }
      out(s) = twoWords(d.digest())
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Same shingles, each packed into ONE long (h1 << 32) | h2 — a
    * bijection of the word pair (both words are 32-bit), so equality
    * joins on the packed key match exactly the joins on (h1, h2) —
    * while shuffling 8 key bytes instead of 16 (or 32-char hex). */
  def keys(tk: ArrayData, shingleLen: Int, maxStarts: Int): ArrayData = {
    val n = tk.numElements()
    val nStarts = math.min(math.max(n - shingleLen, 0), maxStarts - 1) + 1
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!tk.isNullAt(i)) toks(i) = tk.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val out = new Array[Long](nStarts)
    var s = 0
    while (s < nStarts) {
      d.reset()
      val end = math.min(s + shingleLen, n)
      var j = s
      var first = true
      while (j < end) {
        if (toks(j) != null) {
          if (!first) d.update(Space)
          d.update(toks(j))
          first = false
        }
        j += 1
      }
      val g = d.digest()
      out(s) = (word(g, 0) << 32) | word(g, 4)
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** The k = 0 .. numHashes-1 minhash signature over a shingle-word
    * array (elements [h1, h2]): min over shingles of
    * (h1 + k·h2) % mod, one pass. Empty input → empty array (the
    * composable array_min form returned SQL NULL per element and this
    * form's getItem on the empty array returns NULL too, so consumers
    * see identical values; in practice [[words]] never emits an empty
    * array). */
  def minhashSigs(hs: ArrayData, numHashes: Int, mod: Long): ArrayData = {
    val n = hs.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val w = hs.getArray(i)
      val h1 = w.getLong(0)
      val h2 = w.getLong(1)
      var k = 0
      while (k < numHashes) {
        val g = (h1 + k * h2) % mod
        if (g < mins(k)) mins(k) = g
        k += 1
      }
      i += 1
    }
    if (n == 0) org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.empty[Long])
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  private def twoWords(g: Array[Byte]): ArrayData = {
    val h1 = word(g, 0)
    val h2 = word(g, 4)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(h1, h2))
  }

  private def word(g: Array[Byte], off: Int): Long =
    ((g(off) & 0xffL) << 24) | ((g(off + 1) & 0xffL) << 16) |
      ((g(off + 2) & 0xffL) << 8) | (g(off + 3) & 0xffL)
}

/** `shingle_words(tk, L, maxStarts)` → ARRAY<ARRAY<BIGINT>>: the
  * [h1, h2] md5 words of every L-token shingle — the codegen'd
  * drop-in for transform(sequence(...), i -> md5_words(array_join(
  * slice(tk, i+1, L), ' '))). Bit-identical values (spec-pinned in
  * VectorOpsSpec), so every consumer keeps its DuckDB oracle. */
case class ShingleWords(child: Expression, shingleLen: Int, maxStarts: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "shingle_words"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def nullSafeEval(tk: Any): Any =
    ShingleHash.words(tk.asInstanceOf[ArrayData], shingleLen, maxStarts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.words($c, $shingleLen, $maxStarts)")

  override protected def withNewChildInternal(newChild: Expression): ShingleWords =
    copy(child = newChild)
}

/** `shingle_keys(tk, L, maxStarts)` → ARRAY<BIGINT>: the same shingles
  * as [[ShingleWords]], each packed (h1 << 32) | h2 — for consumers
  * that only ever test shingle EQUALITY (n-gram membership joins),
  * where one 8-byte key halves the shuffle vs the word pair and
  * replaces the 32-char md5 hex string the decontamination family
  * used to key on. */
case class ShingleKeys(child: Expression, shingleLen: Int, maxStarts: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def nullSafeEval(tk: Any): Any =
    ShingleHash.keys(tk.asInstanceOf[ArrayData], shingleLen, maxStarts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.keys($c, $shingleLen, $maxStarts)")

  override protected def withNewChildInternal(newChild: Expression): ShingleKeys =
    copy(child = newChild)
}

/** `minhash_sigs(hs, numHashes, mod)` → ARRAY<BIGINT>: the full
  * minhash signature in one pass over the shingle-word array —
  * replaces numHashes separate array_min(transform(...)) expressions
  * (each an interpreted per-element lambda over ~500 words). */
case class MinhashSigs(child: Expression, numHashes: Int, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<array<bigint>> input, got ${other.simpleString}")
  }

  override def nullSafeEval(hs: Any): Any =
    ShingleHash.minhashSigs(hs.asInstanceOf[ArrayData], numHashes, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHash.minhashSigs($c, $numHashes, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}
