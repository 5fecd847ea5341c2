package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hashing — the engine's pervasive
  * `cast(conv(substr(md5(x), start, len), 16, 10) as bigint)` idiom as one
  * codegen'd primitive call.
  *
  * Why: the builtin chain materializes, PER ROW (and per array element under
  * `transform`), a 32-char hex string (md5), a len-char substring, and a
  * radix-parsed copy (conv) — three UTF8String allocations and a parse to
  * recover bits the digest already held. These expressions take the first
  * `len` hex digits (≤ 15, so the value is a non-negative long) straight
  * from the digest bytes. Bit-identical to the builtin chain by
  * construction: hex digit i of md5 is nibble i of the digest.
  *
  * [[GramHash]] additionally fuses the k-word gram BUILD into the digest:
  * the `transform(sequence(0, size(ws)-k), i -> md5(concat_ws(' ', ...)))`
  * idiom allocates the joined gram string per window before hashing it;
  * here each window's words stream straight into one reused MessageDigest
  * (separator byte between words), so the only per-window allocation is the
  * output long. concat_ws NULL semantics are preserved (null words
  * contribute neither bytes nor a separator). The DuckDB oracle keeps the
  * string-built form — the two engines stay independent formulations.
  */
object Md5Hash {
  private val tlMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Value of hex digits [start, start+len) (1-based) of the digest — for
    * len ≤ 15 exactly `cast(conv(substr(hex, start, len), 16, 10) as
    * bigint)` (always non-negative); len = 16 is the full-64-bit key mode
    * (the signed view of the same bits as the 16-hex string prefix — a
    * bijection, used only as a join/distinct key, never as a magnitude).
    */
  def prefixLong(digest: Array[Byte], start: Int, len: Int): Long = {
    var v = 0L
    var i = start - 1
    val end = start - 1 + len
    while (i < end) {
      val b = digest(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  def hashUtf8(s: UTF8String, start: Int, len: Int): Long = {
    val md = tlMd.get()
    md.reset()
    md.update(s.getBytes)
    prefixLong(md.digest(), start, len)
  }

  def hashBinary(b: Array[Byte], start: Int, len: Int): Long = {
    val md = tlMd.get()
    md.reset()
    md.update(b)
    prefixLong(md.digest(), start, len)
  }

  private val Sep = ' '.toByte

  /** All k-word window gram hashes of `ws` in order — md5 of the
    * space-joined window words (concat_ws semantics: nulls skipped), first
    * `len` hex digits as long. Fewer than k words → empty array.
    */
  def gramHash(ws: ArrayData, k: Int, len: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    val md = tlMd.get()
    var i = 0
    while (i <= n - k) {
      md.reset()
      var wrote = false
      var j = 0
      while (j < k) {
        if (!ws.isNullAt(i + j)) {
          if (wrote) md.update(Sep)
          md.update(ws.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      out(i) = prefixLong(md.digest(), 1, len)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `graft_md5_long(x, start, len)`: the first-len-hex-digits-of-md5 long —
  * bit-identical to `cast(conv(substr(md5(x), start, len), 16, 10) as
  * bigint)` for string or binary `x`, without the hex/substr/conv string
  * churn. `start`/`len` are foldable; len ≤ 15 keeps the value a
  * non-negative long (the same bound the conv idiom relies on).
  */
case class Md5PrefixLong(child: Expression, start: Int, len: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType
        if start >= 1 && len >= 1 && len <= 16 && start + len - 1 <= 32 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType | BinaryType =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_long requires 1 <= start, 1 <= len <= 16, start+len-1 <= 32; " +
          s"got start=$start len=$len")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_long expects string or binary input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long"

  private def isBinary = child.dataType == BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) Md5Hash.hashBinary(input.asInstanceOf[Array[Byte]], start, len)
    else Md5Hash.hashUtf8(input.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5Hash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val call = if (isBinary) "hashBinary" else "hashUtf8"
    defineCodeGen(ctx, ev, c => s"$helper.$call($c, $start, $len)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_gram_hash(ws, k, len)`: every k-word window of `ws` hashed to its
  * md5-prefix long in window order — the fused form of
  * `transform(sequence(0, size(ws)-k), i ->
  *   cast(conv(substr(md5(concat_ws(' ', element_at(ws, i+1), ...)), 1, len),
  *     16, 10) as bigint))`
  * (guarded empty for size < k, exactly like the guarded idiom it replaces).
  */
case class GramHash(child: Expression, k: Int, len: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && len >= 1 && len <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_gram_hash requires k >= 1 and 1 <= len <= 16; got k=$k len=$len")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_gram_hash expects array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hash"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.gramHash(input.asInstanceOf[ArrayData], k, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5Hash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$helper.gramHash($c, $k, $len)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
