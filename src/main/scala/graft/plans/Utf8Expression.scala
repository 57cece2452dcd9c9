package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StructField, StructType}

/** `graft_utf8_stats(bytes)` — REAL UTF-8 validation in ONE pass per row:
  * the full well-formedness table from the Unicode standard (RFC 3629),
  * hand-rolled — not `new String(bytes, UTF_8)` (which silently
  * substitutes U+FFFD and can't count what it repaired). Returns
  * `STRUCT<n_valid_chars, n_invalid_bytes, n_multibyte, n_control,
  * is_valid>` — the byte-level text-QA signals a crawl pipeline gates on
  * (mojibake rate, truncated-encoding rate, control-char noise) before
  * any tokenizer sees the data.
  *
  * The validator enforces the REAL boundary conditions, not just the
  * bit-pattern shapes: overlong encodings rejected (C0/C1 and the
  * E0/F0 low-continuation ranges), UTF-16 surrogates rejected
  * (ED A0-BF), code points above U+10FFFF rejected (F4 90+, F5-FF).
  * On an invalid byte it counts ONE invalid byte and resynchronizes at
  * the next byte — the standard replacement policy, so a corrupt run's
  * length is measured, not amplified. `n_control` counts C0 controls
  * except TAB/LF/CR, plus DEL — the "binary junk in my text column"
  * signal. Narrow codegen'd scan stage; no shuffle.
  */
case class Utf8Stats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_utf8_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_valid_chars", LongType, nullable = false),
    StructField("n_invalid_bytes", LongType, nullable = false),
    StructField("n_multibyte", LongType, nullable = false),
    StructField("n_control", LongType, nullable = false),
    StructField("is_valid", BooleanType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = Utf8Impl.stats(input.asInstanceOf[Array[Byte]])
    InternalRow(s.validChars, s.invalidBytes, s.multibyte, s.control,
      s.invalidBytes == 0L)
  }

  override protected def withNewChildInternal(newChild: Expression): Utf8Stats =
    copy(child = newChild)
}

private[graft] object Utf8Impl {

  case class Stats(validChars: Long, invalidBytes: Long, multibyte: Long,
                   control: Long)

  def stats(bytes: Array[Byte]): Stats = {
    var valid = 0L; var invalid = 0L; var multi = 0L; var control = 0L
    var i = 0
    val n = bytes.length
    def cont(off: Int): Boolean =
      off < n && (bytes(off) & 0xc0) == 0x80
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        valid += 1
        if ((b < 0x20 && b != 0x09 && b != 0x0a && b != 0x0d) || b == 0x7f)
          control += 1
        i += 1
      } else if (b >= 0xc2 && b <= 0xdf) {
        if (cont(i + 1)) { valid += 1; multi += 1; i += 2 }
        else { invalid += 1; i += 1 }
      } else if (b == 0xe0) {
        // low continuations would be overlong: first must be A0-BF
        if (i + 1 < n && (bytes(i + 1) & 0xff) >= 0xa0 &&
            (bytes(i + 1) & 0xff) <= 0xbf && cont(i + 2)) {
          valid += 1; multi += 1; i += 3
        } else { invalid += 1; i += 1 }
      } else if (b >= 0xe1 && b <= 0xec) {
        if (cont(i + 1) && cont(i + 2)) { valid += 1; multi += 1; i += 3 }
        else { invalid += 1; i += 1 }
      } else if (b == 0xed) {
        // 80-9F only: A0-BF would encode UTF-16 surrogates
        if (i + 1 < n && (bytes(i + 1) & 0xff) >= 0x80 &&
            (bytes(i + 1) & 0xff) <= 0x9f && cont(i + 2)) {
          valid += 1; multi += 1; i += 3
        } else { invalid += 1; i += 1 }
      } else if (b == 0xee || b == 0xef) {
        if (cont(i + 1) && cont(i + 2)) { valid += 1; multi += 1; i += 3 }
        else { invalid += 1; i += 1 }
      } else if (b == 0xf0) {
        // 90-BF: 80-8F would be overlong
        if (i + 1 < n && (bytes(i + 1) & 0xff) >= 0x90 &&
            (bytes(i + 1) & 0xff) <= 0xbf && cont(i + 2) && cont(i + 3)) {
          valid += 1; multi += 1; i += 4
        } else { invalid += 1; i += 1 }
      } else if (b >= 0xf1 && b <= 0xf3) {
        if (cont(i + 1) && cont(i + 2) && cont(i + 3)) {
          valid += 1; multi += 1; i += 4
        } else { invalid += 1; i += 1 }
      } else if (b == 0xf4) {
        // 80-8F only: 90+ exceeds U+10FFFF
        if (i + 1 < n && (bytes(i + 1) & 0xff) >= 0x80 &&
            (bytes(i + 1) & 0xff) <= 0x8f && cont(i + 2) && cont(i + 3)) {
          valid += 1; multi += 1; i += 4
        } else { invalid += 1; i += 1 }
      } else {
        // 0x80-0xC1 (lone continuation / overlong lead), 0xF5-0xFF
        invalid += 1
        i += 1
      }
    }
    Stats(valid, invalid, multi, control)
  }
}
