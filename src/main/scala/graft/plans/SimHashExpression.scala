package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash16(text)` — 16-bit SimHash of a whitespace-tokenized text
  * column in ONE pass per row.
  *
  * Bit-identical to the relational formulation in `operators.Dedup`
  * (explode tokens → md5 → 16 per-bit ±1 sums → sign bits): same
  * tokenization (single-space split keeping trailing empties), same token
  * hash (first 8 md5 hex chars as an unsigned 32-bit value), same majority
  * vote. But where the relational form EXPLODES every token into a row and
  * shuffles 16 partial sums per doc through a groupBy, this evaluates inside
  * the scan projection — the signature of a 100 TB corpus costs one narrow
  * pass, no shuffle at all.
  *
  * CodegenFallback: the md5 loop stays an interpreted call inside the
  * surrounding whole-stage-codegen'd projection (the digest dominates; a
  * doGenCode version would save only the call overhead).
  */
case class SimHash16(child: Expression) extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_simhash16"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    // split(" ", -1): trailing empty tokens kept, matching Spark's
    // split(text, ' ') HOF-side tokenization exactly
    val tokens = text.split(" ", -1)
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val digest = md.digest(tokens(t).getBytes("UTF-8"))
      // first 8 hex chars == first 4 digest bytes, as unsigned 32-bit
      val th = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
        ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
      var b = 0
      while (b < 16) {
        if (((th >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}
