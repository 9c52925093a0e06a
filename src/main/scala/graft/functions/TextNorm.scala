package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization:
  * `graft_nfc(str)` == java.text.Normalizer.normalize(str, NFC).
  *
  * Spark ships no normalization function, and a Scala UDF here would
  * sit un-codegen'd on every document of a 100 TB text-cleanup pass —
  * the same altitude argument as [[PolyHash]]. NFC is the canonical
  * composition form every dedup/fingerprint pass should run FIRST:
  * without it, "café" spelled e+U+0301 and é hash to different
  * shingles and near-identical docs silently survive dedup.
  *
  * Determinism note for the oracle: NFC is a Unicode-standard
  * algorithm, so the JDK (ICU tables) and DuckDB (utf8proc) agree on
  * every input; the t11 query pins parity against `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects STRING, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. An
    * already-normalized string (the overwhelmingly common case — all
    * ASCII text is NFC) returns the INPUT UTF8String: zero copies,
    * `isNormalized` is a single forward scan. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
