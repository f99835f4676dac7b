package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native codegen'd
  * expression — the canonicalization step every tokenizer pipeline needs
  * before hashing, deduplicating, or learning a vocabulary: visually
  * identical strings with different code-point sequences ("café" composed
  * vs decomposed; "ﬁ" vs "fi" under compatibility forms) must collide, not
  * fork vocabulary entries. SentencePiece normalizes NFKC for exactly this
  * reason (Kudo & Richardson 2018 §2).
  *
  * Spark has no builtin for this; a Scala UDF would break whole-stage
  * codegen on the hot tokenize path, so like [[SequenceRatio]] the codegen
  * emits a static call into one audited JVM implementation
  * (`java.text.Normalizer`, Unicode 15 tables in Java 17).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString(",")}, got $form")

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_${form.toLowerCase(java.util.Locale.ROOT)}"

  // resolved ONCE per expression instance / per generated class — the enum
  // lookup must not run per row on the hot tokenize path
  @transient private lazy val resolvedForm = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalizeUTF8(s.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.UnicodeNormalize.normalizeUTF8($s, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Codegen entry point — interpreted eval routes through it too (with
    * the Form constant embedded directly in the generated code). Already-
    * normalized strings (the overwhelmingly common case for web text) are
    * detected by `isNormalized`'s quick-check pass without allocating.
    */
  def normalizeUTF8(s: UTF8String, f: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
