package graft.expressions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for corpus keys: NFC-compose, then
  * lowercase (root locale), then strip diacritics (NFD + drop
  * combining marks), then collapse whitespace runs and trim.
  *
  * This is the normalization applied before exact/near dedup keys and
  * URL/domain grouping, so "Crème  Brûlée" and "creme brulee" hash
  * identically. One static JVM call per row, inside whole-stage
  * codegen (no UDF wrapper, no per-row Pattern compilation — the
  * patterns are static). The DuckDB oracle mirrors it as
  * `trim(regexp_replace(strip_accents(lower(nfc_normalize(t))), ...))`
  * — the engines agree on NFD-decomposable Latin diacritics, which is
  * the fixture contract (soft-dotted/ligature exotica like ø and ﬁ
  * are mapped by ICU's unaccent but not by NFD, and are excluded).
  */
object TextNormalizeImpl {
  private val CombiningMarks = Pattern.compile("\\p{Mn}+")
  private val WhitespaceRuns = Pattern.compile("\\s+")

  def normalize(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(Locale.ROOT)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val stripped = CombiningMarks.matcher(nfd).replaceAll("")
    val collapsed = WhitespaceRuns.matcher(stripped).replaceAll(" ").trim
    UTF8String.fromString(collapsed)
  }
}

case class TextNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNormalizeImpl.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextNormalizeImpl.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): TextNormalize = copy(child = newChild)
}
