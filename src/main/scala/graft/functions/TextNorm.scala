package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd Unicode text normalization — the standard curation
 * front door (CCNet / C4 / FineWeb all normalize before dedup and
 * filtering, because 'Café' and 'Café' must hash identically):
 *
 *   NFC → NFD → strip combining marks (accent fold) → lowercase
 *   (Locale.ROOT — no Turkish-İ surprises) → collapse runs of
 *   whitespace to one space → trim.
 *
 * ONE fused expression instead of a four-function chain: the pipeline
 * materializes the row's text as a Java String at most once, and the
 * pure-ASCII fast path (the overwhelming majority of a web corpus at
 * 100 TB) never allocates a String at all — it folds case and collapses
 * whitespace directly over the UTF-8 bytes and only falls back to
 * `java.text.Normalizer` when a non-ASCII byte appears.
 *
 * The exact pipeline is chosen to be REPLAYABLE in SQL: DuckDB's
 * `trim(regexp_replace(lower(strip_accents(nfc_normalize(s))), '\s+',
 * ' ', 'g'))` computes the identical result (verified over the
 * accent/ligature/case samples the gate uses), which is what makes the
 * t21 gate hash-exact rather than rows-only.
 */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))

  /** Entry point shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) asciiNormalize(s) else unicodeNormalize(s.toString)
  }

  /** ASCII fast path: lowercase + whitespace collapse + trim straight
    * over the bytes — no String, no Normalizer. */
  private def asciiNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
        b == '\f' || b == 0x0B
      if (isWs) {
        if (o > 0) pendingSpace = true // leading whitespace trims away
      } else {
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Full path: NFC, NFD-based accent fold, ROOT lowercase, collapse. */
  private def unicodeNormalize(raw: String): UTF8String = {
    import java.text.Normalizer
    val nfd = Normalizer.normalize(
      Normalizer.normalize(raw, Normalizer.Form.NFC), Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    var pendingSpace = false
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        // the ASCII `\s` class exactly ([ \t\n\x0B\f\r]) — both Java and
        // RE2 regex default to it, so the SQL replay collapses the same
        // runs; Unicode spaces (U+2028, NBSP, ...) pass through on BOTH
        // sides rather than silently diverging
        val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
          c == '\f' || c == 0x0B
        if (isWs) {
          if (sb.length > 0) pendingSpace = true
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
      }
      i += 1
    }
    UTF8String.fromString(
      sb.toString.toLowerCase(java.util.Locale.ROOT))
  }
}
