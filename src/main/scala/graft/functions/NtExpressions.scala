package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String codecs for the N-Triples interchange format (W3C N-Triples
  * 1.1, §2.3 terminals) — one flat JVM loop per row each way, instead
  * of a chain of regexp_replace calls (which cannot express ECHAR
  * unescaping correctly anyway: sequential replaces mis-parse
  * backslash-escaped backslashes followed by `n`).
  */
object NtExpressions {

  /** Literal-mode: ECHAR escape/unescape for STRING_LITERAL_QUOTE
    * bodies (escapes the five `\ " \n \r \t`; unescape additionally
    * accepts the full ECHAR set plus `\uXXXX` / `\UXXXXXXXX` UCHARs).
    *
    * IRI-mode: percent-encodes the characters N-Triples forbids raw
    * inside `<...>` (controls, space, `<>"{}|^` backtick `\ %`);
    * non-ASCII stays raw (IRI-legal). Decode maps `%XX` back. Using a
    * dedicated mode (rather than ECHARs) keeps IRIs grammar-legal for
    * third-party N-Triples parsers.
    */
  case class NtStringCodec(child: Expression, iri: Boolean, decode: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      val out =
        if (iri && decode) iriDecode(s)
        else if (iri) iriEncode(s)
        else if (decode) echarUnescape(s)
        else echarEscape(s)
      UTF8String.fromString(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def echarEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '"'  => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c    => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  private def echarUnescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { b.append(c); i += 1 }
      else {
        require(i + 1 < s.length, s"dangling escape in N-Triples literal: $s")
        s.charAt(i + 1) match {
          case 't'  => b.append('\t'); i += 2
          case 'b'  => b.append('\b'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 'f'  => b.append('\f'); i += 2
          case '"'  => b.append('"'); i += 2
          case '\'' => b.append('\''); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' =>
            require(i + 6 <= s.length, s"truncated \\u escape: $s")
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            require(i + 10 <= s.length, s"truncated \\U escape: $s")
            b.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16))
            i += 10
          case bad => throw new IllegalArgumentException(
            s"bad ECHAR \\$bad in N-Triples literal: $s")
        }
      }
    }
    b.toString
  }

  private def iriUnsafe(c: Char): Boolean =
    c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
      c == '|' || c == '^' || c == '`' || c == '\\' || c == '%'

  private def iriEncode(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (iriUnsafe(c)) b.append(f"%%${c.toInt}%02X")
      else b.append(c)
      i += 1
    }
    b.toString
  }

  private def iriDecode(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        require(i + 3 <= s.length, s"truncated percent escape in IRI: $s")
        b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
