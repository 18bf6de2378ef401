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
    * IRI-mode: UCHAR-escapes (backslash-u) exactly the characters the
    * IRIREF terminal forbids raw inside `<...>` (controls, space,
    * `<>"{}|^` backtick, backslash); everything else — non-ASCII and
    * `%` included — stays raw. Decode is the exact inverse: UCHAR
    * unescape only, any other backslash fails loudly (IRIREF admits no
    * other backslash form). Percent sequences pass through VERBATIM in
    * both directions: per RFC 3987 a percent-escape like `%2F` or a
    * multi-byte `%C3%A9` is part of the IRI's identity, so an imported
    * public dump re-exports byte-identical instead of silently
    * collapsing `<http://ex/a%2Fb>` to `http://ex/a/b` or decoding
    * UTF-8 escapes bytewise into mojibake. UCHAR (not percent) as the
    * escape channel is what makes encode/decode unambiguous inverses —
    * a raw backslash cannot occur in a grammar-legal IRIREF, while a
    * raw `%` can. Output stays grammar-legal for third-party parsers.
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

  private[graft] def echarEscape(s: String): String = {
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

  private[graft] def echarUnescape(s: String): String = {
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

  /** Characters the IRIREF terminal forbids raw (N-Triples 1.1 §2.3):
    * `[^#x00-#x20<>"{}|^`\]`. `%` is NOT here — it is grammar-legal raw
    * and semantically reserved (RFC 3987 identity), so it never takes
    * part in escaping. */
  private def iriForbidden(c: Char): Boolean =
    c <= ' ' || c == '<' || c == '>' || c == '"' || c == '{' || c == '}' ||
      c == '|' || c == '^' || c == '`' || c == '\\'

  private[graft] def iriEncode(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (iriForbidden(c)) b.append(f"\\u${c.toInt}%04X")
      else b.append(c)
      i += 1
    }
    b.toString
  }

  private[graft] def iriDecode(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') {
        // UCHAR — the only backslash form the IRIREF terminal admits
        require(i + 1 < s.length, s"dangling escape in IRI: $s")
        s.charAt(i + 1) match {
          case 'u' =>
            require(i + 6 <= s.length, s"truncated \\u escape in IRI: $s")
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' =>
            require(i + 10 <= s.length, s"truncated \\U escape in IRI: $s")
            b.appendCodePoint(Integer.parseInt(s.substring(i + 2, i + 10), 16))
            i += 10
          case bad => throw new IllegalArgumentException(
            s"bad escape \\$bad in IRI (IRIREF admits only \\u/\\U): $s")
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
