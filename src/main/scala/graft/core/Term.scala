package graft.core

import org.apache.spark.sql.{Column, Row, functions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RDF-term ADT.
  *
  * The reference's database holds triples of arbitrary heterogeneous values
  * (reference `src/grafter/matcha/alpha.clj:54-58`, README:13-16): keywords,
  * URIs, strings, numbers, language-tagged strings, typed RDF literals,
  * dates — and `nil` is a *matchable* value
  * (`test/grafter/matcha/alpha_test.clj:133-138`).
  *
  * Spark columns are monomorphic, so every term is encoded as one struct
  * column `STRUCT<kind: BYTE, lex: STRING, num: DOUBLE, lang: STRING,
  * datatype: STRING>`. Struct equality is field-wise in Spark, which gives
  * us the reference's value-equality joins for free, and `nil` is kind 0 —
  * never SQL NULL. SQL NULL is reserved for *unbound* solution columns
  * produced by `optional` (≙ the reference's reified `_N` fresh vars,
  * alpha.clj:315).
  */
sealed trait Term extends Product with Serializable

object Term {
  /** matcha nil — a legal, matchable term (alpha_test.clj:133-138). */
  case object TNil extends Term
  /** Clojure keyword `:foo/bar` → TKeyword("foo/bar"). */
  final case class TKeyword(name: String) extends Term
  /** java.net.URI (grafter prefixer output). */
  final case class TUri(uri: String) extends Term
  final case class TString(s: String) extends Term
  final case class TLong(v: Long) extends Term
  final case class TDouble(v: Double) extends Term
  final case class TBool(v: Boolean) extends Term
  /** grafter LangString (alpha.clj:32-48 treats it as an opaque value). */
  final case class TLangString(lex: String, lang: String) extends Term
  /** grafter RDFLiteral: lexical form + datatype URI. */
  final case class TTyped(lex: String, datatype: String) extends Term
  /** Dates/timestamps (grafter OffsetDate etc.) as canonical ISO string. */
  final case class TDate(iso: String) extends Term
  /** Arbitrary host value as an opaque term: a type tag + base64 of the
    * value's serialized bytes. The reference accepts *any* host value as
    * a term and unifies by value equality (README:13-16; alpha.clj:54-58
    * destructures anything Indexed); here any value a caller can
    * serialize becomes a term, unifying by byte equality. Construct via
    * [[Term.opaque]] (raw bytes) or [[Term.opaqueOf]] (any
    * java.io.Serializable).
    */
  final case class TOpaque(tag: String, b64: String) extends Term {
    def bytes: Array[Byte] = java.util.Base64.getDecoder.decode(b64)
  }

  /** Opaque term from raw bytes. */
  def opaque(tag: String, bytes: Array[Byte]): TOpaque =
    TOpaque(tag, java.util.Base64.getEncoder.encodeToString(bytes))

  /** Opaque term from any serializable host value (java serialization —
    * deterministic for a fixed classpath; equal values of the same class
    * serialize identically, so unification matches value equality for
    * well-behaved `equals`/`writeObject` pairs).
    */
  def opaqueOf(tag: String, value: java.io.Serializable): TOpaque = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(value)
    oos.close()
    opaque(tag, bos.toByteArray)
  }

  // kind bytes — stable on-wire encoding, do not renumber.
  val KNil: Byte = 0
  val KKeyword: Byte = 1
  val KUri: Byte = 2
  val KString: Byte = 3
  val KLong: Byte = 4
  val KDouble: Byte = 5
  val KBool: Byte = 6
  val KLangString: Byte = 7
  val KTyped: Byte = 8
  val KDate: Byte = 9
  val KOpaque: Byte = 10

  /** The term-struct schema; one of these per triple position. */
  val schema: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("lex", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("datatype", StringType, nullable = true)))

  def toRow(t: Term): Row = t match {
    case TNil                 => Row(KNil, null, null, null, null)
    case TKeyword(n)          => Row(KKeyword, n, null, null, null)
    case TUri(u)              => Row(KUri, u, null, null, null)
    case TString(s)           => Row(KString, s, null, null, null)
    case TLong(v)             => Row(KLong, v.toString, v.toDouble, null, null)
    case TDouble(v)           => Row(KDouble, null, v, null, null)
    case TBool(v)             => Row(KBool, null, if (v) 1.0 else 0.0, null, null)
    case TLangString(lex, lg) => Row(KLangString, lex, null, lg, null)
    case TTyped(lex, dt)      => Row(KTyped, lex, null, null, dt)
    case TDate(iso)           => Row(KDate, iso, null, null, null)
    case TOpaque(tag, b64)    => Row(KOpaque, b64, null, null, tag)
  }

  def fromRow(r: Row): Term = {
    if (r == null) return null // unbound solution column (≙ matcha `_N`)
    val lex = if (r.isNullAt(1)) null else r.getString(1)
    r.getByte(0) match {
      case KNil        => TNil
      case KKeyword    => TKeyword(lex)
      case KUri        => TUri(lex)
      case KString     => TString(lex)
      case KLong       => TLong(lex.toLong) // decode from lex: exact past 2^53
      case KDouble     => TDouble(r.getDouble(2))
      case KBool       => TBool(r.getDouble(2) != 0.0)
      case KLangString => TLangString(lex, r.getString(3))
      case KTyped      => TTyped(lex, r.getString(4))
      case KDate       => TDate(lex)
      case KOpaque     => TOpaque(r.getString(4), lex)
      case k           => throw new IllegalArgumentException(s"bad term kind $k")
    }
  }

  /** A term as a literal struct Column (for ground pattern positions). */
  def lit(t: Term): Column = {
    def s(v: String): Column =
      if (v == null) functions.lit(null).cast(StringType) else functions.lit(v)
    def d(v: java.lang.Double): Column =
      if (v == null) functions.lit(null).cast(DoubleType)
      else functions.lit(v.doubleValue)
    val r = toRow(t)
    struct(
      functions.lit(r.getByte(0)).cast(ByteType).as("kind"),
      s(if (r.isNullAt(1)) null else r.getString(1)).as("lex"),
      d(if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))).as("num"),
      s(if (r.isNullAt(3)) null else r.getString(3)).as("lang"),
      s(if (r.isNullAt(4)) null else r.getString(4)).as("datatype"))
  }

  /** Build a term struct Column from raw column pieces. */
  def mk(kind: Column, lex: Column, num: Column, lang: Column,
         datatype: Column): Column =
    struct(kind.cast(ByteType).as("kind"), lex.cast(StringType).as("lex"),
      num.cast(DoubleType).as("num"), lang.cast(StringType).as("lang"),
      datatype.cast(StringType).as("datatype"))

  private val nullS = org.apache.spark.sql.functions.lit(null).cast(StringType)
  private val nullD = org.apache.spark.sql.functions.lit(null).cast(DoubleType)

  /** Wrap a raw Spark column into a term struct by its data type.
    * Raw NULLs become term-nil (kind 0) — matcha's nil is matchable.
    */
  def fromRaw(c: Column, dt: DataType): Column = {
    val k = functions.lit _
    dt match {
      case StringType =>
        when(c.isNull, lit(TNil))
          .otherwise(mk(k(KString), c, nullD, nullS, nullS))
      case LongType | IntegerType | ShortType =>
        when(c.isNull, lit(TNil))
          .otherwise(mk(k(KLong), c.cast(StringType), c.cast(DoubleType), nullS, nullS))
      case DoubleType | FloatType =>
        when(c.isNull, lit(TNil))
          .otherwise(mk(k(KDouble), nullS, c.cast(DoubleType), nullS, nullS))
      case BooleanType =>
        when(c.isNull, lit(TNil))
          .otherwise(mk(k(KBool), nullS,
            when(c, 1.0).otherwise(0.0), nullS, nullS))
      case TimestampType | TimestampNTZType | DateType =>
        when(c.isNull, lit(TNil))
          .otherwise(mk(k(KDate),
            date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), nullD, nullS, nullS))
      case other =>
        throw new IllegalArgumentException(s"unsupported raw column type $other")
    }
  }

  /** URI term struct from a raw string column (e.g. 'customer/' || key). */
  def uriCol(c: Column): Column = mk(functions.lit(KUri), c, nullD, nullS, nullS)

  /** Canonical string encoding of a term struct, used for oracle parity:
    * `<tag>|<lexical>`. Doubles print with %.2f (the oracle corpus only
    * carries money doubles); longs print integral. The DuckDB oracle SQL
    * builds the same encoding textually — see SparkEntry.
    */
  /** Canonical TOTAL order key over a term struct, as a sortable
    * struct column (Spark orders structs field-by-field): kind first
    * (so the order is kind-grouped like SPARQL §15.1's
    * unbound < everything-else partial order — an UNBOUND/null term
    * sorts before every kind), then the numeric field (the live
    * comparison for numeric kinds; constant null→0 elsewhere), then
    * the lexical/lang/datatype strings as deterministic tie-breaks.
    * Deterministic on both engines of the oracle rig: equal doubles
    * tie-break on the exact lexical, strings compare by binary
    * order. Feed to orderBy/TakeOrdered ([[graft.engine.Projections
    * .modified]]). */
  def sortKey(c: Column): Column = struct(
    coalesce(c.getField("kind"), functions.lit(-1)).as("k"),
    coalesce(c.getField("num"), functions.lit(0.0)).as("n"),
    // int64 tie-break: longs with |v| > 2^53 collide on the double
    // `num` and the raw lexical string mis-orders same-sign values
    // (adjacent huge negatives sort reversed) — the exact int64 from
    // `lex` restores numeric order within the collision class; 0 for
    // every other kind (no effect, they tie and fall to `l`)
    coalesce(when(c.getField("kind") === KLong,
      c.getField("lex").cast(LongType)), functions.lit(0L)).as("i"),
    coalesce(c.getField("lex"), functions.lit("")).as("l"),
    coalesce(c.getField("lang"), functions.lit("")).as("lg"),
    coalesce(c.getField("datatype"), functions.lit("")).as("dt"))

  def encode(c: Column): Column = {
    val kind = c.getField("kind")
    val lex = c.getField("lex")
    val num = c.getField("num")
    when(c.isNull, functions.lit(null).cast(StringType))
      .when(kind === KNil, "n|")
      .when(kind === KKeyword, concat(functions.lit("k|"), lex))
      .when(kind === KUri, concat(functions.lit("u|"), lex))
      .when(kind === KString, concat(functions.lit("s|"), lex))
      .when(kind === KLong, concat(functions.lit("l|"), lex)) // lex is exact past 2^53
      .when(kind === KDouble, concat(functions.lit("d|"), format_string("%.2f", num)))
      .when(kind === KBool, concat(functions.lit("b|"), num.cast(IntegerType).cast(StringType)))
      .when(kind === KLangString,
        concat(functions.lit("ls|"), lex, functions.lit("@"), c.getField("lang")))
      .when(kind === KTyped,
        concat(functions.lit("lit|"), lex, functions.lit("^^"), c.getField("datatype")))
      .when(kind === KDate, concat(functions.lit("t|"), lex))
      .when(kind === KOpaque,
        concat(functions.lit("o|"), c.getField("datatype"), functions.lit("|"), lex))
      // unknown kind must fail loudly, not encode as NULL (which would
      // hash-match another NULL and hide oracle drift)
      .otherwise(raise_error(concat(functions.lit("unknown term kind: "),
        kind.cast(StringType))))
  }
}
