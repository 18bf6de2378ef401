package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text/hash expressions for the dedup hot paths. Each replaces a chain
  * of higher-order functions (interpreted lambda frame per element)
  * with one flat JVM loop per row.
  */
object TextExpressions {

  /** Distinct word n-gram shingles from a token array, in one pass.
    * Fewer than n tokens → a single shingle of all tokens (same
    * semantics as the transform/slice/array_join formulation and the
    * SQL oracle).
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val space = UTF8String.fromString(" ")
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val count = math.max(1, m - n + 1)
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      i = 0
      while (i < count) {
        val upper = math.min(i + n, m)
        val parts = new Array[UTF8String](upper - i)
        var j = i
        while (j < upper) { parts(j - i) = toks(j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a token array in one pass — no explode, no
    * shuffle: per token a 64-bit hash, ±1 vote per bit, sign of the
    * vote sets the bit.
    *
    * Two hash modes, same banding/verify pipeline downstream:
    *  - default: XXH64 (seed 42, matching Spark's xxhash64) — fastest;
    *  - `useMd5`: first 8 md5 bytes big-endian — ~2× slower per token
    *    but exactly reproducible in ANSI SQL (`md5` + hex-nibble
    *    arithmetic), so fingerprints can be verified by an external
    *    SQL oracle.
    */
  case class SimHash64(child: Expression, useMd5: Boolean = false)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      val md = if (useMd5) mdTL.get() else null
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getUTF8String(i)
        val h =
          if (useMd5) {
            val d = md.digest(s.getBytes)
            ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
              ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
              ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
              ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          } else
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fused MinHash signature + LSH banding in one pass: compute the
    * `perms` signature minima, then hash each of the `bands` groups of
    * perms/bands adjacent minima (XXH64-chained, band index as seed).
    * One expression evaluation per row — composing the signature and
    * banding as separate column expressions re-evaluates the signature
    * once per band (expression trees have no common-subexpression
    * elimination inside higher-order lambdas).
    */
  case class MinHashBandHashes(child: Expression, perms: Int, bands: Int)
      extends UnaryExpression with CodegenFallback {
    require(perms % bands == 0, "perms must divide evenly into bands")
    private val rowsPerBand = perms / bands
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val sig = new Array[Long](perms)
      java.util.Arrays.fill(sig, Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var p = 0
        while (p < perms) {
          val h = XXH64.hashUnsafeBytes(base, off, len, p)
          if (h < sig(p)) sig(p) = h
          p += 1
        }
        i += 1
      }
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = b.toLong
        var k = b * rowsPerBand
        while (k < (b + 1) * rowsPerBand) { h = XXH64.hashLong(sig(k), h); k += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Positional fixed-window token chunks: chunk i = tokens
    * [i·stride, i·stride+size) joined by spaces, ceil(m/stride) chunks
    * (≥ 1 — a 0/1-token doc yields one chunk), in order and
    * non-distinct (posexplode downstream needs the positions).
    * Replaces the transform(sequence, array_join(slice(words…)))
    * formulation whose lambda re-evaluated the captured `split(text)`
    * per chunk (interpreted HOFs have no CSE — the winnowing O(L²)
    * class): here the tokenization child evaluates ONCE per row.
    */
  case class WordChunks(child: Expression, size: Int, stride: Int)
      extends UnaryExpression with CodegenFallback {
    require(size > 0 && stride > 0, "size and stride must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val space = UTF8String.fromString(" ")
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val nChunks = math.max(1, ((m + stride - 1) / stride))
      val out = new Array[AnyRef](nChunks)
      var i = 0
      while (i < nChunks) {
        val start = i * stride
        val upper = math.min(start + size, m)
        val parts = new Array[UTF8String](math.max(0, upper - start))
        var j = start
        while (j < upper) { parts(j - start) = arr.getUTF8String(j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wordChunks(tokens: Column, size: Int, stride: Int): Column =
    GraftSqlBridge.column(
      WordChunks(GraftSqlBridge.expression(tokens), size, stride))

  /** Winnowing fingerprint (Schleimer et al. 2003) in ONE pass: md5 of
    * every k-char gram, sliding-window minimum over w grams, then
    * distinct+sort+join. Semantics bit-identical to the
    * transform/sequence/array_min column formulation (and the SQL
    * oracle) — but that formulation names the gram-hash array inside
    * the window lambda, and interpreted higher-order functions
    * re-evaluate shared subtrees PER ELEMENT, turning O(L) md5s into
    * O(L²): the sf1 gate measured a single document batch pinning one
    * core for minutes. Here each gram hashes exactly once.
    */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && w > 0, "gram size and window must be positive")
    override def dataType: DataType = StringType
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private val hexDigits = "0123456789abcdef".toCharArray
    override protected def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String]
      val md = mdTL.get()
      val nGrams = math.max(1, s.numChars() - k + 1)
      val hashes = new Array[String](nGrams)
      var i = 0
      while (i < nGrams) {
        // substringSQL = the substr() column semantics (1-based, clamped)
        val d = md.digest(s.substringSQL(i + 1, k).getBytes)
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
          hex(2 * b + 1) = hexDigits(d(b) & 0xf)
          b += 1
        }
        hashes(i) = new String(hex)
        i += 1
      }
      // md5 hex is fixed-length ASCII: String order == UTF8String order
      val nWins = math.max(1, nGrams - w + 1)
      val seen = new java.util.TreeSet[String]()
      var j = 0
      while (j < nWins) {
        var min = hashes(j)
        var t = j + 1
        val upper = math.min(j + w, nGrams)
        while (t < upper) {
          if (hashes(t).compareTo(min) < 0) min = hashes(t)
          t += 1
        }
        seen.add(min)
        j += 1
      }
      val sb = new java.lang.StringBuilder(seen.size * 33)
      val it = seen.iterator()
      while (it.hasNext) {
        if (sb.length > 0) sb.append('~')
        sb.append(it.next())
      }
      UTF8String.fromString(sb.toString)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** md5 hex of EVERY n-token window of a token array, in position
    * order: element i = md5 of tokens i..i+n−1 joined by one space, so
    * `posexplode` of the result yields (window start, hash) directly.
    * Fewer than n tokens → empty array (a doc too short to hold one
    * window has no substring-dedup surface). Unlike [[WordShingles]]
    * this keeps EVERY occurrence (no distinct) — position identity is
    * the point. One flat loop, one md5 per window; md5 so the SQL
    * oracle replays the keys bit-for-bit.
    */
  case class WordWindowHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n > 0, "window must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    private val space = UTF8String.fromString(" ")
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private val hexDigits = "0123456789abcdef".toCharArray
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n) return new GenericArrayData(new Array[AnyRef](0))
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val md = mdTL.get()
      val out = new Array[AnyRef](m - n + 1)
      i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        val d = md.digest(UTF8String.concatWs(space, parts: _*).getBytes)
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
          hex(2 * b + 1) = hexDigits(d(b) & 0xf)
          b += 1
        }
        out(i) = UTF8String.fromString(new String(hex))
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** fastText-shaped hashed n-gram linear score in ONE loop over the
    * token array: every unigram and adjacent bigram hashes into a
    * weight bucket (first 32 md5 bits mod `weights.length` — the same
    * md5u32 rule the sampling ops use, so DuckDB replays the bucket
    * arithmetic bit-for-bit) and the row's score is the plain integer
    * sum of the bucket weights. Weights are trained once (bounded by
    * the bucket count) and embedded in the expression, so scoring is a
    * zero-shuffle scan projection — the shape a 100 TB quality filter
    * needs.
    */
  case class HashedNgramScore(child: Expression, weights: Array[Long])
      extends UnaryExpression with CodegenFallback {
    require(weights.nonEmpty, "need at least one weight bucket")
    override def dataType: DataType = LongType
    private val space = UTF8String.fromString(" ")
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    private def bucket(md: java.security.MessageDigest, s: UTF8String): Int = {
      val d = md.digest(s.getBytes)
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (u32 % weights.length).toInt
    }
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val md = mdTL.get()
      var score = 0L
      var i = 0
      while (i < m) {
        val t = arr.getUTF8String(i)
        score += weights(bucket(md, t))
        if (i + 1 < m)
          score += weights(bucket(md,
            UTF8String.concatWs(space, t, arr.getUTF8String(i + 1))))
        i += 1
      }
      score
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Rendezvous (HRW) shard argmax in ONE loop: weight(s) = the first
    * 32 md5 bits of "id#s" (unsigned), winner = max weight, ties to
    * the HIGHER shard index — exactly the column formulation
    * element_at(array_sort(array(struct(md5Prefix32, s)…)), shards)
    * and the SQL oracle's argmax. The column form paid an O(shards·
    * log shards) per-row struct sort on top of the md5s (87 s for
    * 100k rows at 1024 shards); the loop is the md5s alone. */
  case class HrwShard(child: Expression, shards: Int)
      extends UnaryExpression with CodegenFallback {
    require(shards > 0, "need at least one shard")
    override def dataType: DataType = IntegerType
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    @transient private lazy val suffixes: Array[Array[Byte]] =
      Array.tabulate(shards)(s => s"#$s".getBytes("UTF-8"))
    override protected def nullSafeEval(a: Any): Any = {
      val id = a.asInstanceOf[UTF8String].getBytes
      val md = mdTL.get()
      var best = 0
      var bestW = -1L
      var s = 0
      while (s < shards) {
        md.update(id)
        md.update(suffixes(s))
        val d = md.digest()
        val w = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        if (w >= bestW) { best = s; bestW = w } // ties → higher shard
        s += 1
      }
      best
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** UTF-16 offset of each CODE POINT boundary in `s` (length n+1 for
    * n code points): the ngram expressions below window over code
    * points so they match the Spark `substr`/`length` (and DuckDB
    * character) semantics of the HOF formulations they replaced — a
    * UTF-16-unit walk diverges on supplementary-plane characters and
    * encodes split surrogate halves as '?' bytes (round-16 ADVICE
    * fix; OpsSpec pins the equivalence on an astral-plane input). */
  private def codePointOffsets(s: String): Array[Int] = {
    val offs = new Array[Int](s.codePointCount(0, s.length) + 1)
    var o = 0
    var k = 0
    while (k < offs.length) {
      offs(k) = o
      if (o < s.length) o += Character.charCount(s.codePointAt(o))
      k += 1
    }
    offs
  }

  /** Per-class integer scores over hashed CHARACTER 2-/3-grams in ONE
    * pass over the string: every sliding window hashes by the shared
    * md5u32 rule mod `weights(c).length` buckets and adds each class's
    * bucket weight. Replaces |langs| higher-order transform+aggregate
    * chains (interpreted lambda frame per character) with one flat
    * loop per row. Window positions count CODE POINTS (Spark
    * substr/length semantics — see [[codePointOffsets]]). */
  case class HashedCharNgramScores(child: Expression,
                                   weights: Array[Array[Long]])
      extends UnaryExpression with CodegenFallback {
    require(weights.nonEmpty && weights.forall(_.nonEmpty) &&
      weights.forall(_.length == weights.head.length),
      "need one non-empty equal-length weight array per class")
    private val buckets = weights.head.length
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    override protected def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      val md = mdTL.get()
      val out = new Array[Long](weights.length)
      def add(sub: String): Unit = {
        val d = md.digest(sub.getBytes("UTF-8"))
        val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = (u32 % buckets).toInt
        var c = 0
        while (c < weights.length) { out(c) += weights(c)(b); c += 1 }
      }
      val offs = codePointOffsets(s)
      val n = offs.length - 1
      var i = 0
      while (i + 2 <= n) { add(s.substring(offs(i), offs(i + 2))); i += 1 }
      i = 0
      while (i + 3 <= n) { add(s.substring(offs(i), offs(i + 3))); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The TRAINING-side twin of [[HashedCharNgramScores]]: every char
    * 2-/3-gram's md5u32-mod-`buckets` id, bigrams first then trigrams
    * (the exact emission order — and bit-identical bucket values — of
    * the HOF formulation it replaces; OpsSpec "hashedCharNgramFeatures
    * expression ≡ the HOF formulation" pins the equivalence). One
    * MessageDigest walk per row where the HOF
    * `transform(sequence(...), md5 ∘ substr)` evaluated an interpreted
    * expression tree per ELEMENT (round-15 optimization; the same
    * hot-loop-into-expression move as WordShingles/LshBuckets).
    * Windows count CODE POINTS like the HOF's substr
    * ([[codePointOffsets]]). */
  case class HashedCharNgramBuckets(child: Expression, buckets: Int)
      extends UnaryExpression with CodegenFallback {
    require(buckets > 0, "need at least one bucket")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val mdTL =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))
    override protected def nullSafeEval(a: Any): Any = {
      val s = a.asInstanceOf[UTF8String].toString
      val md = mdTL.get()
      val offs = codePointOffsets(s)
      val n = offs.length - 1
      val nBi = math.max(0, n - 1)
      val nTri = math.max(0, n - 2)
      val out = new Array[Long](nBi + nTri)
      def bucketOf(sub: String): Long = {
        val d = md.digest(sub.getBytes("UTF-8"))
        val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        u32 % buckets
      }
      var i = 0
      while (i + 2 <= n) {
        out(i) = bucketOf(s.substring(offs(i), offs(i + 2))); i += 1
      }
      i = 0
      while (i + 3 <= n) {
        out(nBi + i) = bucketOf(s.substring(offs(i), offs(i + 3))); i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def hashedCharNgramBuckets(text: Column, buckets: Int): Column =
    GraftSqlBridge.column(
      HashedCharNgramBuckets(GraftSqlBridge.expression(text), buckets))

  def hashedCharNgramScores(text: Column,
                            weights: Array[Array[Long]]): Column =
    GraftSqlBridge.column(
      HashedCharNgramScores(GraftSqlBridge.expression(text), weights))

  def hrwShard(id: Column, shards: Int): Column =
    GraftSqlBridge.column(HrwShard(GraftSqlBridge.expression(id), shards))

  def wordShingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(tokens), n))

  def wordWindowHashes(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordWindowHashes(GraftSqlBridge.expression(tokens), n))

  def hashedNgramScore(tokens: Column, weights: Array[Long]): Column =
    GraftSqlBridge.column(
      HashedNgramScore(GraftSqlBridge.expression(tokens), weights))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(
      WinnowFingerprint(GraftSqlBridge.expression(text), k, w))

  def minhashBandHashes(shingles: Column, perms: Int, bands: Int): Column =
    GraftSqlBridge.column(
      MinHashBandHashes(GraftSqlBridge.expression(shingles), perms, bands))

  def simhash64(tokens: Column, useMd5: Boolean = false): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens), useMd5))
}
