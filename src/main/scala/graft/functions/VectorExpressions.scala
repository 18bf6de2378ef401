package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector/hash hot paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, nested
  * `transform`) evaluate their lambda per element through the
  * interpreter — fine for small arrays, ruinous for 64-dim dot
  * products over millions of candidate pairs or 64 hash permutations
  * over hundreds of shingles per document. These expressions compile
  * the loops into whole-stage codegen (dot/norm) or one tight JVM
  * loop (minhash), which benchmarked ~40-60× faster at sf0.1.
  */
object VectorExpressions {

  /** dot(a, b) over array<float> in double precision — codegen'd loop. */
  case class DotProductF(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of an array<float> in double precision — codegen'd loop. */
  case class NormF(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble; s += v * v; i += 1
      }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature of an array<string> shingle set: `perms` minima
    * of per-permutation XXH64 hashes, computed in one pass over the
    * shingles (hash once per (shingle, perm) with the perm index as
    * seed). Interpreted eval, but a single flat JVM loop — the nested
    * transform/array_min formulation evaluates ~perms×|shingles|
    * lambda frames per row instead.
    */
  case class MinHashSig(child: Expression, perms: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val out = new Array[Long](perms)
      java.util.Arrays.fill(out, Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var p = 0
        while (p < perms) {
          val h = XXH64.hashUnsafeBytes(base, off, len, p)
          if (h < out(p)) out(p) = h
          p += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // --------------------------------------------------------------------
  // Quantizer expressions. The column formulation of PQ encode / ADC
  // LUT / coarse probe inlines |codebook| × subspaces slice+dot structs
  // into ONE projection — at 16 × 8 the generated doConsume grows past
  // the JVM's 64 KB method limit, whole-stage codegen FAILS, and the
  // entire encode stage silently runs interpreted (observed: janino
  // "Code grows beyond 64 KB" on every PQ-tier query). These replace
  // the struct forest with one loop per row; CodegenFallback keeps the
  // surrounding stage codegen'd (the generated code calls eval, it
  // doesn't inline the forest). Math is bit-identical to the column
  // form: sequential double accumulation over floats (DotProductF's
  // order), d2 = |c|² − 2·v·c with |c|² prefolded at plan build, ties
  // on the lower index (= array_sort on struct(d2, idx)), slices
  // clamped like slice()/dot's min-length rule.
  // --------------------------------------------------------------------

  private def dotRange(v: ArrayData, start: Int, sub: Array[Float]): Double = {
    val n = math.min(sub.length, math.max(0, v.numElements() - start))
    var s = 0.0
    var i = 0
    while (i < n) { s += v.getFloat(start + i).toDouble * sub(i).toDouble; i += 1 }
    s
  }

  /** The `nProbe` nearest coarse cells of a vector, ascending (d2,
    * cell) — replaces slice(array_sort(array(struct(d2, cell)…)), 1,
    * nProbe). nProbe = 1 is the assignment case. */
  case class NearestCells(child: Expression, centroids: Seq[Array[Float]],
                          nProbe: Int)
      extends UnaryExpression with CodegenFallback {
    require(nProbe >= 1 && nProbe <= centroids.length,
      "nProbe must be in [1, nCells]")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cents = centroids.toArray
    @transient private lazy val c2s =
      cents.map(_.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val d2 = new Array[Double](cents.length)
      var j = 0
      while (j < cents.length) {
        d2(j) = c2s(j) - 2.0 * dotRange(v, 0, cents(j))
        j += 1
      }
      // selection of the nProbe smallest, ascending, ties on index:
      // |codebook| is small (16ish), O(nProbe·|codebook|) is fine
      val out = new Array[Int](nProbe)
      val taken = new Array[Boolean](cents.length)
      var p = 0
      while (p < nProbe) {
        var best = -1
        var bestD = 0.0
        var k = 0
        while (k < cents.length) {
          // Double.compare orders NaN last, matching the replaced
          // array_sort(struct(d2, idx)) formulation on NaN distances.
          if (!taken(k) && (best < 0 ||
              java.lang.Double.compare(d2(k), bestD) < 0)) {
            best = k; bestD = d2(k)
          }
          k += 1
        }
        taken(best) = true
        out(p) = best
        p += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** PQ codes for all subspaces in one pass — out(s) = argmin_j of
    * |c_sj|² − 2·v_s·c_sj, ties on lower j. posexplode gives the
    * (subspace, code) relation the column form produced. */
  case class PqEncodeCodes(child: Expression, centroids: Seq[Array[Float]],
                           subspaces: Int, subDim: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val subs: Array[Array[Array[Float]]] =
      Array.tabulate(subspaces)(s =>
        centroids.map(_.slice(s * subDim, (s + 1) * subDim)).toArray)
    @transient private lazy val c2s: Array[Array[Double]] =
      subs.map(_.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val out = new Array[Int](subspaces)
      var s = 0
      while (s < subspaces) {
        var best = 0
        var bestD = Double.NaN
        var j = 0
        while (j < subs(s).length) {
          val d = c2s(s)(j) - 2.0 * dotRange(v, s * subDim, subs(s)(j))
          // Double.compare: NaN never beats a real distance (array_sort
          // ordered NaN last in the replaced column form).
          if (j == 0 || java.lang.Double.compare(d, bestD) < 0) {
            best = j; bestD = d
          }
          j += 1
        }
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC lookup-table entries for one query vector: (subspace, code,
    * d) per sub-centroid, s-major then code order, d = floor((|c|² −
    * 2·q_s·c) · lutScale) as long — exactly the column form's rows. */
  case class PqLutEntries(child: Expression, centroids: Seq[Array[Float]],
                          subspaces: Int, subDim: Int, lutScale: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("d", LongType, nullable = false))), containsNull = false)
    @transient private lazy val subs: Array[Array[Array[Float]]] =
      Array.tabulate(subspaces)(s =>
        centroids.map(_.slice(s * subDim, (s + 1) * subDim)).toArray)
    @transient private lazy val c2s: Array[Array[Double]] =
      subs.map(_.map(_.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val out = new Array[AnyRef](subspaces * centroids.length)
      var s = 0
      var k = 0
      while (s < subspaces) {
        var j = 0
        while (j < subs(s).length) {
          val d2 = c2s(s)(j) - 2.0 * dotRange(v, s * subDim, subs(s)(j))
          out(k) = InternalRow(s, j, math.floor(d2 * lutScale).toLong)
          j += 1; k += 1
        }
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All hyperplane-LSH table buckets of a vector in ONE pass:
    * out(t) = OR over planes p of (1 << p) iff dot(v, plane_tp) > 0 —
    * exactly the per-table `lshBucket` when-chain, but as a tight JVM
    * loop. The column form inlines tables × planes dot-product
    * when-chains into one projection; at occupancy-scaled dials
    * (e.g. 24 planes × 94 tables at 10⁹ vectors) that is ~144k
    * codegen'd terms — far past the JVM's 64 KB generated-method
    * limit, where the stage silently drops to interpreted eval (the
    * PQ-tier lesson). Dot products accumulate sequentially in double
    * over floats, matching DotProductF bit-for-bit, so buckets equal
    * the column form's exactly. */
  case class LshBuckets(child: Expression, planes: Seq[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val tbls: Array[Array[Array[Float]]] =
      planes.map(_.toArray).toArray
    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val out = new Array[Int](tbls.length)
      var t = 0
      while (t < tbls.length) {
        var bucket = 0
        var p = 0
        while (p < tbls(t).length) {
          if (dotRange(v, 0, tbls(t)(p)) > 0) bucket |= (1 << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      new GenericArrayData(out)
    }
    // a GENERATED LOOP (not an unrolled forest): method size is
    // constant in tables × planes × dim, so the 24×94-dial clamp
    // can't breach the 64 KB method limit, and small dials keep
    // whole-stage codegen (the interpreted fallback measured +0.26 s
    // on q28 at sf0.1). Accumulation order matches nullSafeEval /
    // DotProductF exactly — buckets are bit-identical.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tb = ctx.addReferenceObj("lshPlanes", tbls, "float[][][]")
        val t = ctx.freshName("t"); val p = ctx.freshName("p")
        val j = ctx.freshName("j"); val s = ctx.freshName("s")
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val bucket = ctx.freshName("bucket"); val pl = ctx.freshName("pl")
        s"""
           |int[] $out = new int[$tb.length];
           |for (int $t = 0; $t < $tb.length; $t++) {
           |  int $bucket = 0;
           |  for (int $p = 0; $p < $tb[$t].length; $p++) {
           |    float[] $pl = $tb[$t][$p];
           |    int $n = java.lang.Math.min($pl.length, $a.numElements());
           |    double $s = 0.0;
           |    for (int $j = 0; $j < $n; $j++) {
           |      $s += (double) $a.getFloat($j) * (double) $pl[$j];
           |    }
           |    if ($s > 0) $bucket |= (1 << $p);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def lshBucketsAll(vec: Column, planes: Seq[Array[Array[Float]]]): Column =
    GraftSqlBridge.column(LshBuckets(GraftSqlBridge.expression(vec), planes))

  def nearestCells(vec: Column, centroids: Seq[Array[Float]],
                   nProbe: Int): Column =
    GraftSqlBridge.column(
      NearestCells(GraftSqlBridge.expression(vec), centroids, nProbe))

  def pqEncodeCodes(vec: Column, centroids: Seq[Array[Float]],
                    subspaces: Int, subDim: Int): Column =
    GraftSqlBridge.column(
      PqEncodeCodes(GraftSqlBridge.expression(vec), centroids, subspaces, subDim))

  def pqLutEntries(vec: Column, centroids: Seq[Array[Float]],
                   subspaces: Int, subDim: Int, lutScale: Long): Column =
    GraftSqlBridge.column(
      PqLutEntries(GraftSqlBridge.expression(vec), centroids,
        subspaces, subDim, lutScale))

  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductF(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))

  def normF(a: Column): Column =
    GraftSqlBridge.column(NormF(GraftSqlBridge.expression(a)))

  def minhashSig(shingles: Column, perms: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(shingles), perms))
}
