package graft

import graft.core.{Term, TripleDb}
import graft.core.Term._
import graft.dsl._
import graft.engine.Projections
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY §5): pure term-codec laws at full case count,
  * Spark-backed query laws at a reduced case count (each case is a
  * handful of Spark jobs).
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  lazy val spark = TestSpark.session

  val genTerm: Gen[Term] = Gen.oneOf[Term](
    Gen.const(TNil),
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(TKeyword(_)),
    Gen.alphaNumStr.map(s => TUri("http://x/" + s)),
    Gen.alphaNumStr.map(TString(_)),
    Gen.choose(Long.MinValue + 1, Long.MaxValue).map(TLong(_)),
    Gen.choose(-1e6, 1e6).map(TDouble(_)),
    Gen.oneOf(true, false).map(TBool(_)),
    Gen.zip(Gen.alphaNumStr, Gen.oneOf("en", "fr", "de"))
      .map { case (l, g) => TLangString(l, g) },
    Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr)
      .map { case (l, d) => TTyped(l, "http://dt/" + d) })

  property("toRow/fromRow round-trips every term kind") = forAll(genTerm) { t =>
    Term.fromRow(Term.toRow(t)) == t
  }

  val genTriple: Gen[(Term, Term, Term)] = for {
    s <- Gen.oneOf[Term](TKeyword("a"), TKeyword("b"), TKeyword("c"), TNil)
    p <- Gen.oneOf[Term](TKeyword("p"), TKeyword("q"))
    o <- genTerm
  } yield (s, p, o)

  val genDb: Gen[List[(Term, Term, Term)]] =
    Gen.listOfN(6, genTriple).map(_.take(6))

  private def db(ts: Seq[(Term, Term, Term)]): TripleDb =
    TripleDb.fromTerms(spark, ts)

  property("ask ⇔ select nonempty") = forAll(genDb) { ts =>
    val d = db(ts)
    val rows = Seq(TriplePattern(V("s2"), T(TKeyword("p")), V("o2")))
    Projections.ask(d, rows) == Projections.select(d, rows).nonEmpty
  }

  property("merge-dbs is idempotent: db ∪ db ≡ index(db)") = forAll(genDb) { ts =>
    val a = db(ts)
    val merged = TripleDb.merge(a, db(ts))
    val indexed = db(ts).index()
    val eq = merged.df.count() == indexed.df.count()
    indexed.unpersist()
    eq
  }

  property("merge-dbs is commutative (as a set)") = forAll(genDb, genDb) { (x, y) =>
    val xy = TripleDb.merge(db(x), db(y)).df.collect().map(_.toString).sorted.toSeq
    val yx = TripleDb.merge(db(y), db(x)).df.collect().map(_.toString).sorted.toSeq
    xy == yx
  }

  property("select bag size = pattern match count (no dedup of solutions)") =
    forAll(genDb) { ts =>
      val d = db(ts)
      val n = Projections.select(d, Seq(TriplePattern(V("s2"), V("p2"), V("o2")))).size
      n == ts.size
    }

  property("values filter ≡ membership") = forAll(genDb) { ts =>
    val d = db(ts)
    val objs = ts.map(_._3).distinct.take(2)
    val got = Projections.select(d,
      Seq(TriplePattern(V("s2"), V("p2"), V("o2")), Values(V("o2"), objs)),
      Seq(V("o2"))).map(_.head)
    val expected = ts.map(_._3).filter(objs.contains)
    got.groupBy(identity).view.mapValues(_.size).toMap ==
      expected.groupBy(identity).view.mapValues(_.size).toMap
  }

  // ---- sketch/sharding laws (round 4) ----

  import org.apache.spark.sql.functions.{col, concat, lit}

  property("rendezvous: dropping the top shard moves only its ids") =
    forAll(Gen.choose(2, 10)) { n =>
      import spark.implicits._
      val ids = spark.range(200).select(
        concat(lit("id"), col("id")).as("k"))
      val withN = ops.Sample.rendezvousShard(ids, "k", n)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val withN1 = ops.Sample.rendezvousShard(ids, "k", n - 1)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      withN.keySet.filter(k => withN(k) != withN1(k)) ==
        withN.keySet.filter(k => withN(k) == n - 1)
    }

  property("count-min: one-sided for arbitrary widths/depths") =
    forAll(Gen.choose(1, 4), Gen.oneOf(4, 16, 64)) { (d, w) =>
      import spark.implicits._
      val items = spark.range(300)
        .select(concat(lit("t"), (col("id") % 40)).as("token"))
      val cm = ops.Sketch.countMin(items, "token", depth = d, width = w)
      val exact = items.groupBy("token")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("exact"))
      ops.Sketch.cmsEstimate(cm, exact.select("token"), "token")
        .join(exact, "token")
        .where(col("est") < col("exact")).count() == 0
    }

  property("hll merge is associative-commutative (max per register)") =
    forAll(Gen.choose(0, 1000), Gen.choose(0, 1000)) { (a, b) =>
      import spark.implicits._
      def shard(off: Int) = spark.range(off, off + 500)
        .select(concat(lit("x"), col("id")).as("token"))
      val (sa, sb) = (ops.Sketch.hllRegisters(shard(a), "token"),
        ops.Sketch.hllRegisters(shard(b), "token"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      canon(ops.Sketch.hllMerge(sa, sb)) == canon(ops.Sketch.hllMerge(sb, sa))
    }
}
