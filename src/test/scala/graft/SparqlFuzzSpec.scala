package graft

import graft.core.Term
import graft.core.Term._
import graft.dsl._
import graft.sparql._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** SPARQL front-end round-trip fuzzer: random queries built from the
  * CANONICAL node shapes (exactly what the parser itself produces —
  * documented on [[graft.sparql.Parser]]) must survive
  * `Parser.parse(Printer.print(q)) == q` EXACTLY. The printer is the
  * spec-side formulation here (it renders from the AST definition,
  * never from the parser's scanning logic), so a drift in either
  * direction falsifies.
  */
object SparqlRoundTripProps extends Properties("sparql-roundtrip") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(80)

  private val varNames = Seq("v1", "v2", "v3", "v4")
  private val genVar: Gen[V] = Gen.oneOf(varNames).map(V(_))

  private val preds: Seq[Term] =
    Seq(TKeyword("p"), TKeyword("q"), TKeyword("foaf/knows"), TUri("http://ex/p"))
  private val genPred: Gen[Term] = Gen.oneOf(preds)

  private val genGround: Gen[Term] = Gen.oneOf[Term](
    TKeyword("a1"), TKeyword("with/slash"), TUri("http://ex/x"),
    TUri("rel/ative"), TNil, TString("x"), TString("esc\"ape\\\n\ttab"),
    TLangString("hé", "fr-CA"), TTyped("v", "http://dt/x"),
    TLong(42), TLong(-9007199254740993L), TDouble(2.5), TDouble(-0.5),
    TDouble(1.0e10), TBool(true), TBool(false),
    TDate("2024-03-07T15:30:45+05:30"), Term.opaque("tag", Array[Byte](1)))

  private val genTov: Gen[TermOrVar] = Gen.frequency(
    3 -> genVar.map(v => v: TermOrVar),
    2 -> genGround.map(T(_): TermOrVar))

  // ---- canonical paths: never a bare PathPred at top level (that is
  // a plain triple), never PathPlusOf over shapes the parser
  // re-canonicalizes to PathPlus / PathAltPlus ----
  private val genPrim: Gen[PathExpr] = Gen.frequency(
    3 -> genPred.map(PathPred(_)),
    1 -> Gen.choose(1, 2).flatMap(k =>
      Gen.listOfN(k, genPred).map(ps => PathNeg(ps.distinct))))
  private val genStep: Gen[PathExpr] = Gen.frequency(
    3 -> genPrim,
    1 -> genPrim.map(PathInv(_)),
    1 -> genPrim.map(PathStar(_)))
  private val genPath: Gen[PathExpr] = Gen.frequency(
    2 -> genPred.map(PathPlus(_)),
    1 -> Gen.listOfN(2, genPred).map(ps =>
      if (ps.distinct.size == 2) PathAltPlus(ps.distinct)
      else PathPlus(ps.head)),
    2 -> Gen.listOfN(2, genStep).map(PathSeq(_)),
    1 -> Gen.listOfN(2, genStep).map(PathAlt(_)),
    1 -> genPrim.map(PathInv(_)),
    1 -> genPrim.map(PathStar(_)),
    1 -> genPrim.map(PathOpt(_)),
    1 -> (for { p <- genPrim; lo <- Gen.choose(0, 2); w <- Gen.choose(0, 2) }
      yield PathRange(p, lo, math.max(lo + w, 1))),
    1 -> Gen.listOfN(2, genStep).map(ss => PathPlusOf(PathSeq(ss))))

  // ---- canonical term expressions (Bind / projection expressions) ----
  private val genLeafT: Gen[TermExpr] = Gen.frequency(
    3 -> genVar.map(TVar(_): TermExpr),
    1 -> genGround.map(TConst(_): TermExpr))
  private val genNum: Gen[NumExpr] = for {
    a <- genVar.map(NVar(_))
    b <- Gen.oneOf[NumExpr](NConst(TLong(2)), NConst(TDouble(0.5)),
      NVar(V("v2")))
    f <- Gen.oneOf[(NumExpr, NumExpr) => NumExpr](
      NAdd(_, _), NSub(_, _), NMul(_, _), NDiv(_, _))
  } yield f(a, b)
  private val genTermExpr: Gen[TermExpr] = Gen.frequency(
    2 -> genLeafT,
    2 -> (for {
      x <- genLeafT
      f <- Gen.oneOf[TermExpr => TermExpr](
        TStr(_), TLang(_), TDatatype(_), TStrlen(_), TUcase(_), TLcase(_),
        TSubstr(_, 2, Some(3)), TAbs(_), TRound(_), TCeil(_), TFloor(_),
        TDatePart(_, DfYear), TDatePart(_, DfSeconds), TTz(_), TTimezone(_),
        TIri(_), TEncodeForUri(_), TBNode(_), THash(_, "md5"),
        THash(_, "sha256"), TReplace(_, "[xy]", "Z"), TStrLang(_, "en"),
        TStrDt(_, "http://dt/x"))
    } yield f(x)),
    1 -> genNum.map(e => e: TermExpr),
    1 -> Gen.listOfN(2, genLeafT).map(TConcat(_): TermExpr),
    1 -> Gen.listOfN(2, genLeafT).map(TCoalesce(_): TermExpr),
    1 -> (for { a <- genLeafT; b <- genLeafT }
      yield TStrBefore(a, b): TermExpr))

  private val genCmpOp: Gen[CmpOp] = Gen.oneOf(Lt, Le, Gt, Ge, Eq, Neq)

  // ---- canonical filters: var-vs-const is FilterCmp, var-vs-var
  // FilterVarCmp, FilterArith only with a composite side ----
  private def genFilter(depth: Int): Gen[FilterExpr] = {
    val atoms = Gen.frequency[FilterExpr](
      3 -> (for { v <- genVar; op <- genCmpOp; t <- genGround }
        yield FilterCmp(v, op, t)),
      2 -> (for { a <- genVar; op <- genCmpOp; b <- genVar }
        yield FilterVarCmp(a, op, b)),
      2 -> (for { a <- genNum; op <- genCmpOp; b <- genLeafT }
        yield FilterArith(a, op, b)),
      1 -> (for { a <- genTermExpr.suchThat(e =>
          !e.isInstanceOf[TVar] && !e.isInstanceOf[TConst] &&
            !e.isInstanceOf[NumExpr]); op <- genCmpOp; b <- genLeafT }
        yield FilterArith(a, op, b)),
      2 -> genVar.map(FilterBound(_)),
      1 -> genVar.map(FilterRegex(_, "^K.*e$")),
      1 -> (for { v <- genVar; fl <- Gen.oneOf("i", "ism", "m") }
        yield FilterRegex(v, "^k.*E$", fl)),
      1 -> (for { a <- genLeafT; b <- genLeafT }
        yield FilterStrStarts(a, b)),
      1 -> (for { a <- genLeafT; b <- genLeafT } yield FilterStrEnds(a, b)),
      1 -> (for { a <- genLeafT; b <- genLeafT } yield FilterContains(a, b)),
      1 -> genVar.map(v => FilterLangMatches(TLang(TVar(v)), "en")),
      1 -> genLeafT.map(FilterIsIri(_)),
      1 -> genLeafT.map(FilterIsLiteral(_)),
      1 -> genLeafT.map(FilterIsNumeric(_)),
      1 -> (for { a <- genLeafT; b <- genLeafT } yield FilterSameTerm(a, b)),
      1 -> (for { v <- genVar; ts <- Gen.listOfN(2, genGround) }
        yield FilterIn(v, ts)))
    if (depth <= 0) atoms
    else Gen.frequency(
      3 -> atoms,
      1 -> Gen.listOfN(2, genFilter(depth - 1)).map(FilterAnd(_)),
      1 -> Gen.listOfN(2, genFilter(depth - 1)).map(FilterOr(_)),
      1 -> genFilter(depth - 1).map(FilterNot(_)),
      1 -> genRows(1, depth - 1).map(FilterExists(_)))
  }

  // ---- rows ----
  private val genTriple: Gen[PatternRow] = for {
    s <- genTov; p <- Gen.frequency[TermOrVar](
      3 -> genVar.map(v => v: TermOrVar),
      3 -> genPred.map(T(_): TermOrVar))
    o <- genTov
  } yield TriplePattern(s, p, o)

  private val genPathRow: Gen[PatternRow] = for {
    s <- genTov; p <- genPath; o <- genTov
  } yield PathPattern(s, p, o)

  private val genValues: Gen[PatternRow] = Gen.frequency(
    2 -> (for { v <- genVar; ts <- Gen.choose(1, 3)
        .flatMap(Gen.listOfN(_, genGround)) }
      yield Values(v, ts)),
    1 -> (for {
      ts <- Gen.listOfN(2, Gen.option(genGround))
      us <- Gen.listOfN(2, Gen.option(genGround))
    } yield ValuesTable(Seq(V("v1"), V("v2")), Seq(ts, us))))

  private var bindN = 0
  private val genBind: Gen[PatternRow] = genTermExpr.map { e =>
    bindN += 1
    Bind(e, V(s"b$bindN"))
  }

  private def genRows(min: Int, depth: Int): Gen[Seq[PatternRow]] = {
    val leaf = Gen.frequency(
      5 -> genTriple,
      2 -> genPathRow,
      2 -> genValues,
      1 -> genBind,
      // depth must strictly decrease through EXISTS-in-filter, or the
      // generator graph never bottoms out (Gen.frequency is strict)
      2 -> genFilter(math.min(1, depth)))
    val nested: Gen[PatternRow] =
      if (depth <= 0) leaf
      else Gen.frequency(
        4 -> leaf,
        1 -> genRows(1, depth - 1).map(Optional(_)),
        1 -> (for { a <- genRows(1, depth - 1); b <- genRows(1, depth - 1) }
          yield Union(Seq(a, b))),
        1 -> genRows(1, depth - 1).map(Minus(_)),
        1 -> genRows(1, depth - 1).map(NotExists(_)),
        1 -> genSubSelect(depth - 1))
    Gen.choose(min, math.max(min, 3)).flatMap(Gen.listOfN(_, nested))
  }

  private def genSubSelect(depth: Int): Gen[PatternRow] = for {
    rows <- genRows(1, depth)
    inner = Bgp.allVars(rows)
    agg <- Gen.oneOf(true, false)
    distinct <- Gen.oneOf(true, false)
    limit <- Gen.oneOf(-1, 7)
  } yield {
    val vars = if (inner.nonEmpty) inner else Seq(V("v1"))
    if (agg)
      SubSelect(Seq(vars.head, V("agg1")), rows,
        groupBy = Seq(vars.head),
        aggs = Seq(Agg(AggCount, None, V("agg1"))),
        orderBy = Seq(OrderKey(vars.head)), limit = limit,
        distinct = false)
    else SubSelect(Seq(vars.head), rows, limit = limit, distinct = distinct)
  }

  // ---- queries ----
  private val genSelect: Gen[SparqlQuery] = for {
    rows <- genRows(1, 2)
    vars = Bgp.allVars(rows)
    star <- Gen.oneOf(true, false)
    distinct <- Gen.oneOf(true, false)
    limit <- Gen.oneOf(-1, 5)
    offset <- Gen.oneOf(0, 2)
    nOrder <- Gen.choose(0, 2)
    orderVars <- Gen.listOfN(nOrder, Gen.oneOf(varNames).map(V(_)))
    descs <- Gen.listOfN(nOrder, Gen.oneOf(true, false))
    ds <- Gen.frequency(
      3 -> Gen.const(None),
      1 -> Gen.const(Some(Dataset(Seq(TUri("http://g/1")), Nil))),
      1 -> Gen.const(Some(Dataset(
        Seq(TUri("http://g/1"), TKeyword("gname")),
        Seq(TUri("http://g/2"))))),
      1 -> Gen.const(Some(Dataset(Nil, Seq(TUri("http://g/2"))))))
  } yield SelectQuery(
    proj = if (star || vars.isEmpty) Nil else vars.take(2),
    where = rows,
    orderBy = orderVars.zip(descs).map { case (v, asc) =>
      (TVar(v): TermExpr, asc) },
    limit = limit, offset = offset, distinct = distinct,
    dataset = ds)

  private val genAggSelect: Gen[SparqlQuery] = for {
    rows <- genRows(1, 1)
    vars = Bgp.allVars(rows)
    exprKey <- Gen.oneOf(true, false)
    fn <- Gen.oneOf[AggFn](AggCount, AggSum, AggAvg, AggMin, AggMax,
      AggSample, AggGroupConcat(", "))
    hav <- Gen.option(genCmpOp.map(op => FilterCmp(V("a1"), op, TLong(3))))
    withPb <- Gen.oneOf(true, false)
  } yield {
    val kv = vars.headOption.getOrElse(V("v1"))
    val aggVar = vars.drop(1).headOption.getOrElse(V("v2"))
    val key: (TermExpr, V) =
      if (exprKey) (TStrlen(TVar(kv)), V("key1")) else (TVar(kv), kv)
    val aggs = Seq(
      if (fn == AggCount) Agg(AggCount, None, V("a1"))
      else Agg(fn, Some(aggVar), V("a1")))
    // §18.2.4.2 select expressions over the aggregate alias
    val pb = if (withPb)
      Seq(Bind(NMul(NVar(V("a1")), NConst(TLong(2))), V("pb1"))) else Nil
    SelectQuery(proj = Seq(key._2, V("a1")) ++ pb.map(_.as),
      where = rows, aggs = aggs,
      groupBy = Seq(key), having = hav,
      orderBy = Seq((TVar(V("a1")): TermExpr, false)), limit = 5,
      postBinds = pb)
  }

  private val genQuery: Gen[SparqlQuery] = Gen.frequency(
    4 -> genSelect,
    2 -> genAggSelect,
    1 -> (for { rows <- genRows(1, 1); s <- genTov; p <- genPred; o <- genTov }
      yield ConstructQuery(Seq((s, T(p), o)), rows)),
    1 -> genRows(1, 2).map(AskQuery(_)),
    1 -> (for { rows <- genRows(1, 1); v <- genVar }
      yield DescribeQuery(v, rows)))

  // ---- update requests ----
  private val genGraphName: Gen[Term] = Gen.oneOf[Term](
    graft.core.QuadDb.DefaultGraph, TUri("http://g/1"), TKeyword("gname"))
  private val genGroundQuad: Gen[(Term, Term, Term, Term)] = for {
    s <- genGround; p <- genPred; o <- genGround; g <- genGraphName
  } yield (s, p, o, g)
  private val genQuadTemplate
      : Gen[(TermOrVar, TermOrVar, TermOrVar, TermOrVar)] = for {
    s <- genTov; p <- Gen.frequency[TermOrVar](
      2 -> genPred.map(T(_): TermOrVar), 1 -> genVar.map(v => v: TermOrVar))
    o <- genTov
    g <- Gen.frequency[TermOrVar](
      2 -> genGraphName.map(T(_): TermOrVar), 1 -> Gen.const(V("g")))
  } yield (s, p, o, g)

  private val genUpdateOp: Gen[UpdateOp] = Gen.frequency(
    2 -> Gen.choose(1, 3).flatMap(Gen.listOfN(_, genGroundQuad))
      .map(InsertData(_)),
    2 -> Gen.choose(1, 2).flatMap(Gen.listOfN(_, genGroundQuad))
      .map(DeleteData(_)),
    3 -> (for {
      del <- Gen.choose(0, 2).flatMap(Gen.listOfN(_, genQuadTemplate))
      ins <- Gen.choose(if (del.isEmpty) 1 else 0, 2)
        .flatMap(Gen.listOfN(_, genQuadTemplate))
      where <- genRows(1, 1)
    } yield Modify(del, if (del.isEmpty && ins.isEmpty)
      Seq((V("s"), T(TKeyword("p")), V("o"),
        T(graft.core.QuadDb.DefaultGraph))) else ins, where)),
    1 -> (for { f <- Gen.oneOf("/tmp/fz.nt", "/d/x.ttl", "a/b.jsonl")
      g <- genGraphName; sil <- Gen.oneOf(true, false)
    } yield LoadOp(f, g, sil)),
    1 -> Gen.option(genGraphName).map(ClearOp(_)),
    1 -> Gen.const(ClearNamedOp: UpdateOp),
    1 -> (for { g <- Gen.oneOf[Term](TUri("http://g/1"), TKeyword("gname"))
      s <- Gen.oneOf(true, false) } yield CreateOp(g, s)),
    1 -> (for { a <- genGraphName; b <- genGraphName } yield CopyOp(a, b)),
    1 -> (for { a <- genGraphName; b <- genGraphName } yield MoveOp(a, b)),
    1 -> (for { a <- genGraphName; b <- genGraphName } yield AddOp(a, b)))

  private val genUpdateReq: Gen[Seq[UpdateOp]] =
    Gen.choose(1, 3).flatMap(Gen.listOfN(_, genUpdateOp))

  property("parseUpdate(printUpdate(ops)) == ops on canonical requests") =
    forAll(genUpdateReq) { ops =>
      val printed = Printer.printUpdate(ops)
      val ops2 = try Parser.parseUpdate(printed) catch {
        case e: Throwable =>
          println(s"PARSE FAILED on:\n$printed\n$e")
          throw e
      }
      if (ops2 != ops) println(s"DRIFT:\n$printed\nparsed: $ops2\norig: $ops")
      ops2 == ops
    }

  property("parse(print(q)) == q on canonical query ASTs") =
    forAll(genQuery) { q =>
      val printed = Printer.print(q)
      val q2 = try Parser.parse(printed) catch {
        case e: Throwable =>
          println(s"PARSE FAILED on:\n$printed\n$e")
          throw e
      }
      if (q2 != q) println(s"DRIFT:\n$printed\nparsed: $q2\norig:   $q")
      q2 == q
    }
}
