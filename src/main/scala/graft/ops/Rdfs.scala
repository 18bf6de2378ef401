package graft.ops

import graft.core.{QuadDb, Term, TripleDb}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** RDFS-lite forward-chaining materializer over a [[TripleDb]].
  *
  * The reference scopes reasoning OUT (README:41-45 names no entailment
  * support) — this is a capability beyond the reference. The
  * materialized result is an ordinary [[TripleDb]], so every query
  * operator (select / construct / ask / optional / values) runs over
  * the entailed graph unchanged.
  *
  * Supported rules (the RDFS ρdf fragment, Muñoz et al., "Simple and
  * Efficient Minimal RDFS", JWS 2009):
  *   - rdfs5  subPropertyOf transitivity
  *   - rdfs7  (s p o) ∧ (p ⊑p q)      → (s q o)
  *   - rdfs11 subClassOf transitivity
  *   - rdfs9  (x type c) ∧ (c ⊑c d)  → (x type d)
  *   - rdfs2  (s p o) ∧ (p domain c) → (s type c)
  *   - rdfs3  (s p o) ∧ (p range  c) → (o type c)
  *
  * Scale shape: the ontology (schema triples) is driver-sized by
  * definition, so ALL fixpoint iteration happens on the driver — the
  * schema closures fold into a per-predicate emission table
  * (predicate → superproperties, domain-types, range-types, each
  * pre-closed under subClassOf). The instance store is then touched by
  * exactly ONE scan: two broadcast left-joins (emissions keyed by
  * predicate; subClassOf expansion keyed by the object of `type`
  * triples) and one explode emit every entailed fact per row. No
  * instance-instance join, no iteration over instance data; the final
  * set-semantics dedup is the only shuffle — the same one `.index()`
  * already charges. At 100 TB the cost is one scan + one dedup.
  *
  * Fixpoint note: with this rule set, per-row emission over pre-closed
  * schema tables IS the fixpoint, because type triples never feed back
  * into property entailment. That holds as long as the ontology does
  * not declare `subPropertyOf` axioms about the reserved RDFS
  * predicates themselves (`type` / `domain` / `range` / `subClassOf` /
  * `subPropertyOf`) — meta-axioms of that shape are rejected.
  */
object Rdfs {
  val SubClassOf: Term = Term.TKeyword("subClassOf")
  val SubPropertyOf: Term = Term.TKeyword("subPropertyOf")
  val Domain: Term = Term.TKeyword("domain")
  val Range: Term = Term.TKeyword("range")
  val TypeP: Term = Term.TKeyword("type")

  private val Reserved: Set[Term] =
    Set(SubClassOf, SubPropertyOf, Domain, Range, TypeP)

  /** Driver-side transitive closure of a (tiny) schema relation. */
  private def close(pairs: Seq[(Term, Term)]): Map[Term, Set[Term]] = {
    var m = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var grew = true
    while (grew) {
      grew = false
      m = m.map { case (a, bs) =>
        val ext = bs ++ bs.flatMap(b => m.getOrElse(b, Set.empty))
        if (ext.size != bs.size) grew = true
        a -> ext
      }
    }
    m
  }

  /** The per-row entailment pass alone: every input triple expanded to
    * itself plus all its ρdf consequences (no dedup, no schema
    * triples). Pure stateless projections over broadcast schema
    * tables, so it runs UNCHANGED on a STREAMING frame (stream-static
    * broadcast joins; compose with [[graft.sources.NTriples.readStream]]
    * for live entailed ingest) — dedup/set semantics are the batch
    * sink's job. [[materialize]] is this plus schema triples and the
    * set-semantics dedup.
    */
  def entailRows(inst: DataFrame, ontology: TripleDb): DataFrame =
    entailCore(inst.select("s", "p", "o"), ontTriples(ontology))

  /** [[entailRows]] for QUAD frames (columns s/p/o/g): every entailed
    * fact inherits the graph of the instance fact it derives from —
    * per-graph reasoning, so a tenant graph's entailments stay in the
    * tenant graph and a whole-graph takedown removes them with it.
    * Stream-safe for the same reason entailRows is (stateless
    * projections per row). */
  def entailQuadRows(inst: DataFrame, ontology: TripleDb): DataFrame =
    entailCore(inst.select("s", "p", "o", "g"), ontTriples(ontology),
      extra = Seq("g"))

  /** Default ceiling for [[ontTriples]] — generous for any real
    * ontology (Wikidata's full property/class schema is ~100k triples)
    * while catching the fatal mix-up early. */
  val DefaultMaxSchemaTriples: Int = 1000000

  /** Collect the ontology to the driver, with a LOUD size cap: the
    * whole design premise is that the schema is driver-sized, so a
    * caller that accidentally feeds an INSTANCE store as the ontology
    * must fail fast with a diagnosis, not OOM the driver collecting
    * 100 TB. `head(cap + 1)` stops the scan at the cap instead of
    * counting the store. Raise `graft.rdfs.maxSchemaTriples` (session
    * conf) to opt in to a genuinely larger schema.
    */
  private def ontTriples(ontology: TripleDb): Seq[(Term, Term, Term)] = {
    val cap = ontology.df.sparkSession.conf
      .getOption("graft.rdfs.maxSchemaTriples").map(_.toInt)
      .getOrElse(DefaultMaxSchemaTriples)
    val rows = ontology.df.select("s", "p", "o").head(cap + 1)
    require(rows.length <= cap,
      s"ontology exceeds $cap triples — the RDFS schema is closed on the " +
        "driver by contract, so this looks like an instance store passed " +
        "as the ontology; set graft.rdfs.maxSchemaTriples to opt in to a " +
        "larger schema")
    rows.toSeq.map(r => (Term.fromRow(r.getStruct(0)),
      Term.fromRow(r.getStruct(1)), Term.fromRow(r.getStruct(2))))
  }

  /** Driver-side schema prep shared by [[materialize]] and
    * [[entailRows]]: (subPropertyOf closure, subClassOf closure,
    * domain decls, range decls). The schema is driver-sized by
    * contract — collected once, closed on the driver (no per-round
    * Spark jobs for an 8-triple ontology). */
  private def schemaTables(ont: Seq[(Term, Term, Term)])
      : (Map[Term, Set[Term]], Map[Term, Set[Term]],
         Map[Term, Set[Term]], Map[Term, Set[Term]]) = {
    require(!ont.exists { case (s, p, o) =>
      p == SubPropertyOf && (Reserved(s) || Reserved(o))
    }, "ontology declares subPropertyOf over a reserved RDFS predicate — unsupported")
    val pc = close(ont.collect { case (s, p, o) if p == SubPropertyOf => (s, o) })
    val cc = close(ont.collect { case (s, p, o) if p == SubClassOf => (s, o) })
    val dom = ont.collect { case (s, p, o) if p == Domain => (s, o) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rng = ont.collect { case (s, p, o) if p == Range => (s, o) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (pc, cc, dom, rng)
  }

  private def entailCore(inst: DataFrame,
                         ont: Seq[(Term, Term, Term)],
                         extra: Seq[String] = Nil): DataFrame = {
    val spark = inst.sparkSession
    val (pc, cc, dom, rng) = schemaTables(ont)
    def withSupers(cs: Set[Term]): Seq[Term] =
      (cs ++ cs.flatMap(c => cc.getOrElse(c, Set.empty))).toSeq

    // per-predicate emissions: superproperties, and domain/range types
    // collected over the predicate AND its superproperties, pre-closed
    // under subClassOf — one row per predicate with any entailment
    val preds = (pc.keySet ++ dom.keySet ++ rng.keySet).toSeq
    val emitRows = preds.map { p =>
      val props = p +: pc.getOrElse(p, Set.empty).toSeq
      Row(Term.toRow(p),
        pc.getOrElse(p, Set.empty).toSeq.map(Term.toRow),
        withSupers(props.flatMap(q => dom.getOrElse(q, Set.empty)).toSet)
          .map(Term.toRow),
        withSupers(props.flatMap(q => rng.getOrElse(q, Set.empty)).toSet)
          .map(Term.toRow))
    }
    val emitSchema = StructType(Seq(
      StructField("ep", Term.schema),
      StructField("e_sups", ArrayType(Term.schema)),
      StructField("e_dom", ArrayType(Term.schema)),
      StructField("e_rng", ArrayType(Term.schema))))
    val emitDf = spark.createDataFrame(
      java.util.Arrays.asList(emitRows: _*), emitSchema)
    val ccDf = spark.createDataFrame(
      java.util.Arrays.asList(cc.toSeq.map { case (c, sups) =>
        Row(Term.toRow(c), sups.toSeq.map(Term.toRow))
      }: _*),
      StructType(Seq(StructField("cc_c", Term.schema),
        StructField("cc_sups", ArrayType(Term.schema)))))

    val typeL = Term.lit(TypeP)
    def trip(s: Column, p: Column, o: Column): Column =
      struct(s.as("s"), p.as("p"), o.as("o"))
    val emptyT = array().cast(ArrayType(Term.schema))
    // ONE instance scan: broadcast left-joins attach the emissions,
    // explode emits the row's full entailment set.
    // fanOut (round 16, measured): the dense star-graph parquet packs
    // into a handful of scan tasks (bytes-based splits), and the ×5
    // emission explode + dedup partial-aggregate then run on 2-4 cores
    // — q127 was 6 jobs / 15 tasks / 5.9 s with ~1 MB of shuffle, i.e.
    // parallelism-starved compute, not shuffle-bound (the round-9
    // token-explode lesson). Conditional repartition: a no-op whenever
    // the scan already has ≥ core-count partitions (the 100 TB case)
    // and for streaming frames.
    Text.fanOut(inst)
      .join(broadcast(emitDf), col("p") === col("ep"), "left")
      .join(broadcast(ccDf),
        col("p") === typeL && col("o") === col("cc_c"), "left")
      .select(explode(concat(
          array(trip(col("s"), col("p"), col("o"))),
          transform(coalesce(col("e_sups"), emptyT),
            q => trip(col("s"), q, col("o"))),
          transform(coalesce(col("e_dom"), emptyT),
            c => trip(col("s"), typeL, c)),
          transform(coalesce(col("e_rng"), emptyT),
            c => trip(col("o"), typeL, c)),
          transform(coalesce(col("cc_sups"), emptyT),
            c => trip(col("s"), typeL, c))))
        .as("t") +: extra.map(col): _*)
      .select(col("t.s").as("s") +: col("t.p").as("p") +:
        col("t.o").as("o") +: extra.map(col): _*)
  }

  /** The set-semantics dedup with a NARROW exchange key (round 16,
    * guide §2.3 "shuffle keys, not payloads"): subject and object —
    * the wide positions (URIs/literals) — pack losslessly into ONE
    * binary column ([[graft.functions.TermPackExpressions]], injective
    * by construction, round-trip spec-pinned), so the dedup exchange
    * carries `(p struct, ~packed bytes)` instead of three five-field
    * structs. `p` stays its OWN grouping column on purpose: ground-
    * predicate filters over the materialized store push below the
    * dedup exactly as they did over `dropDuplicates("s","p","o")`
    * (grouping-key pushdown — the load-bearing pushdown for every
    * entailment query; an object-ground filter no longer pushes, the
    * accepted trade for the narrow key). Row set is identical:
    * injectivity makes distinct-on-(p, pack(s,o)) ≡
    * distinct-on-(s,p,o). */
  private def dedupNarrow(df: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    import graft.functions.TermPackExpressions.{packTerms, unpackTermAt}
    df.select(col("p") +: packTerms(col("s"), col("o")).as("__so") +:
        extra.map(col): _*)
      .distinct()
      .select(unpackTermAt(col("__so"), 0).as("s") +: col("p") +:
        unpackTermAt(col("__so"), 1).as("o") +: extra.map(col): _*)
  }

  /** Entailed closure of `db` under `ontology` (schema triples using
    * the `subClassOf` / `subPropertyOf` / `domain` / `range` keyword
    * predicates). Returns the full materialized store: original
    * instance triples ∪ ontology ∪ schema closures ∪ entailed
    * instance/type triples, with set semantics (`distinct = true`).
    */
  def materialize(db: TripleDb, ontology: TripleDb): TripleDb = {
    val spark = db.df.sparkSession
    val ont = ontTriples(ontology)
    val all = entailCore(db.df.select("s", "p", "o"), ont)
    val (pc, cc, _, _) = schemaTables(ont)
    // schema facts are themselves entailed: ontology ∪ rdfs5/11 closures
    val schemaTriples = (ont ++
      pc.toSeq.flatMap { case (a, bs) => bs.map(b => (a, SubPropertyOf, b)) } ++
      cc.toSeq.flatMap { case (a, bs) => bs.map(b => (a, SubClassOf, b)) }).distinct
    val schemaDf = TripleDb.fromTerms(spark, schemaTriples).df

    TripleDb(dedupNarrow(all.unionByName(schemaDf)), distinct = true)
  }

  /** Incremental materialization for an appended instance batch: under
    * the ρdf rule set every entailment of an instance triple depends
    * only on that triple and the (fixed) schema closures — no
    * instance-instance joins — so
    * `materialize(base ∪ Δ) = materialize(base) ∪ materialize(Δ)` as
    * sets (spec-pinned). The append path therefore never re-scans the
    * base store: entail tonight's batch alone and set-union it in
    * ([[TripleDb.merge]], or [[TripleDb.union]] + `.index()`), which
    * is the shape that matters when the base is 100 TB and the batch
    * is 100 GB. The same property makes the rules safe on a stream
    * (stateless projections per micro-batch, dedup downstream).
    */
  def materializeDelta(delta: TripleDb, ontology: TripleDb): TripleDb =
    materialize(delta, ontology)

  /** [[materialize]] for a quad store: instance entailments stay in
    * their containing graphs ([[entailQuadRows]]); the ontology and
    * its rdfs5/11 closures land in the DEFAULT (nil) graph — the
    * schema is dataset-level, not per-tenant. Same one-scan shape,
    * set semantics per QUAD. */
  def materializeQuads(db: QuadDb, ontology: TripleDb): QuadDb = {
    val spark = db.df.sparkSession
    val ont = ontTriples(ontology)
    val all = entailCore(db.df.select("s", "p", "o", "g"), ont,
      extra = Seq("g"))
    val (pc, cc, _, _) = schemaTables(ont)
    val schemaTriples = (ont ++
      pc.toSeq.flatMap { case (a, bs) => bs.map(b => (a, SubPropertyOf, b)) } ++
      cc.toSeq.flatMap { case (a, bs) => bs.map(b => (a, SubClassOf, b)) }).distinct
    val schemaDf =
      QuadDb.fromTripleDb(TripleDb.fromTerms(spark, schemaTriples)).df
    // same narrow-key dedup as [[materialize]]; `g` stays its own
    // grouping column so graph-scoped scan filters keep pushing
    QuadDb(dedupNarrow(all.unionByName(schemaDf), extra = Seq("g")),
      distinct = true)
  }
}
