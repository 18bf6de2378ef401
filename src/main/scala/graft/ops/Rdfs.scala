package graft.ops

import graft.core.{Term, TripleDb}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS-lite forward-chaining materializer over a [[TripleDb]].
  *
  * The reference scopes reasoning OUT (README:41-45 names no entailment
  * support) — this is a capability beyond the reference, composed from
  * parts that already exist: [[Paths.closure]] computes the schema
  * closures and plain broadcast joins apply them to the instance data.
  * The materialized result is an ordinary [[TripleDb]], so every query
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
  * Scale shape: the ontology (schema triples) is small by nature —
  * its closures are computed once and BROADCAST; the instance store is
  * touched by exactly two narrow scans (one for rdfs7, one for the
  * domain/range/type rules), each a map-side broadcast join with no
  * instance-side shuffle. The final set-semantics dedup is the only
  * shuffle, the same one `.index()` already charges. At 100 TB the
  * cost is two scans + one dedup — there is no iteration over the
  * instance data (all fixpoint iteration happens on the tiny schema).
  *
  * Fixpoint note: with the rule set above, one pass in the order
  * (property closure → rdfs7 → rdfs2/3 → class closure → rdfs9) IS the
  * fixpoint, because type triples never feed back into property
  * entailment. That holds as long as the ontology does not declare
  * `subPropertyOf` axioms about the reserved predicates themselves
  * (`type` / `domain` / `range` / `subClassOf` / `subPropertyOf`) —
  * meta-axioms of that shape are rejected.
  */
object Rdfs {
  val SubClassOf: Term = Term.TKeyword("subClassOf")
  val SubPropertyOf: Term = Term.TKeyword("subPropertyOf")
  val Domain: Term = Term.TKeyword("domain")
  val Range: Term = Term.TKeyword("range")
  val TypeP: Term = Term.TKeyword("type")

  private val Reserved: Set[Term] =
    Set(SubClassOf, SubPropertyOf, Domain, Range, TypeP)

  /** Entailed closure of `db` under `ontology` (schema triples using
    * the `subClassOf` / `subPropertyOf` / `domain` / `range` keyword
    * predicates). Returns the full materialized store: original
    * instance triples ∪ ontology ∪ schema closures ∪ entailed
    * instance/type triples, with set semantics (`distinct = true`).
    */
  def materialize(db: TripleDb, ontology: TripleDb): TripleDb = {
    val ont = ontology.df
    // reject meta-axioms that would make the one-pass ordering unsound
    val meta = ont
      .where(col("p") === Term.lit(SubPropertyOf) &&
        (Reserved.map(t => col("s") === Term.lit(t)).reduce(_ || _) ||
         Reserved.map(t => col("o") === Term.lit(t)).reduce(_ || _)))
      .limit(1).count()
    require(meta == 0,
      "ontology declares subPropertyOf over a reserved RDFS predicate — unsupported")

    // --- schema closures (tiny frames; iterate on the schema only) ---
    val pc = broadcast(
      Paths.closure(ontology, Seq(SubPropertyOf))
        .select(col("src").as("pa"), col("dst").as("pb")))
    val cc = broadcast(
      Paths.closure(ontology, Seq(SubClassOf))
        .select(col("src").as("ca"), col("dst").as("cb")))
    val dom = broadcast(ont.where(col("p") === Term.lit(Domain))
      .select(col("s").as("dp"), col("o").as("dc")).dropDuplicates())
    val rng = broadcast(ont.where(col("p") === Term.lit(Range))
      .select(col("s").as("rp"), col("o").as("rc")).dropDuplicates())

    val inst = db.df.select("s", "p", "o")

    // rdfs7 (with rdfs5 pre-folded into pc): superproperty triples.
    // pc is transitively closed, so ONE broadcast join covers chains.
    val sup = inst.join(pc, inst("p") === col("pa"))
      .select(col("s"), col("pb").as("p"), col("o"))
    val expanded = inst.unionByName(sup)

    // rdfs2 / rdfs3 over the EXPANDED triples (a domain declared on a
    // superproperty must fire for subproperty triples — expansion
    // already put the superproperty triple in `expanded`).
    val typeLit = Term.lit(TypeP)
    val typesDom = expanded.join(dom, col("p") === col("dp"))
      .select(col("s"), col("dc").as("c"))
    val typesRng = expanded.join(rng, col("p") === col("rp"))
      .select(col("o").as("s"), col("rc").as("c"))
    val instTypes = expanded.where(col("p") === typeLit)
      .select(col("s"), col("o").as("c"))
    val types0 = typesDom.unionByName(typesRng).unionByName(instTypes)

    // rdfs9 (with rdfs11 pre-folded into cc): supertype triples.
    val superTypes = types0.join(cc, col("c") === col("ca"))
      .select(col("s"), col("cb").as("c"))
    val allTypes = types0.unionByName(superTypes)
      .select(col("s"), typeLit.as("p"), col("c").as("o"))

    // schema closure triples are themselves entailed facts (rdfs5/11)
    val pcT = pc.select(col("pa").as("s"), Term.lit(SubPropertyOf).as("p"),
      col("pb").as("o"))
    val ccT = cc.select(col("ca").as("s"), Term.lit(SubClassOf).as("p"),
      col("cb").as("o"))

    TripleDb(expanded.unionByName(allTypes).unionByName(ont)
      .unionByName(pcT).unionByName(ccT)
      .dropDuplicates("s", "p", "o"), distinct = true)
  }
}
