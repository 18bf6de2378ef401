package graft

import graft.core.TripleDb
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders turning the driver's TPC-H-ish parquet tables into triple
  * databases for the matcha-parity queries.
  *
  * The graph view unpivots each wide table (TripleDb.fromWideTable — a
  * narrow map, no shuffle) and tags FK columns so their objects become
  * URI terms of the referenced table's subjects; BGP joins then hop
  * across tables exactly like the reference's cross-entity patterns
  * (reference README:156-163). Subject prefixes are disjoint per table,
  * so the union needs no dedup shuffle (TripleDb.union, not merge).
  */
object Tables {
  // schema inference + file listing per read adds up across 30+ queries;
  // DataFrames are immutable plans, safe to share within a session.
  // Weak-keyed by the session so stopped sessions' entries are collected
  // (an identity-hash key could collide with a dead session's slot).
  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[(String, String), DataFrame]]

  def t(spark: SparkSession, dir: String, name: String): DataFrame = cache.synchronized {
    val perSession = Option(cache.get(spark)).getOrElse {
      val m = scala.collection.mutable.Map.empty[(String, String), DataFrame]
      cache.put(spark, m)
      m
    }
    perSession.getOrElseUpdate((dir, name), spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** The events fixture has stored its `ts` column two ways across
    * driver versions: TIMESTAMP(NANOS), which Spark's parquet reader
    * only accepts as a raw nanos long (legacy flag, harmless when the
    * file is already timestamp[us]), and plain timestamp[us] (current).
    * Downstream code must not touch `ts` raw — route through
    * Events.withTsUs, which normalizes either shape to integer
    * microseconds (`tus`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }

  def customerDb(spark: SparkSession, dir: String): TripleDb =
    TripleDb.fromWideTable(t(spark, dir, "customer"), "customer", "c_custkey",
      fks = Map("c_nationkey" -> "nation"))

  def nationDb(spark: SparkSession, dir: String): TripleDb =
    TripleDb.fromWideTable(t(spark, dir, "nation"), "nation", "n_nationkey",
      fks = Map("n_regionkey" -> "region"))

  def regionDb(spark: SparkSession, dir: String): TripleDb =
    TripleDb.fromWideTable(t(spark, dir, "region"), "region", "r_regionkey")

  def supplierDb(spark: SparkSession, dir: String): TripleDb =
    TripleDb.fromWideTable(t(spark, dir, "supplier"), "supplier", "s_suppkey",
      fks = Map("s_nationkey" -> "nation"))

  def ordersDb(spark: SparkSession, dir: String): TripleDb =
    TripleDb.fromWideTable(t(spark, dir, "orders"), "orders", "o_orderkey",
      fks = Map("o_custkey" -> "customer"))

  /** The whole star schema as one triple DB. */
  def graph(spark: SparkSession, dir: String): TripleDb =
    TripleDb.unionDisjoint(customerDb(spark, dir), nationDb(spark, dir),
      regionDb(spark, dir), supplierDb(spark, dir), ordersDb(spark, dir))

  /** A quad store exercising GRAPH-SCOPED path walks: per-REGION named
    * graphs holding the 2-hop chain customer —c_nationkey→ nation
    * —n_regionkey→ region, PLUS a decoy edge per nation pointing at
    * the NEXT region, tagged in THAT region's graph. A scoped walk
    * (customer's graph = its true region) can never take the decoy —
    * its first hop and the decoy live in different graphs — while a
    * union-graph walk would: the decoys make graph scoping observable
    * in the answer, not just in the plan.
    */
  def regionQuads(spark: SparkSession, dir: String): graft.core.QuadDb = {
    import org.apache.spark.sql.functions._
    import graft.core.Term
    val nat = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    def regUri(c: org.apache.spark.sql.Column) =
      Term.uriCol(concat(lit("region/"), c.cast("string")))
    val cj = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
    val custQ = cj.select(
      Term.uriCol(concat(lit("customer/"), col("c_custkey").cast("string"))).as("s"),
      Term.lit(Term.TKeyword("c_nationkey")).as("p"),
      Term.uriCol(concat(lit("nation/"), col("c_nationkey").cast("string"))).as("o"),
      regUri(col("n_regionkey")).as("g"))
    val natQ = nat.select(
      Term.uriCol(concat(lit("nation/"), col("n_nationkey").cast("string"))).as("s"),
      Term.lit(Term.TKeyword("n_regionkey")).as("p"),
      regUri(col("n_regionkey")).as("o"),
      regUri(col("n_regionkey")).as("g"))
    val decoy = nat.select(
      Term.uriCol(concat(lit("nation/"), col("n_nationkey").cast("string"))).as("s"),
      Term.lit(Term.TKeyword("n_regionkey")).as("p"),
      regUri((col("n_regionkey") + 1) % 5).as("o"),
      regUri((col("n_regionkey") + 1) % 5).as("g"))
    graft.core.QuadDb(custQ.unionByName(natQ).unionByName(decoy))
  }

  /** Customer facts as a QUAD store: each customer's triples live in
    * the named graph of their nation (`nation/<key>`) — the
    * per-tenant/per-source graph layout real RDF warehouses use. The
    * graph tag is a narrow column map over the unpivot (no shuffle,
    * distinctness preserved).
    */
  def customerQuads(spark: SparkSession, dir: String): graft.core.QuadDb = {
    import org.apache.spark.sql.functions._
    import graft.core.Term
    val cust = t(spark, dir, "customer")
    // duplicate the nation key into a raw passenger column: `keep`
    // EXCLUDES a column from the unpivot, and the graph tag must not
    // cost the store its c_nationkey facts (the full relation and the
    // per-predicate slices must describe the SAME store)
    val custK = cust.withColumn("__nk", col("c_nationkey"))
    val tdb = TripleDb.fromWideTable(custK, "customer",
      "c_custkey", fks = Map("c_nationkey" -> "nation"),
      keep = Seq("__nk"))
    val g = Term.uriCol(concat(lit("nation/"), col("__nk").cast("string")))
    // per-predicate slices carry g too — a ground-predicate quad scan
    // reads three columns of the ONE table instead of the unpivoted
    // union, exactly like the triple store's slices (PlanSpec-pinned)
    val subj = Term.uriCol(concat(lit("customer/"), col("c_custkey").cast("string")))
    val dtypes = cust.schema.fields.map(f => f.name -> f.dataType).toMap
    val slices = cust.columns.toSeq.filter(_ != "c_custkey").map { c =>
      val obj =
        if (c == "c_nationkey")
          when(col(c).isNull, Term.lit(Term.TNil))
            .otherwise(Term.uriCol(concat(lit("nation/"), col(c).cast("string"))))
        else Term.fromRaw(col(c), dtypes(c))
      val gSlice =
        Term.uriCol(concat(lit("nation/"), col("c_nationkey").cast("string")))
      c -> cust.select(subj.as("s"), Term.lit(Term.TKeyword(c)).as("p"),
        obj.as("o"), gSlice.as("g"))
    }.toMap
    graft.core.QuadDb(
      tdb.df.withColumn("g", g).select("s", "p", "o", "g"),
      slices, tdb.stats, distinct = tdb.distinct)
  }
}
