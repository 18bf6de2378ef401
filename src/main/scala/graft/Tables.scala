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
    val tdb = TripleDb.fromWideTable(cust, "customer",
      "c_custkey", fks = Map("c_nationkey" -> "nation"),
      keep = Seq("c_nationkey"))
    val g = Term.uriCol(concat(lit("nation/"), col("c_nationkey").cast("string")))
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
      c -> cust.select(subj.as("s"), Term.lit(Term.TKeyword(c)).as("p"),
        obj.as("o"), g.as("g"))
    }.toMap
    graft.core.QuadDb(
      tdb.df.withColumn("g", g).select("s", "p", "o", "g"),
      slices, tdb.stats, distinct = tdb.distinct)
  }
}
