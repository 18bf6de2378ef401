package graft

import graft.dsl._
import graft.engine.Projections
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Plan-shape assertions: the physical properties the engine's scale
  * story depends on, locked as tests so regressions show up as
  * failures, not as silently slower benches.
  */
class PlanSpec extends GraftSpec {

  val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ground-predicate pattern scan uses the predicate slice — no explode") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.selectDf(db,
      Seq(pat(V("c"), T(k("c_name")), V("n"))), Seq(V("c"), V("n"))))
    assert(!p.contains("Generate"), s"expected no explode in:\n$p")
  }

  test("variable-predicate pattern falls back to the full (exploded) view") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.selectDf(db,
      Seq(pat(V("c"), V("pred"), V("o"))), Seq(V("c"), V("pred"), V("o"))))
    assert(p.contains("Generate"), "full view requires the unpivot explode")
  }

  test("3-pattern BGP over the star graph: no explode, broadcast joins") {
    val db = Tables.graph(spark, dir)
    val p = plan(Projections.selectDf(db, Seq(
      pat(V("c"), T(k("c_nationkey")), V("n")),
      pat(V("n"), T(k("n_name")), V("nn")),
      pat(V("c"), T(k("c_name")), V("cn"))), Seq(V("cn"), V("nn"))))
    assert(!p.contains("Generate"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("buildDf aggregates with exactly one shuffle (map-side combine)") {
    val db = Tables.customerDb(spark, dir)
    val p = plan(Projections.buildDf(db, V("c"),
      Seq("names" -> V("name")), Seq(pat(V("c"), T(k("c_name")), V("name")))))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in:\n$p")
  }

  test("bruteKnn broadcasts the query side, never shuffles the corpus") {
    val emb = Tables.t(spark, dir, "embeddings")
    val p = plan(ops.Similarity.bruteKnn(emb, emb.where(col("vec_id") < 5), 3))
    assert(p.contains("BroadcastExchange"))
  }

  test("codegen'd dot product stays inside whole-stage codegen") {
    val emb = Tables.t(spark, dir, "embeddings")
    val df = emb.as("a").crossJoin(emb.as("b").limit(5))
      .select(ops.Similarity.dot(col("a.embedding"), col("b.embedding")).as("d"))
    df.collect() // finalize THIS df's adaptive plan (count() plans separately)
    val p = plan(df)
    // the `*(n)` prefix on an operator marks its WholeStageCodegen stage
    assert(p.contains("*(") && p.contains("*(2) Project [dotproductf"),
      s"dot must not break codegen:\n$p")
  }
}
