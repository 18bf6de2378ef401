package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession

/** The custom expressions exposed through SQL. */
class SqlFunctionsSpec extends GraftSpec {

  lazy val sql: SparkSession = { GraftFunctions.register(spark); spark }

  test("dot_f / norm_f from SQL") {
    val r = sql.sql(
      """SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       norm_f(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("simhash64 and word_shingles from SQL") {
    val r = sql.sql(
      """SELECT simhash64(array('a','b','c')) AS h,
        |       word_shingles(array('x','y','z','w'), 3) AS sh""".stripMargin).head()
    assert(r.getLong(0) != 0L)
    assert(r.getSeq[String](1) == Seq("x y z", "y z w"))
  }

  test("minhash_sig / minhash_bands from SQL") {
    val r = sql.sql(
      """SELECT size(minhash_sig(array('a','b'), 16)) AS s,
        |       size(minhash_bands(array('a','b'), 16, 4)) AS b""".stripMargin).head()
    assert(r.getInt(0) == 16 && r.getInt(1) == 4)
  }

  test("registration is per-session; an isolated session registers independently") {
    sql // shared session registered
    val fresh = spark.newSession()
    GraftFunctions.register(fresh)
    val ok = fresh.sql("SELECT norm_f(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(ok == 5.0)
  }
}
