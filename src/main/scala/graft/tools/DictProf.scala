package graft.tools

import graft.Tables
import graft.core.DictDb
import graft.dsl._
import graft.core.Term.TKeyword
import graft.engine.Projections
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dict-store pipeline stages (local use). */
object DictProf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = Tables.graph(spark, dir)
    t("raw count")(db.df.count())
    val dd = t("dictEncode (enc+dict+check)")(db.dictEncode())
    t("enc count")(dd.triples.count())
    t("dict count")(dd.dict.count())
    def kw(n: String) = T(TKeyword(n))
    def pat(a: TermOrVar, b: TermOrVar, c: TermOrVar) = TriplePattern(a, b, c)
    val q = Seq(
      pat(V("c"), kw("c_nationkey"), V("n")),
      pat(V("n"), kw("n_name"), V("nname")),
      pat(V("c"), kw("c_name"), V("cname")))
    t("bgp+decode run1")(
      Projections.selectDf(dd, q, Seq(V("cname"), V("nname"))).count())
    t("bgp+decode run2")(
      Projections.selectDf(dd, q, Seq(V("cname"), V("nname"))).count())
    dd.unpersist()
    // struct path for comparison
    val idx = t("struct index()")(db.index())
    t("struct bgp run1")(
      Projections.selectDf(idx, q, Seq(V("cname"), V("nname"))).count())
    spark.stop()
  }
}
