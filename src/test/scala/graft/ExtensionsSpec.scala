package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.GraftExtensions

/** The custom expressions are reachable from SQL via the session
  * extension / registry, and agree with the Scala API. */
class ExtensionsSpec extends SparkSpec {

  test("graft_* SQL functions register and agree with the Scala API") {
    GraftExtensions.register(spark)
    Tables(spark, sf).embeddings.limit(50).createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_t")
    val viaApi = spark.table("emb_t").select(col("vec_id"),
      graft.functions.expr.VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("d"))
    assert(viaSql.exceptAll(viaApi).count() == 0)

    Tables(spark, sf).documents.limit(50).createOrReplaceTempView("doc_t")
    val shingleSql =
      """SELECT doc_id, graft_word_shingles(split(trim(regexp_replace(
        |  regexp_replace(lower(text), '[^a-z0-9 ]', ' '), ' +', ' ')), ' '), 3) AS sh
        |FROM doc_t""".stripMargin
    val sh = spark.sql(shingleSql)
    assert(sh.filter(size(col("sh")) > 0).count() > 0)

    val mh = spark.sql(
      s"""SELECT doc_id, graft_minhash_sigs(transform(sh,
         |  s -> cast(conv(substring(md5(s), 1, 8), 16, 10) AS bigint)),
         |  16, ${graft.operators.Dedup.P}L) AS sig
         |FROM ($shingleSql) t""".stripMargin)
    assert(mh.filter(size(col("sig")) === 16).count() == mh.count())

    val sim = spark.sql("SELECT graft_simhash32(array(1L, 2L, 3L)) AS s")
    assert(sim.count() == 1)

    val ch = spark.sql(
      "SELECT graft_word_chunks(array('a','b','c','d','e'), 2) AS c")
      .head.getSeq[String](0)
    assert(ch == Seq("a b", "c d"), s"chunks were $ch")
    val wd = spark.sql(
      "SELECT graft_word_windows(array('a','b','c','d'), 2) AS w")
      .head.getSeq[String](0)
    assert(wd == Seq("a b", "b c", "c d"), s"windows were $wd")

    // the MG aggregate registers like a built-in aggregate: grouped
    // use, exact on a stream narrower than the counter budget
    val hh = spark.sql(
      """SELECT graft_misra_gries(w, 8) AS s FROM (
        |  SELECT explode(array('a','a','a','b','b','c')) AS w)""".stripMargin)
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(hh == Seq(("a", 3L), ("b", 2L), ("c", 1L)), s"mg summary was $hh")
  }
}
