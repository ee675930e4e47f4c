package graft

import org.apache.spark.sql.functions._
import graft.core.{Condition, Store, Tables}

/** Mirrors the reference crate's own test suite (src/lib.rs:245-432)
  * against the Spark Store. */
class StoreSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def mk(rows: Seq[(String, String)]): Store =
    Store.fromData(rows.toDF("a", "b"), Seq("a", "b"))

  test("it_works: find with no conditions returns everything") {
    val s = mk(Seq(("a1", "a2"), ("b1", "b2"), ("c1", "c2")))
    assert(s.find().count() == 3)
  }

  test("it_filters: equality condition on one column") {
    val s = mk(Seq(("a", "x1"), ("a", "x2"), ("b", "x3")))
    val got = s.find(Condition.eq("a", "a"))
    assert(got.count() == 2)
    assert(got.filter(col("a") =!= "a").count() == 0)
  }

  test("it_filters_with_partial_indices: two ANDed conditions") {
    val s = mk(Seq(("a", "x1"), ("a", "x2"), ("b", "x3")))
    val got = s.find(Condition.eq("a", "a"), Condition.eq("b", "x2"))
    assert(got.count() == 1)
  }

  test("rowids are dense, ordered, and stable under insert") {
    val base = mk(Seq(("b", "2"), ("a", "1"), ("c", "3")))
    val ids = base.data.orderBy("a").select("__rowid").as[Long].collect()
    assert(ids.sameElements(Array(0L, 1L, 2L)), s"got ${ids.toSeq}")
    val grown = base.insert(Seq(("e", "5"), ("d", "4")).toDF("a", "b"))
    val all = grown.data.orderBy("a").select("__rowid").as[Long].collect()
    assert(all.sameElements(Array(0L, 1L, 2L, 3L, 4L)), s"got ${all.toSeq}")
  }

  test("it_deletes / rowids not reused") {
    val s = mk(Seq(("a", "x1"), ("a", "x2"), ("b", "x3")))
    val d = s.delete(Condition.eq("a", "a"))
    assert(d.count() == 1)
    // survivor keeps its original id (2), not renumbered to 0
    assert(d.data.select("__rowid").as[Long].head() == 2L)
    val grown = d.insert(Seq(("z", "z1")).toDF("a", "b"))
    assert(grown.data.filter(col("a") === "z").select("__rowid").as[Long].head() == 3L)
  }

  test("filtered_delete: delete_filter with row predicate") {
    val s = mk(Seq(("a1", "a2"), ("b1", "b2"), ("c1", "c2")))
    val d = s.deleteFilter(Seq.empty, col("a") =!= "b1")
    assert(d.count() == 1)
    assert(d.data.select("a").as[String].head() == "b1")
  }

  test("numbering is deterministic across runs on real data") {
    val t = Tables(spark, sf)
    val s1 = Store.fromData(t.customer, Seq("c_custkey"))
    val s2 = Store.fromData(t.customer, Seq("c_custkey"))
    val j = s1.data.select(col("__rowid").as("r1"), col("c_custkey"))
      .join(s2.data.select(col("__rowid").as("r2"), col("c_custkey")), "c_custkey")
    assert(j.filter(col("r1") =!= col("r2")).count() == 0)
  }
}
