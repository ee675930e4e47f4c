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

  test("upsert replaces matched keys, inserts the rest, never reuses ids") {
    val s = Store.fromData(
      Seq(("a", "old1"), ("b", "old2"), ("c", "old3")).toDF("k", "v"), Seq("k"))
    val up = s.upsert(Seq(("b", "new2"), ("d", "new4")).toDF("k", "v"))
    // replaced key appears exactly once, with the batch's value
    assert(up.data.filter(col("k") === "b").count() == 1)
    assert(up.data.filter(col("k") === "b").select("v").as[String].head() == "new2")
    // untouched rows keep value AND rowid
    assert(up.data.filter(col("k") === "a").select("__rowid").as[Long].head() == 0L)
    assert(up.data.filter(col("k") === "c").select("v").as[String].head() == "old3")
    // the whole batch numbers after the pre-upsert max (2), in key order
    assert(up.data.filter(col("k") === "b").select("__rowid").as[Long].head() == 3L)
    assert(up.data.filter(col("k") === "d").select("__rowid").as[Long].head() == 4L)
    // ≡ the delete∘insert composition the reference would run
    val composed = s.delete(Condition.eq("k", "b"))
      .insert(Seq(("b", "new2"), ("d", "new4")).toDF("k", "v"))
    // same (k, v) content; the composition numbers from the SURVIVOR
    // max, upsert from the full-store max — ids may differ, rows not
    val diff = up.data.select("k", "v").exceptAll(composed.data.select("k", "v")).count() +
      composed.data.select("k", "v").exceptAll(up.data.select("k", "v")).count()
    assert(diff == 0)
  }

  test("merge: matched updates keep rowids, matched deletes retire, unmatched insert") {
    val s = Store.fromData(
      Seq(("a", 1L), ("b", -5L), ("c", 3L), ("d", 4L)).toDF("k", "v"), Seq("k"))
    // source matches a (update), b (delete: v<0), misses e (insert)
    val m = s.merge(
      Seq(("a", 100L), ("b", 200L), ("e", 300L)).toDF("k", "v"),
      updateSet = Map("v" -> (col("t.v") + col("s.v"))),
      deleteWhen = Some(col("t.v") < 0L))
    val rows = m.data.select("k", "v", "__rowid").as[(String, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    // WHEN MATCHED UPDATE: in place, rowid KEPT (0 = a's build position)
    assert(rows("a") == (101L, 0L), s"update in place: ${rows("a")}")
    // WHEN MATCHED AND t.v < 0 DELETE: gone, id never reused
    assert(!rows.contains("b"))
    // untouched rows unchanged
    assert(rows("c") == (3L, 2L) && rows("d") == (4L, 3L))
    // WHEN NOT MATCHED INSERT: numbered after the PRE-merge max (3)
    assert(rows("e") == (300L, 4L), s"insert numbering: ${rows("e")}")
    // duplicate source keys fail loudly, as in SQL MERGE
    val ex = intercept[IllegalArgumentException] {
      s.merge(Seq(("a", 1L), ("a", 2L)).toDF("k", "v"), Map.empty)
    }
    assert(ex.getMessage.contains("duplicate"))
    // an updateSet column that names nothing in the store is a typo —
    // reject it loudly instead of silently no-opping the update
    val ex2 = intercept[IllegalArgumentException] {
      s.merge(Seq(("a", 1L)).toDF("k", "v"), Map("vv" -> lit(0L)))
    }
    assert(ex2.getMessage.contains("non-store"))
    // SET on the merge key would rewrite a key in place and break the
    // unique-key invariant — rejected like SQL MERGE engines do
    val ex3 = intercept[IllegalArgumentException] {
      s.merge(Seq(("a", 1L)).toDF("k", "v"), Map("k" -> lit("z")))
    }
    assert(ex3.getMessage.contains("merge key"))
  }

  test("merge: a NULL delete predicate means NOT deleted — the row updates") {
    // SQL MERGE semantics: a NULL clause condition is not satisfied,
    // so the matched row falls through to the UPDATE clause. An
    // unguarded filter would silently DROP it (filter drops NULL).
    val s = Store.fromData(
      Seq(("a", Some(1L)), ("b", None)).toDF("k", "v"), Seq("k"))
    val m = s.merge(
      Seq(("a", 10L), ("b", 20L)).toDF("k", "v"),
      updateSet = Map("v" -> col("s.v")),
      deleteWhen = Some(col("t.v") < 0L)) // NULL for b's null v
    val rows = m.data.select("k", "v").as[(String, Long)].collect().toMap
    assert(rows.keySet == Set("a", "b"),
      s"NULL delete predicate dropped a matched row: $rows")
    assert(rows("b") == 20L, "the NULL-predicate row must take the UPDATE")
  }

  test("mutations on an EMPTY store number from 0; duplicate upsert keys fail loudly") {
    val empty = Store.fromData(Seq.empty[(String, String)].toDF("k", "v"), Seq("k"))
    // the 'initialize empty, merge batches' path: max(__rowid) is null
    val seeded = empty.upsert(Seq(("a", "v1"), ("b", "v2")).toDF("k", "v"))
    assert(seeded.data.select("__rowid").as[Long].collect().sorted.sameElements(Array(0L, 1L)))
    val inserted = empty.insert(Seq(("c", "v3")).toDF("k", "v"))
    assert(inserted.data.select("__rowid").as[Long].head() == 0L)
    // SQL MERGE semantics: duplicate source keys are an error, not
    // two silent live rows
    val ex = intercept[IllegalArgumentException] {
      seeded.upsert(Seq(("b", "x"), ("b", "y")).toDF("k", "v"))
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("numbering is deterministic across runs on real data") {
    val t = Tables(spark, sf)
    val s1 = Store.fromData(t.customer, Seq("c_custkey"))
    val s2 = Store.fromData(t.customer, Seq("c_custkey"))
    val j = s1.data.select(col("__rowid").as("r1"), col("c_custkey"))
      .join(s2.data.select(col("__rowid").as("r2"), col("c_custkey")), "c_custkey")
    assert(j.filter(col("r1") =!= col("r2")).count() == 0)
  }

  test("display: conditions render like the reference's Display impl") {
    // reference src/cmp.rs:175-189 (`display` test): a column ref
    // renders bracketed, a constant bare — names instead of indices
    import graft.core.{Comparison, Value}
    assert(Condition("c0", Comparison.Equal(Value.column("c1"))).describe
      == "[c0] = [c1]")
    assert(Condition.eq("c0", "a").describe == "[c0] = a")
    // the range extensions use Bound-style interval brackets
    assert(Condition.between("k", 1, 5, minIncl = true, maxIncl = false)
      .describe == "[k] in [1, 5)")
    assert(Condition("k", Comparison.Greater(Value.of(0), orEqual = true))
      .describe == "[k] >= 0")
    // toString IS the rendering (the Display contract)
    assert(Condition.eq("c0", "a").toString == "[c0] = a")
  }
}
