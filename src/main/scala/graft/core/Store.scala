package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Spark-first re-expression of the reference `Store`
  * (src/lib.rs:55-206): rows keyed by an autoincrement rowid
  * (lib.rs:178-187), queried via ANDed conditions, with an
  * add/remove-only mutation surface (README.md:31).
  *
  * A `Store` wraps an immutable DataFrame carrying a `__rowid` column;
  * `insert`/`delete` return a new `Store` (persistent-data-structure
  * style — the natural Spark shape for the reference's rowid
  * discipline: deleted ids are never reused, later inserts keep
  * counting up).
  *
  * Rowid assignment is the scale-sensitive part. A naive global
  * `row_number()` window is a single-partition bottleneck, so
  * [[Store.withRowIds]] range-repartitions by the ordering key, sorts
  * within partitions, and dense-numbers with `zipWithIndex` (a count
  * job for per-partition offsets, then a parallel map — no stage ever
  * sees more than one partition). Deterministic for a unique ordering
  * key, and holds at 10^12 rows where a global window would not.
  */
final class Store private (val data: DataFrame, orderCols: Seq[String]) {

  /** All rows matching the ANDed conditions — `Store::find`
    * (src/lib.rs:130-137). Index choice (lib.rs:98-120) is delegated
    * to Catalyst: the same predicates drive parquet pushdown and
    * pruning when the underlying data is laid out by
    * [[graft.storage.IndexedStore]]. */
  def find(conds: Condition*): DataFrame =
    data.filter(Condition.all(conds))

  /** Column check + dense numbering continuing past the current max
    * rowid — the shared tail of every mutation that adds rows.
    * max() is a cheap full-column agg (parquet stats serve it at
    * rest); an EMPTY store yields null there and the numbering starts
    * from 0. The batch is densely numbered by the same distributed
    * scheme as [[Store.withRowIds]]. */
  private def numberAfterMax(batch: DataFrame): DataFrame = {
    val cols = data.columns.filter(_ != Store.RowId)
    require(batch.columns.sorted.sameElements(cols.sorted),
      s"batch columns ${batch.columns.mkString(",")} != store columns ${cols.mkString(",")}")
    val next = Option(data.agg(max(col(Store.RowId))).head.get(0))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    Store.withRowIds(batch.select(cols.map(col).toSeq: _*), orderCols)
      .withColumn(Store.RowId, col(Store.RowId) + lit(next))
  }

  /** Append a batch — `Store::insert` (src/lib.rs:178-187). New rows
    * get rowids after all existing rows, ordered by the store's
    * ordering key within the batch. */
  def insert(batch: DataFrame): Store =
    new Store(data.unionByName(numberAfterMax(batch)), orderCols)

  /** Remove all rows matching the conditions — `Store::delete`
    * (src/lib.rs:140-142). Surviving rows keep their rowids. */
  def delete(conds: Condition*): Store =
    new Store(data.filter(!Condition.all(conds)), orderCols)

  /** MERGE-style upsert keyed on the store's ordering key: every live
    * row whose key appears in the batch is retired (delete semantics,
    * src/lib.rs:140-142 — its rowid is never reused), then the WHOLE
    * batch inserts with fresh ids after the current max (insert
    * semantics, src/lib.rs:178-187). The reference composes this as
    * delete-then-insert; one method keeps it a single logical commit
    * and a single plan.
    *
    * Scale shape: the retire step is one left-anti join on the key —
    * Catalyst broadcasts a small batch, else it is a co-shuffled hash
    * join, linear either way. The id base is max(__rowid) over the
    * FULL pre-upsert store (replaced rows included): parquet
    * column stats serve the max at rest, and counting from the full
    * store preserves the never-reuse discipline even when the current
    * max is itself being replaced. */
  /** SQL MERGE rejects duplicate source matches; silence here would
    * leave two live rows per duplicated key and make their relative
    * numbering nondeterministic. One count-vs-distinct action on the
    * (small) batch buys the loud failure — shared by [[upsert]] and
    * [[merge]]. Returns the key projection for reuse. */
  private def requireUniqueKeys(batch: DataFrame, op: String): DataFrame = {
    val keys = batch.select(orderCols.map(col).toSeq: _*)
    require(keys.count() == keys.distinct().count(),
      s"$op source has duplicate ${orderCols.mkString("(", ",", ")")} keys")
    keys
  }

  def upsert(batch: DataFrame): Store = {
    val keys = requireUniqueKeys(batch, "upsert")
    val survivors = data.join(keys, orderCols, "left_anti")
    new Store(survivors.unionByName(numberAfterMax(batch)), orderCols)
  }

  /** `Store::delete_filter` (src/lib.rs:149-169): delete rows matching
    * the conditions AND the extra row predicate. */
  def deleteFilter(conds: Seq[Condition], f: Column): Store =
    new Store(data.filter(!(Condition.all(conds) && f)), orderCols)

  /** Three-way MERGE keyed on the store's ordering key — the full
    * lakehouse `MERGE INTO` clause set (Delta/Iceberg spell it the
    * same way), which [[upsert]] deliberately does NOT provide:
    *
    *  - WHEN MATCHED AND `deleteWhen` THEN DELETE — matched target
    *    rows satisfying the predicate (over `t.*`/`s.*`) are removed;
    *    their rowids retire, never reused (src/lib.rs:140-142).
    *  - WHEN MATCHED THEN UPDATE SET `updateSet` — remaining matched
    *    rows update IN PLACE and KEEP their rowids (the semantic
    *    difference from upsert, whose replace-rows re-number).
    *    `updateSet` maps target columns to expressions over the
    *    joined frame (`t.` = target, `s.` = source).
    *  - WHEN NOT MATCHED THEN INSERT — source rows with no target
    *    match insert with fresh ids after the current max
    *    (src/lib.rs:178-187 numbering discipline).
    *
    * Scale shape: ONE left outer equi-join on the key (broadcast for
    * a small source, co-shuffled hash join otherwise), one left-anti
    * for the insert set, and the shared distributed numbering tail —
    * no window, no collect. Duplicate source keys are rejected loudly
    * (SQL MERGE's multiple-matched-rows error): silence would leave
    * matched updates nondeterministic. */
  def merge(source: DataFrame, updateSet: Map[String, Column],
      deleteWhen: Option[Column] = None): Store = {
    requireUniqueKeys(source, "merge")
    // (source column compatibility is enforced by numberAfterMax on
    // the insert branch — the shared check, not a duplicate here)
    val cols = data.columns.filter(_ != Store.RowId).toSet
    // a SET column that names nothing in the store is a typo that
    // would otherwise no-op silently — SQL MERGE rejects it, so do we
    val unknown = updateSet.keySet.diff(cols)
    require(unknown.isEmpty,
      s"merge updateSet names non-store columns: ${unknown.mkString(",")}")
    // SET on the merge key itself would rewrite a key in place and
    // silently break the unique-key invariant that withRowIds /
    // numberAfterMax determinism and upsert's key discipline depend
    // on — SQL MERGE engines commonly reject updating the merge key
    val keyed = updateSet.keySet.intersect(orderCols.toSet)
    require(keyed.isEmpty,
      s"merge updateSet may not SET the merge key columns: ${keyed.mkString(",")}")
    // explicit matched marker: key columns may be nullable in general,
    // so "source key is not null" is not a safe matched test
    val joined = data.as("t")
      .join(source.withColumn("__matched", lit(true)).as("s"),
        orderCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _),
        "left")
    val matched = coalesce(col("s.__matched"), lit(false))
    // SQL MERGE treats a NULL clause condition as NOT satisfied: the
    // row falls through to the UPDATE clause — coalesce, or Spark's
    // filter would silently DROP the row on NULL
    val del = coalesce(deleteWhen.getOrElse(lit(false)), lit(false))
    val survivors = joined.filter(!matched || !del)
      .select(data.columns.map { c =>
        if (c == Store.RowId) col(s"t.$c").as(c)
        else when(matched, updateSet.getOrElse(c, col(s"t.$c")))
          .otherwise(col(s"t.$c")).as(c)
      }.toSeq: _*)
    val inserts = source.join(
      data.select(orderCols.map(col).toSeq: _*), orderCols, "left_anti")
    new Store(survivors.unionByName(numberAfterMax(inserts)), orderCols)
  }

  /** Row count, `find(&[]).count()` style. */
  def count(): Long = data.count()

  /** Eagerly materialize the store contents (rowid numbering included)
    * into executor storage and truncate the lineage. A store in the
    * reference is built ONCE and then serves many finds
    * (benches/bench.rs:47); a handle that re-derives the dense
    * numbering on every probe times construction, not the query.
    * Backed by `localCheckpoint` — swap for reliable `checkpoint()`
    * on a cluster where executor loss must not drop the store. */
  def materialized: Store = new Store(data.localCheckpoint(), orderCols)
}

object Store {
  val RowId = "__rowid"

  /** Build a store from a batch, assigning rowids 0..n-1 by the given
    * total ordering (the distributed dense-numbering described on the
    * class). `orderCols` must be a unique key for determinism. */
  def fromData(df: DataFrame, orderCols: Seq[String]): Store =
    new Store(withRowIds(df, orderCols), orderCols)

  /** Distributed deterministic dense numbering: ids follow the total
    * order of `orderCols`, but no stage sees more than one partition
    * of data. Implemented on the RDD because `zipWithIndex` pins one
    * concrete partitioning for both its count job and the numbering
    * map — a two-job DataFrame formulation (offsets job + window job)
    * can see different range boundaries under AQE re-planning. */
  private[graft] def withRowIds(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val oc = orderCols.map(col)
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(parts, oc: _*).sortWithinPartitions(oc: _*)
    val schema = sorted.schema.add(RowId, LongType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(numbered, schema)
  }
}
