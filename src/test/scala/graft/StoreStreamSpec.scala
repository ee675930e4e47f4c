package graft

import org.apache.spark.sql.functions.col
import graft.core.{Store, Tables}
import graft.storage.{HashIndex, IndexedStore}
import graft.streaming.StoreStream

/** Commit-log CDC: the stream must observe exactly the committed
  * generation sequence — incrementally as commits land mid-stream,
  * never a crashed/unpublished build — and each commit's row-level
  * diff must ride the stable-rowid contract sc_gen_diff pins. */
class StoreStreamSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_cdc_$tag")
    // the store writes its own layout under this root
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  test("CDC observes commits incrementally, in order, as they land mid-stream") {
    val path = freshRoot("incr")
    val data = Store.fromData(Tables(spark, sf).customer, Seq("c_custkey")).data
      .select(col(IndexedStore.RowId), col("c_custkey"), col("c_mktsegment"))
      .cache()
    IndexedStore.write(data, path, HashIndex("c_mktsegment", 4))
    val (q, result) = StoreStream.startCdc(spark, path)
    try {
      q.processAllAvailable()
      val snap = result().collect()
      assert(snap.map(_.getLong(0)).distinct.toSeq == Seq(1L),
        "only the initial snapshot is committed yet")
      assert(snap.length == data.count(),
        "initial snapshot streams every row as added")
      assert(snap.forall(_.getString(1) == "added"))
      // a second commit lands while the stream is RUNNING
      IndexedStore.write(data.filter(col("c_mktsegment") =!= "BUILDING"),
        path, HashIndex("c_mktsegment", 4))
      q.processAllAvailable()
      val all = result().collect()
      val seq2 = all.filter(_.getLong(0) == 2L)
      assert(seq2.nonEmpty, "the mid-stream commit was never observed")
      assert(seq2.forall(_.getString(1) == "removed"),
        "a pure curation shrink diffs as removals only")
      // rowid stability: the removed rowids are exactly v1's BUILDING rowids
      val expect = data.filter(col("c_mktsegment") === "BUILDING")
        .select(IndexedStore.RowId).collect().map(_.getLong(0)).toSet
      assert(seq2.map(_.getLong(2)).toSet == expect)
    } finally {
      q.stop()
      data.unpersist()
    }
  }

  test("an unpublished (crashed-build) generation is invisible to the stream") {
    val path = freshRoot("stray")
    val data = Store.fromData(Tables(spark, sf).customer, Seq("c_custkey")).data
    IndexedStore.write(data, path, HashIndex("c_mktsegment", 4))
    // a complete-LOOKING generation directory with no manifest entry
    // and no log entry — the wreck a crash between build and pointer
    // swap leaves behind
    val stray = new java.io.File(path, "gen-000099")
    assert(stray.mkdirs())
    val marker = new java.io.File(stray, "_graft_stats.properties")
    assert(marker.createNewFile())
    val (q, result) = StoreStream.startCdc(spark, path)
    try {
      q.processAllAvailable()
      val seqs = result().select("seq").distinct()
        .collect().map(_.getLong(0)).toSeq
      assert(seqs == Seq(1L),
        s"stream must see only committed generations, saw seqs $seqs")
    } finally q.stop()
  }

  test("st_ingest matches an independent batch recompute of the commit history") {
    val got = StoreStream.stIngest(spark, sf).collect()
    val base = Store.fromData(Tables(spark, sf).customer, Seq("c_custkey")).data
      .select(col(IndexedStore.RowId).as("rid"), col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect =
      base.map { case (rid, ck, seg) => (1L, "added", rid, ck, seg) } ++
        base.collect { case (rid, ck, seg) if seg == "BUILDING" =>
          (2L, "removed", rid, ck, seg)
        }
    val gotT = got.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(gotT.toSet == expect.toSet)
    assert(gotT.toSeq == gotT.sortBy(t => (t._1, t._2, t._3)).toSeq,
      "presentation order is (seq, change, rowid)")
  }
}
