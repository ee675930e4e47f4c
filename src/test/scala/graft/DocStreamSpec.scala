package graft

import graft.streaming.DocStream

/** Streaming near-dup: the stateful bucket-collision pass must equal
  * the batch banding's min-representative labeling (computed here
  * from the shared batch pipeline, independently of both the stream
  * and the SQL oracle) and be deterministic across runs. */
class DocStreamSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("st_near_dup equals the batch min-representative labeling") {
    val got = DocStream.stNearDup(spark, sf)
      .as[(Long, Long, String, Long)].collect().toSet
    val bands = graft.operators.Dedup.bandKeys(
        graft.operators.Dedup.minhashSigs(spark, sf))
      .as[(Long, Int, String)].collect()
    val expect = bands.groupBy(b => (b._2, b._3)).iterator.flatMap {
      case ((band, key), rows) =>
        val rep = rows.map(_._1).min
        rows.collect { case (d, _, _) if d != rep =>
          (d, band.toLong, key, rep)
        }
    }.toSet
    assert(got == expect,
      s"stream vs batch diverged: extra=${got -- expect} missing=${expect -- got}")
    assert(got.nonEmpty, "fixture produced no collisions — bucket sizes degenerate")
    got.foreach { case (d, _, _, rep) => assert(rep < d) }
  }

  test("cross-batch: a smaller-id arrival retro-emits the displaced representative") {
    // Batch 1 admits doc 10 (bucket rep). Batch 2 delivers doc 5 with
    // IDENTICAL text: 5 takes over as representative and the displaced
    // 10 must be emitted as the collision row — without it neither doc
    // is ever flagged and the stream silently diverges from the batch
    // labeling (which flags 10 with rep 5).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.DocStream.nearDupPipeline(
      mem.toDF.toDF("doc_id", "text"))
    val name = "neardup_xbatch"
    val q = out.toDF.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      val txt = "the quick brown fox jumps over the lazy dog and then naps"
      mem.addData((10L, txt))
      q.processAllAvailable()
      assert(spark.table(name).isEmpty, "a lone admission must not flag")
      mem.addData((5L, txt))
      q.processAllAvailable()
      val rows = spark.table(name)
        .as[(Long, Long, String, Long)].collect()
      assert(rows.nonEmpty, "the displaced representative was swallowed")
      assert(rows.forall { case (d, _, _, rep) => d == 10L && rep == 5L },
        s"expected doc 10 flagged with rep 5, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("st_near_dup is deterministic across runs") {
    val a = DocStream.stNearDup(spark, sf).collect().toSeq
    val b = DocStream.stNearDup(spark, sf).collect().toSeq
    assert(a == b)
  }
}
