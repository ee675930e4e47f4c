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

  test("st_near_dup is deterministic across runs") {
    val a = DocStream.stNearDup(spark, sf).collect().toSeq
    val b = DocStream.stNearDup(spark, sf).collect().toSeq
    assert(a == b)
  }
}
