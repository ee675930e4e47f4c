package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Comparison, Condition, Value}
import graft.storage.IndexedStore

/** Zone-map file skipping (the checkpoint's per-file min/max tier):
  * a probe reads strictly fewer FILES with the tier on, results are
  * bit-identical with it off, and the conservative-admit rules
  * (missing bounds, incomparable types, surrogate strings, boundary
  * values) never prune a file that could hold a match. */
class ZoneMapSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_zonemap_spec").toString + "/store"

  private def numFilesRead(df: DataFrame): Long = {
    df.collect()
    Bench.filesReadOf(df).toLong
  }

  // l_shipdate reads back as TIMESTAMP_NTZ (pyarrow timestamp[us]) —
  // NTZ probes keep engine and zone-bound compares timezone-free
  private def ts(s: String) = java.time.LocalDateTime.parse(s)

  /** The gate fixture, built by the SAME code as sc_zonemap and the
    * bench zoneOps measurement (StorageOps.buildZoneBands) — the spec
    * must test the store shape the gate ships. */
  private def buildBandedStore(): String = {
    val path = tmp()
    graft.operators.StorageOps.buildZoneBands(spark, sf, path)
    path
  }

  private def withZoneMaps[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption("graft.store.zonemap")
    spark.conf.set("graft.store.zonemap", on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("graft.store.zonemap", v)
      case None => spark.conf.unset("graft.store.zonemap")
    }
  }

  test("range probe prunes files inside surviving buckets, results identical") {
    val path = buildBandedStore()
    val conds = Seq(Condition.between("l_shipdate",
      ts("1996-01-01T00:00:00"), ts("1997-01-01T00:00:00"),
      minIncl = true, maxIncl = false))
    val (rowsOn, filesOn) = withZoneMaps(on = true) {
      val df = IndexedStore.find(spark, path, conds)
      (df.collect().toSet, numFilesRead(IndexedStore.find(spark, path, conds)))
    }
    val (rowsOff, filesOff) = withZoneMaps(on = false) {
      val df = IndexedStore.find(spark, path, conds)
      (df.collect().toSet, numFilesRead(IndexedStore.find(spark, path, conds)))
    }
    assert(rowsOn == rowsOff, "zone maps changed the result")
    assert(rowsOn.nonEmpty, "fixture probe returned nothing")
    // shipdate has no layout: with the tier off every data file is
    // read; on, only the 1996 append's files survive their bounds
    assert(filesOn < filesOff,
      s"no file skipping: $filesOn files with zone maps vs $filesOff without")
    // the 1996 band landed as ONE coalesced append: at most one file
    // per occupied bucket
    assert(filesOn <= 8, s"1996 probe read $filesOn files, expected ≤ 8")
  }

  test("probe outside every band reads zero files") {
    val path = buildBandedStore()
    val conds = Seq(Condition.between("l_shipdate",
      ts("2005-01-01T00:00:00"), ts("2006-01-01T00:00:00")))
    withZoneMaps(on = true) {
      val df = IndexedStore.find(spark, path, conds)
      assert(df.count() == 0)
      assert(numFilesRead(IndexedStore.find(spark, path, conds)) == 0,
        "a provably-empty probe still opened data files")
    }
  }

  test("boundary values are admitted (inclusive bounds, no over-pruning)") {
    val path = buildBandedStore()
    // the exact minimum shipdate of the 1996 band — a file whose
    // zmin equals the probe value must be kept
    val minTs = withZoneMaps(on = false) {
      IndexedStore.find(spark, path, Seq(Condition.between("l_shipdate",
          ts("1996-01-01T00:00:00"), ts("1997-01-01T00:00:00"),
          minIncl = true, maxIncl = false)))
        .agg(min("l_shipdate")).head().getAs[Any](0)
    }
    val conds = Seq(Condition.eq("l_shipdate", minTs))
    val on = withZoneMaps(on = true) {
      IndexedStore.find(spark, path, conds).collect().toSet
    }
    val off = withZoneMaps(on = false) {
      IndexedStore.find(spark, path, conds).collect().toSet
    }
    assert(on == off)
    assert(on.nonEmpty)
  }

  test("tombstoned rows stay deleted through the zone-pruned reader") {
    val path = buildBandedStore()
    IndexedStore.delete(spark, path,
      Seq(Condition.between("l_quantity", 1.0, 10.0)))
    val conds = Seq(Condition.between("l_shipdate",
      ts("1996-01-01T00:00:00"), ts("1997-01-01T00:00:00"),
      minIncl = true, maxIncl = false))
    val on = withZoneMaps(on = true) {
      IndexedStore.find(spark, path, conds).collect().toSet
    }
    val off = withZoneMaps(on = false) {
      IndexedStore.find(spark, path, conds).collect().toSet
    }
    assert(on == off)
    assert(on.nonEmpty)
    assert(!on.exists(r => r.getAs[Double]("l_quantity") <= 10.0))
  }

  test("zoneAdmits: overlap algebra and conservative admission") {
    import IndexedStore.{ZoneRange, zoneAdmits}
    val zones = Map("x" -> ZoneRange(10L, 20L))
    def cond(cmp: Comparison) = Seq(Condition("x", cmp))
    // equality in/out of bounds
    assert(zoneAdmits(zones, cond(Comparison.Equal(Value.of(10L)))))
    assert(zoneAdmits(zones, cond(Comparison.Equal(Value.of(20L)))))
    assert(!zoneAdmits(zones, cond(Comparison.Equal(Value.of(9L)))))
    assert(!zoneAdmits(zones, cond(Comparison.Equal(Value.of(21L)))))
    // int probe against long bounds widens
    assert(zoneAdmits(zones, cond(Comparison.Equal(Value.of(15)))))
    // one-sided strictness at the boundary
    assert(zoneAdmits(zones, cond(Comparison.Less(Value.of(11L), orEqual = false))))
    assert(!zoneAdmits(zones, cond(Comparison.Less(Value.of(10L), orEqual = false))))
    assert(zoneAdmits(zones, cond(Comparison.Less(Value.of(10L), orEqual = true))))
    assert(!zoneAdmits(zones, cond(Comparison.Greater(Value.of(20L), orEqual = false))))
    assert(zoneAdmits(zones, cond(Comparison.Greater(Value.of(20L), orEqual = true))))
    // between exclusivity at the touching point
    assert(zoneAdmits(zones,
      cond(Comparison.Between(Value.of(20L), true, Value.of(30L), true))))
    assert(!zoneAdmits(zones,
      cond(Comparison.Between(Value.of(20L), false, Value.of(30L), true))))
    assert(!zoneAdmits(zones,
      cond(Comparison.Between(Value.of(0L), true, Value.of(10L), false))))
    // AND semantics: any disproof prunes
    assert(!zoneAdmits(zones, Seq(
      Condition("x", Comparison.Equal(Value.of(15L))),
      Condition("x", Comparison.Equal(Value.of(25L))))))
    // column without bounds, column-ref probe, incomparable type: admit
    assert(zoneAdmits(zones, Seq(Condition.eq("y", 99L))))
    assert(zoneAdmits(zones, cond(Comparison.Equal(Value.column("y")))))
    assert(zoneAdmits(zones, cond(Comparison.Equal(Value.of("not-a-number")))))
  }

  test("zoneCmp: surrogate-pair strings are incomparable, plain strings compare") {
    import IndexedStore.zoneCmp
    assert(zoneCmp("apple", "banana").contains(-1))
    assert(zoneCmp("pear", "pear").contains(0))
    // U+1F600 needs a surrogate pair in UTF-16: UTF-8/UTF-16 orders
    // can diverge there, so the compare must refuse
    assert(zoneCmp("😀", "z").isEmpty)
    assert(zoneCmp(1.5, 2).contains(-1))
    assert(zoneCmp(3L, 3).contains(0))
  }

  test("zoneCmp mirrors engine coercion: exact decimals, −0.0, mixed floats") {
    import IndexedStore.zoneCmp
    def bd(s: String) = new java.math.BigDecimal(s)
    // decimals past double precision compare EXACTLY (a doubleValue
    // round-trip would call these equal and misprune)
    assert(zoneCmp(bd("100.000000000000000002"),
      bd("100.000000000000000001")).contains(1))
    assert(zoneCmp(bd("100.000000000000000001"),
      bd("100.000000000000000001")).contains(0))
    // decimal × integral stays exact through BigDecimal
    assert(zoneCmp(bd("9007199254740993"), 9007199254740992L).contains(1))
    assert(zoneCmp(42L, bd("42.0")).contains(0))
    // SQL equality: −0.0 matches 0.0 (Double.compare alone orders them)
    assert(zoneCmp(-0.0, 0.0).contains(0))
    assert(zoneCmp(0.0, -0.0).contains(0))
    // a float operand promotes the comparison to double, like the engine
    assert(zoneCmp(2.5f, 2L).contains(1))
  }
}
