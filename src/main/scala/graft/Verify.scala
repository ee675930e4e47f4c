package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query-name subset]
    // The optional third arg is a dev-loop convenience (iterate one
    // operator without paying the full registry); the driver passes
    // two args and gets every query, unchanged.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // A typo'd subset must fail fast, not run zero queries and exit 0
    // — the silent-hole failure mode the failure markers below exist
    // to prevent. (This also rejects stray extra args: anything in
    // position 3 must name real queries.)
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same session confs as Bench via the ONE shared builder (see
    // graft.core.Sessions): the gate must hash-prove the exact
    // configuration the bench runs under, so the copies cannot drift.
    val spark = graft.core.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The ICU-off conf above is only result-preserving on an all-ASCII
    // corpus; enforce that contract loudly before verifying anything.
    graft.core.Sessions.assertAsciiCorpus(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    // A throwing query must be LOUD: round 5 lost 11 operators from the
    // correctness gate as silent holes (stderr-only, rc 0, no output
    // dir reads as "never existed"). Record every failure as (a) a
    // poisoned output dir — stale parquet from a previous run is
    // DELETED (a reused outDir must not report the old result as this
    // run's) and a FAILED.parquet text file is left behind, which any
    // parquet glob matches and errors on visibly (an underscore name
    // like _FAILED would be skipped by convention, as _SUCCESS is),
    // (b) a machine-readable failures.json, and (c) a nonzero exit.
    // The marker writes are best-effort: the likely causes of a write
    // failure (disk full, permissions) would make them throw too, and
    // that must not abort the remaining queries.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter(kv => s.contains(kv._1)))
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failures(name) = msg
        try {
          val qDir = Paths.get(outDir, name)
          if (Files.isDirectory(qDir)) {
            val entries = Files.list(qDir)
            try entries.forEach(p => { Files.deleteIfExists(p): Unit })
            finally entries.close()
          }
          Files.createDirectories(qDir)
          Files.writeString(qDir.resolve("FAILED.parquet"), msg)
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name: could not write failure marker: ${m.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = only.fold(SparkEntry.oracleSql)(s =>
        SparkEntry.oracleSql.filter(kv => s.contains(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty) {
      val fj = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/failures.json"), fj)
      System.err.println(
        s"[verify] ${failures.size}/${selected.size} queries FAILED: " +
          failures.keys.mkString(", "))
    }
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
