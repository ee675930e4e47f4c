package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.core.{Store, Tables}
import graft.storage.{HashIndex, IndexedStore}

/** Streaming ingestion CDC over an [[IndexedStore]] — `readStream`
  * on the store's COMMIT LOG so a consumer observes exactly the
  * committed-generation sequence, the Delta-transaction-log pattern
  * applied to the manifest protocol:
  *
  *  - the log entry (`_graft_log/<gen>.json`) is published atomically
  *    AFTER the manifest pointer swap, so a generation is visible to
  *    the stream IFF it committed — a crashed build's directory, or a
  *    build that finished but lost its writer token before the swap,
  *    never produces an entry (spec-pinned with a complete-looking
  *    stray generation);
  *  - entries are metadata-sized (seq, gen, prev), so the stream
  *    itself shuffles nothing corpus-scale: each micro-batch turns
  *    its newly observed commits into row-level CDC with the
  *    [[graft.operators.StorageOps.scGenDiff]] contract — rowids are
  *    stable across commits (the append/rewrite discipline of
  *    [[Store]]), so removed = prev ⟕̸ cur and added = cur ⟕̸ prev,
  *    two rowid anti-joins per commit, no content comparison. The
  *    first commit has no predecessor and streams as the initial
  *    snapshot (every row `added`) — the standard CDC bootstrap.
  *
  * Scale shape: the tail reads O(commits) tiny files; each commit's
  * diff is two anti-joins between two generations of the SAME
  * bucketed layout. The consumer must keep up within the store's
  * retention window (the sweep reclaims generations beyond it) —
  * the same contract every log-structured CDC source carries.
  */
object StoreStream {

  private val LogSchema = StructType(Seq(
    StructField("seq", LongType), StructField("gen", StringType),
    StructField("prev", StringType)))

  /** Columns the fixture CDC carries (the [[graft.operators.StorageOps]]
    * gen-diff projection; a generic deployment would keep the store's
    * full schema). */
  private val Keep = Seq(IndexedStore.RowId, "c_custkey", "c_mktsegment")

  /** The two-commit fixture store (v1 = full customer, v2 = a
    * curation rewrite without the BUILDING segment — the
    * [[graft.operators.StorageOps.scTimeTravel]] shape) built fresh
    * under its own scratch root so its commit log exists from birth. */
  private def ingestStore(spark: SparkSession, dir: String): String = {
    val path = graft.operators.StorageOps.scratch("ingestlog", dir)
    graft.operators.StorageOps.buildOnce(path) {
      val store = Store.fromData(Tables(spark, dir).customer, Seq("c_custkey"))
      IndexedStore.write(store.data, path, HashIndex("c_mktsegment", 8))
      IndexedStore.write(
        store.data.filter(col("c_mktsegment") =!= "BUILDING"),
        path, HashIndex("c_mktsegment", 8))
    }
    path
  }

  /** Row-level CDC for one committed generation: the initial snapshot
    * (`prev` absent) streams every row as `added`; later commits are
    * the two stable-rowid anti-joins. */
  private[graft] def diffFor(spark: SparkSession, path: String, seq: Long,
      gen: String, prev: Option[String]): DataFrame = {
    val cur = IndexedStore.openAt(spark, path, gen)
      .find(Nil).select(Keep.head, Keep.tail: _*)
    val changes = prev match {
      case None => cur.withColumn("change", lit("added"))
      case Some(p) =>
        val past = IndexedStore.openAt(spark, path, p)
          .find(Nil).select(Keep.head, Keep.tail: _*)
        past.join(cur, Seq(IndexedStore.RowId), "left_anti")
          .withColumn("change", lit("removed"))
          .unionByName(cur.join(past, Seq(IndexedStore.RowId), "left_anti")
            .withColumn("change", lit("added")))
    }
    changes.select((lit(seq).as("seq") +: col("change") +: Keep.map(col)): _*)
  }

  /** Start the CDC tail on `path`'s commit log. Returns the running
    * query and a thunk yielding everything observed so far (unordered;
    * empty-schema frame before the first commit lands). Package-visible
    * so the spec can drive commits mid-stream. */
  private[graft] def startCdc(rootSpark: SparkSession, path: String):
      (org.apache.spark.sql.streaming.StreamingQuery, () => DataFrame) = {
    val s = EventStream.streamSession(rootSpark)
    val entries = s.readStream.schema(LogSchema)
      .json(IndexedStore.commitLogDir(path))
    val parts = new scala.collection.mutable.ListBuffer[DataFrame]
    val q = entries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // commit metadata only — tiny by construction; the row-level
        // work stays distributed inside each diff's anti-joins
        val commits = batch.select("seq", "gen", "prev").collect()
          .sortBy(_.getLong(0))
        parts.synchronized {
          commits.foreach { r =>
            parts += diffFor(rootSpark, path, r.getLong(0), r.getString(1),
              Option(r.getString(2)))
          }
        }
      }
      .start()
    val result = () => parts.synchronized {
      if (parts.isEmpty)
        rootSpark.createDataFrame(
          rootSpark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(StructField("seq", LongType) +:
            StructField("change", StringType) +:
            StructField(IndexedStore.RowId, LongType) +:
            Seq(StructField("c_custkey", LongType),
              StructField("c_mktsegment", StringType))))
      else parts.reduce(_.unionByName(_))
    }
    (q, result)
  }

  /** st_ingest — the driver-contract query: tail the fixture store's
    * commit log to completion and emit the full CDC history, ordered
    * for presentation. */
  def stIngest(spark: SparkSession, dir: String): DataFrame = {
    val path = ingestStore(spark, dir)
    val (q, result) = startCdc(spark, path)
    try q.processAllAvailable() finally q.stop()
    result().orderBy("seq", "change", IndexedStore.RowId)
  }

  private val custRowid =
    "row_number() OVER (ORDER BY c_custkey) - 1 AS __rowid"

  /** The batch gen-diff oracle: commit 1 is the initial snapshot,
    * commit 2 removed exactly the BUILDING segment (the rewrite is a
    * pure shrink, so no 'added' rows exist for it). */
  val stIngestSql: String =
    s"""WITH c AS (SELECT c_custkey, c_mktsegment, $custRowid FROM customer)
       |SELECT * FROM (
       |  SELECT 1::BIGINT AS seq, 'added' AS change, __rowid, c_custkey, c_mktsegment
       |  FROM c
       |  UNION ALL
       |  SELECT 2::BIGINT AS seq, 'removed' AS change, __rowid, c_custkey, c_mktsegment
       |  FROM c WHERE c_mktsegment = 'BUILDING') t
       |ORDER BY seq, change, __rowid""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_ingest" -> stIngest,
  )

  def oracles: Map[String, String] = Map(
    "st_ingest" -> stIngestSql,
  )
}
