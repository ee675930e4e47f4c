package graft
object DebugCkptMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Files.createTempDirectory("graft_dbg2").toString + "/store"
    val store = graft.core.Store.fromData(graft.core.Tables(spark, "/root/testdata/sf0.01").customer, Seq("c_custkey"))
    graft.storage.IndexedStore.write(store.data, path, graft.storage.HashIndex("c_mktsegment", 8))
    def walk(d: java.io.File): Seq[String] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap(c => if (c.isDirectory) walk(c) else Seq(c.getPath))
    val gen = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("gen-")).sorted.last
    walk(new java.io.File(path, gen)).filter(_.endsWith(".parquet")).foreach(println)
    val open = graft.storage.IndexedStore.open(spark, path)
    val probe = open.find(Seq(graft.core.Condition.eq("c_mktsegment", "BUILDING")))
    probe.collect()
    println("=== EXEC ===")
    println(probe.queryExecution.executedPlan.toString.take(2500))
    println("filesRead=" + graft.Bench.filesReadOf(probe))
    spark.stop()
  }
}
