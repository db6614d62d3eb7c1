package graft.tools

/** One-off: stream_dedup wall time under HDFS vs RocksDB state stores. */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq(
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb2" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "hdfs2" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ).foreach { case (label, cls) =>
      val spark = graft.GraftSession.builder()
        .config("spark.sql.streaming.stateStore.providerClass", cls)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("stream_dedup")(spark, dir).count()
      println(f"STATESTORE $label ${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
      spark.stop()
    }
  }
}
