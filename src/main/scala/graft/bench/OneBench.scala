package graft.bench
import org.apache.spark.sql.SparkSession
object OneBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("GRAFT_STATE_PROVIDER").contains("rocksdb")) {
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      b.config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val r = StreamBench.run(s, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), numBuckets = 32)
    println(s"RESULT turns=${r.turns} sec=${r.sec} tps=${r.turnsPerSec} " +
      s"root=${r.benchRoot} fs=${r.fsType}")
    println("BATCHES " + r.batchesJson)
    s.stop()
  }
}
