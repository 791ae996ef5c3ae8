package graft.bench
import org.apache.spark.sql.SparkSession
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("2,2,2048")
    val Array(n, c, m) = spec.split(",")
    val s = SparkSession.builder()
      .master(s"local-cluster[$n,$c,$m]")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", (n.toInt * c.toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val cnt = s.range(0, 1000000, 1, 16).map(x => graft.gen.Mix.mix64(x)).filter(_ % 2 == 0).count()
    println(s"PROBE local-cluster[$spec] count=$cnt execs=${s.sparkContext.getExecutorMemoryStatus.size}")
    s.stop()
  }
}
