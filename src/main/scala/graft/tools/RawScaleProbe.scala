package graft.tools
import org.apache.spark.sql.SparkSession
object RawScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // pure CPU: hash a lot of strings, no shuffle
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = spark.range(0, 20000000, 1, cpus.toInt * 2)
        .map(i => ("doc" + i + "word" + (i % 97)).hashCode.toLong % 1000).filter(_ == 0).count()
      println(f"RAW cpus=$cpus round=$round ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n)")
    }
    spark.stop()
  }
}
