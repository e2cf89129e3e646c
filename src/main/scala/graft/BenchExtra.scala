package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query benchmark harness for optimization work (guide §1.4):
  * times each selected gate with a NOOP SINK (computes every column of
  * every row, no output cost) over several repeats and reports per-repeat
  * seconds, so a single GC pause or JIT warm-up cannot masquerade as a
  * regression. Optionally dumps `.explain("formatted")` per query.
  *
  * This is deliberately a SEPARATE main from [[Bench]] (the driver
  * contract, frozen): nothing here changes what the driver measures.
  *
  *   SPARK_GRAFT_ONLY=cu_,dd_ SPARK_GRAFT_REPEATS=3 \
  *   SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLANS_SUFFIX=_before \
  *   sbt "runMain graft.BenchExtra"
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      builder.config("spark.local.dir", s"/dev/shm/graft-bench-local")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val plansSuffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "")
    plansDir.foreach(d => new java.io.File(d).mkdirs())

    // session warm-up, mirroring Bench's absorb job
    scala.util.Try {
      val wdocs = spark.read.parquet(s"$sfDir/documents.parquet")
      wdocs.join(org.apache.spark.sql.functions.broadcast(
        wdocs.groupBy("source").count()), "source").count()
    }

    val out = new StringBuilder("{")
    var first = true
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val times = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          try {
            // noop sink: computes every column of every row (guide §1.4)
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          } catch { case e: Throwable =>
            System.err.println(s"[bench-extra] $name failed: $e")
          }
          (System.nanoTime() - t0) / 1e9
        }
        plansDir.foreach { d =>
          scala.util.Try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$d/$name$plansSuffix.txt"), plan)
          }.failed.foreach(e => System.err.println(s"[bench-extra] plan $name: $e"))
        }
        val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
        if (!first) out.append(",")
        first = false
        out.append(s""""$name":$ts""")
        System.err.println(f"[bench-extra] $name min=${times.min}%.3f all=$ts")
      }
    out.append("}")
    spark.sparkContext.setJobDescription(null)
    scala.util.Try(spark.stop())
    println(out.toString)
    System.out.flush()
  }
}
