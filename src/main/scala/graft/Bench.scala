package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JIT/codegen/scheduler/FS init would otherwise be
    // billed to whichever query runs first
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(10).collect()

    val results = SparkEntry.registry.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      val n = try q.run(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${q.name}%-28s $sec%8.2fs rows=$n")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
