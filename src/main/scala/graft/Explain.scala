package graft

/** Plan-audit tool: prints the physical plan of one query (or a shuffle/join
  * summary of all) — `runMain graft.Explain [queryName] [sfDir]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.nonEmpty && args(0) == "formatted") {
      // `runMain graft.Explain formatted <q1,q2,...> [sfDir] [outDir]` —
      // dump each query's explain("formatted") to <outDir>/<q>.txt (the
      // plan-evidence files the optimization rounds commit under plans/)
      val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      val outDir = if (args.length > 3) args(3) else "plans"
      new java.io.File(outDir).mkdirs()
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), txt)
        println(s"[explain] wrote $outDir/$name.txt")
      }
    } else if (args.nonEmpty && args(0) != "all") {
      val df = SparkEntry.queries(args(0))(spark, sfDir)
      println(df.queryExecution.executedPlan.toString)
    } else {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val lines = plan.split('\n')
        val exchanges = lines.count(_.contains("Exchange"))
        val bhj = lines.count(_.contains("BroadcastHashJoin"))
        val smj = lines.count(_.contains("SortMergeJoin"))
        val cartesian = lines.count(l => l.contains("Cartesian") || l.contains("BroadcastNestedLoop"))
        println(f"$name%-22s exchanges=$exchanges%-3d broadcastJoins=$bhj%-3d sortMergeJoins=$smj%-3d nestedLoop=$cartesian")
      }
    }
    spark.stop()
  }
}
