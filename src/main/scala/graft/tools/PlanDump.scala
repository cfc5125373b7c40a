package graft.tools
import graft.GraftSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("plan-dump", 8)
    val bronze = graft.analytics.LedgerQueries.eventsAsBronze(spark, "/root/testdata/sf0.001")
    val silver = graft.normalize.SolanaNormalizer.normalize(bronze)
    val plan = silver.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/i1_plan.txt"), plan)
    println("from_json count: " + "from_json".r.findAllIn(plan).length)
    println("to_json count: " + "to_json".r.findAllIn(plan).length)
    spark.stop()
  }
}
