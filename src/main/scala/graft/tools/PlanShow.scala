package graft.tools
import graft.{GraftSession, SparkEntry}
object PlanShow {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("c6_join_salted")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("plan-show", 32)
    SparkEntry.queries(name)(spark, d).explain("formatted")
    spark.stop()
  }
}
