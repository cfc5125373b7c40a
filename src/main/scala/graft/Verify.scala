package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query names — dev-loop filter for
    // re-verifying just the queries a change touched. The driver passes
    // two args, so its full-surface contract is unchanged.
    val (sfDir, outDir, only) = args match {
      case Array(s, o)         => (s, o, None)
      case Array(s, o, names)  => (s, o, Some(names.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.getOrCreate("graft-verify", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val selected = only.fold(SparkEntry.queries)(n =>
      SparkEntry.queries.view.filterKeys(n).toMap)
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // {SF} → this run's sf basename: oracle-aux artifact reads always
    // point at the artifacts THIS run's queries wrote, even if another
    // run at a different SF lands before the DuckDB comparison executes.
    val sfName = new java.io.File(sfDir).getName
    val json = only.fold(SparkEntry.oracleSql)(n =>
        SparkEntry.oracleSql.view.filterKeys(n).toMap)
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.tools.OracleAux.SfToken, sfName))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
