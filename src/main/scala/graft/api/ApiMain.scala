package graft.api

import graft.GraftSession
import graft.sources.{BronzeSource, JsonlBronzeSource, ParquetBronzeSource}

/** Standalone launcher for [[ApiServer]] — the engine-side equivalent of
  * the reference's `api` binary (`/root/reference/api/src/main.rs:19-46`:
  * bind, serve until killed).
  *
  * Usage: runMain graft.api.ApiMain <bronzeDir> <silverDir>
  *          [port=3000] [sourceDir] [sourceFormat=jsonl|parquet]
  *          [tablesDir]   — enables `GET /v1/query/:name` over that dir
  *
  * `sourceDir` backs `POST /v1/ingest` (the fetch-history source); when
  * omitted, ingest serves 500 and the read routes still work — the
  * query-serving half is independent of ingestion.
  */
object ApiMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ApiMain <bronzeDir> <silverDir> [port] [sourceDir] [format]")
    val Array(bronze, silver) = args.take(2)
    val port = if (args.length > 2) args(2).toInt else 3000
    val source: BronzeSource =
      if (args.length > 3) {
        val fmt = if (args.length > 4) args(4) else "jsonl"
        fmt match {
          case "jsonl"   => new JsonlBronzeSource(args(3))
          case "parquet" => new ParquetBronzeSource(args(3))
          case other => throw new IllegalArgumentException(
            s"unknown source format: $other")
        }
      } else new BronzeSource {
        def read(spark: org.apache.spark.sql.SparkSession) =
          throw new IllegalStateException(
            "no ingest source configured (pass sourceDir)")
      }
    val spark = GraftSession.getOrCreate("graft-api",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val srv = new ApiServer(spark, source, bronze, silver, port,
      tablesDir = if (args.length > 5) Some(args(5)) else None)
    val bound = srv.start()
    println(s"graft api listening on 127.0.0.1:$bound") // main.rs:41 parity
    sys.addShutdownHook { srv.stop(); spark.stop() }
    Thread.currentThread.join() // serve until killed, like the reference
  }
}
