package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{GraftSession, SparkEntry}

/** Dev tool: MEASURED state-store footprint for the stateful streaming
  * family under the production RocksDB provider — turns "state is
  * bounded" from a result-equality claim into byte numbers. Runs each
  * declared stateful replay at the given scale dir and at a 10×
  * [[StressSweep.blowUp]] of it, captures every StateOperatorProgress
  * from the streaming listener, and reports per (query, operator):
  * max total state rows, max in-memory bytes, and max on-disk RocksDB
  * SST bytes. Bounded state means the 10× column grows with the KEY
  * population (users/pairs in window), never with total input volume.
  *
  * Usage: runMain graft.tools.StateSizeProbe [sfDir] [blowUpDir]
  */
object StateSizeProbe {

  private val Ops = Seq(
    "j2_exactly_once_replay", "j3_late_drop_replay",
    "j5_running_position_replay", "j8_stream_stream_join",
    "j9_stream_dedup", "j11_stream_outer_join")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-statesize").toString)
    val spark = GraftSession.getOrCreate("graft-statesize",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    StressSweep.blowUp(spark, sfDir, bigDir, times = 10)

    // (operatorName, rowsTotal, memBytes, sstBytes) per progress event
    val seen = new ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach { so =>
          val sst = Option(so.customMetrics).map { m =>
            import scala.jdk.CollectionConverters._
            m.asScala.collect {
              case (k, v) if k.toLowerCase.contains("sstfile") => v.longValue()
            }.sum
          }.getOrElse(0L)
          seen.add((so.operatorName, so.numRowsTotal, so.memoryUsedBytes, sst))
        }
    }
    spark.streams.addListener(listener)

    def drain(): Seq[(String, Long, Long, Long)] = {
      // listener events are async; wait for the queue to go quiet
      var last = -1
      while (seen.size != last) { last = seen.size; Thread.sleep(1000) }
      import scala.jdk.CollectionConverters._
      val out = seen.asScala.toSeq
      seen.clear()
      out
    }

    println(f"${"query"}%-28s ${"scale"}%-4s ${"operator"}%-32s " +
      f"${"rows"}%10s ${"mem_bytes"}%12s ${"sst_bytes"}%12s")
    Ops.foreach { op =>
      Seq("1x" -> sfDir, "10x" -> bigDir).foreach { case (tag, dir) =>
        seen.clear()
        SparkEntry.queries(op)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        drain().groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, rows) =>
          println(f"$op%-28s $tag%-4s $name%-32s " +
            f"${rows.map(_._2).max}%10d ${rows.map(_._3).max}%12d " +
            f"${rows.map(_._4).max}%12d")
        }
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
