package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}
import graft.sources.SnapshotTable

/** Dev tool: cost attribution for `c13_snapshot_delete_mor`'s steady-state
  * 3.58 s (round-15 verdict item 4 — 8× its c12 sibling). Decomposes the
  * query into its physical terms at sf0.1 and times each against the
  * others (3 reps, median, after a warmup), so the expensive term is
  * measured, not guessed:
  *
  *   plain      — the v2 file set read WITHOUT metadata columns (the
  *                baseline every other scan in the suite pays)
  *   meta       — same files WITH `_metadata.file_path`/`row_index`
  *                projected through the fileKey regexp (readWithMeta's
  *                shape, no DV join) — isolates the metadata-column and
  *                regexp cost
  *   dv_read    — the full DV-applied v2 read (`SnapshotTable.read`
  *                versionAsOf=2: meta + broadcast anti-join) — isolates
  *                the join increment
  *   purged     — the current (post-OPTIMIZE) read, vectors gone
  *   full_query — the declared c13 query end-to-end
  *   c12_query  — the sibling for the 8× framing
  *
  * Usage: runMain graft.tools.MorCostProbe [sfDir]
  */
object MorCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate("graft-morprobe", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.OracleAux.enabled = false

    // stage the exact c13 layout (memoized; same content-addressed path
    // the query uses), then locate the table dir it reads
    SparkEntry.queries("c13_snapshot_delete_mor")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val dir = Tables.memoLayout(s"c13|$sfDir", "graft_snap_mor")(_ => ()) + "/orders_mor"

    val v2 = SnapshotTable.snapshot(spark, dir, Some(2))
    val root = new org.apache.hadoop.fs.Path(dir)
    def abs(f: String) = new org.apache.hadoop.fs.Path(root, f).toString
    val schema = org.apache.spark.sql.types.DataType.fromJson(v2.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]

    def timeQ(what: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warmup
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[morprobe] $what%-12s ${xs(1)}%7.3f s (min ${xs.head}%.3f)")
      xs(1)
    }

    val plain = timeQ("plain") {
      spark.read.schema(schema).parquet(v2.files.map(abs): _*)
    }
    val metaRaw = timeQ("meta_raw") {
      spark.read.schema(schema).parquet(v2.files.map(abs): _*)
        .withColumn("_graft_path", col("_metadata.file_path"))
        .withColumn("_graft_ri", col("_metadata.row_index"))
    }
    val metaRiOnly = timeQ("meta_ri_only") {
      spark.read.schema(schema).parquet(v2.files.map(abs): _*)
        .withColumn("_graft_ri", col("_metadata.row_index"))
    }
    val metaSsi = timeQ("meta_ssi") {
      spark.read.schema(schema).parquet(v2.files.map(abs): _*)
        .withColumn("_graft_file",
          substring_index(col("_metadata.file_path"), "/", -2))
        .withColumn("_graft_ri", col("_metadata.row_index"))
    }
    val meta = timeQ("meta_regexp") {
      spark.read.schema(schema).parquet(v2.files.map(abs): _*)
        .withColumn("_graft_file",
          regexp_extract(col("_metadata.file_path"), "([^/]+/[^/]+)$", 1))
        .withColumn("_graft_ri", col("_metadata.row_index"))
    }
    val dvRead = timeQ("dv_read") {
      SnapshotTable.read(spark, dir, versionAsOf = Some(2))
    }
    val purged = timeQ("purged") {
      SnapshotTable.read(spark, dir)
    }
    val full = timeQ("full_query") {
      SparkEntry.queries("c13_snapshot_delete_mor")(spark, sfDir)
    }
    val c12 = timeQ("c12_query") {
      SparkEntry.queries("c12_snapshot_delete_restore")(spark, sfDir)
    }

    println(f"[morprobe] metadata-column increment: ${meta - plain}%.3f s; " +
      f"DV-join increment: ${dvRead - meta}%.3f s; " +
      f"purged-scan: $purged%.3f s; full $full%.3f vs c12 $c12%.3f")
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"tool":"MorCostProbe","sf":"$sfDir","plain":${num(plain)},""" +
      s""""meta_raw":${num(metaRaw)},"meta_ri_only":${num(metaRiOnly)},""" +
      s""""meta_ssi":${num(metaSsi)},"meta_regexp":${num(meta)},""" +
      s""""dv_read":${num(dvRead)},"purged":${num(purged)},""" +
      s""""full_query":${num(full)},"c12_query":${num(c12)}}""")
    spark.stop()
  }
}
