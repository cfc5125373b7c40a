package graft

import graft.analytics.LedgerQueries
import graft.sources.{CsvBronzeSink, CsvBronzeSource, JsonlBronzeSink, JsonlBronzeSource, OrcBronzeSink, OrcBronzeSource}
import java.nio.file.Files

/** A1/A3/A4: source layer — fetch_history contract over JSONL/CSV/ORC
  * bronze.
  */
class SourcesSpec extends SparkSpec {

  test("jsonl sink+source round-trips bronze rows; fetchHistory filters, orders, limits") {
    val dir = Files.createTempDirectory("src").toString + "/bronze"
    JsonlBronzeSink.write(LedgerQueries.fixtureBronze(spark), dir)
    val src = new JsonlBronzeSource(dir)
    assert(src.read(spark).count() == 5)
    val hist = src.fetchHistory(spark, LedgerQueries.W, limit = 3).collect()
    assert(hist.length == 3)
    assert(hist.forall(_.getAs[String]("wallet_address") == LedgerQueries.W))
    assert(src.fetchHistory(spark, "UnknownWallet", 10).count() == 0)
  }

  test("csv sink+source round-trips bronze rows INCLUDING the embedded raw JSON") {
    import graft.normalize.SolanaNormalizer
    val dir = Files.createTempDirectory("csv").toString + "/bronze"
    val bronze = LedgerQueries.fixtureBronze(spark)
    CsvBronzeSink.write(bronze, dir)
    val back = new CsvBronzeSource(dir).read(spark)
    assert(back.count() == 5)
    // the real round-trip proof: the quote/comma-laden raw_metadata JSON
    // survives CSV and normalizes identically to the in-memory bronze
    def silver(df: org.apache.spark.sql.DataFrame) =
      SolanaNormalizer.normalize(df)
        .select("transaction_id", "asset_symbol", "amount").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(silver(back) == silver(bronze),
      "CSV round-trip must preserve raw_metadata byte semantics")
  }

  test("csv sink canonicalizes column order: a reordered DataFrame round-trips by name") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("csvro").toString + "/bronze"
    val reordered = LedgerQueries.fixtureBronze(spark)
      .select("wallet_address", "raw_metadata", "id", "user_id",
        "timestamp", "tx_hash", "chain")
    CsvBronzeSink.write(reordered, dir)
    val back = new CsvBronzeSource(dir).read(spark)
    // positional binding with a swapped layout would put wallets in user_id
    assert(back.filter(col("wallet_address") === LedgerQueries.W).count() == 5,
      "column-reordered input must still round-trip by name")
  }

  test("orc sink+source round-trips bronze rows; fetchHistory contract holds") {
    val dir = Files.createTempDirectory("orc").toString + "/bronze"
    OrcBronzeSink.write(LedgerQueries.fixtureBronze(spark), dir)
    val src = new OrcBronzeSource(dir)
    val hist = src.fetchHistory(spark, LedgerQueries.W, limit = 3).collect()
    assert(hist.length == 3)
    assert(hist.forall(_.getAs[String]("wallet_address") == LedgerQueries.W))
  }

  test("corrupt jsonl lines are skipped, not fatal (error-skip semantics)") {
    val dir = Files.createTempDirectory("bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.json")
    f.println("""{"id": "ok1", "user_id": "u", "wallet_address": "w", "timestamp": 1, "tx_hash": "h", "chain": "solana", "raw_metadata": "{}"}""")
    f.println("""not json at all""")
    f.println("""{"id": "ok2", "user_id": "u", "wallet_address": "w", "timestamp": 2, "tx_hash": "h2", "chain": "solana", "raw_metadata": "{}"}""")
    f.close()
    val rows = new JsonlBronzeSource(dir).read(spark).collect()
    assert(rows.map(_.getAs[String]("id")).sorted.toSeq == Seq("ok1", "ok2"))
  }

  test("quarantine read splits good rows from corrupt lines and replays them") {
    import graft.sources.QuarantinedJsonl
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("quar").toString
    new java.io.File(s"$dir/in").mkdirs()
    val f2 = new java.io.PrintWriter(s"$dir/in/part-0.json")
    f2.println("""{"id": "ok1", "user_id": "u", "wallet_address": "w", "timestamp": 1, "tx_hash": "h", "chain": "solana", "raw_metadata": "{}"}""")
    f2.println("""not json at all""")
    f2.println("""{"no_id_field": true}""")
    f2.println("""{"id": "ok2", "user_id": "u", "wallet_address": "w", "timestamp": "NOT A NUMBER", "tx_hash": "h2", "chain": "solana", "raw_metadata": "{}"}""")
    f2.println("""{"id": "ok3", "user_id": "u", "wallet_address": "w", "timestamp": 3, "tx_hash": "h3", "chain": "solana", "raw_metadata": "{}"}""")
    f2.close()

    val good = QuarantinedJsonl.readAndQuarantine(spark, s"$dir/in", s"$dir/q")
    assert(good.collect().map(_.getAs[String]("id")).sorted.toSeq == Seq("ok1", "ok3"),
      "good = parseable AND well-shaped (bad-typed field quarantines too)")

    val q = spark.read.parquet(s"$dir/q")
    assert(q.count() == 3, "every rejected line is retained verbatim")
    assert(q.columns.toSet == Set("raw_line", "src_file"))
    assert(q.filter(col("raw_line") === "not json at all").count() == 1)

    // replay: upstream fixed the dtype drift -> re-read quarantine lines
    val fixedDir = s"$dir/fixed"
    new java.io.File(fixedDir).mkdirs()
    val fw = new java.io.PrintWriter(s"$fixedDir/part-0.json")
    q.collect().map(_.getAs[String]("raw_line")).foreach { l =>
      fw.println(l.replace("\"NOT A NUMBER\"", "2"))
    }
    fw.close()
    val (replayed, stillBad) = QuarantinedJsonl.read(spark, fixedDir)
    assert(replayed.collect().map(_.getAs[String]("id")).toSeq == Seq("ok2"),
      "fixed line re-admits; the rest stay quarantined")
    assert(stillBad.count() == 2)
  }

  test("quarantine differential: good set equals the PERMISSIVE reader's on random corruption") {
    import graft.sources.QuarantinedJsonl
    val rnd = new scala.util.Random(777L)
    (1 to 5).foreach { round =>
      val dir = Files.createTempDirectory(s"quarp$round").toString
      new java.io.File(s"$dir/in").mkdirs()
      val pw = new java.io.PrintWriter(s"$dir/in/part-0.json")
      var goodIds = Set.empty[String]
      (0 until 20).foreach { i =>
        rnd.nextInt(4) match {
          case 0 => pw.println(s"garbage line $i ${rnd.nextInt()}")
          case 1 => pw.println(s"""{"wrong_shape": $i}""")
          case _ =>
            goodIds += s"ok$i"
            pw.println(s"""{"id": "ok$i", "user_id": "u", "wallet_address": "w", "timestamp": $i, "tx_hash": "h$i", "chain": "solana", "raw_metadata": "{}"}""")
        }
      }
      pw.close()
      val (good, bad) = QuarantinedJsonl.read(spark, s"$dir/in")
      val ids = good.collect().map(_.getAs[String]("id")).toSet
      assert(ids == goodIds, s"round $round: quarantine reader's good set")
      // the permissive drop-path reader admits exactly the same rows —
      // quarantine adds retention, never changes admission
      val permissive = new JsonlBronzeSource(s"$dir/in").read(spark)
        .collect().map(_.getAs[String]("id")).toSet
      assert(ids == permissive, s"round $round: admission parity with the drop path")
      assert(bad.count() == 20 - goodIds.size, s"round $round: retention is total")
    }
  }

  test("jdbc store round-trips bronze: idempotent save, pushed by-wallet read (repo.rs parity)") {
    import graft.sources.JdbcStore
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dir = Files.createTempDirectory("jdbc").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val bronze = LedgerQueries.fixtureBronze(spark)

    // first save inserts all rows; replaying the SAME batch inserts none
    assert(JdbcStore.saveIdempotent(spark, bronze, url, "transactions", "id", opts) == 5)
    assert(JdbcStore.saveIdempotent(spark, bronze, url, "transactions", "id", opts) == 0)
    // a batch with one genuinely new row appends exactly that row
    val plusOne = bronze.unionByName(bronze.limit(1)
      .withColumn("id", concat(col("id"), lit("_new"))))
    assert(JdbcStore.saveIdempotent(spark, plusOne, url, "transactions", "id", opts) == 1)

    // by-wallet ordered read equals the bronze-source contract
    val got = JdbcStore.readByWallet(spark, url, "transactions",
      LedgerQueries.W, Seq("timestamp", "id"), opts)
    assert(got.count() == 6)
    assert(got.collect().forall(_.getAs[String]("wallet_address") == LedgerQueries.W))
    // full column round-trip, order-insensitive
    val back = JdbcStore.read(spark, url, "transactions", opts)
      .select(bronze.columns.map(col).toIndexedSeq: _*)
    assert(back.exceptAll(plusOne).isEmpty && plusOne.exceptAll(back).isEmpty)

    // the wallet predicate reaches the database, not a post-scan filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("wallet_address"),
      s"wallet equality not pushed into the JDBC scan:\n$plan")

    // partition-parallel read: the bulk re-processing path at scale —
    // Spark's stride options pass through and split the scan into
    // independent range queries, one task each, same data
    val par = JdbcStore.read(spark, url, "transactions", opts ++ Map(
      "partitionColumn" -> "timestamp",
      "lowerBound" -> "0", "upperBound" -> "2000000000",
      "numPartitions" -> "4"))
    assert(par.rdd.getNumPartitions == 4,
      s"expected 4 JDBC range partitions, got ${par.rdd.getNumPartitions}")
    assert(par.count() == 6)
    val seq = par.select(bronze.columns.map(col).toIndexedSeq: _*)
    assert(seq.exceptAll(plusOne).isEmpty && plusOne.exceptAll(seq).isEmpty,
      "partition-parallel read must return the same rows")
  }

  test("schema evolution: mergeSchema read unions generations, missing column nulls exactly on old rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("schemaevo").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.parquet(s"$dir/g1")
    Seq((3L, 30.0, "new"), (4L, 40.0, "new"))
      .toDF("id", "v", "added")
      .write.parquet(s"$dir/g2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/g1", s"$dir/g2")
    assert(merged.columns.sorted.toSeq == Seq("added", "id", "v"))
    assert(merged.count() == 4, "no generation's rows lost or doubled")
    val nulls = merged.filter(col("added").isNull)
      .select("id").as[Long].collect().sorted.toSeq
    assert(nulls == Seq(1L, 2L),
      "exactly the pre-evolution rows carry null in the added column")
  }

  test("a12: csv round-trip aggregate equals the parquet-side aggregate") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import org.apache.spark.sql.types.DecimalType
    val viaCsv = analytics.StarQueries.queries("a12_csv_roundtrip")(spark, sfDir)
    val direct = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = viaCsv.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == direct.toSeq,
      "CSV write→read must be lossless for longs, doubles, and strings")
  }

  test("a15: Avro container round-trip is row-exact per type, incl. nulls and binary") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.sources.AvroSource
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("y", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.25f, true, "héllo\nworld", Array[Byte](0, 1, -1, 127)),
      Row(null, null, null, null, null, null, null),
      Row(Long.MaxValue, Int.MinValue, Double.MinPositiveValue,
        Float.NegativeInfinity, false, "", Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro-rt").toString + "/t"
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema == schema.copy(fields =
        schema.fields.map(_.copy(nullable = true))),
      s"schema must self-describe: ${back.schema}")
    def key(r: Row) = (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
      Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
      Option(r.getAs[Array[Byte]](6)).map(_.toSeq))
    assert(back.collect().map(key).toSet == rows.map(key).toSet,
      "every value must survive the container hop bit-exactly")
  }

  test("a15: avro round-trip aggregate equals the parquet-side aggregate") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val viaAvro = analytics.StarQueries.queries("a15_avro_roundtrip")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaAvro.toSeq == direct.toSeq)
  }

  test("a13: the shipdate predicate pushes into the ORC scan") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("orcpush").toString + "/li"
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_shipdate")
      .write.mode("overwrite").orc(dir)
    val scanned = spark.read.orc(dir)
      .filter(col("l_shipdate") >= org.apache.spark.sql.functions
        .lit("2001-06-01").cast("timestamp"))
      .select("l_orderkey", "l_quantity")
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed into the ORC reader:\n$plan")
    // and the filtered content agrees with the parquet-side filter
    val expect = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= org.apache.spark.sql.functions
        .lit("2001-06-01").cast("timestamp")).count()
    assert(scanned.count() == expect)
  }

  test("a14: the type predicate prunes hive partitions, not data files") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("partprune").toString + "/events"
    Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    // one directory per type on disk
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("event_type=")), s"no hive dirs: $subdirs")
    val scanned = spark.read.parquet(dir)
      .filter(col("event_type").isin("click", "purchase"))
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"type predicate not applied at the partition level:\n$plan")
    // pruned scan touches only the two partitions' rows
    val expect = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(scanned.count() == expect)
  }
}
