package graft

import graft.operators.{AsOfJoin, Compactor, IdempotentSink, MultimodalPipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IdempotentSink (A5/G2/J2), AsOfJoin (C5), MultimodalPipeline (K5). */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("idempotent sink: writing the same batch twice yields identical table state") {
    val dir = Files.createTempDirectory("idem").toString + "/t"
    val batch = Seq(("a", 1), ("b", 2), ("a", 1)).toDF("id", "v")
    val n1 = IdempotentSink.appendOnce(spark, batch, dir, "id")
    assert(n1 == 2, "in-batch duplicate collapses")
    val n2 = IdempotentSink.appendOnce(spark, batch, dir, "id")
    assert(n2 == 0, "replay is a no-op")
    val state = spark.read.parquet(dir).as[(String, Int)].collect().sorted.toSeq
    assert(state == Seq(("a", 1), ("b", 2)))
  }

  test("idempotent sink: partially-overlapping batch appends only new keys") {
    val dir = Files.createTempDirectory("idem2").toString + "/t"
    IdempotentSink.appendOnce(spark, Seq(("a", 1)).toDF("id", "v"), dir, "id")
    val n = IdempotentSink.appendOnce(spark,
      Seq(("a", 9), ("c", 3)).toDF("id", "v"), dir, "id")
    assert(n == 1)
    val state = spark.read.parquet(dir).as[(String, Int)].collect().sorted.toSeq
    assert(state == Seq(("a", 1), ("c", 3)), "existing key keeps original value")
  }

  test("idempotent sink: a second concurrent writer fails loudly, table stays dup-free") {
    val dir = Files.createTempDirectory("idem3").toString + "/t"
    IdempotentSink.appendOnce(spark, Seq(("a", 1)).toDF("id", "v"), dir, "id")
    // a writer holding the lock forces the interleaved appendOnce to throw
    // instead of double-inserting (the reference's ON CONFLICT is atomic
    // because Postgres serializes it; plain parquet must fail loudly)
    IdempotentSink.withTableLock(spark, dir) {
      val e = intercept[IdempotentSink.ConcurrentWriteException] {
        IdempotentSink.appendOnce(spark, Seq(("b", 2)).toDF("id", "v"), dir, "id")
      }
      assert(e.getMessage.contains("locked by another writer"))
    }
    // lock released on exit: the retried batch lands exactly once
    assert(IdempotentSink.appendOnce(spark, Seq(("b", 2)).toDF("id", "v"), dir, "id") == 1)
    val state = spark.read.parquet(dir).as[(String, Int)].collect().sorted.toSeq
    assert(state == Seq(("a", 1), ("b", 2)))
  }

  test("idempotent sink: dead-writer lock blocks until breakLock; lock survives body failure") {
    val dir = Files.createTempDirectory("idem4").toString + "/t"
    // body failure must NOT leak the lock
    intercept[RuntimeException] {
      IdempotentSink.withTableLock(spark, dir)(throw new RuntimeException("boom"))
    }
    assert(IdempotentSink.appendOnce(spark, Seq(("a", 1)).toDF("id", "v"), dir, "id") == 1)
    // simulate a dead writer: plant a stale lock by hand
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_graft_write_lock"), false).close()
    intercept[IdempotentSink.ConcurrentWriteException] {
      IdempotentSink.appendOnce(spark, Seq(("b", 2)).toDF("id", "v"), dir, "id")
    }
    assert(IdempotentSink.breakLock(spark, dir), "stale lock removed")
    assert(IdempotentSink.appendOnce(spark, Seq(("b", 2)).toDF("id", "v"), dir, "id") == 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("idempotent sink: two racing writers never double-insert") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("idem5").toString + "/t"
    val batch = Seq(("k1", 1), ("k2", 2)).toDF("id", "v")
    val attempts = Seq(
      Future(Right(IdempotentSink.appendOnce(spark, batch, dir, "id"))
      ).recover { case e: IdempotentSink.ConcurrentWriteException => Left(e) },
      Future(Right(IdempotentSink.appendOnce(spark, batch, dir, "id"))
      ).recover { case e: IdempotentSink.ConcurrentWriteException => Left(e) })
    val results = Await.result(Future.sequence(attempts), 120.seconds)
    // every outcome is legal EXCEPT a silent double-insert: the loser either
    // threw (overlapped) or appended 0 new rows (ran after the winner)
    assert(results.exists(_.isRight), s"at least one writer must land: $results")
    val ids = spark.read.parquet(dir).select("id").as[String].collect().toSeq
    assert(ids.sorted == ids.distinct.sorted, s"duplicate keys written: $ids")
    assert(ids.toSet == Set("k1", "k2"))
  }

  test("compaction shrinks a many-file table without changing its contents") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = Tables.events(spark, sfDir).select($"event_id", $"user_id", $"value")
    df.repartition(24).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val (sumBefore, cntBefore) = (
      before.agg(sum($"event_id")).head.getLong(0), before.count())
    val (nBefore, nAfter) = Compactor.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 24 && nAfter == 1, s"expected 24 -> 1, got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir)
    assert(after.count() == cntBefore)
    assert(after.agg(sum($"event_id")).head.getLong(0) == sumBefore)
  }

  test("compaction is a no-op on an already-compact table") {
    val dir = Files.createTempDirectory("compact2").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1).write.parquet(dir)
    val (b, a) = Compactor.compact(spark, dir)
    assert(b == 1 && a == 1)
  }

  test("compactTable compacts each hive partition leaf independently") {
    val dir = Files.createTempDirectory("compact3").toString + "/t"
    Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"value")
      .repartition(6)
      .write.partitionBy("event_type").parquet(dir)
    val cntBefore = spark.read.parquet(dir).count()
    val (nBefore, nAfter) = Compactor.compactTable(spark, dir, targetBytes = 1L << 30)
    assert(nBefore > nAfter, s"expected fewer files, got $nBefore -> $nAfter")
    assert(nAfter == 5, "one file per event_type partition")
    val after = spark.read.parquet(dir)
    assert(after.count() == cntBefore)
    assert(after.select("event_type").distinct().count() == 5,
      "partition column still derived from the directory layout")
  }

  test("compactTable self-heals an interrupted swap (leaf and root)") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    // leaf mid-swap: crash hit between rename(live -> trash) and
    // rename(tmp -> live) — only the hidden trash dir remains
    val dir = Files.createTempDirectory("compact4").toString + "/t"
    Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "k")
      .repartition(2).write.partitionBy("k").parquet(dir)
    val leaf = new Path(dir, "k=a")
    assert(fs.rename(leaf, new Path(dir, ".k=a_compact_old")))
    assert(spark.read.parquet(dir).count() == 1, "partition invisible pre-heal")
    Compactor.compactTable(spark, dir, targetBytes = 1L << 30)
    assert(spark.read.parquet(dir).count() == 3, "leaf data restored")
    // root mid-swap: the whole table dir was renamed away
    val dir2 = Files.createTempDirectory("compact5").toString + "/t"
    Seq((1, "x"), (2, "y")).toDF("id", "v").write.parquet(dir2)
    val root2 = new Path(dir2)
    assert(fs.rename(root2, new Path(root2.getParent, ".t_compact_old")))
    Compactor.compactTable(spark, dir2, targetBytes = 1L << 30)
    assert(spark.read.parquet(dir2).count() == 2, "root data restored")
  }

  test("maintenance e2e: appendOnce batches -> incremental MV refresh -> compaction; state equals one-shot aggregate") {
    import graft.operators.IncrementalAgg
    val root = Files.createTempDirectory("maint").toString
    val bronze = root + "/bronze"
    val mv = root + "/mv"
    // the full maintenance story composed: idempotent ingest feeds the MV
    // with exactly the rows that LANDED (computed before the append mutates
    // the table, materialized via localCheckpoint), batchId carries sink
    // idempotence through to the MV, and compaction at the end must not
    // change what a re-aggregate sees
    val batches = Seq(
      Seq(("e1", "a", 1.0), ("e2", "b", 2.0)),
      Seq(("e2", "b", 99.0), ("e3", "a", 3.0)), // e2 is a replayed key
      Seq(("e4", "c", 4.0)))
    batches.zipWithIndex.foreach { case (rows, id) =>
      val b = rows.toDF("event_id", "k", "value")
      val landed = IdempotentSink
        .dedupeAgainstExisting(spark, b, bronze, "event_id").localCheckpoint(true)
      assert(IdempotentSink.appendOnce(spark, b, bronze, "event_id") == landed.count())
      IncrementalAgg.updateTable(spark, mv, landed, Seq("k"), "value",
        batchId = Some(id.toLong)): Unit
    }
    // crash-replay of the last batch: sink appends 0, MV refresh is a no-op
    val replay = batches.last.toDF("event_id", "k", "value")
    assert(IdempotentSink.appendOnce(spark, replay, bronze, "event_id") == 0)
    // same batchId as the last commit: updateTable must ignore the data
    // entirely and return the committed state
    val state = IncrementalAgg.updateTable(spark, mv,
        replay, Seq("k"), "value", batchId = Some(2L))
      .orderBy("k").collect().map(_.toSeq)
    // maintenance window: compact the ingested bronze
    val (nb, na) = Compactor.compactTable(spark, bronze, targetBytes = 1L << 30)
    assert(na == 1 && nb > na, s"expected many -> 1 file, got $nb -> $na")
    // oracle: the incremental state must equal the one-shot aggregate over
    // the compacted bronze, bit for bit (decomposable-aggregate contract)
    val oneShot = IncrementalAgg
      .partial(spark.read.parquet(bronze), Seq("k"), "value")
      .orderBy("k").collect().map(_.toSeq)
    assert(state.toSeq == oneShot.toSeq)
    assert(spark.read.parquet(bronze).count() == 4, "e2 replay never landed twice")
  }

  test("as-of join: inclusive match takes most recent quote at or before trade ts") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade_id")
    val quotes = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 99.0))
      .toDF("key", "ts", "px")
    val out = AsOfJoin(trades, quotes, "key", "ts", "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("t1") == 10.0, "equal-ts quote matches inclusively")
    assert(out("t2") == 20.0, "latest prior quote wins")
    assert(out("t3") == null, "no prior quote -> null")
  }

  test("as-of join: duplicate-(key, ts) quotes resolve deterministically across repartitionings") {
    val trades = Seq((1L, 100L, "t1"), (1L, 150L, "t2")).toDF("key", "ts", "trade_id")
    // three quotes at the SAME (key, ts) with different values — the tie
    // must resolve to the greatest value tuple (30.0) on every run,
    // regardless of how the quote side is partitioned or ordered
    val quoteRows = Seq((1L, 100L, 10.0), (1L, 100L, 30.0), (1L, 100L, 20.0))
    val layouts = Seq(
      quoteRows.toDF("key", "ts", "px"),
      quoteRows.reverse.toDF("key", "ts", "px").repartition(7),
      quoteRows.sortBy(_._3).toDF("key", "ts", "px").repartition(1))
    layouts.zipWithIndex.foreach { case (quotes, i) =>
      val out = AsOfJoin(trades, quotes, "key", "ts", "ts", Seq("px"))
        .select("trade_id", "px").as[(String, Double)].collect().toMap
      assert(out == Map("t1" -> 30.0, "t2" -> 30.0),
        s"layout $i resolved ties nondeterministically: $out")
    }
  }

  test("as-of join strict mode excludes the equal-timestamp quote") {
    val trades = Seq((1L, 100L, "t1")).toDF("key", "ts", "trade_id")
    val quotes = Seq((1L, 100L, 10.0), (1L, 90L, 5.0)).toDF("key", "ts", "px")
    val out = AsOfJoin(trades, quotes, "key", "ts", "ts", Seq("px"), strict = true)
      .select("px").as[Double].head()
    assert(out == 5.0)
  }

  test("bucketed as-of join equals the plain formulation across widths, modes, ties and nulls") {
    // Randomized-but-seeded corpus engineered to hit every boundary case:
    // multiple keys, duplicate-(key, ts) quote ties, null quote values
    // (single-row carry — null fields stay null), trades in buckets with
    // no quotes (carry-in from earlier buckets), trades before any quote (null result).
    val rnd = new scala.util.Random(7)
    val trades = (1 to 400).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, s"t$i")
    }.toDF("key", "ts", "trade_id")
    val quotes = (1 to 300).map { _ =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong,
        if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextInt(50)),
        java.lang.Long.valueOf(rnd.nextInt(5)))
    }.toDF("key", "ts", "px", "depth")
    for (strict <- Seq(false, true); width <- Seq(7L, 100L, 10000L)) {
      val plain = AsOfJoin(trades, quotes, "key", "ts", "ts",
        Seq("px", "depth"), strict)
        .orderBy("trade_id").collect().toSeq
      val buck = AsOfJoin.bucketed(trades, quotes, "key", "ts", "ts",
        Seq("px", "depth"), width, strict)
        .orderBy("trade_id").collect().toSeq
      assert(buck == plain, s"strict=$strict width=$width diverged")
    }
  }

  test("salted skew join matches plain join result on a hot-key dataset") {
    import graft.operators.SkewJoin
    // 90% of rows share key 1 (the skew), the rest spread over 2..10
    val big = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN 1 ELSE id % 9 + 2 END AS k", "id AS v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (11L, "unmatched"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k")).groupBy("k", "tag")
      .count().orderBy("k").as[(Long, String, Long)].collect().toSeq
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", salts = 8)
      .groupBy("k", "tag").count().orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(salted == plain)
    // and the hot key's rows genuinely spread across salt values
    val spread = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(8L)))
      .filter($"k" === 1).select("_salt").distinct().count()
    assert(spread > 4, s"salt only used $spread buckets")
  }

  test("salted skew join rejects right/full outer (would fabricate phantom rows)") {
    import graft.operators.SkewJoin
    val df = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(df, df, "k", joinType = "full")
    }
  }

  test("as-of join carries value columns from ONE row: null fields are never backfilled from older rows") {
    // the SCD2 shape that exposed the per-column-ignoreNulls bug: the
    // latest version has valid_to = NULL (open); the old propagation
    // backfilled it with the PREVIOUS version's valid_to, producing a
    // version whose valid_to == its own valid_from
    val facts = Seq((1L, 300L, "f1"), (1L, 150L, "f2")).toDF("key", "ts", "fact_id")
    val versions = Seq(
      (1L, 100L, "v1", java.lang.Long.valueOf(200L)),
      (1L, 200L, "v2", null.asInstanceOf[java.lang.Long]) // open version
    ).toDF("key", "vts", "ver", "valid_to")
    val out: Map[String, (String, Option[Long])] =
      AsOfJoin(facts, versions, "key", "ts", "vts", Seq("ver", "valid_to"))
        .select("fact_id", "ver", "valid_to").collect()
        .map(r => r.getString(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out("f1") == (("v2", None)),
      s"open version's null valid_to was backfilled: ${out("f1")}")
    assert(out("f2") == (("v1", Some(200L))))
  }

  test("as-of join rejects colliding value columns and reserved names") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, 1.0)).toDF("key", "ts", "px")
    val r = Seq((1L, 5L, 2.0)).toDF("key", "ts", "px")
    intercept[IllegalArgumentException] {
      AsOfJoin(l, r, "key", "ts", "ts", Seq("px")) // px exists on left
    }
  }

  test("multimodal resize clamps into bounding box preserving aspect; frame sampling explodes videos") {
    import graft.operators.MultimodalPipeline._
    val feats = extractFeatures(mediaFromDocuments(spark, sfDir))
    val resized = resize(feats, 256, 256).collect()
    assert(resized.forall(f => f.width <= 256 && f.height <= 256))
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.foreach { f =>
      val o = orig(f.media_id)
      if (o.width <= 256 && o.height <= 256)
        assert(f.width == o.width && f.height == o.height, "no upscaling")
      else {
        val ratioBefore = o.width.toDouble / o.height
        val ratioAfter = f.width.toDouble / f.height
        assert(math.abs(ratioBefore - ratioAfter) / ratioBefore < 0.05,
          s"aspect drifted: $o -> $f")
      }
    }
    val frames = sampleFrames(feats, everyN = 30)
    val byId = frames.collect().groupBy(_.media_id)
    orig.values.foreach { o =>
      val expect = if (o.modality == "video") (o.frames + 29) / 30 else 1
      assert(byId(o.media_id).length == expect, s"wrong frame count for $o")
    }
  }

  test("multimodal pipeline: deterministic stub features over documents corpus") {
    val out = MultimodalPipeline.featuresQuery(spark, sfDir)
    val rows = out.collect()
    assert(rows.length > 0)
    val again = MultimodalPipeline.featuresQuery(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "stub decode must be deterministic")
    assert(out.filter($"width" < 64 || $"height" < 64).count() == 0)
    assert(out.filter($"modality" === "video" && $"frames" < 1).count() == 0)
    assert(out.filter(!$"modality".isin("image", "audio", "video")).count() == 0)
  }

  test("multimodal codec registry dispatches per modality; unregistered modality fails loudly") {
    import graft.operators.MultimodalPipeline._
    import OperatorSpec.{FixedImageCodec, StubRest}
    val media = mediaFromDocuments(spark, sfDir)
    val feats = extractFeatures(media, CodecRegistry(Seq(FixedImageCodec, StubRest))).collect()
    assert(feats.nonEmpty)
    assert(feats.filter(_.modality == "image").forall(f => f.width == 333 && f.height == 444),
      "image rows must route to the image codec")
    val stubbed = extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    feats.filterNot(_.modality == "image").foreach { f =>
      assert(f == stubbed(f.media_id), "non-image rows must match the stub path")
    }
    // Unregistered modality: the task must fail, not emit default features.
    val ex = intercept[org.apache.spark.SparkException] {
      extractFeatures(media, CodecRegistry(Seq(FixedImageCodec))).collect()
    }
    assert(ex.getMessage.contains("no codec registered") ||
      Option(ex.getCause).exists(_.getMessage.contains("no codec registered")))
    // Two codecs claiming one modality: construction must fail — last-wins
    // would silently route payloads to the wrong decoder.
    val dup = intercept[IllegalArgumentException] {
      CodecRegistry(Seq(FixedImageCodec, MultimodalPipeline.stubRegistry.codecs.head))
    }
    assert(dup.getMessage.contains("image"))
  }

  test("real codecs decode genuine PNG/JPEG/WAV payloads; corrupt bytes fail loudly") {
    import graft.operators.MultimodalPipeline._
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
      out.toByteArray
    }
    def wav(sampleRate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](nFrames * fmt.getFrameSize)),
        fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // minimal valid ISO BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0))
    def mp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
      def box(tp: String, payload: Array[Byte]): Array[Byte] = {
        val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        b.putInt(8 + payload.length); b.put(tp.getBytes("US-ASCII")); b.put(payload)
        b.array()
      }
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
          "isom".getBytes("US-ASCII"))
      val mvhd = { // v0 payload is 100 bytes; timescale@12, duration@16
        val p = java.nio.ByteBuffer.allocate(100)
        p.position(12); p.putInt(timescale); p.putInt(duration)
        box("mvhd", p.array())
      }
      val tkhd = { // v0 payload is 84 bytes; 16.16 width@76, height@80
        val p = java.nio.ByteBuffer.allocate(84)
        p.position(76); p.putInt(w << 16); p.putInt(h << 16)
        box("tkhd", p.array())
      }
      ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
    }
    val records = Seq(
      MediaRecord(1L, "image", encode(37, 21, "png"), "{}"),
      MediaRecord(2L, "image", encode(128, 64, "jpg"), "{}"),
      MediaRecord(3L, "audio", wav(8000f, 2, 1234), "{}"),
      MediaRecord(4L, "video", mp4(320, 240, 600, 1800), "{}"))
      .toDS()
    val feats = extractFeatures(records, imageIoRegistry)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width == 37 && feats(1L).height == 21 && feats(1L).frames == 1,
      s"PNG header misread: ${feats(1L)}")
    assert(feats(2L).width == 128 && feats(2L).height == 64,
      s"JPEG header misread: ${feats(2L)}")
    assert(feats(3L).width == 8000 && feats(3L).height == 2 && feats(3L).frames == 1234,
      s"WAV header misread (width=rate, height=channels, frames=samples): ${feats(3L)}")
    assert(feats(4L).width == 320 && feats(4L).height == 240 && feats(4L).frames == 3000,
      s"MP4 header misread (width/height=tkhd 16.16, frames=duration_ms): ${feats(4L)}")
    // corrupt video bytes must fail the task loudly, like image/audio
    val badVideo = Seq(MediaRecord(8L, "video", Array[Byte](1, 2, 3), "{}")).toDS()
    val vex = intercept[org.apache.spark.SparkException] {
      extractFeatures(badVideo, imageIoRegistry).collect()
    }
    assert(vex.getMessage.contains("ISO BMFF") ||
      Option(vex.getCause).exists(_.getMessage.contains("ISO BMFF")))

    // fuzz the box walker: random garbage and bit-mutated valid files must
    // either decode or throw the TYPED corrupt-container error — never a
    // raw index error and never loop (driver-side, bounded by test time)
    val codec = new Mp4HeaderCodec
    val rnd = new scala.util.Random(7)
    val valid = mp4(320, 240, 600, 1800)
    (1 to 300).foreach { i =>
      val payload =
        if (i % 3 == 0) { // truncation of a valid file
          valid.take(1 + rnd.nextInt(valid.length))
        } else if (i % 3 == 1) { // byte mutation of a valid file
          val m = valid.clone()
          m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
          m
        } else { // pure noise
          val m = new Array[Byte](rnd.nextInt(200))
          rnd.nextBytes(m); m
        }
      try codec.decode(MediaRecord(100L + i, "video", payload, "{}"))
      catch { case _: IllegalArgumentException => () } // the ONLY allowed failure
    }
    // downstream plumbing works unchanged on really-decoded features
    val resized = resize(extractFeatures(records, imageIoRegistry), 64, 64)
      .collect().map(f => f.media_id -> f).toMap
    assert(resized(2L).width == 64 && resized(2L).height == 32,
      s"aspect-preserving resize over real dims: ${resized(2L)}")
    // a payload no reader recognizes must fail the task, not emit features
    val corrupt = Seq(MediaRecord(9L, "image",
      "this is not an image".getBytes("UTF-8"), "{}")).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      extractFeatures(corrupt, imageIoRegistry).collect()
    }
    assert(ex.getMessage.contains("not a decodable image") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a decodable image")))
  }
}

/** File-scope codecs for the registry test — keeps the Spark closure free
  * of a captured (non-serializable) suite instance.
  */
object OperatorSpec {
  import graft.operators.MultimodalPipeline._

  object FixedImageCodec extends MediaCodec {
    val modalities: Set[String] = Set("image")
    def decode(r: MediaRecord): MediaFeatures =
      decodeStub(r).copy(width = 333, height = 444)
  }

  object StubRest extends MediaCodec {
    val modalities: Set[String] = Set("audio", "video")
    def decode(r: MediaRecord): MediaFeatures = decodeStub(r)
  }
}
