package graft

import java.nio.file.Files

import graft.sources.{RpcChainIngestor, RpcFleetPoller, RpcPoller}

/** A2 live-ingest loop: poll → cursor-cut → exactly-once append. The
  * correctness claim under test is that NOTHING depends on the cursor —
  * it is efficiency state only; the keyed append is what makes the loop
  * exactly-once.
  */
class RpcPollerSpec extends SparkSpec {

  private val W = "WaLLetAddr1111111111111111111111"

  test("polling lands history once, then only strictly newer transactions") {
    val node = new RpcStubNode(total = 5)
    val table = Files.createTempDirectory("poll").toString + "/bronze"
    try {
      val poller = new RpcPoller(new RpcChainIngestor(node.endpoint), table, W)
      assert(poller.pollOnce(spark) == 5, "first poll lands the full history")
      node.txCalls.set(0)
      assert(poller.pollOnce(spark) == 0, "idle feed: no detail fetches at all")
      assert(node.txCalls.get() == 0,
        "the cursor cut happens BEFORE any getTransaction round-trip")

      node.grow(3)
      assert(poller.pollOnce(spark) == 3, "only the newer transactions land")
      assert(node.txCalls.get() == 3)
      val t = spark.read.parquet(table)
      assert(t.count() == 8)
      assert(t.select("id").distinct().count() == 8)
    } finally node.stop()
  }

  test("a lost cursor degrades to re-fetch, never to duplicates") {
    val node = new RpcStubNode(total = 4)
    val dir = Files.createTempDirectory("poll2").toString
    val table = s"$dir/bronze"
    try {
      val ing = new RpcChainIngestor(node.endpoint)
      assert(new RpcPoller(ing, table, W).pollOnce(spark) == 4)
      // cursor file deleted (fresh deploy, wiped checkpoint volume)
      val cur = new java.io.File(s"$table._cursor_$W")
      assert(cur.exists()); assert(cur.delete())
      val blind = new RpcPoller(ing, table, W)
      assert(blind.pollOnce(spark) == 0,
        "re-fetched history is dropped by the keyed append, not re-inserted")
      assert(spark.read.parquet(table).count() == 4)
    } finally node.stop()
  }

  test("a restarted poller resumes from the persisted cursor") {
    val node = new RpcStubNode(total = 3)
    val table = Files.createTempDirectory("poll3").toString + "/bronze"
    try {
      val ing = new RpcChainIngestor(node.endpoint)
      new RpcPoller(ing, table, W).pollOnce(spark)
      node.grow(2)
      node.txCalls.set(0)
      // new instance = process restart; cursor comes back from disk
      val restarted = new RpcPoller(ing, table, W)
      assert(restarted.currentCursor.contains("sig000"))
      assert(restarted.pollOnce(spark) == 2)
      assert(node.txCalls.get() == 2, "resume pays only the fresh prefix")
      assert(spark.read.parquet(table).count() == 5)
    } finally node.stop()
  }

  test("randomized differential: cursor-walk over random feed growth never loses or duplicates") {
    val rnd = new scala.util.Random(4096L)
    (1 to 5).foreach { round =>
      val node = new RpcStubNode(total = 1 + rnd.nextInt(6))
      val table = Files.createTempDirectory(s"pollp$round").toString + "/bronze"
      try {
        // random page size exercises multi-page walks and stopAt cuts
        val ing = new RpcChainIngestor(node.endpoint, pageSize = 1 + rnd.nextInt(4))
        val poller = new RpcPoller(ing, table, W, pageLimit = 1000)
        var expected = 0L
        (1 to 4).foreach { _ =>
          if (rnd.nextBoolean()) node.grow(rnd.nextInt(5))
          poller.pollOnce(spark)
        }
        poller.pollOnce(spark) // drain whatever the last grow added
        val landed = spark.read.parquet(table)
        val sigs = landed.select("tx_hash").collect().map(_.getString(0)).toSet
        val model = node.allSigs.toSet // the feed's truth
        assert(sigs == model,
          s"round $round: table ${sigs.size} signatures vs feed ${model.size}")
        assert(landed.count() == sigs.size, s"round $round: duplicate rows")
      } finally node.stop()
    }
  }

  test("a burst larger than pageLimit is fully fetched, never skipped past") {
    // The failure mode under test: more new signatures arrive between
    // polls than one round's page budget. The resume walk must keep
    // paging until the cursor appears — terminating on the budget and
    // then advancing the cursor would orphan the unfetched gap forever.
    val node = new RpcStubNode(total = 3)
    val table = Files.createTempDirectory("pollburst").toString + "/bronze"
    try {
      val poller = new RpcPoller(
        new RpcChainIngestor(node.endpoint, pageSize = 2), table, W, pageLimit = 4)
      assert(poller.pollOnce(spark) == 3)
      node.grow(11) // burst of 11 >> pageLimit 4
      assert(poller.pollOnce(spark) == 11,
        "the whole burst lands in one round; no gap is skipped")
      val t = spark.read.parquet(table)
      assert(t.count() == 14)
      assert(t.select("tx_hash").collect().map(_.getString(0)).toSet ==
        node.allSigs.toSet)
      node.grow(2)
      assert(poller.pollOnce(spark) == 2, "steady state resumes normally after the burst")
    } finally node.stop()
  }

  test("randomized differential under a TINY page budget: bursts never lose rows") {
    val rnd = new scala.util.Random(8192L)
    (1 to 4).foreach { round =>
      val node = new RpcStubNode(total = 1 + rnd.nextInt(4))
      val table = Files.createTempDirectory(s"pollb$round").toString + "/bronze"
      try {
        // pageLimit 2 with growth up to 7 per poll: most rounds exceed
        // the budget, exercising the resume-past-limit path every time
        val ing = new RpcChainIngestor(node.endpoint, pageSize = 1 + rnd.nextInt(3))
        val poller = new RpcPoller(ing, table, W, pageLimit = 2)
        poller.pollOnce(spark) // bootstrap: newest pageLimit of the initial feed
        (1 to 4).foreach { _ =>
          if (rnd.nextBoolean()) node.grow(rnd.nextInt(8))
          poller.pollOnce(spark)
        }
        poller.pollOnce(spark)
        val landed = spark.read.parquet(table)
        val sigs = landed.select("tx_hash").collect().map(_.getString(0)).toSet
        // bootstrap keeps only the newest pageLimit of the INITIAL feed;
        // everything that arrived after the first poll must be present
        val initial = node.allSigs.filter(_.startsWith("sig")).toSet
        val grownSigs = node.allSigs.filterNot(_.startsWith("sig")).toSet
        assert(grownSigs.subsetOf(sigs),
          s"round $round: grown signatures lost: ${grownSigs -- sigs}")
        assert(sigs.subsetOf(initial ++ grownSigs), s"round $round: phantom rows")
        assert(landed.count() == sigs.size, s"round $round: duplicate rows")
      } finally node.stop()
    }
  }

  test("fleet poll: per-wallet cursors, one dead feed skips loudly, zero duplicates") {
    val node = new RpcStubNode(total = 0,
      perWallet = Map("w1" -> 3, "w2" -> 2, "w3" -> 4),
      sigError = Set("w3")) // w3's signature-list call 500s every time
    val table = Files.createTempDirectory("fleet").toString + "/bronze"
    try {
      val fleet = new RpcFleetPoller(
        new RpcChainIngestor(node.endpoint, fetchPartitions = 2, pageSize = 2),
        table, Seq("w1", "w2", "w3"), pageLimit = 10)
      assert(fleet.pollOnce(spark) == 5, "w1+w2 land; dead w3 skips without stalling the fleet")
      assert(fleet.currentCursors(spark) ==
        Map("w1" -> "w1-sig000", "w2" -> "w2-sig000"),
        "cursors advance only for wallets that landed rows")

      // steady state: per-wallet growth, one of them a burst > pageLimit
      node.growWallet("w1", 3)
      node.growWallet("w2", 11)
      assert(fleet.pollOnce(spark) == 14,
        "the whole fleet's fresh rows land in one keyed append; the burst walks past pageLimit")

      node.txCalls.set(0)
      assert(fleet.pollOnce(spark) == 0, "idle fleet: no detail fetches")
      assert(node.txCalls.get() == 0, "cursor cut happens before any getTransaction")

      val t = spark.read.parquet(table)
      val want = (node.walletSigs("w1") ++ node.walletSigs("w2")).toSet
      assert(t.select("tx_hash").collect().map(_.getString(0)).toSet == want)
      assert(t.count() == want.size, "no duplicate rows across rounds")

      // a restarted (new) instance resumes from the persisted cursor table
      val restarted = new RpcFleetPoller(
        new RpcChainIngestor(node.endpoint, pageSize = 2), table, Seq("w1", "w2", "w3"))
      node.growWallet("w2", 1)
      assert(restarted.pollOnce(spark) == 1)

      // a lost cursor table degrades to re-fetch, never to duplicates
      val fs = new java.io.File(s"$table._cursors")
      assert(fs.exists())
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
      }
      rmrf(fs)
      assert(restarted.pollOnce(spark) == 0,
        "blind re-fetch is dropped by the keyed append")
      assert(spark.read.parquet(table).count() == want.size + 1)

      // a writer that died mid-swap leaves an EMPTY cursor dir: the next
      // round must degrade to bootstrap (dedup'd), never crash
      val cursDir = new java.io.File(s"$table._cursors")
      assert(cursDir.exists(), "previous poll republished the cursor table")
      Option(cursDir.listFiles()).foreach(_.foreach(rmrf))
      assert(cursDir.listFiles().isEmpty)
      assert(restarted.pollOnce(spark) == 0,
        "an unreadable (empty) cursor table re-bootstraps, rows still dedup")
      assert(spark.read.parquet(table).count() == want.size + 1)
    } finally node.stop()
  }

  test("randomized fleet differential: bursts and dead feeds never lose or duplicate") {
    val rnd = new scala.util.Random(16384L)
    (1 to 3).foreach { round =>
      val wallets = (1 to 4).map(i => s"fw$i")
      val node = new RpcStubNode(total = 0,
        perWallet = wallets.map(_ -> (1 + rnd.nextInt(3))).toMap)
      val table = Files.createTempDirectory(s"fleetp$round").toString + "/bronze"
      try {
        val fleet = new RpcFleetPoller(
          new RpcChainIngestor(node.endpoint, fetchPartitions = 2,
            pageSize = 1 + rnd.nextInt(3)),
          table, wallets, pageLimit = 1000)
        fleet.pollOnce(spark) // bootstrap all wallets
        (1 to 3).foreach { _ =>
          wallets.foreach { w =>
            if (rnd.nextBoolean()) node.growWallet(w, rnd.nextInt(6))
          }
          fleet.pollOnce(spark)
        }
        fleet.pollOnce(spark) // drain the last growth
        val landed = spark.read.parquet(table)
        val sigs = landed.select("tx_hash").collect().map(_.getString(0)).toSet
        val model = wallets.flatMap(node.walletSigs).toSet
        assert(sigs == model,
          s"round $round: table ${sigs.size} vs feeds ${model.size}: " +
            s"missing ${model -- sigs}, phantom ${sigs -- model}")
        assert(landed.count() == sigs.size, s"round $round: duplicate rows")
        assert(landed.select("wallet_address", "tx_hash").distinct().count() == sigs.size)
      } finally node.stop()
    }
  }

  test("run() executes the loop; landed total accumulates across rounds") {
    val node = new RpcStubNode(total = 2)
    val table = Files.createTempDirectory("poll4").toString + "/bronze"
    try {
      val poller = new RpcPoller(new RpcChainIngestor(node.endpoint), table, W)
      assert(poller.run(spark, rounds = 2, intervalMs = 0) == 2)
      node.grow(1)
      assert(poller.run(spark, rounds = 2, intervalMs = 0) == 1)
    } finally node.stop()
  }
}
