package graft

import org.json4s.JInt
import org.json4s.jackson.JsonMethods

import graft.sources.RpcChainIngestor

/** A1 wire half: the JSON-RPC history client against an in-process stub
  * node (localhost `HttpServer`, no network egress). The stub speaks the
  * two RPC methods the reference uses (`adapters/src/solana.rs:26,37`):
  * `getSignaturesForAddress` with `limit`/`before` cursor pagination and
  * `getTransaction`, with configurable per-signature failures to exercise
  * the reference's log-and-skip contract (solana.rs:51-53).
  */
class RpcIngestSpec extends SparkSpec {

  private val W = "WaLLetAddr1111111111111111111111"

  test("fetchHistory pulls signatures then details and lands bronze rows") {
    val node = new RpcStubNode(total = 7)
    try {
      val rows = new RpcChainIngestor(node.endpoint, fetchPartitions = 2)
        .fetchHistory(spark, W, limit = 5).collect()
      assert(rows.length == 5)
      val bySig = rows.map(r => r.getAs[String]("tx_hash") -> r).toMap
      assert(bySig.keySet == Set("sig000", "sig001", "sig002", "sig003", "sig004"),
        "newest `limit` signatures, reference take-from-front semantics")
      val r2 = bySig("sig002")
      assert(r2.getAs[Long]("timestamp") == 1700000004L, "timestamp = blockTime")
      assert(r2.getAs[String]("chain") == "solana")
      assert(r2.getAs[String]("user_id") == "00000000-0000-0000-0000-000000000000")
      val meta = JsonMethods.parse(r2.getAs[String]("raw_metadata"))
      assert((meta \ "meta" \ "fee") == JInt(5000),
        "raw_metadata stores the full getTransaction envelope verbatim")
      assert(rows.map(_.getAs[String]("id")).distinct.length == 5)
    } finally node.stop()
  }

  test("per-signature failures are skipped, never fatal (solana.rs:51-53)") {
    val node = new RpcStubNode(total = 6,
      rpcError = Set("sig001"), notFound = Set("sig003"), http500 = Set("sig004"))
    try {
      val rows = new RpcChainIngestor(node.endpoint)
        .fetchHistory(spark, W, limit = 6).collect()
      assert(rows.map(_.getAs[String]("tx_hash")).sorted.toSeq ==
        Seq("sig000", "sig002", "sig005"),
        "RPC-error, pruned, and HTTP-500 signatures each skip independently")
    } finally node.stop()
  }

  test("signature list paginates with the before cursor; pages stay bounded") {
    val node = new RpcStubNode(total = 10)
    try {
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 3)
        .fetchHistory(spark, W, limit = 8).collect()
      assert(rows.length == 8)
      assert(node.sigCalls.get() == 3, "8 signatures at pageSize 3 = 3 pages")
    } finally node.stop()
  }

  test("history shorter than limit terminates on the short page") {
    val node = new RpcStubNode(total = 4)
    try {
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 10)
        .fetchHistory(spark, W, limit = 100).collect()
      assert(rows.length == 4)
      assert(node.sigCalls.get() == 1, "short first page ends pagination")
      assert(node.txCalls.get() == 4)
    } finally node.stop()
  }

  test("limit 0 returns an empty bronze frame without any RPC call") {
    val node = new RpcStubNode(total = 4)
    try {
      val df = new RpcChainIngestor(node.endpoint).fetchHistory(spark, W, 0)
      assert(df.count() == 0)
      assert(df.columns.toSeq == graft.model.Schemas.bronze.fieldNames.toSeq)
      assert(node.sigCalls.get() == 0)
    } finally node.stop()
  }

  test("re-ingest is id-stable: deterministic ids make the sink idempotent") {
    val node = new RpcStubNode(total = 3)
    try {
      val ing = new RpcChainIngestor(node.endpoint)
      def ids() = ing.fetchHistory(spark, W, 3).collect()
        .map(r => r.getAs[String]("tx_hash") -> r.getAs[String]("id")).toMap
      assert(ids() == ids(), "same signature -> same id on every ingest")
    } finally node.stop()
  }

  test("x-token rides every request (solana_grpc.rs:9-14 auth surface)") {
    val node = new RpcStubNode(total = 2)
    try {
      new RpcChainIngestor(node.endpoint, xToken = Some("sekrit"))
        .fetchHistory(spark, W, 2).collect()
      assert(node.lastToken.contains("sekrit"))
    } finally node.stop()
  }

  test("multi-wallet fan-out fetches every wallet's feed; one dead wallet never stalls the fleet") {
    val node = new RpcStubNode(total = 0,
      perWallet = Map("w1" -> 3, "w2" -> 5, "w3" -> 2, "w4" -> 0))
    try {
      val rows = new RpcChainIngestor(node.endpoint, fetchPartitions = 2, pageSize = 2)
        .fetchHistoryMany(spark, Seq("w1", "w2", "w3", "w4", "wGhost"), limitPerWallet = 4)
        .collect()
      val byWallet = rows.groupBy(_.getAs[String]("wallet_address")).view.mapValues(_.length).toMap
      assert(byWallet == Map("w1" -> 3, "w2" -> 4, "w3" -> 2),
        "per-wallet limit respected; empty and unknown wallets contribute nothing")
      assert(rows.map(_.getAs[String]("tx_hash")).distinct.length == rows.length)
      assert(rows.filter(_.getAs[String]("wallet_address") == "w2")
        .map(_.getAs[String]("tx_hash")).toSet ==
        Set("w2-sig000", "w2-sig001", "w2-sig002", "w2-sig003"),
        "each wallet's NEWEST limitPerWallet signatures land")
    } finally node.stop()
  }

  test("a full page with malformed entries does NOT end the walk early") {
    // history-exhausted detection must use the RAW response size: a full
    // page whose malformed items were dropped is still a full page
    val node = new RpcStubNode(total = 6,
      malformedSig = Set("sig001", "sig002"))
    try {
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 3)
        .fetchHistory(spark, W, limit = 6).collect()
      assert(rows.map(_.getAs[String]("tx_hash")).sorted.toSeq ==
        Seq("sig000", "sig003", "sig004", "sig005"),
        "the page after the malformed-heavy one is still walked")
      assert(node.sigCalls.get() >= 2, "walk continued past the garbled page")
    } finally node.stop()
  }

  test("a page of only malformed entries terminates (no before-cursor to advance)") {
    val node = new RpcStubNode(total = 4,
      malformedSig = Set("sig000", "sig001"))
    try {
      // pageSize 2: first page is entirely malformed -> no signature to
      // page `before` from; the walk must stop rather than re-request the
      // same page forever
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 2)
        .fetchHistory(spark, W, limit = 4).collect()
      assert(rows.isEmpty)
      assert(node.sigCalls.get() == 1)
    } finally node.stop()
  }

  test("a broken signature-list call IS fatal (reference `?` semantics)") {
    val node = new RpcStubNode(total = 2)
    node.stop() // connection refused
    intercept[Exception] {
      new RpcChainIngestor(node.endpoint, timeoutMs = 500)
        .fetchHistory(spark, W, 2).collect()
    }
  }
}
