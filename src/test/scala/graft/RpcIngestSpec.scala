package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s.{JArray, JInt, JNothing, JObject, JString, JValue}
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

  /** Stub node: `total` signatures `sig000..sigNNN` (newest-first, like the
    * real RPC); `getTransaction` returns blockTime = 1700000000 + index,
    * except signatures in `rpcError` (JSON-RPC error object), `notFound`
    * (result: null — node pruned the tx) or `http500`.
    */
  private final class StubNode(
      total: Int,
      rpcError: Set[String] = Set.empty,
      notFound: Set[String] = Set.empty,
      http500: Set[String] = Set.empty) {

    val sigCalls = new AtomicInteger(0)
    val txCalls = new AtomicInteger(0)
    @volatile var lastToken: Option[String] = None
    private val sigs = (0 until total).map(i => f"sig$i%03d") // sig000 newest

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/"
    def stop(): Unit = server.stop(0)

    private def handle(ex: HttpExchange): Unit = {
      val req = JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      lastToken = Option(ex.getRequestHeaders.getFirst("x-token"))
      val JString(method) = req \ "method": @unchecked
      val JArray(params) = req \ "params": @unchecked
      method match {
        case "getSignaturesForAddress" =>
          sigCalls.incrementAndGet()
          val opts = params(1)
          val limit = (opts \ "limit") match { case JInt(i) => i.toInt; case _ => 1000 }
          val from = (opts \ "before") match {
            case JString(b) => sigs.indexOf(b) + 1 // strictly older than cursor
            case _ => 0
          }
          val page = sigs.slice(from, from + limit)
            .map(s => JObject("signature" -> JString(s), "slot" -> JInt(from + 1)))
          respond(ex, 200, result(JArray(page.toList)))
        case "getTransaction" =>
          txCalls.incrementAndGet()
          val JString(sig) = params.head: @unchecked
          if (http500(sig)) respond(ex, 500, """{"oops":true}""")
          else if (rpcError(sig))
            respond(ex, 200, """{"jsonrpc":"2.0","id":1,"error":{"code":-32005,"message":"node is behind"}}""")
          else if (notFound(sig))
            respond(ex, 200, """{"jsonrpc":"2.0","id":1,"result":null}""")
          else {
            val idx = sigs.indexOf(sig)
            respond(ex, 200, result(JObject(
              "slot" -> JInt(idx + 1),
              "blockTime" -> JInt(1700000000 + idx),
              "transaction" -> JObject("signatures" -> JArray(List(JString(sig)))),
              "meta" -> JObject("err" -> JNothing, "fee" -> JInt(5000)))))
          }
        case other => respond(ex, 400, s"""{"error":"unknown method $other"}""")
      }
    }

    private def result(r: JValue): String =
      JsonMethods.compact(JsonMethods.render(JObject(
        "jsonrpc" -> JString("2.0"), "id" -> JInt(1), "result" -> r)))

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  }

  test("fetchHistory pulls signatures then details and lands bronze rows") {
    val node = new StubNode(total = 7)
    try {
      val rows = new RpcChainIngestor(node.endpoint, fetchPartitions = 2)
        .fetchHistory(spark, W, limit = 5).collect()
      assert(rows.length == 5)
      val bySig = rows.map(r => r.getAs[String]("tx_hash") -> r).toMap
      assert(bySig.keySet == Set("sig000", "sig001", "sig002", "sig003", "sig004"),
        "newest `limit` signatures, reference take-from-front semantics")
      val r2 = bySig("sig002")
      assert(r2.getAs[Long]("timestamp") == 1700000002L, "timestamp = blockTime")
      assert(r2.getAs[String]("chain") == "solana")
      assert(r2.getAs[String]("user_id") == "00000000-0000-0000-0000-000000000000")
      val meta = JsonMethods.parse(r2.getAs[String]("raw_metadata"))
      assert((meta \ "meta" \ "fee") == JInt(5000),
        "raw_metadata stores the full getTransaction envelope verbatim")
      assert(rows.map(_.getAs[String]("id")).distinct.length == 5)
    } finally node.stop()
  }

  test("per-signature failures are skipped, never fatal (solana.rs:51-53)") {
    val node = new StubNode(total = 6,
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
    val node = new StubNode(total = 10)
    try {
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 3)
        .fetchHistory(spark, W, limit = 8).collect()
      assert(rows.length == 8)
      assert(node.sigCalls.get() == 3, "8 signatures at pageSize 3 = 3 pages")
    } finally node.stop()
  }

  test("history shorter than limit terminates on the short page") {
    val node = new StubNode(total = 4)
    try {
      val rows = new RpcChainIngestor(node.endpoint, pageSize = 10)
        .fetchHistory(spark, W, limit = 100).collect()
      assert(rows.length == 4)
      assert(node.sigCalls.get() == 1, "short first page ends pagination")
      assert(node.txCalls.get() == 4)
    } finally node.stop()
  }

  test("limit 0 returns an empty bronze frame without any RPC call") {
    val node = new StubNode(total = 4)
    try {
      val df = new RpcChainIngestor(node.endpoint).fetchHistory(spark, W, 0)
      assert(df.count() == 0)
      assert(df.columns.toSeq == graft.model.Schemas.bronze.fieldNames.toSeq)
      assert(node.sigCalls.get() == 0)
    } finally node.stop()
  }

  test("re-ingest is id-stable: deterministic ids make the sink idempotent") {
    val node = new StubNode(total = 3)
    try {
      val ing = new RpcChainIngestor(node.endpoint)
      def ids() = ing.fetchHistory(spark, W, 3).collect()
        .map(r => r.getAs[String]("tx_hash") -> r.getAs[String]("id")).toMap
      assert(ids() == ids(), "same signature -> same id on every ingest")
    } finally node.stop()
  }

  test("x-token rides every request (solana_grpc.rs:9-14 auth surface)") {
    val node = new StubNode(total = 2)
    try {
      new RpcChainIngestor(node.endpoint, xToken = Some("sekrit"))
        .fetchHistory(spark, W, 2).collect()
      assert(node.lastToken.contains("sekrit"))
    } finally node.stop()
  }

  test("a broken signature-list call IS fatal (reference `?` semantics)") {
    val node = new StubNode(total = 2)
    node.stop() // connection refused
    intercept[Exception] {
      new RpcChainIngestor(node.endpoint, timeoutMs = 500)
        .fetchHistory(spark, W, 2).collect()
    }
  }
}
