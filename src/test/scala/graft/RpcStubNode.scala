package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s.{JArray, JInt, JNothing, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

/** In-process stub Solana-RPC node (localhost `HttpServer`, no network
  * egress) speaking the two methods the reference uses
  * (`adapters/src/solana.rs:26,37`): `getSignaturesForAddress` with
  * `limit`/`before` cursor pagination and `getTransaction`. Signatures
  * are `sig000, sig001, …` with LOWER index = NEWER (the RPC returns
  * newest-first)… until [[grow]] prepends strictly newer ones
  * (`new0000, new0001, …`). Per-signature failures are configurable to
  * exercise the log-and-skip contract (solana.rs:51-53).
  */
final class RpcStubNode(
    total: Int,
    rpcError: Set[String] = Set.empty,
    notFound: Set[String] = Set.empty,
    http500: Set[String] = Set.empty,
    perWallet: Map[String, Int] = Map.empty,
    malformedSig: Set[String] = Set.empty, // emitted WITHOUT a signature field
    sigError: Set[String] = Set.empty) {   // wallets whose signature LIST call 500s

  val sigCalls = new AtomicInteger(0)
  val txCalls = new AtomicInteger(0)
  @volatile var lastToken: Option[String] = None
  // newest-first; grow() prepends. With `perWallet`, each wallet gets an
  // independent feed (`<wallet>-sigNNN`); otherwise one shared feed
  // serves whatever wallet is asked (the single-wallet tests).
  @volatile private var feeds: Map[String, Vector[String]] =
    if (perWallet.isEmpty) Map("" -> (0 until total).map(i => f"sig$i%03d").toVector)
    else perWallet.map { case (w, n) =>
      w -> (0 until n).map(i => f"$w-sig$i%03d").toVector
    }
  private val grown = new AtomicInteger(0)

  private def feedKey(wallet: String): String = if (perWallet.isEmpty) "" else wallet
  private def feedFor(wallet: String): Vector[String] =
    feeds.getOrElse(feedKey(wallet), Vector.empty)

  /** Current (shared-feed) content, newest-first (test model truth). */
  def allSigs: Seq[String] = feeds("")

  /** Prepend `n` strictly newer transactions to the shared feed. */
  def grow(n: Int): Seq[String] = synchronized {
    val fresh = (0 until n).map(_ => f"new${grown.getAndIncrement()}%04d").reverse
    feeds = feeds.updated("", fresh.toVector ++ feeds(""))
    fresh
  }

  /** Per-wallet feed truth (perWallet mode). */
  def walletSigs(w: String): Seq[String] = feedFor(w)

  /** Prepend `n` strictly newer transactions to wallet `w`'s feed. */
  def growWallet(w: String, n: Int): Seq[String] = synchronized {
    val fresh = (0 until n).map(_ => f"$w-new${grown.getAndIncrement()}%04d").reverse
    feeds = feeds.updated(feedKey(w), fresh.toVector ++ feedFor(w))
    fresh
  }

  /** blockTime: stable per signature — 1700000000 + position from the
    * OLDEST end of its feed, so newer signatures always carry larger
    * stamps.
    */
  private def blockTime(sig: String): Int = {
    val feed = feeds.values.find(_.contains(sig)).getOrElse(Vector(sig))
    1700000000 + (feed.size - 1 - feed.indexOf(sig))
  }

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
        val JString(wallet) = params.head: @unchecked
        if (sigError(wallet)) { respond(ex, 500, """{"oops":true}"""); return }
        val snapshot = feedFor(wallet)
        val opts = params(1)
        val limit = (opts \ "limit") match { case JInt(i) => i.toInt; case _ => 1000 }
        val from = (opts \ "before") match {
          case JString(b) => snapshot.indexOf(b) + 1 // strictly older than cursor
          case _ => 0
        }
        val page = snapshot.slice(from, from + limit).map { s =>
          if (malformedSig(s)) JObject("memo" -> JString(s"garbled $s"), "slot" -> JInt(from + 1))
          else JObject("signature" -> JString(s), "slot" -> JInt(from + 1))
        }
        respond(ex, 200, result(JArray(page.toList)))
      case "getTransaction" =>
        txCalls.incrementAndGet()
        val JString(sig) = params.head: @unchecked
        if (http500(sig)) respond(ex, 500, """{"oops":true}""")
        else if (rpcError(sig))
          respond(ex, 200, """{"jsonrpc":"2.0","id":1,"error":{"code":-32005,"message":"node is behind"}}""")
        else if (notFound(sig))
          respond(ex, 200, """{"jsonrpc":"2.0","id":1,"result":null}""")
        else
          respond(ex, 200, result(JObject(
            "slot" -> JInt(blockTime(sig) - 1700000000 + 1),
            "blockTime" -> JInt(blockTime(sig)),
            "transaction" -> JObject("signatures" -> JArray(List(JString(sig)))),
            "meta" -> JObject("err" -> JNothing, "fee" -> JInt(5000)))))
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
