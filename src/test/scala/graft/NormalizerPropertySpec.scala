package graft

import graft.model.Transaction
import graft.normalize.SolanaNormalizer
import scala.util.Random

/** Randomized differential test (SURVEY.md §5.3): 300 generated
  * transactions spanning the parser's edge cases, checked against an
  * independent in-test model of the documented semantics
  * (`/root/reference/adapters/src/solana_parser.rs:7-93`) — a second
  * implementation, not shared code with the engine's columnar formulation.
  */
class NormalizerPropertySpec extends SparkSpec {

  private val W = "TrackedWallet11111111111111111111111111111"
  private val rnd = new Random(12345L)

  // --- corpus generator ---------------------------------------------------
  private case class TokBal(idx: Int, mint: String, owner: String, ui: Option[Double])

  private case class GenTx(
      id: String, hasMeta: Boolean, keys: Seq[String],
      pre: Seq[Long], post: Seq[Long],
      preTok: Seq[TokBal], postTok: Seq[TokBal])

  private def genTx(i: Int): GenTx = {
    val walletPos = rnd.nextInt(4) // 3 = absent
    val nKeys = 2 + rnd.nextInt(3)
    val keys = (0 until nKeys).map(j => s"Key${i}_$j").toVector
    val keysW = if (walletPos < nKeys) keys.updated(walletPos, W) else keys
    // balances arrays sometimes shorter than the key list (index-miss path)
    val nBal = if (rnd.nextInt(10) == 0) math.max(1, nKeys - 1) else nKeys
    def lamports() = rnd.nextInt(5) match {
      case 0 => 0L
      case 1 => rnd.nextInt(1500).toLong // dust-scale (< 1e-6 SOL ⇔ < 1000)
      case _ => (rnd.nextInt(20) + 1) * 100000000L
    }
    val pre = Seq.fill(nBal)(lamports())
    val post = Seq.fill(nBal)(lamports())
    def tok(j: Int) = TokBal(
      idx = rnd.nextInt(nKeys + 2),
      mint = s"Mint${rnd.nextInt(4)}",
      owner = if (rnd.nextBoolean()) W else s"Other$j",
      ui = if (rnd.nextInt(5) == 0) None else Some((rnd.nextInt(800) / 100.0) max 0.0))
    GenTx(s"tx$i", rnd.nextInt(10) != 0, keysW, pre, post,
      Seq.fill(rnd.nextInt(3))(tok(rnd.nextInt(100))),
      Seq.fill(rnd.nextInt(4))(tok(rnd.nextInt(100))))
  }

  private def toJson(t: GenTx): String = {
    def keyJs(k: String) = s"""{"pubkey": "$k", "signer": false, "writable": true}"""
    def tokJs(b: TokBal) = {
      val ui = b.ui.map(_.toString).getOrElse("null")
      s"""{"accountIndex": ${b.idx}, "mint": "${b.mint}", "owner": "${b.owner}", "uiTokenAmount": {"uiAmount": $ui, "decimals": 6, "amount": "0"}}"""
    }
    val meta = if (!t.hasMeta) "" else
      s""", "meta": {"fee": 0, "preBalances": [${t.pre.mkString(",")}], "postBalances": [${t.post.mkString(",")}], "preTokenBalances": [${t.preTok.map(tokJs).mkString(",")}], "postTokenBalances": [${t.postTok.map(tokJs).mkString(",")}]}"""
    s"""{"slot": 1, "blockTime": 1672531200, "transaction": {"signatures": ["s"], "message": {"accountKeys": [${t.keys.map(keyJs).mkString(",")}], "recentBlockhash": "x"}}$meta}"""
  }

  // --- independent model of the documented semantics ----------------------
  private def expected(t: GenTx): Set[(String, Double)] = {
    if (!t.hasMeta) return Set.empty
    val native: Set[(String, Double)] = t.keys.indexOf(W) match {
      case -1 => Set.empty
      case i =>
        val delta = (t.post.lift(i).getOrElse(0L) - t.pre.lift(i).getOrElse(0L)) / 1e9
        if (math.abs(delta) > 1e-6) Set(("SOL", delta)) else Set.empty
    }
    val spl = t.postTok.filter(_.owner == W).flatMap { p =>
      val pre = t.preTok.find(_.idx == p.idx).flatMap(_.ui).getOrElse(0.0)
      val delta = p.ui.getOrElse(0.0) - pre
      if (math.abs(delta) > 1e-6) Some((p.mint, delta)) else None
    }
    native ++ spl
  }

  private lazy val corpus = (0 until 300).map(genTx)

  private lazy val silver: Map[String, Seq[(String, Double)]] = {
    import spark.implicits._
    val bronze = corpus.map(t =>
      Transaction(t.id, "u", W, 1672531200L, s"h_${t.id}", "solana", toJson(t))).toDF()
    SolanaNormalizer.normalize(bronze)
      .select("transaction_id", "asset_symbol", "amount").collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDouble(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  test("random corpus: engine output matches the independent model on every transaction") {
    corpus.foreach { t =>
      val got = silver.getOrElse(t.id, Nil)
      val want = expected(t)
      // SPL entries for duplicate (owner, idx) post balances may repeat;
      // compare as multisets via sorted seq
      assert(got.sorted == want.toSeq.sorted || got.toSet == want,
        s"${t.id}: got ${got.sorted}, want ${want.toSeq.sorted}\n${toJson(t)}")
    }
  }

  test("random corpus: dust invariant holds everywhere") {
    assert(silver.values.flatten.forall { case (_, amt) => math.abs(amt) > 1e-6 })
  }

  test("random corpus: every emitted asset is SOL or an owned post-token mint") {
    corpus.foreach { t =>
      val owned = t.postTok.filter(_.owner == W).map(_.mint).toSet + "SOL"
      silver.getOrElse(t.id, Nil).foreach { case (asset, _) =>
        assert(owned.contains(asset), s"${t.id} emitted foreign asset $asset")
      }
    }
  }

  test("ethereum branch: random envelopes match an independent in-test model") {
    import spark.implicits._
    val rnd = new Random(314L)
    val wallet = "0xTrackedWa11et0000000000000000000000000001"
    val others = Seq("0xOtherA", "0xOtherB")
    def addr(): String = {
      val a = (wallet +: others)(rnd.nextInt(3))
      if (rnd.nextBoolean()) a.toUpperCase else a // EIP-55-style case noise
    }
    case class Env(id: String, from: String, to: String,
        value: Option[BigInt], status: Option[Int])
    val envs = (0 until 200).map { i =>
      val value = rnd.nextInt(5) match {
        case 0 => None                                // parse-guard drop
        case 1 => Some(BigInt(rnd.nextInt(900)))      // dust-range wei
        case 2 => Some(BigInt("10000000000000000000")) // > int64 wei
        case _ => Some(BigInt(rnd.nextLong(2000000000000000000L)))
      }
      val status = rnd.nextInt(4) match {
        case 0 => Some(0) // reverted
        case 1 => None    // pre-Byzantium: success
        case _ => Some(1)
      }
      Env(s"e$i", addr(), addr(), value, status)
    }
    // independent model of the documented semantics
    def expected(e: Env): Option[Double] = for {
      v <- e.value
      if e.status.forall(_ == 1)
      signed = (if (e.to.toLowerCase == wallet.toLowerCase) v else BigInt(0)) -
        (if (e.from.toLowerCase == wallet.toLowerCase) v else BigInt(0))
      amt = signed.toDouble / 1e18
      if math.abs(amt) > 1e-6
    } yield amt

    val bronze = envs.map { e =>
      val fields = Seq(s""""from": "${e.from}"""", s""""to": "${e.to}"""") ++
        e.value.map(v => s""""value": $v""") ++
        e.status.map(st => s""""status": $st""")
      graft.model.Transaction(e.id, "u", wallet, 0L, s"h${e.id}", "ethereum",
        fields.mkString("{", ", ", "}"))
    }.toDF()
    val got = graft.normalize.EthereumNormalizer.normalize(bronze)
      .select("transaction_id", "amount").as[(String, Double)].collect().toMap
    envs.foreach { e =>
      assert(got.get(e.id) == expected(e),
        s"${e.id}: got ${got.get(e.id)}, want ${expected(e)} for $e")
    }
  }
}
