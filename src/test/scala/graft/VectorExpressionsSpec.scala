package graft

import graft.functions.VectorExpressions.{cosineFast, dotFast}
import graft.functions.VectorFunctions.{asDouble, cosine, dot}
import org.apache.spark.sql.functions._

/** DotProductExpr — the custom codegen'd Catalyst expression — must agree
  * bit-for-bit with the higher-order-function formulation and stay inside
  * whole-stage codegen.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotFast equals higher-order dot on known values") {
    val a = array(lit(1.0), lit(2.0), lit(3.0))
    val b = array(lit(4.0), lit(-5.0), lit(6.0))
    val (fast, slow) = Seq(1).toDF("x")
      .select(dotFast(a, b), dot(a, b)).as[(Double, Double)].head()
    assert(fast == 12.0 && fast == slow)
  }

  test("dotFast/cosineFast agree bit-for-bit with HOF versions on the embeddings corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_vec"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(
        dotFast($"embedding", $"q_vec").as("fast"),
        dot(asDouble($"embedding"), asDouble($"q_vec")).as("slow"),
        cosineFast($"embedding", $"q_vec").as("cfast"),
        cosine(asDouble($"embedding"), asDouble($"q_vec")).as("cslow"))
      .filter($"fast" =!= $"slow" || $"cfast" =!= $"cslow")
      .count()
    assert(diffs == 0)
  }

  test("null array on either side yields null, not a crash") {
    val rows = Seq(1).toDF("x").select(
      dotFast(lit(null).cast("array<double>"), array(lit(1.0))).as("l"),
      dotFast(array(lit(1.0)), lit(null).cast("array<double>")).as("r"))
      .collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("mismatched lengths use the shorter prefix (reference .get semantics)") {
    val v = Seq(1).toDF("x")
      .select(dotFast(array(lit(2.0), lit(3.0)), array(lit(10.0))))
      .as[Double].head()
    assert(v == 20.0)
  }

  test("lang argmax: multi-language markers, ties to lex-last lang, null/empty inputs") {
    import graft.functions.VectorExpressions.langArgmax
    val markers = Map(
      "en" -> Seq("the", "and"),
      "es" -> Seq("el", "la"),
      "fr" -> Seq("le", "la"))
    def pred(text: org.apache.spark.sql.Column) =
      langArgmax(split(text, " "), markers)
    val got = Seq(
      "the and cat",   // en wins 2-0
      "la la la",      // "la" is BOTH es and fr: 3-3 tie → lex-last (fr)
      "no markers at all", // 0-0-0 tie → lex-last (fr)
      "el la the and x" // en 2, es 2, fr 1 → tie en/es → lex-last (es)
    ).toDF("text").select(pred($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "fr", "es"), got.toString)
    // null text → null prediction, not a crash
    val n = Seq(Option.empty[String]).toDF("text")
      .select(pred($"text")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("repetition stats: known multisets, <2 tokens and null text yield null") {
    import graft.functions.VectorExpressions.repetitionStats
    val df = Seq(
      (1L, "a b a b c"),     // bigrams: ab, ba, ab, bc → n=4 mode=2 distinct=3
      (2L, "x x x x"),       // xx ×3 → n=3 mode=3 distinct=1
      (3L, "one"),           // <2 tokens → null
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", repetitionStats(split($"text", " ")).as("rs"))
      .orderBy("id")
      .collect()
    assert(df(0).getStruct(1).toSeq == Seq(4, 2, 3))
    assert(df(1).getStruct(1).toSeq == Seq(3, 3, 1))
    assert(df(2).isNullAt(1) && df(3).isNullAt(1))
    // null ELEMENTS (reachable via the SQL registration, never via split):
    // honest NULL, not bigrams silently folded across the gap
    import graft.functions.VectorExpressions.repetitionStats
    val withNullTok = Seq(1)
      .toDF("i")
      .select(repetitionStats(
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("rs"))
      .head
    assert(withNullTok.isNullAt(0), "null token must null the stats")
  }

  test("repetition stats agree with the higher-order formulation on the corpus") {
    import graft.functions.VectorExpressions.repetitionStats
    val t = split($"text", " ")
    val bg = expr(
      "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), " +
        "i -> concat(t[i], ' ', t[i+1])) END")
    val rows = Tables.documents(spark, sfDir)
      .select($"doc_id", t.as("t"))
      .select($"doc_id", bg.as("bg"), repetitionStats($"t").as("rs"))
      .filter($"bg".isNotNull)
      .select($"doc_id",
        (size($"bg") === $"rs.n_bigrams").as("n_ok"),
        (size(array_distinct($"bg")) === $"rs.n_distinct").as("d_ok"),
        (expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
          === $"rs.mode_count").as("m_ok"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"mismatch at doc ${r.getLong(0)}")
    }
  }

  test("repetition_stats is reachable from SQL via the extension registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT repetition_stats(split('a b a b c', ' ')) AS rs").head.getStruct(0)
    assert(r.toSeq == Seq(4, 2, 3))
  }

  test("repetition_stats bigram identity is the token pair, not a joined string") {
    graft.plans.GraftExtensions.register(spark)
    // bigrams: ('a b','c'), ('c','a'), ('a','b c') — all distinct. A
    // space-joined key would collide the first and last into 'a b c'
    // (mode_count 2, n_distinct 2) for tokens that contain the separator.
    val r = spark.sql(
      "SELECT repetition_stats(array('a b', 'c', 'a', 'b c')) AS rs").head.getStruct(0)
    assert(r.toSeq == Seq(3, 1, 3))
  }

  test("striped grid stays in [0,256) on documents whose Int sum overflows") {
    import org.apache.spark.sql.functions.lit
    // ~150k astral-plane code points: each stripe accumulates ~2.3e9 —
    // past Int.MaxValue, where an Int accumulator would go negative under
    // Scala's sign-keeping % (the round-10 advice finding)
    val big = new StringBuilder
    (0 until 150000).foreach(_ => big.appendAll(Character.toChars(0x10FF0F)))
    val grid = spark.range(1)
      .select(graft.functions.VectorExpressions.stripedGrayGrid(
        lit(big.toString)).as("g"))
      .head.getSeq[Int](0)
    assert(grid.length === 72)
    assert(grid.forall(c => c >= 0 && c < 256),
      s"cells out of [0,256): ${grid.filter(c => c < 0 || c >= 256)}")
    // BigInt re-derivation: positions p ≡ j (mod 72) all carry 0x10FF0F
    val perStripe = Array.tabulate(72)(j => (150000 - j + 71) / 72)
    val expected = perStripe.map(n => ((BigInt(0x10FF0F) * n) % 256).toInt)
    assert(grid.toSeq === expected.toSeq)
  }

  test("bounded sorted overlap: exact counts, early-exit only below the bound") {
    import graft.functions.VectorExpressions.boundedSortedOverlap
    import org.apache.spark.sql.functions.{array, lit}
    def ov(a: Seq[Long], b: Seq[Long], req: Long): Int =
      spark.range(1).select(boundedSortedOverlap(
          array(a.map(lit(_)): _*), array(b.map(lit(_)): _*), lit(req)).as("o"))
        .head.getInt(0)
    // exact overlap when reachable
    assert(ov(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L), 0L) === 2)
    assert(ov(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L), 2L) === 2)
    // -1 when the bound is unreachable (overlap 2 < required 3)
    assert(ov(Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L), 3L) === -1)
    // disjoint
    assert(ov(Seq(1L, 2L), Seq(3L, 4L), 1L) === -1)
    assert(ov(Seq(1L, 2L), Seq(3L, 4L), 0L) === 0)
    // identical sets
    assert(ov(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L) === 3)
    // empty side
    assert(ov(Seq.empty, Seq(1L), 0L) === 0)
    // randomized differential vs the set-intersection ground truth
    val rnd = new scala.util.Random(17L)
    (0 until 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val truth = (a.toSet & b.toSet).size
      val req = rnd.nextInt(12).toLong
      val got = ov(a, b, req)
      if (truth >= req) assert(got === truth, s"a=$a b=$b req=$req")
      else assert(got === -1, s"a=$a b=$b req=$req truth=$truth")
    }
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_vec"))
    val df = emb.crossJoin(broadcast(q))
      .select(dotFast($"embedding", $"q_vec").as("d"))
    df.collect() // finalize the adaptive plan so codegen stages are visible
    val plan = df.queryExecution.executedPlan.toString
    // the projection computing dot_product must sit inside a codegen stage
    val projLine = plan.linesIterator.find(l =>
      l.contains("dot_product") && l.contains("Project"))
    assert(projLine.isDefined, s"dot_product not in plan:\n$plan")
    assert(projLine.get.matches(""".*\*\(\d+\) Project.*"""), // '*(n)' = codegen stage
      s"dot_product projection not codegen'd:\n$plan")
  }
}
