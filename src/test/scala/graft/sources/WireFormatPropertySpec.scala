package graft.sources

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import Http2Framing.Hpack

/** Randomized round-trip properties for the two round-13 wire/at-rest
  * format layers (same seeded-random differential style as
  * OperatorPropertySpec):
  *
  *  - HPACK: arbitrary header lists survive encoder→decoder with and
  *    without Huffman, across a SHARED connection (dynamic table state
  *    evolving over many blocks — the stateful part the golden vectors
  *    exercise only on the RFC's three-block traces);
  *  - Avro containers: random rows over the full supported scalar set
  *    (with nulls) survive write→read bit-exactly at random partition
  *    counts.
  */
class WireFormatPropertySpec extends graft.SparkSpec {

  test("HPACK: random header blocks round-trip across a shared connection") {
    val rnd = new Random(7013L)
    def randToken(n: Int) =
      (0 until n).map(_ => "abcdefghijklmnopqrstuvwxyz-0123456789"(
        rnd.nextInt(37))).mkString
    def randValue(n: Int) = // values may carry any printable byte + UTF-8
      (0 until n).map(_ => (rnd.nextInt(94) + 33).toChar).mkString +
        (if (rnd.nextBoolean()) "é→中" else "")
    Seq(false, true).foreach { huffman =>
      val enc = new Hpack.Encoder(huffman = huffman)
      val dec = new Hpack.Decoder()
      (1 to 25).foreach { _ =>
        val headers = (0 until 1 + rnd.nextInt(12)).map { _ =>
          // mix static-table names (hit the indexed paths) with fresh ones
          val name = rnd.nextInt(3) match {
            case 0 => ":method"
            case 1 => "content-type"
            case _ => randToken(1 + rnd.nextInt(16))
          }
          name -> randValue(rnd.nextInt(24))
        }
        val block = enc.encode(headers)
        val got = dec.decode(block)
        assert(got == headers,
          s"HPACK(huffman=$huffman) diverged:\n$got\nvs\n$headers")
        // shared-connection invariant: both ends' dynamic tables must
        // stay in lockstep after every block
        assert(dec.tableEntries == enc.tableEntries,
          "encoder/decoder dynamic tables diverged mid-connection")
      }
    }
  }

  test("Avro containers: random scalar rows round-trip bit-exactly") {
    val rnd = new Random(7014L)
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("y", BinaryType)))
    (1 to 4).foreach { round =>
      def nullable[T](v: T): Any = if (rnd.nextInt(5) == 0) null else v
      val rows = (0 until 1 + rnd.nextInt(40)).map { _ =>
        Row(
          nullable(rnd.nextLong()),
          nullable(rnd.nextInt()),
          nullable(rnd.nextInt(4) match {
            case 0 => Double.NaN
            case 1 => Double.NegativeInfinity
            case _ => rnd.nextDouble() * 1e12 - 5e11
          }),
          nullable(rnd.nextFloat()),
          nullable(rnd.nextBoolean()),
          nullable(randUnicode(rnd)),
          nullable(Array.fill(rnd.nextInt(20))(rnd.nextInt().toByte)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(4)), schema)
      val dir = java.nio.file.Files
        .createTempDirectory("avro-prop").toString + s"/r$round"
      AvroSource.write(df, dir)
      def key(r: Row) = (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)).map(d => java.lang.Double.doubleToRawLongBits(
          d.asInstanceOf[Double])),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
        Option(r.getAs[Array[Byte]](6)).map(_.toSeq))
      val got = AvroSource.read(spark, dir).collect().map(key)
      assert(got.toSeq.sortBy(_.toString) ==
          rows.map(key).sortBy(_.toString),
        s"round $round: avro round-trip diverged")
    }
  }

  private def randUnicode(rnd: Random): String =
    (0 until rnd.nextInt(24)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => (rnd.nextInt(94) + 33).toChar.toString
        case 1 => "é"
        case 2 => "中"
        case _ => new String(Character.toChars(0x1F600 + rnd.nextInt(16)))
      }
    }.mkString
}
