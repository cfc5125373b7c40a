package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** The token fence's loss path: a foreign stamp landing inside the settle
  * window must abort this writer WITHOUT touching the (now foreign) lock.
  * Lives in package graft.operators to reach the test-only
  * `fenceSettleMs` knob.
  */
class LockFenceSpec extends SparkSpec {

  test("a foreign stamp during the settle window aborts the fence and keeps the foreign lock") {
    val dir = Files.createTempDirectory("fence").toString + "/t"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lp = new Path(dir, "_graft_write_lock")
    val saved = IdempotentSink.fenceSettleMs
    IdempotentSink.fenceSettleMs = 500L
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val attempt = Future {
        IdempotentSink.withTableLock(spark, dir) { "entered" }
      }
      // let the writer create + stamp, then overwrite with a foreign stamp
      // mid-settle — the interleaving a non-atomic create would produce
      Thread.sleep(150)
      val out = fs.create(lp, /* overwrite = */ true)
      try out.writeBytes("pid=999 epochMs=0 nonce=foreign\n") finally out.close()
      val e = intercept[IdempotentSink.ConcurrentWriteException] {
        Await.result(attempt, 30.seconds)
      }
      assert(e.getMessage.contains("lost the create race"))
      // the loser must NOT delete the winner's lock
      val in = fs.open(lp)
      val content = try new String(in.readAllBytes()) finally in.close()
      assert(content.contains("nonce=foreign"), s"foreign lock was touched: $content")
    } finally {
      IdempotentSink.fenceSettleMs = saved
      IdempotentSink.breakLock(spark, dir)
    }
  }

  test("uncontended fence verifies ownership and releases the lock") {
    val dir = Files.createTempDirectory("fence2").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val r = IdempotentSink.withTableLock(spark, dir) { 42 }
    assert(r == 42)
    assert(!fs.exists(new Path(dir, "_graft_write_lock")), "lock released on exit")
  }
}
