package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import java.nio.file.Files
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

/** The write lock's exclusivity contract: create-exclusive acquisition is
  * atomic (NIO `CREATE_NEW` on local FS), so under genuinely simultaneous
  * writers at most one ever holds the lock, losers fail loudly, and a
  * foreign lock is never deleted by a loser.
  */
class LockFenceSpec extends SparkSpec {

  test("N simultaneous writers: never two concurrent holders, losers throw, lock released") {
    val dir = Files.createTempDirectory("fence").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holders = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val attempts = Future.traverse((1 to 8).toList) { _ =>
      Future {
        start.await()
        try {
          IdempotentSink.withTableLock(spark, dir) {
            val h = holders.incrementAndGet()
            peak.updateAndGet(m => math.max(m, h))
            Thread.sleep(50)
            holders.decrementAndGet()
            true
          }
        } catch { case _: IdempotentSink.ConcurrentWriteException => false }
      }
    }
    start.countDown()
    val wins = Await.result(attempts, 60.seconds).count(identity)
    assert(peak.get == 1, s"two writers held the lock concurrently (peak ${peak.get})")
    assert(wins >= 1, "at least one writer must acquire the lock")
    assert(wins < 8, "8 simultaneous writers cannot all win against a 50 ms hold")
    assert(!fs.exists(new Path(dir, "_graft_write_lock")), "lock released after all exits")
  }

  test("a loser must not delete the holder's (foreign) lock") {
    val dir = Files.createTempDirectory("fence2").toString + "/t"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val lp = new Path(dir, "_graft_write_lock")
    val out = fs.create(lp, false)
    try out.writeBytes("pid=999 epochMs=0 nonce=foreign\n") finally out.close()
    val e = intercept[IdempotentSink.ConcurrentWriteException] {
      IdempotentSink.withTableLock(spark, dir) { "must not enter" }
    }
    assert(e.getMessage.contains("exists"))
    val in = fs.open(lp)
    val content = try new String(in.readAllBytes()) finally in.close()
    assert(content.contains("nonce=foreign"), s"foreign lock was touched: $content")
    assert(IdempotentSink.breakLock(spark, dir), "breakLock clears the dead lock")
    assert(IdempotentSink.withTableLock(spark, dir) { 42 } == 42,
      "table usable again after breakLock")
  }

  test("uncontended acquisition stamps forensics token and releases the lock") {
    val dir = Files.createTempDirectory("fence3").toString + "/t"
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lp = new Path(dir, "_graft_write_lock")
    val r = IdempotentSink.withTableLock(spark, dir) {
      // while held, the lock must carry the pid+nonce forensics payload
      val in = fs.open(lp)
      val content = try new String(in.readAllBytes()) finally in.close()
      assert(content.contains(s"pid=${ProcessHandle.current.pid}"), content)
      assert(content.contains("nonce="), content)
      42
    }
    assert(r == 42)
    assert(!fs.exists(lp), "lock released on exit")
  }
}
