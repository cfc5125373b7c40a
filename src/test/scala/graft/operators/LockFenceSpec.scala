package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import java.nio.file.Files
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

/** The write lock's exclusivity contract: create-exclusive acquisition is
  * atomic (NIO `CREATE_NEW` on local FS), so under genuinely simultaneous
  * writers at most one ever holds the lock, losers fail loudly, and a
  * foreign lock is never deleted by a loser. Non-atomic-create schemes
  * (object stores) keep the settle-then-fence, exercised via [[WeakFs]].
  */
class LockFenceSpec extends SparkSpec {

  test("N simultaneous writers: exactly one holds the lock, losers throw, lock released") {
    val dir = Files.createTempDirectory("fence").toString + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holders = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    // The winner HOLDS the lock until every loser has attempted and thrown,
    // so exactly one win is deterministic — no dependence on scheduling or
    // host core count (the default global pool could serialize 8 futures
    // on a small machine, letting each "win" an uncontended lock in turn).
    val losers = new CountDownLatch(7)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val attempts = Future.traverse((1 to 8).toList) { _ =>
        Future {
          start.await()
          try {
            IdempotentSink.withTableLock(spark, dir) {
              val h = holders.incrementAndGet()
              peak.updateAndGet(m => math.max(m, h))
              assert(losers.await(30, java.util.concurrent.TimeUnit.SECONDS),
                "losers did not all fail while the winner held the lock")
              holders.decrementAndGet()
              true
            }
          } catch {
            case _: IdempotentSink.ConcurrentWriteException =>
              losers.countDown(); false
          }
        }
      }
      start.countDown()
      val wins = Await.result(attempts, 60.seconds).count(identity)
      assert(peak.get == 1, s"two writers held the lock concurrently (peak ${peak.get})")
      assert(wins == 1, s"exactly one writer must win, got $wins")
      assert(!fs.exists(new Path(dir, "_graft_write_lock")), "lock released after all exits")
    } finally pool.shutdown()
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

  test("non-atomic-create scheme: a foreign stamp during the settle aborts the fence, foreign lock kept") {
    // weakfs:// = RawLocalFileSystem under a scheme NOT in
    // atomicCreateSchemes, so withTableLock takes the settle-then-fence
    // path — the object-store contract (loud failure, never silent
    // double-write).
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.weakfs.impl", classOf[WeakFs].getName)
    val dir = "weakfs:" + Files.createTempDirectory("fence4").toString + "/t"
    val lp = new Path(dir, "_graft_write_lock")
    val fs = new Path(dir).getFileSystem(conf)
    val saved = IdempotentSink.fenceSettleMs
    IdempotentSink.fenceSettleMs = 800L
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val attempt = Future {
        IdempotentSink.withTableLock(spark, dir) { "entered" }
      }
      // synchronize on the OBSERVABLE event — the writer's stamp landing —
      // not a fixed sleep (a loaded host could otherwise let the overwrite
      // land before the writer's create, failing the message assertion)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      def stamped(): Boolean = fs.exists(lp) && {
        val in = fs.open(lp)
        val c = try new String(in.readAllBytes()) finally in.close()
        c.contains("nonce=") && !c.contains("nonce=foreign")
      }
      while (!stamped() && System.nanoTime() < deadline) Thread.sleep(20)
      assert(stamped(), "writer never stamped the lock")
      val out = fs.create(lp, /* overwrite = */ true)
      try out.writeBytes("pid=999 epochMs=0 nonce=foreign\n") finally out.close()
      val e = intercept[IdempotentSink.ConcurrentWriteException] {
        Await.result(attempt, 30.seconds)
      }
      assert(e.getMessage.contains("lost the create race"))
      val in = fs.open(lp)
      val content = try new String(in.readAllBytes()) finally in.close()
      assert(content.contains("nonce=foreign"), s"foreign lock was touched: $content")
    } finally {
      IdempotentSink.fenceSettleMs = saved
      IdempotentSink.breakLock(spark, dir)
    }
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

/** Test-only filesystem: local storage under a scheme that is NOT in
  * `IdempotentSink.atomicCreateSchemes`, forcing the settle-then-fence
  * acquisition path (the object-store contract).
  */
class WeakFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("weakfs:///")
}
