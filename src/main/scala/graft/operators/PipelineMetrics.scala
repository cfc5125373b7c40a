package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability — data-quality counters that ride the job
  * instead of costing one.
  *
  * The reference exposes nothing here (its CLI prints per-run counts by
  * re-materializing the Vec it just built — `cli/src/main.rs:103,170`);
  * at 100 TB a monitoring `df.count()` per stage is a second full pass
  * over the stage input, and a `cache()` to amortize it is a cluster of
  * memory pressure. Spark's `CollectMetrics` operator
  * (`Dataset.observe`) computes aggregates INSIDE the running job —
  * metrics stream through the existing scan, partial-aggregated
  * map-side like any other agg, and surface on the driver when the
  * action finishes. Zero extra jobs, zero extra scans, bounded driver
  * state (one row of aggregates per stage).
  *
  * Batch: [[stage]] attaches an [[Observation]]; read `obs.get` after
  * any action on the returned frame. Streaming: the same `observe` call
  * works on streaming frames; per-micro-batch values arrive through
  * [[MetricsListener]] (`QueryListener` progress events), the shape the
  * engine's streaming sinks already report through.
  */
object PipelineMetrics {

  /** The standard per-stage health row: row count, per-column null
    * counts, and min/max of the watermark column if given — the
    * counters a feed-health dashboard needs to catch a dead upstream
    * (rows = 0), a schema drift (nulls spike), or a stuck clock
    * (max(ts) stops advancing).
    */
  def standardMetrics(nullCols: Seq[String], tsCol: Option[String]): Seq[Column] =
    (count(lit(1)).as("rows") +:
      nullCols.map(c => count_if(col(c).isNull).as(s"nulls_$c"))) ++
      tsCol.toSeq.flatMap(t =>
        Seq(min(col(t)).as("ts_min"), max(col(t)).as("ts_max")))

  /** Attach a named metrics stage to a batch frame. Returns the frame
    * (plan unchanged except the CollectMetrics node) and the
    * [[Observation]] whose `.get` blocks until the first action
    * completes.
    */
  def stage(
      df: DataFrame,
      name: String,
      metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric column")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Attach a named metrics stage to a STREAMING frame (Observation
    * objects are batch-only); values surface per micro-batch via
    * [[MetricsListener]].
    */
  def streamingStage(df: DataFrame, name: String, metrics: Seq[Column]): DataFrame = {
    require(metrics.nonEmpty, "at least one metric column")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Collects per-micro-batch observed metrics for named stages.
    * Register on `spark.streams`; [[latest]]/[[history]] read from the
    * driver-side map (bounded: one Row per stage per retained batch,
    * capped at [[keep]] batches).
    */
  final class MetricsListener(keep: Int = 100) extends StreamingQueryListener {
    private val byStage = mutable.Map.empty[String, mutable.ArrayDeque[Row]]

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      synchronized {
        e.progress.observedMetrics.forEach { (stage, row) =>
          val q = byStage.getOrElseUpdate(stage, mutable.ArrayDeque.empty)
          q.append(row)
          while (q.size > keep) q.removeHead()
        }
      }

    def latest(stage: String): Option[Row] =
      synchronized(byStage.get(stage).flatMap(_.lastOption))

    def history(stage: String): Seq[Row] =
      synchronized(byStage.get(stage).map(_.toSeq).getOrElse(Nil))
  }

  /** Convenience: run `action` and return the observed rows of every
    * stage in `obs` as a name→Map view (the dashboard-payload shape).
    */
  def collect(action: => Unit, obs: (String, Observation)*): Map[String, Map[String, Any]] = {
    action
    obs.map { case (n, o) => n -> o.get }.toMap
  }

  private def count_if(c: Column): Column = sum(when(c, 1L).otherwise(0L))
}
