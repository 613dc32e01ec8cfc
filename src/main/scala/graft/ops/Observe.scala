package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Single-scan pipeline metrics via `Dataset.observe` (CollectMetrics).
  *
  * The 100 TB problem this solves: a quality gate that reports "rows in,
  * rows kept, sum of X" as SEPARATE aggregations re-scans the corpus once
  * per report — q76 folds its six constraints into one aggregate pass
  * for exactly that reason. `observe` goes one step further: the metrics
  * piggyback the SAME physical scan that produces the pipeline's real
  * output (a `CollectMetrics` node accumulates per-partition partials in
  * the task stream and merges them on the driver), so the report is
  * FREE — zero extra jobs, zero extra scans, any number of metric
  * expressions (each an aggregate over the observed frame).
  *
  * API subtlety the helper hides: every action builds its own
  * `QueryExecution` (`write`, `count`, ...), so the metrics surface on
  * the EXECUTED plan's listener event, not necessarily on
  * `df.queryExecution`. [[runAndCollect]] captures them through a
  * scoped `QueryExecutionListener` (the bus is asynchronous — the wait
  * is bounded); [[metrics]] reads them directly when the action ran
  * through the frame's own execution (`collect()`).
  */
object Observe {

  /** Attach named aggregate metrics to the frame's executions.
    * Mirrors `Dataset.observe`'s (first, rest*) shape so the
    * zero-metrics call is unrepresentable, not a runtime error. */
  def withMetrics(df: DataFrame, name: String,
                  first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)

  /** The observed metrics row from the frame's OWN execution (populated
    * by `collect()`-style actions that run through `df.queryExecution`;
    * None before any such action or for an unknown name). */
  def metrics(df: DataFrame, name: String): Option[Row] =
    df.queryExecution.observedMetrics.get(name)

  // per-call observation tag: the QueryExecutionListener is session-wide
  // and matched by metric name, so two concurrent actions observing the
  // SAME name could each capture the other's row. A per-call unique name
  // makes the match the wrapped action's execution by construction.
  private val callIds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observe `df` under a per-call UNIQUE internal name derived from
    * `name`, hand the observed frame to `action` (any Spark action — a
    * write, a count, a collect), and capture the observed metrics row
    * from that action's completion event. Because the observation name
    * is unique to this call, a concurrent action observing the same
    * user-facing `name` on another thread can't be captured in its
    * place. The listener bus delivers asynchronously, so the capture
    * waits — bounded by `timeoutMs`, never indefinitely. Returns the
    * action's result and the metrics (None only if the action's
    * execution didn't complete on the bus in time). */
  def runAndCollect[T](df: DataFrame, name: String,
                       metricsCols: Seq[Column],
                       timeoutMs: Long = 10000L)(action: DataFrame => T): (T, Option[Row]) = {
    require(metricsCols.nonEmpty, "runAndCollect needs at least one metric column")
    val spark = df.sparkSession
    val tag = s"$name#${callIds.incrementAndGet()}"
    val observed = df.observe(tag, metricsCols.head, metricsCols.tail: _*)
    @volatile var captured: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(tag).foreach { r =>
          captured = Some(r)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action(observed)
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (captured.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      (result, captured)
    } finally spark.listenerManager.unregister(listener)
  }
}
