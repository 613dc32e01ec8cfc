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

  /** Run `action` (any Spark action on a frame observed under `name` —
    * a write, a count, a collect) and capture the observed metrics row
    * from its completion event. The listener bus delivers
    * asynchronously, so the capture waits — bounded by `timeoutMs`,
    * never indefinitely. Returns the action's result and the metrics
    * (None only if no execution carrying `name` completed in time). */
  def runAndCollect[T](spark: SparkSession, name: String,
                       timeoutMs: Long = 10000L)(action: => T): (T, Option[Row]) = {
    @volatile var captured: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { r =>
          captured = Some(r)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = action
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (captured.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      (result, captured)
    } finally spark.listenerManager.unregister(listener)
  }
}
