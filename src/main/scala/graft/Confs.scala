package graft

import org.apache.spark.sql.SparkSession

/** Run a block under temporarily-set session confs, restoring — or
  * unsetting, for keys that had no explicit value — every key
  * afterwards. The save/set/restore idiom is shared by the streaming
  * drains, the dedup store, the AQE skew-join demo, and the
  * dynamic-overwrite writes; keeping it in one place means no call
  * site can independently get the Some/None restore branch wrong. */
object Confs {

  def withConfs[T](spark: SparkSession,
                   confs: Seq[(String, String)])(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
