package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The shared corrupt-line counting dance for PERMISSIVE line-format
  * readers ([[Jsonl]], [[Csv]]) — one home for the subtle part: Spark
  * refuses a query referencing ONLY the corrupt column of a fresh file
  * scan, so the count runs over a persisted parse (spill-safe) that is
  * released before returning, and the clean frame re-reads lazily so
  * nothing stays pinned. */
private[sources] object CorruptGate {

  /** `fresh` must produce a NEW scan each call (call-by-name). */
  def readCounted(fresh: => DataFrame, corruptCol: String)
  : (DataFrame, Long) = {
    val raw = fresh.persist()
    val bad =
      try raw.filter(col(corruptCol).isNotNull).count()
      finally raw.unpersist()
    (fresh.filter(col(corruptCol).isNull).drop(corruptCol), bad)
  }
}
