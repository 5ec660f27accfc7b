package graft.streaming

/** Full-microsecond timestamp conversion shared by every handler
  * that sorts or compares event times in Scala space — the streaming
  * modules AND the per-series batch kernels ([[graft.operators.Ewma]])
  * — ONE definition of the (ts, event_id) tie rule's time component,
  * so the twins cannot drift sub-millisecond (getTime alone is
  * millis). */
private[graft] object EventTime {
  def toUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def fromUs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
