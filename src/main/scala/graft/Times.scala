package graft

/** Microsecond ↔ Timestamp conversions, shared by every site that must
  * not alias the testdata's micro-precision timestamps to milliseconds
  * (CacheManager delta bounds, the q207/q210 scenario cuts, the fs_soak
  * timeline). `java.sql.Timestamp(ms)` truncates; these preserve the
  * sub-millisecond part via the nanos field. */
object Times {

  /** Epoch micros of a Timestamp, sub-millisecond part included. */
  def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Timestamp from epoch micros (nanos-preserving construction). */
  def ofMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
