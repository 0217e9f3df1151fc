package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter for incremental corpus dedup.
  *
  * The scale contract: dedup of a NEW shard against a 100 TB history
  * must not rescan (or even shuffle) the history per shard. A Bloom
  * filter over the history's content keys is a FIXED-size summary
  * (B bits, here 2^16 positions per the default) that the shard probes
  * locally; only Bloom-positive docs — true dups + the bounded
  * false-positive tail, rate ≈ (1 − e^(−k·n/B))^k — pay the exact
  * verify join against the history key table. No false negatives, by
  * construction: an exact dup always has all k positions set.
  *
  * Representation: instead of a packed driver-side bitset, the filter
  * is the DISTINCT position table (≤ B rows, broadcastable by
  * definition — B is a constant independent of history size). Probing
  * is `explode(k positions) ⋈ broadcast(positions)` with a count-k
  * gate: identical semantics to testing k bits, but the whole pipeline
  * stays declarative, incremental (new history docs MERGE new position
  * rows), and exactly replayable in the DuckDB oracle. Positions are
  * md5-derived (the q52 hashing idiom), so both engines compute
  * bit-identical positions.
  */
object BloomDedup {

  /** Default filter width (positions) and hash count. */
  val DefaultB = 65536
  val DefaultK = 4

  /** The i-th Bloom position of a content-key column: 60 bits of
    * md5("i:" || key) reduced mod B. */
  def position(i: Int, key: Column, b: Int = DefaultB): Column =
    pmod(
      conv(substring(md5(concat(lit(i.toString), lit(":"), key)), 18, 15),
        16, 10).cast("long"),
      lit(b.toLong))

  /** Distinct position table (single column `p`) of a key frame. */
  def build(keys: DataFrame, keyCol: String = "k", k: Int = DefaultK,
      b: Int = DefaultB): DataFrame = {
    val key = col(keyCol)
    keys.select(explode(array((0 until k).map(position(_, key, b)): _*)).as("p"))
      .distinct()
  }

  /** Per-doc Bloom probe: (idCol, bloom_hit) — hit iff all k positions
    * are present in the (broadcast) position table. Each exploded
    * position row matches at most one distinct-position row, so the
    * count-k gate is exact even when a doc's own k positions collide. */
  def probe(docs: DataFrame, positions: DataFrame, idCol: String,
      keyCol: String = "k", k: Int = DefaultK, b: Int = DefaultB): DataFrame = {
    val probed = docs
      .select(col(idCol), explode(
        array((0 until k).map(position(_, col(keyCol), b)): _*)).as("p"))
      .join(broadcast(positions), "p")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nhit"))
    docs.select(col(idCol))
      .join(probed, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("nhit"), lit(0L)) === k).as("bloom_hit"))
  }
}
