package graft.functions

/** Guarded word n-gram generation over a token array column.
  *
  * The naive `transform(sequence(1, greatest(size(t) - (n-1), 0)), ...)`
  * idiom is wrong for short docs: when `size(t) < n` the bound is 0 and
  * Spark's `sequence(1, 0)` auto-steps DOWN to `[1, 0]`, so the
  * transform runs twice with out-of-range `t[...]` lookups and emits
  * NULL grams. A `<= n-1`-token doc then survives `explode` as a null
  * gram while a DuckDB oracle's `generate_series(1, 0)` is EMPTY and
  * drops the doc entirely — an engine mismatch the corpus tables only
  * masked because they carry no short docs. The CASE guard makes both
  * engines generate zero grams for short docs (matching the streaming
  * generator `NearDupStream.shingles`, which already excludes them).
  */
object TextGrams {

  /** SQL for the space-joined n-gram list of token array column `tok`
    * (empty array when `size(tok) < n`). Index shape matches the
    * original 3-gram idiom `concat(t[i-1], ' ', t[i], ' ', t[i+1])`. */
  def gramsSql(n: Int, tok: String = "t"): String = {
    require(n >= 2, s"n-gram arity must be >= 2, got $n")
    val terms = (0 until n).map {
      case 0 => s"$tok[i-1]"
      case 1 => s"$tok[i]"
      case j => s"$tok[i+${j - 1}]"
    }
    val cat = terms.mkString("concat(", ", ' ', ", ")")
    s"CASE WHEN size($tok) >= $n THEN " +
      s"transform(sequence(1, size($tok) - ${n - 1}), i -> $cat) " +
      "ELSE CAST(array() AS array<string>) END"
  }
}
