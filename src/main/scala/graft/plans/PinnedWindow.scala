package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Constant partition key for INTENTIONAL single-task windows.
  *
  * Some windows here run over relations that are bounded BY
  * CONSTRUCTION — dim tables, per-partition offset relations,
  * distinct-value grids — where a single task is the correct plan.
  * Left unpartitioned, every such window fires WindowExec's "No
  * Partition Defined" warning and a [[PlanLint]] `GLOBAL_WINDOW`
  * finding, indistinguishable in a log scan from a real scale bug.
  *
  * `Window.partitionBy(lit(0))` does NOT silence it on Spark 4: the
  * `EliminateWindowPartitions` optimizer rule strips foldable
  * partition expressions, reverting the window to an empty
  * partitionSpec (and `hash(anchor) * 0` is zero-propagated away the
  * same way). This key — `pmod(hash(anchor), 1)` — is constant 0 for
  * every row but anchored to an attribute reference with no
  * applicable simplification rule, so it survives optimization: the
  * window keeps a partition spec (one hash partition, identical
  * semantics and cost to the unpartitioned form) and the warning
  * marks only ACCIDENTAL global windows.
  */
object PinnedWindow {

  /** A partition key that is always 0 but cannot be constant-folded.
    * `anchor` should be any column of the windowed relation (the
    * order key is the natural choice). */
  def key(anchor: Column): Column = pmod(hash(anchor), lit(1))
}
