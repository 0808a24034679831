package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level utilities. */
object ColumnOps {

  /** Let-binding for column expressions.
    *
    * Catalyst expressions are trees, not DAGs: every `Column` reference
    * pastes a full copy of the subtree, so an intermediate used k times
    * is *evaluated* k times (and nested uses multiply — the winnowing
    * fingerprint was O(len²) hash evaluations before this). Wrapping
    * the value in a 1-element array and applying the body through
    * `transform` turns the reference into a lambda variable — evaluated
    * once per row, shared by every use inside `body`.
    *
    * Works for any data type (arrays/structs included); nested binds
    * compose (inner lambdas may reference outer lambda variables).
    */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
