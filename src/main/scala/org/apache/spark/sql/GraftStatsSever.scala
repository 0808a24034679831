package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Stats severance for checkpointed iteration state (r12).
  *
  * `Dataset.localCheckpoint` returns a [[LogicalRDD]] whose
  * `originStats` carry the PRE-checkpoint sizeInBytes ESTIMATE — not
  * the materialized size. Inside a fixed-point loop (k-core peel, CC
  * contraction) that estimate compounds ~3x BigInt digits per round
  * through Catalyst's size-product walk, and past ~10 rounds the
  * DRIVER burns seconds-to-minutes per checkpoint in
  * SizeInBytesOnlyStatsPlanVisitor (the r10 bench hang; the r11
  * kcore_delete 42.8 s incident; the r12 kcore_mixed 136 s one).
  *
  * The r11 house fix rebuilt a fresh scan via
  * `createDataFrame(df.rdd, df.schema)` — correct, but it pays an
  * InternalRow -> Row -> InternalRow conversion on every downstream
  * use (~50% on the 8-round warm peel). This helper instead rewraps
  * the SAME InternalRow RDD in a copy of the LogicalRDD with
  * `originStats = None`, restoring unknown-size defaults at zero
  * runtime cost: identical rows, identical partitioning, no
  * conversion. Lives in org.apache.spark.sql because
  * `Dataset.ofRows` is private[sql].
  */
object GraftStatsSever {

  /** The input must be the direct result of `localCheckpoint()` (a
    * LogicalRDD root); anything else is returned unchanged.
    */
  def sever(df: DataFrame): DataFrame =
    df match {
      case ds: Dataset[_] =>
        ds.queryExecution.logical match {
          case lr: LogicalRDD =>
            val session = ds.sparkSession.asInstanceOf[ClassicSession]
            Dataset.ofRows(session, lr.copy()(session, None, None))
          case _ => df
        }
      case _ => df
    }
}
