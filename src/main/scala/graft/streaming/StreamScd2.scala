package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Scd2

/** Streaming SCD2 maintenance — the ingest face of
  * `operators.Scd2`: each micro-batch of change-log rows folds into
  * a parquet dimension table via `Scd2.merge`, so the dimension is
  * always the same table a full `fromChangeLog` rebuild over every
  * row seen so far would produce (merge ∘ merge = merge over the
  * unioned batches — the composition Scd2Spec proves at every cut).
  *
  * Durability: the dimension directory is VERSIONED — each batch
  * writes `v<epoch>` fresh and then atomically swaps a one-line
  * `_CURRENT` pointer file, so a concurrent reader never sees a
  * half-written table and a failed batch leaves the previous
  * version intact. Epoch replays after a failure are safe: merging
  * an already-applied batch again is a no-op by construction (the
  * replayed rows are exact duplicates of adjacent change rows and
  * collapse in `fromChangeLog`'s consecutive-same-value filter).
  *
  * Scale note: `merge` touches only batch keys; untouched and
  * closed versions pass scan-through — but this sink REWRITES the
  * dimension file per batch, which is fine for a dimension
  * (key-cardinality-sized) and wrong for a fact. Late rows older
  * than a key's open version violate the merge contract
  * (operators.Scd2 doc) — feed those through a batch rebuild.
  */
object StreamScd2 {

  private def pointerPath(dimDir: String) = Paths.get(dimDir, "_CURRENT")

  /** The current dimension version directory, if any batch committed. */
  def currentVersion(dimDir: String): Option[String] = {
    val p = pointerPath(dimDir)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Read the current dimension (empty-schema-safe: None before the
    * first commit).
    */
  def readDim(s: SparkSession, dimDir: String): Option[DataFrame] =
    currentVersion(dimDir).map(v => s.read.parquet(s"$dimDir/$v"))

  private def swapPointer(dimDir: String, version: String): Unit = {
    val tmp = Paths.get(dimDir, "_CURRENT.tmp")
    Files.createDirectories(Paths.get(dimDir))
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(dimDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wire the maintenance sink over a change-log stream (columns
    * keyCol, tsCol, tieCol, valCol). Caller starts/stops the query.
    */
  def sink(changes: DataFrame, dimDir: String, checkpointDir: String,
      keyCol: String, tsCol: String, tieCol: String, valCol: String)
      : DataStreamWriter[Row] =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val merged = readDim(s, dimDir) match {
          case Some(dim) =>
            Scd2.merge(dim, batch, keyCol, tsCol, tieCol, valCol)
          case None =>
            Scd2.fromChangeLog(batch, keyCol, tsCol, tieCol, valCol)
        }
        val v = s"v$epochId"
        merged.write.mode("overwrite").parquet(s"$dimDir/$v")
        swapPointer(dimDir, v)
        ()
      }
}
