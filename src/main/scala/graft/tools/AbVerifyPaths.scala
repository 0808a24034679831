package graft.tools

import org.apache.spark.sql.functions.col

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** A/B the two allPairsCosine verify paths on the FULL corpus of a
  * testdata dir (the catalog entries scope doc_id < 1000 to keep the
  * gate bounded; this main is the unscoped measurement BASELINE.md §6
  * quotes). Cascade order as deployed: exactDedup first — on the
  * ScaleData sf1 corpus that collapses each document's factor−1 exact
  * replicas, so the pairwise stage sees the deduped corpus and the
  * sf1 row measures exactDedup-at-10× + the same pair mass.
  *
  * Usage: runMain graft.tools.AbVerifyPaths <sfDir> [minCos2Ppm]
  * Prints one JSON line per path: {"path":…,"sec":…,"pairs":…}.
  */
object AbVerifyPaths {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val t2 = if (args.length > 1) args(1).toLong else 902500L
    val spark = GraftSession.local("ab-verify-paths")
    val kept = Dedup.exactDedup(
      Tables.documents(spark, sfDir).select("doc_id", "text"),
      "doc_id", "text").localCheckpoint()
    // (cutoff, label): MaxValue = every pair through array_intersect;
    // 0 = every pair through the posting re-join. The shipped
    // auto-select default is 0 (posting re-join for every pair — see
    // Dedup.allPairsCosine's maxTokensForArrayVerify doc), so the
    // "posting" arm below is the production control.
    Seq(("array", Long.MaxValue), ("posting", 0L)).foreach {
      case (label, cutoff) =>
        val t0 = System.nanoTime()
        val n = Dedup.allPairsCosine(kept, "doc_id", "text",
          minCos2Ppm = t2, maxTokensForArrayVerify = cutoff).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"path":"$label","sec":$sec%.1f,"pairs":$n,"sf":"$sfDir","t2_ppm":$t2}""")
    }
    spark.stop()
  }
}
