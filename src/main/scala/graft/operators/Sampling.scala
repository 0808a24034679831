package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment.
  *
  * Training-data pipelines need splits and samples that are (a)
  * reproducible run-over-run, (b) independent of partitioning and
  * executor count, and (c) stable when the corpus is re-sharded or
  * appended to — a row's assignment must depend on the ROW, not on
  * where it happened to land. `df.sample()` / `rand()` give none of
  * those. Hashing the row's key gives all three: assignment is a pure
  * integer function of the key, map-only at any scale, and replayable
  * in any engine (the oracle recomputes the identical arithmetic).
  *
  * The affine hash (x·A + B mod P, P prime) is 2-universal — unbiased
  * bucket frequencies for any key set — and every operand stays below
  * 2⁶⁰ (exact BIGINT everywhere). Same family as [[Sketch.cmsBucket]],
  * different constants so a CMS row and a split never correlate.
  */
object Sampling {
  val P = 1000000007L
  private val A = 906488655L
  private val B = 217728422L

  /** Uniform bucket in [0, buckets) as a pure function of `key`. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(key.cast("long"), lit(P)) * A + B, lit(P)) % buckets

  /** SQL rendering of [[hashBucket]] (DuckDB `%` is signed — wrap the
    * inner mod non-negative first, exactly like pmod).
    */
  def hashBucketSql(key: String, buckets: Int): String =
    s"(((($key % $P) + $P) % $P) * $A + $B) % $P % $buckets"

  /** Assign every row to a named split by hash bucket: `weights` are
    * integer percentages summing to ≤ 100 (e.g. train 80 / val 10 /
    * test 10); rows hash into 100 buckets and take the first split
    * whose cumulative range covers their bucket. Map-only; appending
    * new data never reassigns existing rows.
    */
  def hashSplit(df: DataFrame, key: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum <= 100, "weights must sum to <= 100")
    val b = hashBucket(col(key), 100)
    val cum = weights.scanLeft(0)(_ + _._2).tail
    val expr = weights.zip(cum).foldRight(lit("rest"): Column) {
      case (((name, _), hi), acc) => when(b < hi, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Keep ~num/den of rows, deterministically: the rows whose hash
    * bucket mod `den` falls below `num`. A pure filter — pushes to the
    * scan, never shuffles, and the SAME rows survive on any cluster.
    */
  def bernoulliSample(df: DataFrame, key: String,
      num: Int, den: Int): DataFrame =
    df.filter(hashBucket(col(key), den) < num)

  /** Data-mixture sampling: per-source keep rates (source → num/den),
    * the way a pretraining mix up/down-weights corpora (e.g. books
    * 9/10, web 1/4). Still a pure map-only filter of (key, source) —
    * reweighting the mix never shuffles anything, and the surviving
    * set is reproducible and append-stable per source. Sources
    * missing from `rates` are dropped (an explicit mix is a
    * whitelist).
    */
  def mixtureSample(df: DataFrame, key: String, sourceCol: String,
      rates: Seq[(String, Int, Int)]): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, n, d) => n >= 0 && n <= d },
      "rates must be 0 <= num <= den")
    val keep = rates.foldRight(lit(false): Column) {
      case ((src, num, den), acc) =>
        when(col(sourceCol) === src, hashBucket(col(key), den) < num)
          .otherwise(acc)
    }
    df.filter(keep)
  }

  /** Priority column for weighted sampling WITHOUT replacement, after
    * Duffield–Lund–Thorup priority sampling: q = w / u with u uniform
    * in (0, 1]; the k rows with the LARGEST q are the sample
    * (inclusion probability ≈ min(1, w/τ) for the k-th priority τ —
    * heavier rows proportionally likelier).
    *
    * Chosen over Efraimidis–Spirakis u^(1/w) deliberately: ES needs a
    * transcendental (pow/ln), and libm implementations differ by ulps
    * across engines — enough to flip a selection at the k-th
    * boundary. q = w/u is two exact-input divisions: u comes from the
    * affine key hash (not `rand()` — re-runs, re-shards and appends
    * never change a row's draw), so the priority is bit-identical on
    * any engine and any partitioning.
    */
  def weightedPriority(key: Column, weight: Column): Column = {
    val u = (hashBucket(key, 1000000) + lit(1)).cast("double") / lit(1000000.0)
    weight / u
  }

  /** SQL rendering of [[weightedPriority]] (identical op order). */
  def weightedPrioritySql(keySql: String, weightSql: String): String =
    s"""$weightSql / ((${hashBucketSql(keySql, 1000000)} + 1) / 1000000.0)"""

  /** Weighted sample of k rows (heavier `weight` → more likely):
    * global TakeOrdered on the priority — no full sort materializes.
    * Ties break on the key, so the boundary row is unambiguous.
    */
  def weightedSample(df: DataFrame, key: String, weight: Column,
      k: Int): DataFrame =
    df.withColumn("priority", weightedPriority(col(key), weight))
      .orderBy(col("priority").desc, col(key))
      .limit(k)
}
