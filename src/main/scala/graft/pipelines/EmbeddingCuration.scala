package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity, Stats}

/** The embedding-side curation pipeline as a library API — the
  * vector-space counterpart of [[CorpusCuration]]: given embeddings
  * and a centroid model, gate distance-z outliers, semantically dedup
  * the survivors (SemDeDup), and cap each cluster for a
  * diversity-preserving sample. [[qPipeEmbeddingCuration]]'s oracle
  * (Queries.scala) proves the composition exactly; this object is the
  * call-site users compose with their own models.
  *
  * `curateAuto` is the one-call path: learn the model from the data
  * itself — deterministic farthest-point seeding, `iters` Lloyd's
  * rounds — then curate with it. Every stage is the proven operator;
  * nothing here adds semantics, only wiring.
  */
object EmbeddingCuration {

  /** Curate against a given centroid model. Input (cid, cvec);
    * output the curated (cluster, cid) sample.
    */
  def curate(
      vecs: DataFrame,
      centers: Array[Array[Double]],
      zMax: Double = 2.0,
      minCosine: Double = 0.25,
      maxCluster: Int = 33,
      quota: Int = 8): DataFrame = {
    val assigned = Similarity.assignNearest(vecs, centers)
      .select(col("cid"), col("cluster"), col("d2"))
    val outliers = Stats.zscoreOutliers(assigned, "cluster",
      floor(col("d2") * 1e6), zMax, keep = Seq("cid", "cluster"))
    val clean = vecs.join(outliers.select("cid"), Seq("cid"), "left_anti")
    val survivors = Similarity.semanticDedup(clean, centers, minCosine,
      maxCluster)
    Sampling.groupCapSample(survivors, "cluster", "cid", quota)
      .select("cluster", "cid")
  }

  /** Learn the model from the corpus (farthest-point seeds + Lloyd's),
    * then [[curate]] with it. The model collect is k·dim doubles —
    * the house bounded-collect exception; the corpus never moves.
    */
  def curateAuto(
      vecs: DataFrame,
      k: Int,
      iters: Int = 3,
      zMax: Double = 2.0,
      minCosine: Double = 0.25,
      maxCluster: Int = 33,
      quota: Int = 8,
      minClusterSize: Long = 2L): DataFrame =
    curate(vecs, learnedCenters(vecs, k, iters, minClusterSize), zMax,
      minCosine, maxCluster, quota)

  /** The trained model as literals: seed ids via deterministic maxmin,
    * seed vectors joined back, `iters` Lloyd's rounds.
    *
    * Clusters that captured fewer than `minClusterSize` points are
    * DROPPED from the model (and empty seeds are not carried):
    * farthest-point seeding hands every extreme outlier its own seed
    * by construction, and a singleton cluster can never be flagged by
    * the per-cluster z-gate downstream (its one distance IS the
    * cluster mean). Dropping the under-populated center re-assigns
    * its points to the nearest REAL cluster, where their distance
    * z-score is exactly what the gate measures. `minClusterSize = 1`
    * restores the keep-everything model.
    */
  def learnedCenters(
      vecs: DataFrame, k: Int, iters: Int,
      minClusterSize: Long = 2L): Array[Array[Double]] = {
    val seedIds = Similarity.farthestPointSeeds(vecs, k)
      .select("rank", "cid").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    val byId = vecs
      .filter(col("cid").isin(seedIds: _*))
      .select(col("cid"), col("cvec").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val seeds = seedIds.map(byId)
    val model = Similarity.kmeans(vecs, seeds, iters)
      .select("cluster", "centroid", "n").collect()
      .map(r => r.getInt(0) -> (r.getSeq[Double](1).toArray, r.getLong(2)))
      .toMap
    val kept = seeds.indices.flatMap { i =>
      model.get(i) match {
        case Some((c, n)) if n >= minClusterSize => Some(c)
        case Some(_) => None // under-populated: drop, do not carry
        case None if minClusterSize <= 0L => Some(seeds(i))
        case None => None // empty seed: nothing real to keep
      }
    }
    require(kept.nonEmpty,
      s"all $k learned clusters fell below minClusterSize=$minClusterSize")
    kept.toArray
  }
}
