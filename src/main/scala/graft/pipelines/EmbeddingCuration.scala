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
      quota: Int = 8): DataFrame =
    curate(vecs, learnedCenters(vecs, k, iters), zMax, minCosine,
      maxCluster, quota)

  /** The trained model as literals: seed ids via deterministic maxmin,
    * seed vectors joined back, `iters` Lloyd's rounds; missing
    * clusters keep their seed position (kmeans' carry-forward).
    */
  def learnedCenters(
      vecs: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
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
      .select("cluster", "centroid").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    seeds.indices.map(i => model.getOrElse(i, seeds(i))).toArray
  }
}
