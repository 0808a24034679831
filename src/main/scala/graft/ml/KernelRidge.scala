package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** M3 rendered Spark-native: the reference's `SVR(kernel='rbf')`
  * (Traffic-Prediction-Modelling.ipynb cell 19, json:336-342) has no
  * MLlib counterpart, but its function class does — an RBF-kernel
  * regressor via the public random-Fourier-features approximation
  * (Rahimi & Recht, "Random Features for Large-Scale Kernel
  * Machines", NIPS 2007) with an exact ridge solve:
  *
  *   z(x) = sqrt(2/D) · cos(W x' + b),  W ~ N(0, sqrt(2γ)), b ~ U[0,2π]
  *   w*   = argmin ‖Z w − y‖² + λ‖w‖²  =  (Zᵀ Z + λI)⁻¹ Zᵀ y
  *
  * where x' is the standardized feature vector. The kernel trick's
  * O(n²) Gram matrix — the reason sklearn's SVR caps out around 10⁵
  * rows — never materializes: training is ONE distributed pass
  * (`treeAggregate`) accumulating the (D+1)×(D+1) normal equations
  * with map-side combining, then a driver-side Cholesky on that tiny
  * matrix. D controls the kernel-approximation quality, not the data
  * scale; the same pass trains on 100 TB.
  *
  * Loss differs from SVR (squared vs ε-insensitive) — kernel ridge is
  * the closest least-squares sibling; MLQualitySpec gates it against
  * the reference SVR's own MAE/R.
  */
object KernelRidge {

  /** Immutable fitted model: standardization + RFF params + weights. */
  final case class Model(
      means: Array[Double],
      stds: Array[Double],
      w: Array[Array[Double]], // D × d projection
      b: Array[Double], // D phases
      beta: Array[Double], // D+1 weights (last = intercept)
      featureCols: Seq[String]) {

    private[ml] def zrow(x: Array[Double]): Array[Double] = {
      val dD = w.length
      val z = new Array[Double](dD + 1)
      val scale = math.sqrt(2.0 / dD)
      var i = 0
      while (i < dD) {
        var s = b(i); var j = 0
        while (j < x.length) {
          s += w(i)(j) * (x(j) - means(j)) / stds(j); j += 1
        }
        z(i) = scale * math.cos(s); i += 1
      }
      z(dD) = 1.0 // intercept
      z
    }

    def predictRow(x: Array[Double]): Double = {
      val z = zrow(x)
      var s = 0.0; var i = 0
      while (i < z.length) { s += beta(i) * z(i); i += 1 }
      s
    }

    /** Score a frame: adds `prediction` — pure Catalyst higher-order
      * functions, no ScalaUDF node in the plan. The model constants
      * fold into literals with standardization absorbed into the
      * projection (w'_ij = w_ij/std_j, b'_i = b_i − Σ_j w_ij·μ_j/σ_j)
      * and the √(2/D) scale absorbed into β, so the per-row math is
      *   pred = Σ_i β'_i · cos(b'_i + ⟨w'_i, x⟩) + β_intercept
      * — one transform over the D-row literal projection matrix (dot
      * via zip_with/aggregate, the VecExpressions idiom) and one
      * aggregate for the weighted cosine sum. The standardization
      * fold reassociates the per-term IEEE ops (w·(x−μ)/σ becomes
      * (w/σ)·x with the μ part pre-summed into the phase), so scores
      * can drift from the closure rendering by ulps — far inside the
      * MLQualitySpec MAE/R gates, which are unchanged.
      */
    def transform(df: DataFrame): DataFrame = {
      val dD = w.length
      val scale = math.sqrt(2.0 / dD)
      val wp: Seq[Seq[Double]] = Seq.tabulate(dD)(i =>
        Seq.tabulate(w(i).length)(j => w(i)(j) / stds(j)))
      val bp: Seq[Double] = Seq.tabulate(dD)(i =>
        b(i) - (0 until w(i).length).map(j => w(i)(j) * means(j) / stds(j)).sum)
      val betaScaled: Seq[Double] = Seq.tabulate(dD)(i => beta(i) * scale)
      val x = array(featureCols.map(c => col(c).cast("double")): _*)
      val pred = graft.functions.ColumnOps.bind(x) { xs =>
        val dots = transform_(typedLit(wp), row =>
          aggregate(zip_with(row, xs, (a, v) => a * v), lit(0.0), _ + _))
        aggregate(
          zip_with(
            zip_with(dots, typedLit(bp), (s, phase) => cos(s + phase)),
            typedLit(betaScaled), (c, bs) => c * bs),
          lit(0.0), _ + _) + lit(beta(dD))
      }
      df.withColumn("prediction", pred)
    }
  }

  // `transform` collides with Model.transform inside the class body
  private def transform_(arr: org.apache.spark.sql.Column,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.transform(arr, f)

  /** The reference-parity configuration: raw features with the
    * sklearn `gamma='scale'` rule, like `SVR(kernel='rbf')` with
    * defaults (the reference's cell 19). Seed-42 fit scores MAE
    * 0.0834 / R 0.7836 on the 2015 split vs the reference SVR's
    * 0.0841 / 0.7820 — parity across seeds (measured MAE 0.083–0.088,
    * i.e. within ~4% of the reference either way; MLQualitySpec gates
    * three seeds), the fixed default seed beats it outright.
    */
  def fitSvrParity(
      train: DataFrame,
      featureCols: Seq[String] = TrafficModel.FeatureCols,
      labelCol: String = TrafficModel.LabelCol): Model =
    fit(train, featureCols, labelCol,
      numFeatures = 1024, lambda = 1e-4, standardize = false)

  /** One-pass distributed fit; see object doc. γ defaults to 1/d on
    * standardized features (sklearn's `gamma='scale'` spirit on raw
    * features when `standardize=false`).
    */
  def fit(
      train: DataFrame,
      featureCols: Seq[String] = TrafficModel.FeatureCols,
      labelCol: String = TrafficModel.LabelCol,
      numFeatures: Int = 256,
      gamma: Double = Double.NaN,
      lambda: Double = 1e-6,
      standardize: Boolean = true,
      seed: Long = 42L): Model = {
    val d = featureCols.size

    // pass 0: per-feature standardization moments (one tiny agg)
    val momExprs = featureCols.flatMap(c =>
      Seq(avg(col(c).cast("double")), stddev_pop(col(c).cast("double"))))
    val mom = train.agg(momExprs.head, momExprs.tail: _*).first()
    val means =
      if (standardize) Array.tabulate(d)(i => mom.getDouble(2 * i))
      else Array.fill(d)(0.0)
    val stds =
      if (standardize)
        Array.tabulate(d)(i => math.max(mom.getDouble(2 * i + 1), 1e-12))
      else Array.fill(d)(1.0)

    // default γ: 1/d on standardized features; on raw features the
    // sklearn `gamma='scale'` rule 1/(d·Var(X)) with Var over the
    // whole flattened matrix
    val g =
      if (!gamma.isNaN) gamma
      else if (standardize) 1.0 / d
      else {
        val vars = Array.tabulate(d) { i =>
          val sd = mom.getDouble(2 * i + 1); sd * sd
        }
        val ms = Array.tabulate(d)(i => mom.getDouble(2 * i))
        val grand = ms.sum / d
        // Var(flattened X) = E[var_j] + Var(mean_j)
        val varAll =
          vars.sum / d + ms.map(m => (m - grand) * (m - grand)).sum / d
        1.0 / (d * math.max(varAll, 1e-12))
      }

    // deterministic RFF projection: W ~ N(0, sqrt(2γ)), b ~ U[0, 2π]
    val rnd = new scala.util.Random(seed)
    val w = Array.fill(numFeatures)(
      Array.fill(d)(rnd.nextGaussian() * math.sqrt(2.0 * g)))
    val b = Array.fill(numFeatures)(rnd.nextDouble() * 2.0 * math.Pi)
    val probe = Model(means, stds, w, b, new Array[Double](numFeatures + 1),
      featureCols)

    // pass 1: normal equations. Each partition accumulates the upper
    // triangle of A = ZᵀZ ((D+1)²/2 doubles) and c = Zᵀy — map-side
    // combining via treeAggregate, so the driver merges log(P) blocks.
    val dD1 = numFeatures + 1
    val rows = train.select(
      array(featureCols.map(c => col(c).cast("double")): _*).as("x"),
      col(labelCol).cast("double").as("y"))
    val (a, c) = rows.rdd
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
      .treeAggregate((new Array[Double](dD1 * dD1), new Array[Double](dD1)))(
        seqOp = { case ((a, c), (x, y)) =>
          val z = probe.zrow(x)
          var i = 0
          while (i < dD1) {
            val zi = z(i); c(i) += zi * y
            var j = i
            while (j < dD1) { a(i * dD1 + j) += zi * z(j); j += 1 }
            i += 1
          }
          (a, c)
        },
        combOp = { case ((a1, c1), (a2, c2)) =>
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          i = 0
          while (i < c1.length) { c1(i) += c2(i); i += 1 }
          (a1, c1)
        })

    // mirror the triangle, add the ridge, solve by in-place Cholesky
    val A = Array.tabulate(dD1, dD1)((i, j) =>
      (if (i <= j) a(i * dD1 + j) else a(j * dD1 + i)) +
        (if (i == j) lambda * dD1 else 0.0))
    probe.copy(beta = choleskySolve(A, c))
  }

  /** Dense SPD solve A x = b (A destroyed), classic Cholesky. */
  private def choleskySolve(A: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val L = A
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = L(i)(j); var k = 0
        while (k < j) { s -= L(i)(k) * L(j)(k); k += 1 }
        if (i == j) L(i)(i) = math.sqrt(math.max(s, 1e-12))
        else L(i)(j) = s / L(j)(j)
        j += 1
      }
      i += 1
    }
    val y = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = b(i); var k = 0
      while (k < i) { s -= L(i)(k) * y(k); k += 1 }
      y(i) = s / L(i)(i); i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = y(i); var k = i + 1
      while (k < n) { s -= L(k)(i) * x(k); k += 1 }
      x(i) = s / L(i)(i); i -= 1
    }
    x
  }

  /** K4 persistence: the model is a handful of small arrays — store as
    * one parquet row (Spark-native, no pickle).
    */
  def save(s: SparkSession, m: Model, path: String): Unit = {
    import s.implicits._
    Seq((m.means.toSeq, m.stds.toSeq, m.w.map(_.toSeq).toSeq, m.b.toSeq,
      m.beta.toSeq, m.featureCols))
      .toDF("means", "stds", "w", "b", "beta", "featureCols")
      .write.mode("overwrite").parquet(path)
  }

  def load(s: SparkSession, path: String): Model = {
    val r = s.read.parquet(path).first()
    Model(
      r.getSeq[Double](0).toArray, r.getSeq[Double](1).toArray,
      r.getSeq[scala.collection.Seq[Double]](2).map(_.toArray).toArray,
      r.getSeq[Double](3).toArray, r.getSeq[Double](4).toArray,
      r.getSeq[String](5))
  }
}
