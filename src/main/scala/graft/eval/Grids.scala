package graft.eval

/** Default hyperparameter grids per estimator — the engine's equivalent of
  * `GridGenerator.get_grids` (/root/reference/src/scalecast/
  * GridGenerator.py:3-32, grids/{example,mv,theta,vecm}.py): named,
  * code-shipped default grids a user copies and edits before `tune`.
  *
  * Numeric parameter axes feed [[Evaluation.expandGrid]] directly; the
  * `normalizer` axis matches the estimator registry
  * ({none,scale,minmax,robust}, cfg.py:67-73). Reference axes that name
  * library-specific knobs without an MLlib equivalent (sklearn solver
  * strings, darts ModelMode enums, statsmodels `deterministic` codes) keep
  * the supported subset — each divergence is noted inline. `lags` axes from
  * grids/mv.py are feature-construction choices here (addArTerms order),
  * not estimator params, so they live with the caller.
  */
object Grids {

  /** One estimator's default search space. `keep` filters structurally
    * invalid cells out of the cartesian expansion (e.g. ARMA(0,0)). */
  final case class Grid(params: Map[String, Seq[Double]],
                        normalizers: Seq[String] = Seq("none"),
                        keep: Map[String, Double] => Boolean = _ => true) {
    /** Cartesian rows in [[Evaluation.expandGrid]]'s deterministic order,
      * crossed with the normalizer axis. */
    def expand: Seq[(Map[String, Double], String)] =
      for (m <- Evaluation.expandGrid(params) if keep(m); n <- normalizers) yield (m, n)
    def size: Int = expand.size
  }

  /** grids/example.py + theta.py + vecm.py re-expressed over the registry's
    * accepted params. */
  val defaults: Map[String, Grid] = Map(
    // example.py mlr: normalizer axis only
    "mlr" -> Grid(Map.empty, Seq("scale", "minmax", "none")),
    // example.py lasso: alpha 0.01..1.00
    "lasso" -> Grid(Map("alpha" -> (1 to 100).map(_ / 100.0))),
    // example.py ridge: alpha 0.01..1.00
    "ridge" -> Grid(Map("alpha" -> (1 to 100).map(_ / 100.0))),
    // example.py elasticnet: alpha 0.1..2.0 x l1_ratio x normalizer
    "elasticnet" -> Grid(Map(
      "alpha" -> (1 to 20).map(_ / 10.0),
      "l1_ratio" -> Seq(0, 0.25, 0.5, 0.75, 1.0)), Seq("scale", "minmax")),
    // example.py sgd (penalty axes; sklearn's learning-rate schedule strings
    // have no MLlib analogue — the solver substitution is documented on the
    // estimator)
    "sgd" -> Grid(Map(
      "alpha" -> Seq(0.00001, 0.0001, 0.001),
      "l1_ratio" -> Seq(0, 0.15, 0.5, 1.0)), Seq("scale", "minmax")),
    // example.py rf: depth x trees (max_features/max_samples are sklearn
    // resampling knobs MLlib's forest exposes differently — omitted)
    "rf" -> Grid(Map(
      "max_depth" -> Seq(2, 5), "n_estimators" -> Seq(100, 500))),
    // example.py gbt: depth axis ('max_features' omitted as above)
    "gbt" -> Grid(Map("max_depth" -> Seq(2, 3, 4, 5))),
    // native ε-SVR (models/Svr.scala): sklearn-style C/epsilon axes; gamma
    // stays at the data-adaptive 'scale' default unless tuned explicitly
    "svr" -> Grid(Map(
      "C" -> Seq(0.1, 1.0, 10.0, 100.0),
      "epsilon" -> Seq(0.01, 0.1, 0.5))),
    // native MLP (models/MlpNet.scala): width and ridge penalty
    "mlp" -> Grid(Map(
      "hidden_layer_sizes" -> Seq(4, 8, 16),
      "alpha" -> Seq(1e-5, 1e-4, 1e-3))),
    // the reference's rnn/lstm grids tune layer width, epochs, and lags
    // (grids/example.py:47-53,86-103); lags are a feature recipe here
    // (addArTerms), so the default grid spans the native net's width and
    // optimizer-budget axes (models/RnnNet.scala)
    "rnn" -> Grid(Map(
      "units" -> Seq(4, 8, 16), "maxiter" -> Seq(100, 200))),
    "lstm" -> Grid(Map(
      "units" -> Seq(4, 8, 16), "maxiter" -> Seq(100, 200))),
    // example.py knn: n_neighbors 2..100 (capped at 20 — the reference's
    // 2..100 over a ≤100-ob series mostly aliases to the same neighbor sets)
    "knn" -> Grid(Map("k" -> (2 to 20).map(_.toDouble))),
    // example.py hwes tunes {trend,seasonal,use_boxcox} structure flags;
    // our optimized HWES searches the smoothing weights themselves
    // (Smoothing.holtWintersGridSearch), so the default grid is the (α,β,γ)
    // lattice
    "hwes" -> Grid(Map(
      "alpha" -> Seq(0.1, 0.3, 0.5, 0.7, 0.9),
      "beta" -> Seq(0.0, 0.1, 0.3),
      "gamma" -> Seq(0.0, 0.1, 0.3))),
    // theta.py: theta axis (darts ModelMode/SeasonalityMode enums have no
    // analogue in the SES-blend theta implementation)
    "theta" -> Grid(Map("theta" -> Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0))),
    // arima.py order tuples flattened to the Hannan-Rissanen (p, q) axes;
    // d composes via diffT upstream. (0,0) is excluded like autoArma's
    // p+q>0 gate — a no-lag ARMA is the mean model, not an ARMA cell
    "arima" -> Grid(Map("p" -> Seq(0, 1, 2), "q" -> Seq(0, 1, 2)),
      keep = m => m("p") + m("q") > 0),
    // vecm.py: lag axis (statsmodels 'deterministic'/'seasons' codes are
    // Johansen-spec options; our VECM fixes the constant-in-cointegration
    // case)
    "vecm" -> Grid(Map("k_ar_diff" -> Seq(1, 2, 3, 4, 5, 6, 7))),
    // tbats_like: Fourier depth x optional second seasonal period (0 = off)
    "tbats_like" -> Grid(Map(
      "fourier_order" -> Seq(1, 2, 3), "m2" -> Seq(0, 4, 6))),
    // prophet_like: changepoint count (piecewise-linear hinge trend —
    // prophet's n_changepoints knob) x Fourier depth; the seasonal period m
    // is a data property, not tuned
    "prophet_like" -> Grid(Map(
      "n_changepoints" -> Seq(0, 3, 5, 10), "fourier_order" -> Seq(2, 3)))
  )

  /** `gen_rnn_grid` (/root/reference/src/scalecast/util.py:1272-1360):
    * seeded random sampler over the recurrent architecture space — random
    * search for when the cartesian default grid is too wide to sweep.
    *
    * The reference draws `layer_tries` Keras layer stacks of
    * (cell, units, activation, dropout) tuples. The native nets
    * ([[graft.models.RnnNet]]) are single-cell tanh seq2vec regressors, so
    * the architecture axes sample onto their counterparts: `layer_cell_pool`
    * (SimpleRNN|LSTM) → the cell family, which here IS the estimator name
    * (`rnn`|`lstm`); `units_pool` → the hidden width; `dropout_pool`'s
    * regularization role → the ridge strength `alphaPool`; the activation
    * pool collapses (tanh is the cell); the `uniform_*` flags are moot with
    * one recurrent layer. The reference's epochs/kwargs axes cross every
    * sampled architecture — `maxiterPool` plays that role. Same seed → same
    * grid (`np.random.seed` parity); duplicate draws collapse.
    *
    * Returns estimator-name → tune rows: feed one entry to
    * `setEstimator(cell).tune(rows)`, or pair each entry with its model
    * function for [[Evaluation.tuneTestForecast]]; cap with
    * [[AutoSelect.limitGridSize]] (the reference's `limit_grid_size`). */
  def genRnnGrid(layerTries: Int = 5,
                 cellPool: Seq[String] = Seq("lstm"),
                 unitsPool: Seq[Int] = Seq(4, 8, 16, 32),
                 alphaPool: Seq[Double] = Seq(1e-4),
                 maxiterPool: Seq[Int] = Seq(100, 200),
                 seed: Long = 42L): Map[String, Seq[Map[String, Double]]] = {
    require(layerTries > 0, "layerTries must be positive")
    val bad = cellPool.filterNot(Set("rnn", "lstm"))
    require(bad.isEmpty, s"cellPool entries must be rnn|lstm, got: ${bad.mkString(",")}")
    require(cellPool.nonEmpty && unitsPool.nonEmpty && alphaPool.nonEmpty &&
      maxiterPool.nonEmpty, "every pool needs at least one value")
    val rng = new scala.util.Random(seed)
    val draws = IndexedSeq.fill(layerTries)((
      cellPool(rng.nextInt(cellPool.size)),
      unitsPool(rng.nextInt(unitsPool.size)).toDouble,
      alphaPool(rng.nextInt(alphaPool.size)))).distinct
    val rows = for {
      (cell, units, alpha) <- draws
      iters <- maxiterPool
    } yield (cell, Map("units" -> units, "alpha" -> alpha,
      "maxiter" -> iters.toDouble))
    rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
  }

  /** User-registered grids (`set_grids_file` / a user's own Grids.py,
    * GridGenerator.py:3-32): overlay the defaults, including shadowing a
    * default grid for a builtin estimator. */
  private val custom = scala.collection.concurrent.TrieMap.empty[String, Grid]
  def register(name: String, grid: Grid): Unit = custom.put(name, grid)

  /** `GridGenerator.get_grids` + `ingest_grid` lookup: the registered or
    * default grid for an estimator, or a clear error naming the available
    * ones. */
  def gridFor(estimator: String): Grid =
    custom.get(estimator).orElse(defaults.get(estimator))
      .getOrElse(throw new IllegalArgumentException(
        s"no default grid for '$estimator'; available: " +
          (defaults.keys ++ custom.keys).toSeq.distinct.sorted.mkString(", ")))
}
