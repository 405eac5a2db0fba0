package graft.models

import graft.core.SeriesFrame._
import graft.results.ResultsStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model stacking via signal features — the reference's `add_signals` +
  * `mlp_stack` pattern (/root/reference/src/scalecast/Forecaster.py:367-407,
  * auxmodels.py:47-126): base models' predictions become feature columns
  * (`signal_<model>`) and a meta-regressor is trained on them. The default
  * meta-learner is GBT (kept for round-over-round result stability); with
  * the native [[MlpNet]] estimator, `metaAlgo = "mlp"` reproduces the
  * reference's MLP meta-learner family directly (StackingSpec drives it).
  */
object Stacking {

  /** Fit base model functions, bank their predictions, join them back as
    * signal features, and fit a meta estimator on the signals. Returns the
    * scored frame with `yhat` from the meta model. */
  def stack(frame: DataFrame, baseModels: Map[String, DataFrame => DataFrame],
            metaAlgo: String = "gbt",
            metaParams: Map[String, Double] = Map("n_estimators" -> 30.0, "max_depth" -> 3.0)): DataFrame = {
    val banked = baseModels.map { case (name, fn) =>
      ResultsStore.bank(fn(frame), name)
    }.reduce(_ unionByName _)
    val withSignals = baseModels.keys.foldLeft(frame)((f, name) =>
      ResultsStore.addSignal(f, banked, name))
    val signalCols = baseModels.keys.map(n => s"signal_$n").toSeq
    val meta = MllibTsEstimator(metaAlgo, signalCols, metaParams)
    val model = meta.fit(withSignals)
    model.transform(withSignals).drop("_fraw", "_f")
  }
}
