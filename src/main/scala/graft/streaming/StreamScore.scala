package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{MultiClass, TextOps}

/** Streaming model scoring: a TRAINED multi-class linear model applied
  * to a document stream, with a tumbling-window census of the
  * predicted labels — the CCNet-style "live language-ID monitor" over
  * an ingest stream (reference scope: the per-row `apply` composition
  * its users run, `core.py` §2.3, lifted to Structured Streaming).
  *
  * Scale/state shape: scoring is STATELESS — [[MultiClass.scored]] is
  * row-local margins against a driver-held model, so it composes with
  * any `readStream` source at full source parallelism with ZERO state
  * store. Only the census aggregation carries state, bounded by
  * (watermark horizon / width) × labels like [[EventWindows]]; the
  * model ships once per task binary, never per row. Batch and
  * streaming take the SAME call (the batch/stream dual every operator
  * here follows — batch output is the oracle gate, the streaming path
  * is pinned equal in StreamingSpec); streaming adds the watermark.
  */
object StreamScore {

  /** `(window_start, <predCol>, n)` census of predicted labels per
    * tumbling `width` window. `docs` must carry a timestamp `tsCol`;
    * `window_start` is epoch seconds (the [[EventWindows]]
    * convention). Predictions are argmax over 6dp-rounded scores
    * (round-before-argmax — any engine replays the label). */
  def predLabelCensus(docs: DataFrame, feats: Column, m: MultiClass.McModel,
      tsCol: String, width: String = "1 hour",
      predCol: String = "pred_label"): DataFrame =
    MultiClass.scored(docs, feats, m, predCol)
      .groupBy(window(col(tsCol), width), col(predCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"),
        col(predCol), col("n"))

  /** Streaming variant: identical aggregation with an explicit
    * watermark (append-mode state cleanup). */
  def predLabelCensusStream(docs: DataFrame, feats: Column,
      m: MultiClass.McModel, tsCol: String, width: String = "1 hour",
      watermark: String = "2 hours",
      predCol: String = "pred_label"): DataFrame =
    predLabelCensus(docs.withWatermark(tsCol, watermark), feats, m,
      tsCol, width, predCol)

  /** Language-ID census over a document stream: [[predLabelCensus]]
    * specialized to a trained [[TextOps.LangIdModel]] (char-n-gram
    * featurization rides inside the model). `minScore` applies the
    * CCNet confidence rejection — low-confidence rows count as
    * 'unknown', not as their best guess. */
  def langIdCensus(docs: DataFrame, textCol: String, m: TextOps.LangIdModel,
      tsCol: String, width: String = "1 hour",
      minScore: Double = 0.0): DataFrame =
    TextOps.langIdPredict(docs, textCol, m, "lang_pred", minScore)
      .groupBy(window(col(tsCol), width), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("window_start"),
        col("lang_pred"), col("n"))

  /** Streaming [[langIdCensus]] with the watermark applied. */
  def langIdCensusStream(docs: DataFrame, textCol: String,
      m: TextOps.LangIdModel, tsCol: String, width: String = "1 hour",
      watermark: String = "2 hours", minScore: Double = 0.0): DataFrame =
    langIdCensus(docs.withWatermark(tsCol, watermark), textCol, m,
      tsCol, width, minScore)
}
