package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** DataFrame-era analogue of the reference's MLlib decision-tree scorer
  * (ConsumerESFinal.scala:50-83, DecisionTreeTest.scala:30-53): assemble
  * features → train DecisionTreeClassifier (gini, depth 6, 32 bins — the
  * reference's hyperparameters) → `model.transform` for scoring, which
  * works identically on batch and streaming DataFrames (the closure-
  * captured-model pattern of the reference becomes a broadcast transform).
  */
object ScoringPipeline {

  /** Feature frame derived from events (value + time-of-day signals). */
  def featurize(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("event_type"),
      col("value"),
      hour(col("ts")).cast("double").as("hour_of_day"),
      dayofweek(col("ts")).cast("double").as("day_of_week"),
      (col("event_type") === "purchase").cast("double").as("label"))

  def fit(train: DataFrame): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("value", "hour_of_day", "day_of_week"))
      .setOutputCol("features")
    val tree = new DecisionTreeClassifier()
      .setImpurity("gini").setMaxDepth(6).setMaxBins(32).setSeed(42L)
    new Pipeline().setStages(Array(assembler, tree)).fit(train)
  }

  /** x2: train on the events table, score it, count per (prediction ×
    * event_type) with the reference's label decode (Bolt / Not bolt →
    * flagged / normal). Deterministic (fixed seed, count-based impurity)
    * but not SQL-expressible → rows-only correctness check. */
  /** x3: 70/30 randomSplit train/holdout evaluation (O15 — the analog of
    * reference DecisionTreeTest.scala:37-46, which eyeballed predictions;
    * here accuracy is computed and golden-tested). Deterministic: fixed
    * split seed over a deterministic parquet read, fixed tree seed. */
  def x3MlEval(spark: SparkSession, dir: String): DataFrame = {
    val feats = featurize(Sources.table(spark, dir, "events")).cache()
    val Array(train, holdout) = feats.randomSplit(Array(0.7, 0.3), seed = 42L)
    val model = fit(train) // fit's iterative passes are what the cache serves
    feats.unpersist()
    model.transform(holdout)
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .select(
        lit("decision_tree_holdout").as("metric"),
        col("n_test"),
        col("n_correct"),
        round(col("n_correct").cast("double") / col("n_test").cast("double"), 4).as("accuracy"))
  }

  def x2MlScore(spark: SparkSession, dir: String): DataFrame = {
    val feats = featurize(Sources.table(spark, dir, "events")).cache()
    val model = fit(feats) // cache serves the tree's repeated passes
    feats.unpersist()      // scoring below recomputes featurize once
    model.transform(feats)
      .withColumn("pred_label",
        when(col("prediction") === 0.0, "normal").otherwise("flagged"))
      .groupBy("pred_label", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("pred_label", "event_type")
  }
}
