"""MLlib sentiment pipeline: the learned variant of the S11 operator.

The north star names "Spark ML pipeline + DataFrame transformations" as
the approach; SURVEY.md §7 M5 calls for an MLlib
``Pipeline(Tokenizer -> HashingTF/IDF -> LogisticRegression)`` variant
of the lexicon scorer (reference behavior at
``FunctionApp2/process_data/__init__.py:62-82``). This module provides
exactly that, self-supervised so it needs no external labels:

1. weak labels from the deterministic lexicon scorer (positive=1.0,
   negative=0.0; neutral/mixed rows are excluded from training),
2. a Pipeline of RegexTokenizer -> StopWordsRemover -> HashingTF ->
   IDF -> LogisticRegression,
3. scoring = ``model.transform`` — a pure DataFrame job whose cost is
   one scan plus the (broadcast) model, horizontally scalable exactly
   like the lexicon path.

Training is deterministic: fixed tokenizer/TF dimensionality, LBFGS
optimization on a deterministic label set.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, IDF, RegexTokenizer, StopWordsRemover
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS_EN, sentiment_components_expr

N_FEATURES = 1 << 12  # 4096-dim hashed space: tiny model, broadcastable


def weak_labels(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexicon-derived binary labels: 1.0 where positive hits dominate,
    0.0 where negative dominate; ties/neutral rows are dropped."""
    pos, neg = sentiment_components_expr(text_col)
    return (
        df.withColumn("__pos", pos)
        .withColumn("__neg", neg)
        .filter(F.col("__pos") != F.col("__neg"))
        .withColumn(
            "label", (F.col("__pos") > F.col("__neg")).cast("double")
        )
        .drop("__pos", "__neg")
    )


def build_pipeline(text_col: str = "text") -> Pipeline:
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern="[^a-zA-Z]+",
        toLowercase=True, minTokenLength=1,
    )
    stop = StopWordsRemover(
        inputCol="__tokens", outputCol="__clean", stopWords=list(STOPWORDS_EN)
    )
    tf = HashingTF(
        inputCol="__clean", outputCol="__tf", numFeatures=N_FEATURES
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features", labelCol="label", maxIter=20, regParam=0.01
    )
    return Pipeline(stages=[tok, stop, tf, idf, lr])


def train_sentiment_model(
    df: DataFrame, text_col: str = "text"
) -> PipelineModel:
    """Fit the pipeline on lexicon weak labels from ``df`` itself."""
    return build_pipeline(text_col).fit(weak_labels(df, text_col))


def score_with_model(
    model: PipelineModel, df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, sentiment, confidence) in the reference's result shape:
    categorical label + the positive-class probability (the analog of
    ``confidenceScores.positive``, reference ``:93``)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    p_pos = F.round(
        F.element_at(vector_to_array(F.col("probability")), 2), 6
    )
    return scored.select(
        F.col(id_col).alias("record_id"),
        F.when(F.col("prediction") == 1.0, "positive")
        .otherwise("negative")
        .alias("sentiment"),
        p_pos.alias("confidence"),
    )
