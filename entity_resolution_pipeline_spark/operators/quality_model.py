"""Model-based corpus quality filtering — the classifier stage of
web-scale curation (GPT-3 / LLaMA style: train a CHEAP classifier to
imitate an expensive quality judgment, then run the cheap model over the
full corpus). No reference analog (the reference's learned model scores
entity PAIRS, /root/reference/src/modeling.py; this one scores documents)
— LLM-pipeline extension.

Shape: per-document features are pure native Column expressions (one
narrow corpus pass, zero Python); training is spark.ml LogisticRegression
over the labeled slice (driver-state coefficients, exactly like the ER
GBT in operators/scoring.py); application is the fitted model's
``transform`` — a broadcast dot product, JVM-side, one narrow projection
over 10^12 documents. The distillation labels here come from the
heuristic curation gate (operators/curation.py:curation_flags), the same
trick production pipelines use when the expensive judgment (an LLM
grader, human ratings, a reference corpus contrast) is too costly to run
corpus-wide: run it on a slice, distill, deploy the distilled model.

Training is iterative (LBFGS) and therefore not SQL-expressible, so the
verification contract is split the way the battery splits it for the ANN
quantizers (driver-state literals): TRAINING quality lives in pytest
(held-out agreement and AUC floors vs the gate labels, plus agreement of
a freshly trained model with the committed artifact below), while the
100 TB DEPLOYMENT path — features → dot product → threshold with the
COMMITTED coefficient artifact — is a pure native projection with a
full-plan DuckDB oracle (battery row ``quality_filter``). The committed
artifact PINNED_QUALITY_MODEL is the output of one training run at
sf0.01 (seed 42, train slice doc_id % 2 == 0); scoring emits the LOGIT
rather than the sigmoid probability because the logistic function is
monotone (keep ⇔ logit ≥ logit(τ)) and exp() is the one term whose last
ulp could differ between JVM and DuckDB libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import (
    LANG_STOPWORDS, repetition_counts_col, token_entropy_col,
)

QUALITY_FEATURES = [
    "n_tokens", "mean_word_len", "alpha_ratio", "stop_ratio",
    "entropy", "dup_word_frac", "top_word_frac",
]

# The committed model artifact: LogisticRegression(maxIter=25,
# regParam=0.01, standardization=True, seed fixtures above) fitted at
# sf0.01 on the doc_id % 2 == 0 slice with curation-gate labels — the
# "distilled classifier shipped to the cluster" that a 100 TB scoring job
# broadcasts. Pinned so the deployment projection is fully deterministic
# and SQL-oracle-checkable; tests/test_quality_model.py asserts a freshly
# trained model agrees with this artifact's keep decisions.
PINNED_QUALITY_COEFFS: dict[str, float] = {
    "n_tokens": -0.047267773197258105,
    "mean_word_len": 1.298120117272665,
    "alpha_ratio": -0.9878140087136014,
    "stop_ratio": 36.716986741181806,
    "entropy": 3.433463803214661,
    "dup_word_frac": -3.835258995257086,
    "top_word_frac": -41.2976221909497,
}
PINNED_QUALITY_INTERCEPT: float = -11.01070136220459


def score_quality_pinned(features: DataFrame,
                         coeffs: dict[str, float] | None = None,
                         intercept: float | None = None,
                         logit_threshold: float = 0.0) -> DataFrame:
    """Score documents with a PINNED coefficient artifact as one native
    projection: adds (logit, keep) where logit = round(b + Σ wᵢ·fᵢ, 6)
    and keep ⇔ logit ≥ ``logit_threshold`` (0.0 ⇔ p ≥ 0.5 — the logistic
    is monotone, so thresholding the logit IS thresholding the
    probability, minus the cross-engine exp()). This is the deployment
    hot path at 100 TB: zero shuffle, zero Python, whole-stage codegen,
    the model rides the plan as literals exactly like the ANN centroids
    and PQ codebooks."""
    coeffs = PINNED_QUALITY_COEFFS if coeffs is None else coeffs
    b = PINNED_QUALITY_INTERCEPT if intercept is None else intercept
    logit = F.lit(float(b))
    for name in QUALITY_FEATURES:  # fixed fold order — oracle mirrors it
        if name in coeffs:
            logit = logit + F.lit(float(coeffs[name])) * F.col(name)
    out = features.withColumn("logit", F.round(logit, 6))
    return out.withColumn("keep", F.col("logit") >= F.lit(logit_threshold))


def doc_quality_features(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id, QUALITY_FEATURES...) — raw per-document quality signals as ONE
    narrow projection (token folds + char regexes; the repetition integers
    ride the shared struct). Deliberately the RAW signals, not the
    composite heuristic score: the classifier learns its own weighting."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    en_stops = LANG_STOPWORDS["en"]
    inner = docs.select(
        F.col(id_col),
        F.size(words).cast("double").alias("n_tokens"),
        F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("double")
        .alias("_alpha"),
        F.length(t).cast("double").alias("_nc"),
        F.size(F.filter(words, lambda x: x.isin(en_stops))).cast("double")
        .alias("_stop_hits"),
        F.coalesce(token_entropy_col(t), F.lit(0.0)).alias("entropy"),
        repetition_counts_col(t).alias("_rep"),
    )
    nt = F.col("n_tokens")
    tw = F.col("_rep.total_words").cast("double")
    return inner.select(
        F.col(id_col), "n_tokens",
        F.when(nt > 0, F.col("_alpha") / nt).otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(F.col("_nc") > 0, F.col("_alpha") / F.col("_nc"))
        .otherwise(F.lit(0.0)).alias("alpha_ratio"),
        F.when(nt > 0, F.col("_stop_hits") / nt).otherwise(F.lit(0.0))
        .alias("stop_ratio"),
        "entropy",
        F.when(tw > 0, 1.0 - F.col("_rep.distinct_words") / tw)
        .otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(tw > 0, F.col("_rep.top_word_count") / tw)
        .otherwise(F.lit(0.0)).alias("top_word_frac"),
    )


def train_quality_filter(labeled_features: DataFrame,
                         label_col: str = "label", seed: int = 42):
    """LogisticRegression over QUALITY_FEATURES; the fitted coefficient
    vector is tiny driver state (like the PQ codebooks / ER GBT)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from pyspark import StorageLevel

    asm = VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="qvec")
    lr = LogisticRegression(featuresCol="qvec", labelCol=label_col,
                            maxIter=25, regParam=0.01, standardization=True)
    # LBFGS makes one pass per iteration: persist the assembled frame so
    # the feature folds + gate labels are computed once, not ×iterations
    data = asm.transform(labeled_features.withColumn(
        label_col, F.col(label_col).cast("double"))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    try:
        model = lr.fit(data)
    finally:
        data.unpersist()
    return asm, model


def apply_quality_filter(features: DataFrame, asm, model,
                         threshold: float = 0.5) -> DataFrame:
    """Score documents with the distilled filter: adds (p_quality, keep).
    One broadcast dot product per row — the 100 TB deployment cost."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(asm.transform(features))
    return (
        out.withColumn("p_quality",
                       F.round(vector_to_array("probability")[1], 6))
        .withColumn("keep", F.col("p_quality") >= threshold)
        .drop("qvec", "rawPrediction", "probability", "prediction")
    )


def distill_curation_gate(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          train_mod: int = 2, threshold: float = 0.5,
                          seed: int = 42) -> DataFrame:
    """End-to-end distillation: run the heuristic gate on the training
    slice (ids ≡ 0 mod ``train_mod`` — the 'expensive judgment on a
    slice' stand-in), train the classifier on that slice's features, and
    score EVERY document. Returns (id, p_quality, keep, gate_keep) where
    gate_keep is the full gate's own verdict for side-by-side audit."""
    from .curation import curation_flags

    from pyspark import StorageLevel

    feats = doc_quality_features(docs, id_col, text_col)
    gate = curation_flags(docs, id_col, text_col).select(
        F.col(id_col), F.col("keep").alias("gate_keep"))
    # the feature folds + gate rules feed BOTH the training slice and the
    # corpus-wide scoring pass — compute them once
    labeled = (
        feats.join(gate, id_col)
        .withColumn("label", F.col("gate_keep").cast("double"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    train = labeled.where(F.col(id_col) % train_mod == 0)
    asm, model = train_quality_filter(train, "label", seed)
    scored = apply_quality_filter(labeled, asm, model, threshold)
    out = scored.select(id_col, "p_quality", "keep", "gate_keep")
    out._erps_persisted = [labeled]
    return out


def save_pinned_quality_filter(path: str,
                               coeffs: dict[str, float] | None = None,
                               intercept: float | None = None,
                               logit_threshold: float = 0.0) -> None:
    """Persist the PINNED scorer as a plain-JSON S12 artifact (no
    spark.ml classes — the deployment scorer is a native projection, so
    the artifact is just numbers any job can broadcast)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "pinned_quality.json"), "w") as f:
        json.dump({
            "feature_cols": QUALITY_FEATURES,
            "coefficients": (PINNED_QUALITY_COEFFS if coeffs is None
                             else coeffs),
            "intercept": (PINNED_QUALITY_INTERCEPT if intercept is None
                          else intercept),
            "logit_threshold": logit_threshold,
            "model_type": "pinned_logit",
        }, f, sort_keys=True)


def load_pinned_quality_filter(path: str) -> tuple[dict, float, float]:
    """Returns (coeffs, intercept, logit_threshold) from the JSON artifact."""
    import json
    import os

    with open(os.path.join(path, "pinned_quality.json")) as f:
        doc = json.load(f)
    return (dict(doc["coefficients"]), float(doc["intercept"]),
            float(doc["logit_threshold"]))


def save_quality_filter(path: str, asm, model,
                        threshold: float = 0.5) -> None:
    """Persist assembler + LR + manifest (S12-style, mirroring
    operators/modeling.save_scorer_package): the artifact any Spark
    deployment loads to score new corpora without retraining."""
    import json
    import os

    asm.write().overwrite().save(os.path.join(path, "assembler"))
    model.write().overwrite().save(os.path.join(path, "lr"))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"feature_cols": QUALITY_FEATURES,
                   "threshold": threshold,
                   "model_type": type(model).__name__}, f, sort_keys=True)


def load_quality_filter(path: str):
    """Returns (asm, model, manifest)."""
    import json
    import os

    from pyspark.ml.classification import LogisticRegressionModel
    from pyspark.ml.feature import VectorAssembler

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    asm = VectorAssembler.load(os.path.join(path, "assembler"))
    model = LogisticRegressionModel.load(os.path.join(path, "lr"))
    return asm, model, manifest
