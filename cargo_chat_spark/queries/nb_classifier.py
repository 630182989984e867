"""Learned document classifier: multinomial Naive Bayes over tokens.

The curation family's quality/langid gates are fixed HEURISTICS; a
production pipeline also TRAINS classifiers from labeled seed data
(fastText-style quality/domain classifiers). This module adds the
no-external-deps member of that family Spark-first — multinomial NB
with Laplace smoothing, predicting ``source`` from ``text``:

- **Training is pure aggregation** (no iterations): per-(label, token)
  counts, per-label token totals, vocabulary size, label priors — one
  corpus scan plus map-side-combined aggs.
- **Scoring is exact integer arithmetic.** Each log-probability is
  floored to MICRO-units (``floor(ln(p) * 1e6) :: bigint`` — the
  mock_embed/fixed-point discipline), so the per-document score is an
  INTEGER sum: immune to float summation order at any scale, and the
  whole train+predict surface value-hash-checks against the DuckDB
  oracle. (The batch bm25 gate instead rounds a double SUM — fine for
  its ≤3-term sums; NB sums hundreds of token contributions, where
  floating addition order would genuinely bite.)
- **The model broadcasts** at classify time (|vocab| × |labels| rows —
  model-sized, not corpus-sized); documents shuffle only on their own
  (doc, token) tf aggregate.

Gates: ``nb_train_logprobs`` (the learned model over the top-60 corpus
tokens) and ``nb_classify_docs`` (argmax label for a deterministic doc
subset, ties to the lexicographically smallest label).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

TOP_TOKENS = 60
SAMPLE_MOD = 7  # classify docs with doc_id % 7 == 0

_NB_CTES = """
toks AS (
    SELECT doc_id, source,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents),
tok AS (SELECT * FROM toks WHERE token <> ''),
vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tok),
lab_tok AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM tok GROUP BY source),
cnt AS (
    SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok GROUP BY source, token),
model AS (
    SELECT c.source, c.token,
           CAST(floor(ln((c.c + 1) / CAST(l.n_tok + v.v AS DOUBLE)) * 1000000)
                AS BIGINT) AS lp_micro
    FROM cnt c JOIN lab_tok l USING (source) CROSS JOIN vocab v),
unseen AS (
    SELECT l.source,
           CAST(floor(ln(1.0 / CAST(l.n_tok + v.v AS DOUBLE)) * 1000000)
                AS BIGINT) AS unseen_micro
    FROM lab_tok l CROSS JOIN vocab v),
doc_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
priors AS (
    SELECT source,
           CAST(floor(ln(COUNT(*) / CAST(t.total AS DOUBLE)) * 1000000)
                AS BIGINT) AS prior_micro
    FROM documents CROSS JOIN doc_total t
    GROUP BY source, t.total)
"""

_TRAIN_SQL = f"""
WITH {_NB_CTES},
top_tokens AS (
    SELECT token FROM tok GROUP BY token
    ORDER BY COUNT(*) DESC, token ASC LIMIT {TOP_TOKENS})
SELECT m.source, m.token, m.lp_micro
FROM model m JOIN top_tokens USING (token)
"""

def _pred_cte(sample_mod: int) -> str:
    """CTE chain ending in ``pred`` — per-doc argmax label + integer
    score for the ``doc_id % sample_mod == 0`` subset."""
    return f"""{_NB_CTES},
sample_tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE doc_id % {sample_mod} = 0
    GROUP BY doc_id, token),
scored AS (
    SELECT s.doc_id, u.source,
           p.prior_micro
           + SUM(s.tf * COALESCE(m.lp_micro, u.unseen_micro)) AS score_micro
    FROM sample_tf s
    CROSS JOIN unseen u
    LEFT JOIN model m ON m.token = s.token AND m.source = u.source
    JOIN priors p ON p.source = u.source
    GROUP BY s.doc_id, u.source, p.prior_micro),
pred AS (
    SELECT doc_id, source AS pred_source,
           CAST(score_micro AS BIGINT) AS score_micro
    FROM scored
    QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, source ASC) = 1)"""
# ^ score_micro is prior + SUM over BIGINTs — DuckDB widens to HUGEINT,
# which the DRIVER's pandas canonicalization downcasts to float64 while
# Spark returns int64 (hash mismatch invisible to the fetchall-based
# pytest harness). Caught by tools/driver_sim.py in round 8.


_CLASSIFY_SQL = f"""
WITH {_pred_cte(SAMPLE_MOD)}
SELECT doc_id, pred_source, score_micro FROM pred
"""


def _model_frames(spark, sf_dir):
    """(model, unseen, priors) frames — all model-sized."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(D.tokens(F.col("text"))).alias("token")
    ).where(F.col("token") != "")
    vocab = tok.agg(
        F.countDistinct("token").cast("bigint").alias("v")
    )
    lab_tok = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    cnt = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    model = (
        cnt.join(lab_tok, "source")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "token",
            F.floor(
                F.log(
                    (F.col("c") + 1)
                    / (F.col("n_tok") + F.col("v")).cast("double")
                )
                * 1000000
            ).cast("bigint").alias("lp_micro"),
        )
    )
    unseen = (
        lab_tok.crossJoin(F.broadcast(vocab)).select(
            "source",
            F.floor(
                F.log(
                    F.lit(1.0) / (F.col("n_tok") + F.col("v")).cast("double")
                )
                * 1000000
            ).cast("bigint").alias("unseen_micro"),
        )
    )
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    priors = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            F.floor(
                F.log(F.col("n") / F.col("total").cast("double")) * 1000000
            ).cast("bigint").alias("prior_micro"),
        )
    )
    return tok, model, unseen, priors


@register("nb_train_logprobs", sql=_TRAIN_SQL)
def nb_train_logprobs(spark, sf_dir):
    """The learned smoothed log-probabilities (integer micro-units) for
    the top-60 corpus tokens across every label."""
    tok, model, _, _ = _model_frames(spark, sf_dir)
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(TOP_TOKENS)
        .select("token")
    )
    return model.join(F.broadcast(top), "token").select(
        "source", "token", "lp_micro"
    )


def _predictions(spark, sf_dir, sample_mod: int):
    """Per-doc argmax (doc_id, pred_source, score_micro) for the
    ``doc_id % sample_mod == 0`` subset — the shared scorer behind the
    classify gate (mod 7) and the model-composed filter (mod 1). The
    model/priors/unseen frames broadcast; the doc side aggregates its
    own tf and sums INTEGER contributions — deterministic at any
    parallelism."""
    tok, model, unseen, priors = _model_frames(spark, sf_dir)
    sample_tf = (
        tok.where(F.col("doc_id") % sample_mod == 0)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    scored = (
        sample_tf.alias("st")
        .crossJoin(F.broadcast(unseen).alias("un"))
        .join(
            F.broadcast(model).alias("md"),
            on=[
                F.col("md.token") == F.col("st.token"),
                F.col("md.source") == F.col("un.source"),
            ],
            how="left",
        )
        .select(
            F.col("st.doc_id").alias("doc_id"),
            F.col("un.source").alias("source"),
            (
                F.col("st.tf")
                * F.coalesce(F.col("md.lp_micro"), F.col("un.unseen_micro"))
            ).alias("contrib"),
        )
        .groupBy("doc_id", "source")
        .agg(F.sum("contrib").alias("tok_score"))
        .join(F.broadcast(priors), "source")
        .select(
            "doc_id",
            "source",
            (F.col("prior_micro") + F.col("tok_score")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("source")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("source").alias("pred_source"),
            "score_micro",
        )
    )


@register("nb_classify_docs", sql=_CLASSIFY_SQL)
def nb_classify_docs(spark, sf_dir):
    """Argmax-label prediction for the doc_id % 7 == 0 subset."""
    return _predictions(spark, sf_dir, SAMPLE_MOD)


# ----------------------------------------------------- nb_filter_report
# The model COMPOSED INTO a curation decision (round 8): production
# pipelines run fastText-style classifiers over the whole corpus and act
# on the prediction (keep/drop/bucket). Here the decision is
# self-consistency — keep documents whose predicted source equals their
# actual source (high-confusion docs are the ones whose token profile
# does not match their provenance) — reported per source as a keep-rate
# card. Every doc scores (sample_mod = 1); the output is label-sized.
# All sums are integers (micro-unit scores / counts) and CAST to BIGINT
# in the oracle (the HUGEINT pandas lesson above).

_FILTER_SQL = f"""
WITH {_pred_cte(1)}
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN p.pred_source = d.source THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN p.pred_source = d.source THEN p.score_micro
                     ELSE 0 END) AS BIGINT) AS kept_score_micro
FROM pred p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


@register("nb_filter_report", sql=_FILTER_SQL)
def nb_filter_report(spark, sf_dir):
    """Classifier-composed curation: per-source keep-rate card for the
    self-consistency filter (pred_source == source) over the WHOLE
    corpus. One scorer pass + one broadcast join back to the doc labels
    + one label-sized aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pred = _predictions(spark, sf_dir, 1)
    keep = F.col("pred_source") == F.col("source")
    return (
        pred.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(keep, F.col("score_micro")).otherwise(0))
            .cast("bigint")
            .alias("kept_score_micro"),
        )
    )

# ------------------------------------------------- nb_calibration_report
# Evaluation-as-data for the classifier itself (round 10): the
# reliability card every production filter needs before its predictions
# gate a corpus — does a larger decision margin actually mean a more
# reliable prediction? Confidence = the INTEGER micro-unit margin
# between the top-1 and top-2 label scores (every doc scores all
# labels, so rank 2 always exists); bins are fixed-width margin buckets
# (200k micro-units, capped at bin 9), so the whole report is
# integer-exact and value-hashes. A miscalibrated model shows flat or
# inverted accuracy across bins — the signal to retrain before
# trusting nb_filter_report's keep decisions.

_CALIBRATION_SQL = f"""
WITH {_NB_CTES},
sample_tf AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY doc_id, token),
scored AS (
    SELECT s.doc_id, u.source,
           p.prior_micro
           + SUM(s.tf * COALESCE(m.lp_micro, u.unseen_micro)) AS score_micro
    FROM sample_tf s
    CROSS JOIN unseen u
    LEFT JOIN model m ON m.token = s.token AND m.source = u.source
    JOIN priors p ON p.source = u.source
    GROUP BY s.doc_id, u.source, p.prior_micro),
r2 AS (
    SELECT doc_id, source, score_micro,
           row_number() OVER (
               PARTITION BY doc_id
               ORDER BY score_micro DESC, source ASC) AS rk
    FROM scored),
top2 AS (
    SELECT a.doc_id, a.source AS pred_source,
           CAST(a.score_micro - b.score_micro AS BIGINT) AS margin_micro
    FROM r2 a JOIN r2 b ON a.doc_id = b.doc_id AND b.rk = 2
    WHERE a.rk = 1)
SELECT CAST(LEAST(t.margin_micro // 200000, 9) AS INT) AS margin_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN t.pred_source = d.source THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM top2 t JOIN documents d USING (doc_id)
GROUP BY 1
"""


@register("nb_calibration_report", sql=_CALIBRATION_SQL)
def nb_calibration_report(spark, sf_dir):
    """Reliability card: per margin-bin document count and correct count
    over the whole corpus (margin = top1 − top2 score, integer
    micro-units; fixed 200k-unit bins capped at 9). Cost: the scorer
    pass nb_filter_report already pays, a rank-2 window instead of
    rank-1, and a 10-row aggregate."""
    tok, model, unseen, priors = _model_frames(spark, sf_dir)
    sample_tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    scored = (
        sample_tf.alias("st")
        .crossJoin(F.broadcast(unseen).alias("un"))
        .join(
            F.broadcast(model).alias("md"),
            on=[
                F.col("md.token") == F.col("st.token"),
                F.col("md.source") == F.col("un.source"),
            ],
            how="left",
        )
        .select(
            F.col("st.doc_id").alias("doc_id"),
            F.col("un.source").alias("source"),
            (
                F.col("st.tf")
                * F.coalesce(F.col("md.lp_micro"), F.col("un.unseen_micro"))
            ).alias("contrib"),
        )
        .groupBy("doc_id", "source")
        .agg(F.sum("contrib").alias("tok_score"))
        .join(F.broadcast(priors), "source")
        .select(
            "doc_id",
            "source",
            (F.col("prior_micro") + F.col("tok_score")).alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("source")
    )
    top2 = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("source"))).alias(
                "pred_source"
            ),
            (
                F.max(F.when(F.col("rk") == 1, F.col("score_micro")))
                - F.max(F.when(F.col("rk") == 2, F.col("score_micro")))
            ).cast("bigint").alias("margin_micro"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        top2.join(docs, "doc_id")
        .groupBy(
            F.least(
                F.expr("margin_micro DIV 200000"), F.lit(9)
            ).cast("int").alias("margin_bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("pred_source") == F.col("source"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
    )
