"""Training-data curation operators over ``documents``: deterministic
stratified sampling, weighted source mixing, and token-budget sequence
packing (north-star extension — the sampling/packing stages every
large-scale LLM data pipeline runs between dedup and tokenization).

All three are pure Catalyst plans with exact DuckDB twins:

- Selection is DETERMINISTIC hash-threshold sampling — ``md5(doc_id)``'s
  low 32 bits modulo 10,000 against a per-stratum rate — not ``rand()``:
  reproducible across runs/engines, cheap (one md5 per row, no shuffle for
  the Bernoulli stage), and stable under repartitioning. This is the
  standard trick for resumable dataset curation at 100 TB: membership is a
  function of the KEY, so incremental reruns keep prior decisions.
- Rates that depend on corpus statistics (source mixing) come from a
  per-source aggregate broadcast back onto the scan — one small shuffle of
  counts, never of documents.
- Sequence packing shards by ``doc_id % N`` and runs the running-token-sum
  window per shard, so the sort is per-shard (bounded), not global.

These entries sit in the catalog's overflow tail: fully oracle-checked by
``tests/test_sampling.py`` (the driver's 50-row gate is already occupied by
the unique SURVEY §2 gates).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.queries._draws import (
    DRAW_MOD as _DRAW_MOD,
    SPLIT_TEST_LO as _SPLIT_TEST_LO,
    SPLIT_VAL_LO as _SPLIT_VAL_LO,
    draw as _draw,
    draw_sql as _draw_sql,
)
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table


# --------------------------------------------------- stratified sampling
# Per-language keep rates (language-rebalancing pass: downsample the
# over-represented strata). Unknown strata keep everything.
_STRATA_RATES = {"en": 0.50, "de": 0.80, "fr": 0.80}
_DEFAULT_RATE = 1.0

_STRATIFIED_SQL = f"""
WITH sampled AS (
    SELECT doc_id, lang,
        {_draw_sql('doc_id')} AS draw,
        -- floor() explicitly: DuckDB CAST(DOUBLE AS BIGINT) rounds,
        -- Spark's cast truncates (same rule as pack_sequences below)
        CAST(floor({_DRAW_MOD} * CASE lang
            WHEN 'en' THEN 0.50 WHEN 'de' THEN 0.80 WHEN 'fr' THEN 0.80
            ELSE 1.0 END) AS BIGINT) AS threshold
    FROM documents
)
SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_total,
    CAST(SUM(CASE WHEN draw < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM sampled
GROUP BY lang
"""


@register("stratified_sample", sql=_STRATIFIED_SQL)
def stratified_sample(spark, sf_dir):
    """Deterministic per-stratum downsampling: keep doc iff
    ``draw(doc_id) < rate[lang] * 10000``. Output: per-language totals and
    kept counts (the aggregate makes the gate order-free; the kept SET
    itself is what a pipeline would write out)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = None
    for lang, r in _STRATA_RATES.items():
        clause = (F.col("lang") == lang, F.lit(r))
        rate = F.when(*clause) if rate is None else rate.when(*clause)
    rate = rate.otherwise(F.lit(_DEFAULT_RATE))
    threshold = F.floor(F.lit(_DRAW_MOD) * rate).cast("bigint")
    kept = F.when(_draw(F.col("doc_id")) < threshold, 1).otherwise(0)
    return (
        docs.select("doc_id", "lang", kept.alias("is_kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("is_kept").cast("bigint").alias("n_kept"),
        )
    )


# ------------------------------------------------- train/val/test splitter
# Holdout membership as a PURE FUNCTION of the document key: split(doc) =
# bucket of md5(doc_id)'s draw against fixed boundaries. The properties a
# 100 TB pipeline needs fall out for free — splits are disjoint + complete
# by construction, stable under repartitioning/reruns/incremental appends
# (a doc can never migrate between splits, so eval never contaminates
# train across dataset versions), and assignment needs no shuffle, no
# global sort, no stored membership table. 98/1/1 boundaries.
_SPLIT_SQL = f"""
SELECT doc_id, lang, source,
    CASE WHEN {_draw_sql('doc_id')} < {_SPLIT_VAL_LO} THEN 'train'
         WHEN {_draw_sql('doc_id')} < {_SPLIT_TEST_LO} THEN 'val'
         ELSE 'test' END AS split
FROM documents
"""


@register("dataset_split", sql=_SPLIT_SQL)
def dataset_split(spark, sf_dir):
    """Deterministic 98/1/1 train/val/test assignment per document (see
    the note above). Emits every row with its split label so the oracle
    value-hashes the full assignment, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    draw = _draw(F.col("doc_id"))
    split = (
        F.when(draw < _SPLIT_VAL_LO, "train")
        .when(draw < _SPLIT_TEST_LO, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", "lang", "source", split.alias("split"))


# ----------------------------------------------------- weighted source mix
# Target mixture proportions by source. Rates derive from corpus counts:
# the bottleneck source s* maximizes w_s/n_s; every source keeps
# rate_s = (w_s / n_s) / (w_s* / n_s*) — s* keeps 100%, others downsample
# so the OUTPUT proportions match the weights exactly (in expectation).
# Sources not in the mix get weight 0 → dropped (curation selects the
# desired sources). Keys are the testdata corpus's actual source labels
# (src0..src19) — weights naming absent sources make the whole op a
# no-op that still oracle-matches (both engines agree on zeros).
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}

_MIX_CASE = " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items()
)

_SOURCE_MIX_SQL = f"""
WITH weighted AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source,
        CAST(CASE source {_MIX_CASE} ELSE 0.0 END AS DOUBLE) AS w
    FROM documents GROUP BY source
),
bottleneck AS (
    SELECT MAX(w / n_source) AS max_ratio FROM weighted WHERE w > 0
),
rates AS (
    SELECT source, n_source, w,
        CASE WHEN w > 0 THEN (w / n_source) / (SELECT max_ratio FROM bottleneck)
             ELSE 0.0 END AS keep_rate
    FROM weighted
)
SELECT d.source, r.n_source,
    CAST(SUM(CASE WHEN {_draw_sql('d.doc_id')}
                       < CAST(floor({_DRAW_MOD} * r.keep_rate) AS BIGINT)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    round(r.keep_rate, 6) AS keep_rate
FROM documents d JOIN rates r USING (source)
GROUP BY d.source, r.n_source, r.keep_rate
"""


@register("source_mix", sql=_SOURCE_MIX_SQL)
def source_mix(spark, sf_dir):
    """Mix sources to target weights by deterministic downsampling.

    Plan shape: one count aggregate (rows = #sources) → driver-free
    broadcast join back onto the scan → hash-threshold filter. The only
    shuffles move per-source COUNTS; documents flow map-side."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.lit(0.0)
    for s, wt in _MIX_WEIGHTS.items():
        w = F.when(F.col("source") == s, F.lit(float(wt))).otherwise(w)
    weighted = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source")
    ).withColumn("w", w.cast("double"))
    max_ratio = weighted.where(F.col("w") > 0).agg(
        F.max(F.col("w") / F.col("n_source")).alias("max_ratio")
    )
    rates = weighted.crossJoin(F.broadcast(max_ratio)).select(
        "source",
        "n_source",
        F.when(
            F.col("w") > 0, (F.col("w") / F.col("n_source")) / F.col("max_ratio")
        )
        .otherwise(F.lit(0.0))
        .alias("keep_rate"),
    )
    joined = docs.join(F.broadcast(rates), "source")
    kept = F.when(
        _draw(F.col("doc_id"))
        < F.floor(F.lit(_DRAW_MOD) * F.col("keep_rate")).cast("bigint"),
        1,
    ).otherwise(0)
    return (
        joined.select("source", "n_source", "keep_rate", kept.alias("is_kept"))
        .groupBy("source", "n_source", "keep_rate")
        .agg(F.sum("is_kept").cast("bigint").alias("n_kept"))
        .select(
            "source",
            "n_source",
            "n_kept",
            F.round("keep_rate", 6).alias("keep_rate"),
        )
    )


# ------------------------------------------------------- sequence packing
# Greedy first-fit-in-id-order packing into token-budget bins, sharded by
# doc_id % N_SHARDS so each window sort is per-shard. pack_id encodes
# (shard, bin): the bin index is the running token total BEFORE the doc,
# integer-divided by the budget — docs overflow into the next bin exactly
# when the budget would be crossed, matching a streaming packer fed in id
# order.
_PACK_BUDGET = 2048
_N_SHARDS = 32

_TOKENS = "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"

_PACK_SQL = f"""
WITH toks AS (
    SELECT doc_id, doc_id % {_N_SHARDS} AS shard, {_TOKENS} AS n_tokens
    FROM documents
),
packed AS (
    SELECT shard, doc_id, n_tokens,
        -- floor() explicitly: DuckDB CAST(DOUBLE AS BIGINT) ROUNDS while
        -- Spark's cast truncates — without floor the engines split packs
        -- at different boundaries
        CAST(floor((SUM(n_tokens) OVER (
                PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS bin_idx
    FROM toks
)
-- shard << 40: a shard would need 2**40 bins (~2.2e15 tokens/shard at
-- budget 2048) before colliding into the next shard's id space — beyond
-- any single-corpus scale; shard*1e6 collided at ~2G tokens/shard
SELECT CAST(shard * 1099511627776 + bin_idx AS BIGINT) AS pack_id,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
    CAST(MIN(doc_id) AS BIGINT) AS first_doc,
    CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM packed
GROUP BY 1
"""


def pack_by_budget(toks, budget: int = _PACK_BUDGET):
    """Pack a (doc_id, shard, n_tokens) frame into token-budget bins.

    Running sum per shard, bin = floor(preceding_total / budget). One
    shuffle on shard, per-shard linear window — no global sort, scales
    with shards. Shared by pack_sequences (whitespace counts) and
    bpe_queries.bpe_pack_tokens (learned-tokenizer counts)."""
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_idx",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget
        ).cast("bigint"),
    )
    return (
        # pack_id = shard << 40 | bin: collision needs 2**40 bins in one
        # shard (~2.2e15 tokens at budget 2048) — see oracle SQL comment
        packed.groupBy(
            (F.shiftleft(F.col("shard").cast("bigint"), 40) + F.col("bin_idx"))
            .cast("bigint")
            .alias("pack_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register("pack_sequences", sql=_PACK_SQL)
def pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (the pre-tokenization batching pass).

    Whitespace token counts (same spec as textstats.token_count), packed
    by the shared per-shard running-sum window (pack_by_budget)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    return pack_by_budget(toks)


# ------------------------------------------------ packing efficiency card
# The evaluation card for the packing pass: how well do the bins use the
# token budget? Per shard — packs, docs, token mass, overflow beyond the
# budget (the crossing rule lets the straddling doc overshoot), underfill
# of CLOSED packs (the open last bin of each shard is excluded: it is
# still filling), and the integer micro-unit fill ratio. All integers
# derived from the gated pack frame; one extra groupBy on shard plus a
# broadcast join of the per-shard max bin. A fill ratio drifting down
# across corpus versions means doc-length mix changed and the budget or
# shard count needs retuning — the signal this card exists to track.
_PACK_EFF_SQL = f"""
WITH packs AS ({_PACK_SQL}),
parts AS (
    SELECT CAST(pack_id // 1099511627776 AS BIGINT) AS shard,
           CAST(pack_id % 1099511627776 AS BIGINT) AS bin_idx,
           n_docs, total_tokens
    FROM packs
),
last_bin AS (
    SELECT shard, MAX(bin_idx) AS max_bin FROM parts GROUP BY shard
)
SELECT p.shard,
    CAST(COUNT(*) AS BIGINT) AS n_packs,
    CAST(SUM(p.n_docs) AS BIGINT) AS n_docs,
    CAST(SUM(p.total_tokens) AS BIGINT) AS total_tokens,
    CAST(SUM(CASE WHEN p.total_tokens > {_PACK_BUDGET}
             THEN p.total_tokens - {_PACK_BUDGET} ELSE 0 END) AS BIGINT)
        AS overflow_tokens,
    CAST(SUM(CASE WHEN p.bin_idx < l.max_bin
                   AND p.total_tokens < {_PACK_BUDGET}
             THEN {_PACK_BUDGET} - p.total_tokens ELSE 0 END) AS BIGINT)
        AS underfill_closed_tokens,
    CAST((1000000 * SUM(p.total_tokens))
         // (COUNT(*) * {_PACK_BUDGET}) AS BIGINT) AS fill_micro
FROM parts p JOIN last_bin l USING (shard)
GROUP BY p.shard
"""


@register("packing_efficiency_report", sql=_PACK_EFF_SQL)
def packing_efficiency_report(spark, sf_dir):
    """Per-shard packing-efficiency card over the gated pack frame:
    pack/doc/token counts, overflow vs the budget, closed-pack
    underfill, and the micro-unit fill ratio."""
    packs = pack_sequences(spark, sf_dir)
    parts = packs.select(
        F.expr(f"CAST(pack_id DIV {1 << 40} AS BIGINT)").alias("shard"),
        F.expr(f"CAST(pack_id % {1 << 40} AS BIGINT)").alias("bin_idx"),
        "n_docs",
        "total_tokens",
    )
    last = parts.groupBy("shard").agg(F.max("bin_idx").alias("max_bin"))
    b = F.lit(_PACK_BUDGET)
    j = parts.join(F.broadcast(last), "shard")
    return j.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_packs"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("total_tokens").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(
                F.col("total_tokens") > b, F.col("total_tokens") - b
            ).otherwise(0)
        ).cast("bigint").alias("overflow_tokens"),
        F.sum(
            F.when(
                (F.col("bin_idx") < F.col("max_bin"))
                & (F.col("total_tokens") < b),
                b - F.col("total_tokens"),
            ).otherwise(0)
        ).cast("bigint").alias("underfill_closed_tokens"),
        F.expr(
            f"CAST((1000000 * sum(total_tokens))"
            f" DIV (count(*) * {_PACK_BUDGET}) AS BIGINT)"
        ).alias("fill_micro"),
    )


# --------------------------------------------------- temperature-based mix
# Multilingual/LLM-corpus mixing with sampling temperature: target weight
# w_s ∝ n_s^ALPHA (ALPHA < 1 upweights small sources relative to their
# natural frequency — the standard rebalancing for low-resource languages
# and long-tail domains). keep_rate_s = (n_min / n_s)^(1-ALPHA): the
# smallest source keeps 100%, larger sources downsample toward the
# tempered proportions.
#
# ALPHA is fixed at 3/4 so the exponent (1-ALPHA = 1/4) computes as
# sqrt(sqrt(x)) — IEEE sqrt is CORRECTLY ROUNDED and division is exact, so
# the keep rates are bit-identical in Spark and DuckDB. A general pow()
# would not be (libm pow is not correctly rounded; the two engines may use
# different libms), and a 1-ULP rate difference could flip a threshold
# count. Same reasoning as the md5 draw replacing RNG.
_TEMP_ALPHA_NUM, _TEMP_ALPHA_DEN = 3, 4  # documentation; the code uses 1/4

_TEMP_MIX_SQL = f"""
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
    FROM documents GROUP BY source
),
floor_n AS (SELECT MIN(n_source) AS n_min FROM counts),
rates AS (
    SELECT source, n_source,
        sqrt(sqrt(CAST((SELECT n_min FROM floor_n) AS DOUBLE) / n_source))
            AS keep_rate
    FROM counts
)
SELECT d.source, r.n_source,
    CAST(SUM(CASE WHEN {{draw}} < CAST(floor({_DRAW_MOD} * r.keep_rate) AS BIGINT)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
    round(r.keep_rate, 6) AS keep_rate
FROM documents d JOIN rates r USING (source)
GROUP BY d.source, r.n_source, r.keep_rate
""".replace("{draw}", _draw_sql("d.doc_id"))


@register("temperature_mix", sql=_TEMP_MIX_SQL)
def temperature_mix(spark, sf_dir):
    """Temperature-tempered source mix (alpha = 3/4): per-source keep
    counts under keep_rate = (n_min/n_s)^(1/4). Same plan shape as
    source_mix — counts shuffle, documents flow map-side under a
    broadcast-joined rate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_source")
    )
    n_min = counts.agg(F.min("n_source").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_source",
        F.sqrt(F.sqrt(F.col("n_min").cast("double") / F.col("n_source"))).alias(
            "keep_rate"
        ),
    )
    joined = docs.join(F.broadcast(rates), "source")
    kept = F.when(
        _draw(F.col("doc_id"))
        < F.floor(F.lit(_DRAW_MOD) * F.col("keep_rate")).cast("bigint"),
        1,
    ).otherwise(0)
    return (
        joined.select("source", "n_source", "keep_rate", kept.alias("is_kept"))
        .groupBy("source", "n_source", "keep_rate")
        .agg(F.sum("is_kept").cast("bigint").alias("n_kept"))
        .select(
            "source",
            "n_source",
            "n_kept",
            F.round("keep_rate", 6).alias("keep_rate"),
        )
    )


# --------------------------------------------- fixed-size per-group sample
# The complement of rate-based sampling: "exactly N examples per source"
# (eval-set construction, per-domain inspection samples, few-shot pools).
# Membership = the N smallest md5 draws per group — deterministic,
# engine-portable, append-UNstable by design (a fixed-size sample must
# change as the group grows; the rate-based ops above are the
# append-stable family). The rank-N filter compiles to the same map-side
# WindowGroupLimit as latest_event_per_user: each partition forwards at
# most N candidates per group, so the shuffle is O(groups × N ×
# partitions) regardless of corpus size.
_PER_SOURCE_N = 10

_PER_SOURCE_SQL = f"""
SELECT doc_id, source, CAST(rnk AS INT) AS sample_rank
FROM (
    SELECT doc_id, source,
        row_number() OVER (
            PARTITION BY source
            ORDER BY {_draw_sql('doc_id')}, doc_id
        ) AS rnk
    FROM documents
)
WHERE rnk <= {_PER_SOURCE_N}
"""


@register("per_source_sample", sql=_PER_SOURCE_SQL)
def per_source_sample(spark, sf_dir):
    """Exactly {N} docs per source, chosen by smallest md5 draw (ties to
    the lower doc_id) — see the note above."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_draw(F.col("doc_id")), "doc_id")
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= _PER_SOURCE_N)
        .select("doc_id", "source", F.col("sample_rank").cast("int"))
    )


# --------------------------------------------------- weighted sampling
# Deterministic weighted sampling without replacement (Efraimidis-Spirakis
# A-Res): priority = -ln(u) / w with u = (low32(md5(doc_id)) + 1) / 2^32
# in (0, 1] and w = n_chars; keep the N smallest priorities. Char-weighted
# selection is the standard "sample by token mass, not by document count"
# pipeline draw. The md5 draw replaces the RNG (resumable, engine-portable);
# ln() is the only libm call and a selection flip would need two priorities
# within ~1 ulp of each other AND straddling rank N — vanishing for random
# draws; ties after the 6 dp rounding break on doc_id. TakeOrderedAndProject
# keeps the top-N without a global sort (local N per partition -> driver
# merge), the same plan shape pinned for vocab_top50.
_WEIGHTED_N = 100

_WEIGHTED_SQL = f"""
WITH draws AS (
    SELECT doc_id, n_chars,
        (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
            / 4294967296.0 AS u
    FROM documents)
SELECT doc_id, n_chars, round(-ln(u) / n_chars, 6) AS priority
FROM draws
ORDER BY -ln(u) / n_chars ASC, doc_id
LIMIT {_WEIGHTED_N}
"""


@register("weighted_sample", sql=_WEIGHTED_SQL)
def weighted_sample(spark, sf_dir):
    """Top-{N} docs by A-Res weighted-sampling priority (weight = n_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    low32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (low32 + F.lit(1)) / F.lit(4294967296.0)
    priority = -F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            priority.alias("_p"),
            F.round(priority, 6).alias("priority"),
        )
        .orderBy(F.col("_p").asc(), F.col("doc_id").asc())
        .limit(_WEIGHTED_N)
        .drop("_p")
    )


# --------------------------------------------------- token-budgeted mixing
# The dataset-assembly step after curation and before packing: each
# source contributes documents IN ID ORDER until its TOKEN budget is
# exhausted (the "N billion tokens per domain" recipe every pretraining
# mixture spec states). Deterministic greedy: a doc is kept iff the
# running token total BEFORE it is under the budget — the crossing doc
# is kept (it started inside the budget), the same first-fit boundary
# rule pack_by_budget pins. Scale shape: ONE shuffle on source; the
# per-source running sum is a linear window over the source partition;
# the output is source-sized. Append-stability matters here exactly as
# for dataset_split: adding NEW (higher-id) docs can never evict an
# already-kept doc, because the running prefix below any kept id is
# unchanged — the mixture is reproducible across corpus versions.

_MIX_BUDGET = 800

_TOKEN_MIX_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, {_TOKENS} AS n_tokens
    FROM documents
),
running AS (
    SELECT source, doc_id, n_tokens,
        SUM(n_tokens) OVER (
            PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) - n_tokens AS before_total
    FROM toks
)
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
    CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
    CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM running
WHERE before_total < {_MIX_BUDGET}
GROUP BY source
"""


@register("token_budget_mix", sql=_TOKEN_MIX_SQL)
def token_budget_mix(spark, sf_dir):
    """Per-source token-budget mixture report: docs kept in id order
    until each source's budget fills (first-fit crossing rule)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    toks = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = toks.withColumn(
        "before_total", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).where(F.col("before_total") < _MIX_BUDGET)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# ----------------------------------------------- epoch-schedule mixing
# Data-constrained scaling (Muennighoff et al. 2023): when the token
# budget exceeds a source's corpus, REPEAT the source up to a cap
# (~4 epochs, beyond which repeated data stops helping) and fill the
# remainder with a fractional pass. The schedule is pure arithmetic
# over per-source token totals plus the shared first-fit crossing rule
# (token_budget_mix) for the fractional epoch — integer-exact, one
# aggregate + one window over the source partition, no shuffle beyond
# the per-source groupBy. The report is what a training launcher
# consumes: epochs per source, which docs the fractional pass keeps,
# and the budget residual: positive where the 4-epoch cap leaves
# budget unspent, negative where the first-fit crossing rule overshoots
# by (at most) the final document.
_EPOCH_BUDGET = 5000  # per-source token budget (spans 2-4 epochs here)
_MAX_EPOCHS = 4

_EPOCH_MIX_SQL = f"""
WITH toks AS (
    SELECT doc_id, source,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+'))
           END AS n_tokens
    FROM documents
),
srcs AS (
    -- all-empty sources carry no schedulable mass (and would divide by
    -- zero differently per engine) — excluded in BOTH engines
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM toks GROUP BY source
    HAVING SUM(n_tokens) > 0
),
sched AS (
    SELECT source, total_tokens,
           LEAST({_MAX_EPOCHS}, {_EPOCH_BUDGET} // total_tokens)
               AS full_epochs,
           CASE WHEN {_EPOCH_BUDGET} // total_tokens >= {_MAX_EPOCHS}
                THEN 0
                ELSE {_EPOCH_BUDGET} % total_tokens
           END AS frac_budget
    FROM srcs
),
cum AS (
    SELECT t.doc_id, t.source, t.n_tokens,
           SUM(t.n_tokens) OVER (
               PARTITION BY t.source ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - t.n_tokens AS before_total
    FROM toks t
),
frac AS (
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS frac_docs,
           CAST(COALESCE(SUM(c.n_tokens), 0) AS BIGINT) AS frac_tokens
    FROM cum c JOIN sched s USING (source)
    WHERE c.before_total < s.frac_budget
    GROUP BY c.source
)
SELECT s.source,
       s.total_tokens,
       CAST(s.full_epochs AS BIGINT) AS full_epochs,
       CAST(COALESCE(f.frac_docs, 0) AS BIGINT) AS frac_docs,
       CAST(COALESCE(f.frac_tokens, 0) AS BIGINT) AS frac_tokens,
       CAST(s.full_epochs * s.total_tokens
            + COALESCE(f.frac_tokens, 0) AS BIGINT) AS scheduled_tokens,
       CAST({_EPOCH_BUDGET} - s.full_epochs * s.total_tokens
            - COALESCE(f.frac_tokens, 0) AS BIGINT) AS residual_tokens
FROM sched s LEFT JOIN frac f USING (source)
"""


@register("epoch_schedule_mix", sql=_EPOCH_MIX_SQL)
def epoch_schedule_mix(spark, sf_dir):
    """Per-source repetition schedule against a fixed token budget:
    full epochs capped at 4, fractional pass filled doc-id-first (the
    token_budget_mix crossing rule), and the budget residual (positive =
    cap-bound shortfall, negative = the crossing rule overshooting by
    at most one document). Integer-exact throughout."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    toks = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    srcs = (
        toks.groupBy("source")
        .agg(F.sum("n_tokens").cast("bigint").alias("total_tokens"))
        .where(F.col("total_tokens") > 0)
    )
    sched = srcs.select(
        "source",
        "total_tokens",
        F.least(
            F.lit(_MAX_EPOCHS),
            F.expr(f"{_EPOCH_BUDGET} DIV total_tokens"),
        ).alias("full_epochs"),
        F.when(
            F.expr(f"{_EPOCH_BUDGET} DIV total_tokens") >= _MAX_EPOCHS,
            F.lit(0),
        )
        .otherwise(F.expr(f"{_EPOCH_BUDGET} % total_tokens"))
        .alias("frac_budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn(
        "before_total", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    frac = (
        cum.join(F.broadcast(sched.select("source", "frac_budget")), "source")
        .where(F.col("before_total") < F.col("frac_budget"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("frac_docs"),
            F.sum("n_tokens").cast("bigint").alias("frac_tokens"),
        )
    )
    out = sched.join(frac, "source", "left").select(
        "source",
        "total_tokens",
        F.col("full_epochs").cast("bigint").alias("full_epochs"),
        F.coalesce("frac_docs", F.lit(0)).cast("bigint").alias("frac_docs"),
        F.coalesce("frac_tokens", F.lit(0))
        .cast("bigint")
        .alias("frac_tokens"),
    )
    return out.select(
        "source",
        "total_tokens",
        "full_epochs",
        "frac_docs",
        "frac_tokens",
        (F.col("full_epochs") * F.col("total_tokens") + F.col("frac_tokens"))
        .cast("bigint")
        .alias("scheduled_tokens"),
        (
            F.lit(_EPOCH_BUDGET)
            - F.col("full_epochs") * F.col("total_tokens")
            - F.col("frac_tokens")
        )
        .cast("bigint")
        .alias("residual_tokens"),
    )
