"""ANN evaluation as a first-class, oracle-gated operator.

Every ANN member's recall is pinned in pytest (tests/test_ann_recall.py),
but a production retrieval stack wants recall as DATA — a report the
pipeline can compute per corpus version, alert on, and regress. This
gate computes recall@10 vs the exact kNN for three ladder members
(LSH forest, trained IVF, int8 re-rank) entirely declaratively: the
exact and approximate top-10 sets are the ALREADY-GATED queries, hits
are a per-query semi-join intersection, and the recall is integer
micro-units (floor(1e6·hits/(10·|Q|))) so the whole report value-hashes
across engines. The oracle nests the members' existing DuckDB oracles
verbatim — a change in any member's semantics moves this report too.

Scale shape: each member costs its own (gated) plan plus one broadcast
semi-join against the exact set (|Q|·10 rows, tiny) and a 1-row
aggregate — the report adds no term beyond the members it measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from cargo_chat_spark.functions.localframe import local_frame
from pyspark.sql import functions as F

from cargo_chat_spark.queries.registry import register


def _report_sql() -> str:
    from cargo_chat_spark.queries.ann_lsh import _RP_FOREST_SQL
    from cargo_chat_spark.queries.similarity import _trained_sql
    from cargo_chat_spark.queries.vector_search import _KNN_INT8_SQL, _KNN_SQL

    members = {
        "forest": _RP_FOREST_SQL,
        "int8": _KNN_INT8_SQL,
        "ivf_trained": _trained_sql(),
    }
    parts = []
    for name, sql in sorted(members.items()):
        parts.append(f"""
SELECT '{name}' AS member,
    (SELECT CAST(count(DISTINCT query_id) AS BIGINT) FROM exact)
        AS n_queries,
    (SELECT CAST(count(*) AS BIGINT)
     FROM ({sql}) a
     JOIN exact e ON a.query_id = e.query_id
                 AND a.neighbor_id = e.neighbor_id) AS n_hits""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH exact AS (
    SELECT query_id, neighbor_id FROM ({_KNN_SQL}) x
)
SELECT member, n_queries, n_hits,
    (1000000 * n_hits) // (10 * n_queries) AS recall_micro
FROM ({body})
"""


def _eval_member_frames(spark: SparkSession, sf_dir: str):
    """The four evaluation inputs — the exact top-10 and the three ANN
    members' top-10 — as memo-persisted |Q|·10-row frames (VERDICT r14
    item 6, guide §2.4): both report cards consume the SAME member
    result sets, and a production evaluation harness materializes each
    member's answer set once per index version before grading it. The
    member subtrees are their gated plans verbatim; the memo only cuts
    re-execution within one report row (build phase → probe)."""
    from cargo_chat_spark.caching import memo_persist
    from cargo_chat_spark.queries.ann_lsh import rp_lsh_forest_topk
    from cargo_chat_spark.queries.similarity import ivf_topk_trained
    from cargo_chat_spark.queries.vector_search import (
        knn_exact,
        knn_int8_rerank,
    )

    exact = memo_persist(
        spark, ("ann_eval_exact", sf_dir),
        lambda: knn_exact(spark, sf_dir).select(
            "query_id", "neighbor_id"
        ),
    )
    fns = {
        "forest": rp_lsh_forest_topk,
        "int8": knn_int8_rerank,
        "ivf_trained": ivf_topk_trained,
    }
    members = {
        name: memo_persist(
            spark, (f"ann_eval_{name}", sf_dir),
            lambda fn=fn: fn(spark, sf_dir).select(
                "query_id", "neighbor_id", "rank"
            ),
        )
        for name, fn in fns.items()
    }
    return exact, members


def _eval_members_builder(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the four member answer sets — four INDEPENDENT plans,
    overlapped (guide §2.6) so the build phase back-fills each plan's
    straggler tail with the next member's tasks."""
    from cargo_chat_spark.functions.overlap import spawn_job

    exact, members = _eval_member_frames(spark, sf_dir)
    jobs = [
        spawn_job(lambda d=d: d.count())
        for d in [exact, *members.values()]
    ]
    for j in jobs:
        j.join()


@register("ann_recall_report", sql=_report_sql())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 vs exact kNN for three ANN ladder members, as one
    value-hashed report row per member — evaluation-as-data for the
    retrieval stack. Fully declarative: no collect anywhere; each
    member's plan is its gated form, hits come from a semi-join against
    the exact top-10 set, recall is exact integer micro-units."""
    # r14 checkpointed the exact frame (it feeds every member's
    # semi-join plus the n_queries aggregate — 4× re-execution without
    # it); r15 lifts ALL FOUR member answer sets into memo-persisted
    # frames shared with ann_rank_metrics_report (guide §2.4).
    exact, members = _eval_member_frames(spark, sf_dir)
    nq = exact.agg(
        F.count_distinct("query_id").cast("bigint").alias("n_queries")
    )
    parts = []
    for name in sorted(members):
        approx = members[name].select("query_id", "neighbor_id")
        hits = approx.join(
            exact, ["query_id", "neighbor_id"], "semi"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        parts.append(
            hits.crossJoin(F.broadcast(nq)).select(
                F.lit(name).alias("member"), "n_queries", "n_hits"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "member",
        "n_queries",
        "n_hits",
        F.expr("(1000000 * n_hits) DIV (10 * n_queries)").alias(
            "recall_micro"
        ),
    )


# ------------------------------------------------- LSH precision report
# The dedup family's evaluation-as-data member: how good are the banded
# MinHash candidates, as a DATA product — exact shingle-set Jaccard
# (the ngram_jaccard_pairs machinery) computed for every LSH candidate
# pair, bucketed into exact integer deciles ((10·|A∩B|) // |A∪B| — the
# division never leaves the integer domain, so the histogram
# value-hashes), one row per occupied decile. A pipeline alerts when
# the low-decile mass grows (bands too permissive for the corpus) the
# same way it alerts on ann_recall_report.


def _lsh_precision_sql() -> str:
    from cargo_chat_spark.queries.dedup import _BANDS_CTE

    return f"""
WITH {_BANDS_CTE},
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
    WHERE a.doc_id < b.doc_id
),
hs AS (
    -- list_distinct: h holds distinct shingles but h32 collisions can
    -- duplicate hash VALUES; pure set semantics on both engines.
    SELECT doc_id, list_sort(list_distinct(h)) AS s FROM hashes
),
scored AS (
    SELECT
        len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS inter,
        len(sa.s) + len(sb.s)
            - len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS uni
    FROM pairs p
    JOIN hs sa ON sa.doc_id = p.doc_a
    JOIN hs sb ON sb.doc_id = p.doc_b
)
SELECT CAST((10 * inter) // uni AS INT) AS jaccard_decile,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM scored
GROUP BY 1
"""


@register("lsh_precision_report", sql=_lsh_precision_sql())
def lsh_precision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard decile histogram of the MinHash-LSH candidate
    pairs — candidate quality as a value-hashed report. Cost: the gated
    LSH pair join + two hash-array lookups per candidate pair (never
    all-pairs) + a decile-sized aggregate."""
    from cargo_chat_spark.queries.dedup import (
        _sorted_hashes_df,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(spark, sf_dir)
    hs = _sorted_hashes_df(spark, sf_dir)
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        pairs.join(
            hs.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")),
            "doc_a",
        )
        .join(
            hs.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")),
            "doc_b",
        )
        .select(inter.alias("inter"), union.alias("uni"))
        .select(
            F.expr("CAST((10 * inter) DIV uni AS INT)").alias(
                "jaccard_decile"
            )
        )
        .groupBy("jaccard_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# ---------------------------------------------- BPE compression report
# The tokenizer family's evaluation-as-data member: corpus compression
# (chars per token) at 0, 3, and all learned merges — the curve a
# tokenizer team watches per corpus version. Totals are exact integers
# (Σ freq·n_tokens over the dict frame), the ratio is integer
# micro-units, and the oracle reads the token counts straight out of
# the trainer oracle's unrolled s0/s3/s6 symbolization states — so the
# report is pinned to the same iteration contract as the trainer gate.


def _bpe_compression_sql() -> str:
    from cargo_chat_spark.queries.bpe_queries import N_MERGES, _unrolled_chain

    ks = [0, N_MERGES // 2, N_MERGES]
    parts = [
        f"""
SELECT {k} AS n_merges,
    (SELECT CAST(SUM(freq * len(string_split(trim(s), '  '))) AS BIGINT)
     FROM s{k}) AS total_tokens"""
        for k in ks
    ]
    body = "\nUNION ALL\n".join(parts)
    return f"""{_unrolled_chain(N_MERGES)},
chars AS (SELECT CAST(SUM(freq * length(word)) AS BIGINT) AS total_chars
          FROM wf)
SELECT n_merges, total_tokens,
    (SELECT total_chars FROM chars) AS total_chars,
    (1000000 * (SELECT total_chars FROM chars)) // total_tokens
        AS chars_per_token_micro
FROM ({body})
"""


@register("bpe_compression_report", sql=_bpe_compression_sql())
def bpe_compression_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chars-per-token at 0 / half / all learned merges — the
    tokenizer compression curve as a value-hashed report. Encoding runs
    over the VOCABULARY frame (|unique words| Arrow rows, never corpus
    tokens), weighted by dict frequency."""
    from cargo_chat_spark.operators.bpe import encode_words
    from cargo_chat_spark.queries.bpe_queries import N_MERGES, _trained

    wf, merges = _trained(spark, sf_dir)
    ks = [0, N_MERGES // 2, N_MERGES]
    parts = []
    for k in ks:
        enc = encode_words(wf, merges[:k])
        parts.append(
            enc.agg(
                F.sum(F.col("freq") * F.size("tokens"))
                .cast("bigint")
                .alias("total_tokens")
            ).select(F.lit(k).alias("n_merges"), "total_tokens")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    chars = wf.agg(
        F.sum(F.col("freq") * F.length("word")).cast("bigint").alias(
            "total_chars"
        )
    )
    return out.crossJoin(F.broadcast(chars)).select(
        "n_merges",
        "total_tokens",
        "total_chars",
        F.expr("(1000000 * total_chars) DIV total_tokens").alias(
            "chars_per_token_micro"
        ),
    )


# ---------------------------------------------- corpus drift via CDC
# Version-over-version corpus drift as data — per-source document and
# token deltas between two snapshot versions, computed ONLY from the
# signed file-diff delta (snap_file_deltas): O(changed files +
# DV-touched files), never a rescan of either version. Reuses the
# wordfreq gate's snapshot lifecycle fixture (write → MERGE with text
# edits + re-keyed inserts → MoR delete overlapping the update set), so
# the delta path exercised includes the DV-only commit. The oracle
# restates v2 − v0 relationally per source, anchored on the v0 source
# list so both engines emit every source (zero deltas included).

_DRIFT_NTOK = (
    "len(list_filter(string_split_regex(text, ' +'), w -> length(w) > 0))"
)

_DRIFT_SQL = f"""
WITH final AS (
  SELECT source,
         CASE WHEN doc_id % 10 = 3 THEN text || ' extrawordx'
              ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 4 AND doc_id % 20 <> 3
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id % 10 = 7
),
fc AS (
  SELECT source, CAST(count(*) AS BIGINT) AS d,
         CAST(SUM({_DRIFT_NTOK}) AS BIGINT) AS t
  FROM final GROUP BY source
),
ic AS (
  SELECT source, CAST(count(*) AS BIGINT) AS d,
         CAST(SUM({_DRIFT_NTOK}) AS BIGINT) AS t
  FROM documents GROUP BY source
)
SELECT s.source,
       COALESCE(fc.d, 0) - COALESCE(ic.d, 0) AS docs_delta,
       COALESCE(fc.t, 0) - COALESCE(ic.t, 0) AS tokens_delta
FROM (SELECT DISTINCT source FROM documents) s
LEFT JOIN fc ON fc.source = s.source
LEFT JOIN ic ON ic.source = s.source
"""


@register("corpus_drift_cdc_report", sql=_DRIFT_SQL)
def corpus_drift_cdc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (docs_delta, tokens_delta) across the snapshot
    lifecycle, folded from the signed delta alone. At 100 TB this is
    the between-versions drift card a pipeline publishes per commit —
    its cost is the change feed, not the corpus."""
    from cargo_chat_spark.queries.bpe_queries import _wf_snapshot_fixture
    from cargo_chat_spark.sources.snapshots import snap_file_deltas, snap_read

    path = _wf_snapshot_fixture(spark, sf_dir)
    ntok = F.size(
        F.filter(F.split(F.col("text"), " +"), lambda w: F.length(w) > 0)
    )
    delta = snap_file_deltas(spark, path, 0, 2).select(
        "source",
        F.col("sgn").cast("bigint").alias("sgn"),
        ntok.cast("bigint").alias("ntok"),
    )
    agg = delta.groupBy("source").agg(
        F.sum("sgn").alias("docs_delta"),
        F.sum(F.col("sgn") * F.col("ntok")).alias("tokens_delta"),
    )
    sources = snap_read(spark, path, 0).select("source").distinct()
    return sources.join(agg, "source", "left").select(
        "source",
        F.coalesce("docs_delta", F.lit(0)).cast("bigint").alias("docs_delta"),
        F.coalesce("tokens_delta", F.lit(0)).cast("bigint").alias(
            "tokens_delta"
        ),
    )


# ------------------------------------------- embedding drift via CDC
# The vector-modality member of the drift family: per-IVF-cell vector
# count deltas between two snapshot versions of the embedding table,
# folded from the signed CDC delta alone (O(changed files)). Runs on
# the ivf_topk_cdc_synced lifecycle fixture (MERGE-negate — the
# hardest case, every updated vector changes cells — then a CoW
# delete), so the report shows real cross-cell movement. An
# embedding-space shift between corpus versions surfaces here before
# it degrades retrieval: cells filling/emptying is the cheap,
# value-hashable proxy for distribution drift.


def _emb_drift_sql() -> str:
    from cargo_chat_spark.queries.similarity import _cent_values_sql
    from cargo_chat_spark.queries.vector_search import _SQ

    def assign(src: str) -> str:
        return f"""
    SELECT cell_id, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT b.vec_id, a.cell_id,
            row_number() OVER (
                PARTITION BY b.vec_id
                ORDER BY sqrt({_SQ.format(a="a.cvec", b="b.embedding")}),
                         a.cell_id
            ) AS cr
        FROM ({src}) b CROSS JOIN centroids a
    ) WHERE cr = 1 GROUP BY cell_id"""

    final_src = """SELECT vec_id,
        CASE WHEN vec_id % 10 = 3
             THEN list_transform(embedding, x -> -x)
             ELSE embedding END AS embedding
    FROM embeddings WHERE vec_id % 10 <> 7"""
    init_src = "SELECT vec_id, embedding FROM embeddings"
    return f"""
WITH centroids AS (
    SELECT * FROM (VALUES {_cent_values_sql()}) AS t(cell_id, cvec)
),
fa AS ({assign(final_src)}),
ia AS ({assign(init_src)})
SELECT c.cell_id,
    COALESCE(fa.n, 0) - COALESCE(ia.n, 0) AS vecs_delta
FROM (SELECT cell_id FROM centroids) c
LEFT JOIN fa ON fa.cell_id = c.cell_id
LEFT JOIN ia ON ia.cell_id = c.cell_id
"""


@register("embedding_drift_cdc_report", sql=_emb_drift_sql())
def embedding_drift_cdc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell (vecs_delta) across the vector snapshot lifecycle,
    folded from the signed delta: delta rows hard-assign with the
    frozen trained centroids (the same kernel the IVF gates pin), then
    one cell-sized signed aggregate, anchored on the full cell list so
    both engines emit every cell."""
    from cargo_chat_spark.functions import vectors
    from cargo_chat_spark.operators import kmeans
    from cargo_chat_spark.queries._ivf_centroids import TRAINED_CENTROIDS
    from cargo_chat_spark.queries.vector_search import _ann_cdc_table
    from cargo_chat_spark.sources.snapshots import snap_file_deltas

    tbl = _ann_cdc_table(spark, sf_dir)
    delta = snap_file_deltas(spark, tbl, 0, 2)
    dim = vectors.infer_dim(delta, "embedding")
    assigned = kmeans.assign_cells(
        delta.select("embedding", F.col("sgn").cast("bigint").alias("sgn")),
        TRAINED_CENTROIDS,
        dim=dim,
    )
    agg = assigned.groupBy("cell_id").agg(
        F.sum("sgn").alias("vecs_delta")
    )
    cells = local_frame(spark, 
        [(i,) for i in range(len(TRAINED_CENTROIDS))], "cell_id int"
    )
    return cells.join(agg, "cell_id", "left").select(
        "cell_id",
        F.coalesce("vecs_delta", F.lit(0)).cast("bigint").alias(
            "vecs_delta"
        ),
    )


# --------------------------------------------- ANN rank-quality metrics
# ann_recall_report grades set membership; a retrieval stack also wants
# POSITION quality — did the approximate member put the true neighbors
# first? MRR and NDCG@10 (binary relevance = membership in the exact
# top-10) computed entirely in the integer domain so the report
# value-hashes: per-query reciprocal rank is 1_000_000 // first_hit_rank
# (integer division), the NDCG position discounts floor(1e6 / log2(r+1))
# are materialized ONCE in Python below and rendered as identical
# integer literals into BOTH engines (log2 at query time would ride each
# engine's libm and risk a boundary flip), and every mean is an integer
# sum followed by one integer division. Zero-hit queries count in the
# denominators (LEFT join from the exact query list).
#
# Scale shape: identical to ann_recall_report — each member costs its
# own gated plan; the metrics add one |Q|·10-row join and a per-query
# aggregate. Nothing here grows faster than the members being measured.

import math as _math

_NDCG_DISCOUNT_MICRO: dict[int, int] = {
    r: _math.floor(1_000_000 / _math.log2(r + 1)) for r in range(1, 11)
}
_IDCG_MICRO = sum(_NDCG_DISCOUNT_MICRO.values())


def _rank_metrics_sql() -> str:
    from cargo_chat_spark.queries.ann_lsh import _RP_FOREST_SQL
    from cargo_chat_spark.queries.similarity import _trained_sql
    from cargo_chat_spark.queries.vector_search import _KNN_INT8_SQL, _KNN_SQL

    disc_case = " ".join(
        f'WHEN {r} THEN {m}' for r, m in sorted(_NDCG_DISCOUNT_MICRO.items())
    )
    members = {
        "forest": _RP_FOREST_SQL,
        "int8": _KNN_INT8_SQL,
        "ivf_trained": _trained_sql(),
    }
    parts = []
    for name, sql in sorted(members.items()):
        parts.append(f"""
SELECT '{name}' AS member, qm.query_id,
    COALESCE(h.n_hits, 0) AS n_hits,
    COALESCE(h.rr_micro, 0) AS rr_micro,
    (1000000 * COALESCE(h.dcg_micro, 0)) // {_IDCG_MICRO} AS ndcg_micro,
    CASE WHEN COALESCE(h.first_rank, 0) = 1 THEN 1 ELSE 0 END AS hit1
FROM (SELECT DISTINCT query_id FROM exact) qm
LEFT JOIN (
    SELECT a.query_id,
        count(*) AS n_hits,
        min(a."rank") AS first_rank,
        1000000 // min(a."rank") AS rr_micro,
        SUM(CASE a."rank" {disc_case} ELSE 0 END) AS dcg_micro
    FROM ({sql}) a
    JOIN exact e ON a.query_id = e.query_id
                AND a.neighbor_id = e.neighbor_id
    GROUP BY a.query_id
) h ON h.query_id = qm.query_id""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH exact AS (
    SELECT query_id, neighbor_id FROM ({_KNN_SQL}) x
)
SELECT member,
    CAST(count(*) AS BIGINT) AS n_queries,
    CAST(SUM(n_hits) AS BIGINT) AS n_hits,
    CAST(SUM(hit1) AS BIGINT) AS hits_at_1,
    CAST(SUM(rr_micro) // count(*) AS BIGINT) AS mrr_micro,
    CAST(SUM(ndcg_micro) // count(*) AS BIGINT) AS ndcg10_micro
FROM ({body})
GROUP BY member
"""


@register("ann_rank_metrics_report", sql=_rank_metrics_sql())
def ann_rank_metrics_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and NDCG@10 (binary relevance vs the exact kNN top-10) for
    three ANN ladder members, one value-hashed row per member — the
    position-quality companion to ann_recall_report. All metric math is
    integer (micro-units, hardcoded discount table shared with the
    oracle); zero-hit queries stay in the denominator."""
    # same shared member answer sets as ann_recall_report (r15,
    # guide §2.4): the exact frame feeds 3 member joins + the query
    # spine, the member frames are graded verbatim.
    exact, members = _eval_member_frames(spark, sf_dir)
    qids = exact.select("query_id").distinct()
    disc = F.create_map(
        *[
            F.lit(x)
            for rm in sorted(_NDCG_DISCOUNT_MICRO.items())
            for x in rm
        ]
    )
    parts = []
    for name in sorted(members):
        approx = members[name].select("query_id", "neighbor_id", "rank")
        hits = (
            approx.join(exact, ["query_id", "neighbor_id"], "inner")
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("n_hits"),
                F.min("rank").alias("first_rank"),
                F.sum(
                    F.coalesce(disc[F.col("rank")], F.lit(0))
                ).alias("dcg_micro"),
            )
        )
        perq = qids.join(hits, "query_id", "left").select(
            F.lit(name).alias("member"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce(
                F.expr("1000000 DIV first_rank"), F.lit(0)
            ).alias("rr_micro"),
            F.expr(
                f"(1000000 * COALESCE(dcg_micro, 0)) DIV {_IDCG_MICRO}"
            ).alias("ndcg_micro"),
            F.when(F.col("first_rank") == 1, 1).otherwise(0).alias("hit1"),
        )
        parts.append(perq)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("member").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("n_hits").cast("bigint").alias("n_hits"),
        F.sum("hit1").cast("bigint").alias("hits_at_1"),
        F.expr("CAST(SUM(rr_micro) DIV count(1) AS BIGINT)").alias(
            "mrr_micro"
        ),
        F.expr("CAST(SUM(ndcg_micro) DIV count(1) AS BIGINT)").alias(
            "ndcg10_micro"
        ),
    )


# ----------------------------------------------- label purity @ 10
# The semantic-quality card the embedding table's labels afford: for
# each label, how often do a query's exact top-10 neighbors share its
# label? (kNN-classifier accuracy = retrieval semantic coherence —
# the readout a pipeline tracks across embedding-model versions, next
# to ann_recall_report's ladder-fidelity and ann_rank_metrics_report's
# position quality.) Pure integers: per-query purity is hits*1e5 over
# 10 (exact), per-label mean is an integer sum // count.

def _label_purity_sql() -> str:
    from cargo_chat_spark.queries.vector_search import _KNN_SQL

    return f"""
WITH knn AS (SELECT query_id, neighbor_id FROM ({_KNN_SQL}) x),
lab AS (SELECT vec_id, label FROM embeddings),
perq AS (
    SELECT k.query_id, ql.label,
        CAST(SUM(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_same
    FROM knn k
    JOIN lab ql ON ql.vec_id = k.query_id
    JOIN lab nl ON nl.vec_id = k.neighbor_id
    GROUP BY k.query_id, ql.label
)
SELECT label,
    CAST(count(*) AS BIGINT) AS n_queries,
    CAST(SUM(n_same) AS BIGINT) AS n_same_label,
    CAST((100000 * SUM(n_same)) // (10 * count(*)) AS BIGINT)
        AS purity_micro
FROM perq
GROUP BY label
"""


@register("knn_label_purity_report", sql=_label_purity_sql())
def knn_label_purity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label purity@10 of the exact kNN (share of top-10 neighbors
    carrying the query's label), integer micro-units — the
    embedding-space coherence card. Cost: the gated kNN plan + two
    broadcast label joins + a label-sized aggregate."""
    from cargo_chat_spark.queries.vector_search import knn_exact
    from cargo_chat_spark.sources.testdata import load_table

    knn = knn_exact(spark, sf_dir).select("query_id", "neighbor_id")
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    perq = (
        knn.join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("qlabel"),
                )
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                (F.col("nlabel") == F.col("qlabel")).cast("long")
            ).cast("bigint").alias("n_same")
        )
    )
    return perq.groupBy(F.col("qlabel").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("n_same").cast("bigint").alias("n_same_label"),
        F.expr("(100000 * SUM(n_same)) DIV (10 * count(1))").alias(
            "purity_micro"
        ),
    )


# ---------------------------------------------- LSH band-setting sweep
# The tuning card behind the (bands × rows) choice: the SAME 16-perm
# minhash signature re-banded at three settings — production (4,4),
# looser (8,2), stricter (2,8) — each with the hot-bucket cap, each
# scored against EXACT Jaccard (true pair := J ≥ 0.5, the integer test
# 2·|∩| ≥ |∪| — no division). The s-curve midpoint (1/b)^(1/r) is
# precomputed in Python and rendered as the same literal into both
# engines (micro-units), so the card shows threshold vs realized
# precision side by side. This is how a pipeline PICKS band settings
# before a 100 TB dedup run: candidates scale with looseness, the cap
# bounds any degenerate bucket, and the exact-Jaccard scoring touches
# only candidate pairs, never all-pairs.
_SWEEP_SETTINGS = [(4, 4), (8, 2), (2, 8)]  # b*r <= 16 perms


def _sweep_threshold_micro(b: int, r: int) -> int:
    return round((1.0 / b) ** (1.0 / r) * 1_000_000)


def _band_sweep_sql() -> str:
    from cargo_chat_spark.operators import dedup as D
    from cargo_chat_spark.queries.dedup import _SIGS_CTE

    per = []
    for b, r in _SWEEP_SETTINGS:
        tag = f"b{b}r{r}"
        per.append(f"""
bands_{tag} AS (
    SELECT doc_id, band, key FROM (
        SELECT doc_id, s.band,
               array_to_string(list_transform(
                   list_slice(mh, s.band * {r} + 1, (s.band + 1) * {r}),
                   x -> CAST(x AS VARCHAR)), '_') AS key
        FROM sigs, (
            SELECT unnest(generate_series(0, {b - 1})) AS band
        ) s
    )
    QUALIFY row_number() OVER (
        PARTITION BY band, key ORDER BY doc_id
    ) <= {D.BUCKET_CAP}
),
scored_{tag} AS (
    SELECT len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS inter,
           len(sa.s) + len(sb.s)
               - len(list_filter(sa.s, x -> list_contains(sb.s, x))) AS uni
    FROM (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_{tag} a JOIN bands_{tag} b
          ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id
    ) p
    JOIN hs sa ON sa.doc_id = p.doc_a
    JOIN hs sb ON sb.doc_id = p.doc_b
)""")
    selects = []
    for b, r in _SWEEP_SETTINGS:
        tag = f"b{b}r{r}"
        selects.append(f"""
SELECT '{tag}' AS setting,
    CAST({b} AS INT) AS bands, CAST({r} AS INT) AS rows_per_band,
    CAST({_sweep_threshold_micro(b, r)} AS BIGINT) AS threshold_micro,
    CAST(COUNT(*) AS BIGINT) AS n_candidates,
    CAST(COALESCE(SUM(CASE WHEN 2 * inter >= uni THEN 1 END), 0)
         AS BIGINT) AS n_true,
    CAST(CASE WHEN COUNT(*) = 0 THEN 0
         ELSE (1000000 * COALESCE(SUM(
                  CASE WHEN 2 * inter >= uni THEN 1 END), 0)) // COUNT(*)
         END AS BIGINT) AS precision_micro
FROM scored_{tag}""")
    return (
        f"WITH {_SIGS_CTE},\n"
        "hs AS (SELECT doc_id, list_sort(list_distinct(h)) AS s"
        " FROM hashes),"
        + ",".join(per)
        + "\nUNION ALL".join(selects)
    )


@register("lsh_band_sweep_report", sql=_band_sweep_sql())
def lsh_band_sweep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (bands, rows) setting: candidate count, true-pair
    count (exact Jaccard ≥ 0.5 over the candidates only), realized
    precision, and the setting's theoretical s-curve midpoint."""
    from cargo_chat_spark.operators import dedup as D
    from cargo_chat_spark.queries.dedup import (
        _memo_persist,
        _sigs_df,
        _sorted_hashes_df,
    )

    from cargo_chat_spark.functions.localframe import local_frame

    sigs = _memo_persist(
        spark, ("sweep_sigs", sf_dir), lambda: _sigs_df(spark, sf_dir)
    )
    hs = _sorted_hashes_df(spark, sf_dir)
    # r15 (guide §2.4, §1.1): ONE tagged plan instead of three. The old
    # form built a separate band/cap/self-join/score/agg plan per
    # setting — 6 signature scans (the self-join consumes bands twice),
    # 3 cap windows, 3 pair shuffles, 3 hs join pairs. All three
    # settings' band keys now explode from one signature scan with a
    # setting tag folded into the bucket key, so the cap window, the
    # candidate self-join, the distinct, and the exact-Jaccard scoring
    # each run ONCE over the tagged union. Per-setting semantics are
    # exact: the tag is part of the bucket key (cap and join never mix
    # settings) and of the pair-distinct key.
    def _tag_entries(tag):
        def f(e):
            return F.struct(
                F.lit(tag).alias("tag"),
                e["band"].alias("band"),
                e["key"].alias("key"),
            )

        return f

    tagged = F.flatten(
        F.array(
            *[
                F.transform(
                    D.band_keys(F.col("mh"), b, r),
                    _tag_entries(f"b{b}r{r}"),
                )
                for b, r in _SWEEP_SETTINGS
            ]
        )
    )
    bands = (
        sigs.select("doc_id", F.explode(tagged).alias("bk"))
        .select(
            "doc_id",
            F.col("bk.tag").alias("tag"),
            F.col("bk.band").alias("band"),
            # composite bucket key: cap_hot_buckets partitions on
            # (band, key), so the tag folds into the key to keep every
            # bucket setting-local
            F.concat_ws("\x1f", "bk.tag", "bk.key").alias("key"),
        )
    )
    bands = D.cap_hot_buckets(bands)
    a = bands.select(F.col("doc_id").alias("doc_a"), "tag", "band", "key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    pairs = (
        a.join(bb, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("tag", "doc_a", "doc_b")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    uni = F.size("sa") + F.size("sb") - inter
    scored = (
        pairs.join(
            hs.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")),
            "doc_a",
        )
        .join(
            hs.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")),
            "doc_b",
        )
        .select("tag", inter.alias("inter"), uni.alias("uni"))
    )
    agg = scored.groupBy("tag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(2 * F.col("inter") >= F.col("uni"), 1)),
            F.lit(0),
        ).cast("bigint").alias("n_true"),
    )
    # a setting with zero candidates has no group row — the left join
    # onto the literal settings frame restores the old per-setting agg's
    # (0, 0, 0) row
    base = local_frame(
        spark,
        [
            (f"b{b}r{r}", b, r, _sweep_threshold_micro(b, r))
            for b, r in _SWEEP_SETTINGS
        ],
        "tag string, bands int, rows_per_band int, threshold_micro bigint",
    )
    return base.join(agg, "tag", "left").select(
        F.col("tag").alias("setting"),
        "bands",
        "rows_per_band",
        "threshold_micro",
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
            "n_candidates"
        ),
        F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
        F.when(
            F.coalesce("n_candidates", F.lit(0)) == 0, F.lit(0)
        )
        .otherwise(F.expr("(1000000 * n_true) DIV n_candidates"))
        .cast("bigint")
        .alias("precision_micro"),
    )


def _sweep_builder(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the sweep's once-per-corpus artifacts (signature
    frame + sorted-hash sets) so the bench probe axis measures the
    re-band + candidate scoring, not the shared MinHash build."""
    from cargo_chat_spark.queries.dedup import (
        _memo_persist,
        _sigs_df,
        _sorted_hashes_df,
    )

    _memo_persist(
        spark, ("sweep_sigs", sf_dir), lambda: _sigs_df(spark, sf_dir)
    ).count()
    _sorted_hashes_df(spark, sf_dir).count()


from cargo_chat_spark.queries.registry import (  # noqa: E402
    register_phase_builder as _rpb,
)

_rpb("lsh_band_sweep_report", _sweep_builder)
# the two ANN evaluation cards share the four member answer sets as
# their build phase (VERDICT r14 item 6; the probes grade cached
# |Q|·10-row frames)
_rpb("ann_recall_report", _eval_members_builder)
_rpb("ann_rank_metrics_report", _eval_members_builder)


def _emb_drift_builder(spark: SparkSession, sf_dir: str) -> None:
    """The vector snapshot LIFECYCLE (write → MERGE-negate → CoW
    delete) is the once-per-corpus-version fixture; the drift report's
    steady-state cost is the delta assign + one cell-sized aggregate.
    Phase-split so the bench probe axis measures the fold, not the
    commits (the wordfreq_cdc_dict discipline)."""
    from cargo_chat_spark.queries.vector_search import _ann_cdc_table

    _ann_cdc_table(spark, sf_dir)


_rpb("embedding_drift_cdc_report", _emb_drift_builder)


def _drift_report_builder(spark: SparkSession, sf_dir: str) -> None:
    """Same split for the corpus-volume drift card: the documents
    snapshot lifecycle is the build, the signed-delta fold the probe."""
    from cargo_chat_spark.queries.bpe_queries import _wf_snapshot_fixture

    _wf_snapshot_fixture(spark, sf_dir)


_rpb("corpus_drift_cdc_report", _drift_report_builder)
