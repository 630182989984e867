"""Multimodal featurization as a REGISTERED, oracle-checked catalog entry.

``operators/multimodal.py`` provides the binary-column convention and the
Arrow-batched ``mapInPandas`` featurizer (real decode stubbed — no codec
libs in this environment). This entry drives that exact plumbing end to
end: documents → UTF-8 payload bytes → ``attach_media_columns`` →
``extract_features`` (the deterministic byte-statistics kernel) → exploded
fixed-point feature rows.

It is fully DuckDB-oracle-checkable because the synthetic corpus is pure
ASCII: the payload byte at position i equals the codepoint of character
i+1, so the kernel's per-stride byte means are reproducible in SQL with
``ord(substring(text, i, 1))``. Arithmetic is matched op-for-op
(sum/len → /255.0 → *1e6 → floor; explicit floor — DuckDB's
CAST(DOUBLE AS BIGINT) rounds while Spark's truncates).

Plan shape: scan → encode projection → mapInPandas (Arrow batches,
the only Python stage — this IS the operator under test) → posexplode →
fixed-point projection. One scan, no shuffle; at 100 TB the featurizer
parallelism is the scan partitioning, exactly how a real decoder fleet
would run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators.multimodal import (
    attach_media_columns,
    extract_features,
)
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

_N_FEATURES = 8

_MEDIA_SQL = f"""
WITH chars AS (
    SELECT doc_id, (i - 1) % {_N_FEATURES} AS bucket,
        ord(substring(text, i, 1)) AS byte
    FROM documents, UNNEST(generate_series(1, len(text))) AS u(i)
    -- >= 8 chars so every stride bucket is populated: the kernel pads
    -- empty buckets with 0.0 rows the SQL GROUP BY would not produce
    WHERE len(text) >= 8
)
SELECT doc_id AS media_id,
    CAST(bucket AS INT) AS bucket,
    CAST(floor(AVG(byte) / 255.0 * 1000000) AS BIGINT) AS feat_fp,
    TRUE AS decode_ok
FROM chars
GROUP BY doc_id, bucket
"""


@register("media_featurize", sql=_MEDIA_SQL)
def media_featurize(spark, sf_dir):
    """Byte-statistics features through the real mapInPandas media path,
    exploded to (media_id, bucket, fixed-point feature) rows."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(
        docs.where(F.length("text") >= _N_FEATURES).select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        ),
        payload_col="payload",
        media_type="image/fake",
    )
    feats = extract_features(media, n_features=_N_FEATURES, fake=True)
    return feats.select(
        "media_id",
        F.posexplode("feature").alias("bucket", "feat"),
        "decode_ok",
    ).select(
        "media_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.floor(F.col("feat") * 1_000_000).cast("bigint").alias("feat_fp"),
        "decode_ok",
    )


# ----------------------------------------------------- frame sampling
# Drives operators/multimodal.sample_frames — the 1→N Arrow mapInPandas
# stage (each media row expands to its sampled "frames"). Oracle-checkable
# for the same reason media_featurize is: the ASCII corpus makes payload
# byte k equal the codepoint of character k+1, so frame k's bytes are
# exactly substring(text, k*FB+1, FB) and DuckDB's md5(varchar) equals the
# kernel's md5(bytes).
_FRAME_BYTES = 64
_FRAME_STRIDE = 4

_FRAME_SQL = f"""
WITH frames AS (
    SELECT doc_id,
           (k - 1) AS frame_idx,
           substring(text, (k - 1) * {_FRAME_BYTES} + 1, {_FRAME_BYTES})
               AS chunk
    FROM documents,
         UNNEST(generate_series(
             1, CAST(ceil(len(text) / {_FRAME_BYTES}.0) AS BIGINT))) AS u(k)
    WHERE len(text) >= 1
)
SELECT doc_id AS media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(len(chunk) AS INT) AS frame_len,
       md5(chunk) AS frame_md5
FROM frames
WHERE frame_idx % {_FRAME_STRIDE} = 0
"""


@register("media_frame_sample", sql=_FRAME_SQL)
def media_frame_sample(spark, sf_dir):
    """Every 4th fixed-size frame per media payload through the real
    mapInPandas demux plumbing (fake kernel — see operators/multimodal)."""
    from cargo_chat_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(
        docs.where(F.length("text") >= 1).select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        ),
        payload_col="payload",
        media_type="video/fake",
    )
    return sample_frames(
        media, frame_bytes=_FRAME_BYTES, stride=_FRAME_STRIDE, fake=True
    )


# ------------------------------------------------ frame-level near-dup
# Round-6 composition gate: the 1→N frame demux FEEDING the exact-dedup
# machinery (operators/dedup.exact_dedup — the same md5-groupBy/min-id
# core behind the gated ``dedup_exact``). This proves the multimodal
# demux output composes into the dedup family end to end: duplicate
# video/image frames across assets collapse to one canonical keeper —
# the frame-fingerprint dedup pass a crawl pipeline runs before decode.
#
# Scale shape: demux is mapInPandas on the scan partitioning (no
# shuffle); the dedup groupBy is ONE shuffle on the 128-bit key with
# map-side partial aggregation — identical posture to dedup_exact.
# The (media_id, frame_idx) pair packs into one BIGINT (media_id < 2^31
# by schema, frame_idx < 2^32 — a 2 GiB payload at 64 B/frame stays
# under 2^25) so exact_dedup's MIN(id) keeps the lexicographic-first
# frame, bit-for-bit reproducible in the oracle.
_FRAME_UID = 1 << 32

_FRAME_NEARDUP_SQL = f"""
WITH frames AS (
    SELECT doc_id,
           (k - 1) AS frame_idx,
           substring(text, (k - 1) * {_FRAME_BYTES} + 1, {_FRAME_BYTES})
               AS chunk
    FROM documents,
         UNNEST(generate_series(
             1, CAST(ceil(len(text) / {_FRAME_BYTES}.0) AS BIGINT))) AS u(k)
    WHERE len(text) >= 1
),
sampled AS (
    SELECT doc_id, frame_idx, md5(chunk) AS frame_md5
    FROM frames WHERE frame_idx % {_FRAME_STRIDE} = 0
),
g AS (
    SELECT md5(frame_md5) AS dedup_key,
           MIN(doc_id * {_FRAME_UID} + frame_idx) AS kept,
           COUNT(*) AS group_size
    FROM sampled
    GROUP BY 1
    HAVING COUNT(*) >= 2
)
SELECT dedup_key,
       CAST(kept // {_FRAME_UID} AS BIGINT) AS kept_media,
       CAST(kept % {_FRAME_UID} AS BIGINT) AS kept_frame,
       CAST(group_size AS BIGINT) AS group_size
FROM g
"""


@register("frame_neardup", sql=_FRAME_NEARDUP_SQL)
def frame_neardup(spark, sf_dir):
    """Duplicate-frame groups (size >= 2) across all media assets:
    demuxed frames keyed by content md5 through exact_dedup, keeper =
    lexicographically first (media_id, frame_idx)."""
    from cargo_chat_spark.operators.dedup import exact_dedup
    from cargo_chat_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_media_columns(
        docs.where(F.length("text") >= 1).select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        ),
        payload_col="payload",
        media_type="video/fake",
    )
    frames = sample_frames(
        media, frame_bytes=_FRAME_BYTES, stride=_FRAME_STRIDE, fake=True
    )
    uid = (
        F.col("media_id").cast("bigint") * F.lit(_FRAME_UID)
        + F.col("frame_idx").cast("bigint")
    )
    groups = exact_dedup(
        frames.select(uid.alias("frame_uid"), "frame_md5"),
        key=F.col("frame_md5"),
        id_col="frame_uid",
    )
    return groups.where(F.col("group_size") >= 2).select(
        "dedup_key",
        F.floor(F.col("kept_id") / F.lit(_FRAME_UID))
        .cast("bigint")
        .alias("kept_media"),
        (F.col("kept_id") % F.lit(_FRAME_UID)).cast("bigint").alias("kept_frame"),
        F.col("group_size").cast("bigint").alias("group_size"),
    )
