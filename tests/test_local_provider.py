"""Local in-process model provider (M1/M5 real-model path).

Skips cleanly when sentence-transformers / the model opt-in env var is
absent (this container has neither); runs the full mapInPandas embedding
stage when present — same pattern the reference uses for its ONNX models
(embedding.rs:29-35), exercised here through the identical pipeline code
path the mock provider uses.
"""

from __future__ import annotations

import os

import pytest

from cargo_chat_spark.models import local_st


def test_unavailable_is_a_clean_gate(monkeypatch):
    """Without the env opt-in, construction raises the skip-signal error and
    available() is False — never a crash, never silently mocked."""
    monkeypatch.delenv(local_st.EMBED_MODEL_ENV, raising=False)
    assert local_st.available() is False
    with pytest.raises(local_st.ModelUnavailableError, match=local_st.EMBED_MODEL_ENV):
        local_st.LocalSTProvider()


def test_factory_is_lazy(monkeypatch):
    """The factory must not import/load anything at construction time —
    it is pickled to executors; the model loads per worker task."""
    monkeypatch.delenv(local_st.EMBED_MODEL_ENV, raising=False)
    factory = local_st.local_provider_factory()  # must not raise
    with pytest.raises(local_st.ModelUnavailableError):
        factory()


@pytest.mark.slow
def test_local_provider_end_to_end(spark):
    if not local_st.available():
        pytest.skip(
            f"local model path disabled (needs sentence-transformers + "
            f"${local_st.EMBED_MODEL_ENV})"
        )
    from cargo_chat_spark.plans.indexing import build_index

    files = spark.createDataFrame(
        [
            ("src/a.rs", "fn main() { println!(\"hi\"); }", "rs"),
            ("src/b.py", "def f():\n    return 1\n", "py"),
        ],
        "path string, content string, extension string",
    )
    provider = local_st.LocalSTProvider()
    index = build_index(
        files, local_st.local_provider_factory(), dim=provider.dim
    )
    rows = index.collect()
    assert rows and all(len(r["embedding"]) == provider.dim for r in rows)
    # normalized embeddings: unit L2 norm (embedding.rs:112-129)
    import math

    for r in rows:
        assert abs(math.sqrt(sum(x * x for x in r["embedding"])) - 1.0) < 1e-3

    scores = provider.rerank_scores("rust main function", [r["code"] for r in rows])
    assert len(scores) == len(rows)
