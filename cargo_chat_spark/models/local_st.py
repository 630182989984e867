"""In-process local model provider (SURVEY §2.8 M1/M5 real-model path).

The reference embeds with local ONNX models — Jina code embeddings at 512-d
or Qwen3 at 1024-d (/root/reference/src/embedding.rs:29-35) — and reranks
with a local cross-encoder (/root/reference/src/rerank.rs:7-19). This is the
Spark-side analog: sentence-transformers (or any model exposing
``encode``/``predict``) loaded ONCE PER PYTHON WORKER inside the same
Arrow-batched ``mapInPandas`` stages the mock provider uses, so swapping
mock → real model changes zero pipeline code.

Strictly env-gated and import-light:

- nothing imports torch/sentence_transformers at module import time;
- construction raises ``ModelUnavailableError`` unless the library is
  installed AND ``CARGO_CHAT_LOCAL_EMBED_MODEL`` names a model;
- never on the oracle path (SURVEY §7 build rule 6) — oracles only ever see
  the deterministic mock.

Classify/HyDE/answer (M3/M4/M6) delegate to the mock: the reference routes
those through chat models, not the local encoders (hyde.rs:350-466).
"""

from __future__ import annotations

import os

from cargo_chat_spark.models.mock import MockProvider

EMBED_MODEL_ENV = "CARGO_CHAT_LOCAL_EMBED_MODEL"
RERANK_MODEL_ENV = "CARGO_CHAT_LOCAL_RERANK_MODEL"

# The reference's model-name → dim table (embedding.rs:29-35).
KNOWN_DIMS = {
    "jinaai/jina-embeddings-v2-base-code": 512,
    "Qwen/Qwen3-Embedding-0.6B": 1024,
}


class ModelUnavailableError(RuntimeError):
    """Raised when the local-model path is requested but not available —
    callers (and tests) treat this as 'skip', never as a failure."""


def _import_sentence_transformers():
    try:
        import sentence_transformers  # noqa: F401

        return sentence_transformers
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ModelUnavailableError(
            "sentence-transformers is not installed in this environment"
        ) from e


class LocalSTProvider(MockProvider):
    """M1 embed + M5 rerank on in-process models; M3/M4/M6 stay mocked.

    ``embed_batch`` normalizes to unit vectors to match the reference's
    cosine-ready embeddings (embedding.rs:112-129 normalizes on encode).
    """

    def __init__(
        self,
        embed_model: str | None = None,
        rerank_model: str | None = None,
        dim: int | None = None,
    ):
        embed_model = embed_model or os.environ.get(EMBED_MODEL_ENV)
        if not embed_model:
            raise ModelUnavailableError(
                f"set ${EMBED_MODEL_ENV} to enable the local-model provider"
            )
        st = _import_sentence_transformers()
        self._embedder = st.SentenceTransformer(embed_model)
        inferred = self._embedder.get_sentence_embedding_dimension()
        super().__init__(dim=dim or inferred or KNOWN_DIMS.get(embed_model, 512))
        rerank_model = rerank_model or os.environ.get(RERANK_MODEL_ENV)
        self._reranker = (
            st.CrossEncoder(rerank_model) if rerank_model else None
        )

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        vecs = self._embedder.encode(
            texts, normalize_embeddings=True, show_progress_bar=False
        )
        return [[float(x) for x in v] for v in vecs]

    def rerank_scores(self, query: str, docs: list[str]) -> list[float]:
        if self._reranker is None:
            return super().rerank_scores(query, docs)  # deterministic mock
        scores = self._reranker.predict([(query, d) for d in docs])
        return [float(s) for s in scores]


def local_provider_factory(
    embed_model: str | None = None,
    rerank_model: str | None = None,
    dim: int | None = None,
):
    """Picklable factory for ``plans.indexing.embed_chunks`` /
    ``plans.retrieval`` mapInPandas stages — the model loads once per Python
    worker task, not per batch (the per-executor-singleton pattern,
    SURVEY §4). Usage::

        index = build_index(files, local_provider_factory(), dim=512)
    """

    def factory() -> LocalSTProvider:
        return LocalSTProvider(
            embed_model=embed_model, rerank_model=rerank_model, dim=dim
        )

    return factory


def available() -> bool:
    """True iff the env opts in AND the library imports."""
    if not os.environ.get(EMBED_MODEL_ENV):
        return False
    try:
        _import_sentence_transformers()
        return True
    except ModelUnavailableError:
        return False
