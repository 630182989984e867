"""Deterministic mock provider — the default test/oracle configuration
(SURVEY §5 strategy item 4).

- Embeddings: the same md5 hash-projection family as the SQL-portable
  ``mock_embed_documents`` query (queries/similarity.py), so pipeline
  results can be cross-checked against pure-SQL reproductions.
- Classifier: rule-based keyword classifier standing in for the LLM's
  strict-JSON-schema structured output (hyde.rs:353-392).
- HyDE: truncated echo of the query (identity mock; budget semantics of
  main.rs:497 preserved).
- Reranker: deterministic token-overlap score (stands in for the
  cross-encoder, rerank.rs:10).
"""

from __future__ import annotations

from collections.abc import Iterator

from cargo_chat_spark.functions.hashing import PRIME, h32_py
from cargo_chat_spark.models.provider import Classification

_INTENT_KEYWORDS = [
    ("how does", "how_it_works"),
    ("how do", "how_it_works"),
    ("implement", "implementation"),
    ("bug", "debugging"),
    ("error", "debugging"),
    ("explain", "explanation"),
    ("what is", "explanation"),
]
_LANG_KEYWORDS = ["rust", "python", "javascript", "typescript", "go", "java"]


class MockProvider:
    def __init__(self, dim: int = 16):
        self.dim = dim

    # M1/M2 — mirror of the SQL expression in queries/similarity.py
    def embed_one(self, text: str) -> list[float]:
        h = h32_py(text) % PRIME
        return [
            float((h * ((2654435761 * j + 1) % PRIME) + j) % PRIME) / PRIME
            for j in range(1, self.dim + 1)
        ]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        return [self.embed_one(t) for t in texts]

    # M3 — rule-based classification
    def classify_query(self, query: str) -> Classification:
        q = query.lower()
        intent = "explanation"
        for kw, label in _INTENT_KEYWORDS:
            if kw in q:
                intent = label
                break
        language = next((l for l in _LANG_KEYWORDS if l in q), None)
        wants_code = intent in ("implementation", "debugging", "how_it_works")
        confidence = 0.9 if language else (0.75 if wants_code else 0.6)
        return Classification(
            language=language,
            intent=intent,
            wants_code=wants_code,
            confidence=confidence,
            target_folders=None,
            target_extensions=None,
            exclude_patterns=None,
        )

    # M4 — identity/echo HyDE with the chunk-size budget
    def hyde_document(self, query: str, intent: str, max_chars: int = 1000) -> str:
        return f"[{intent}] {query}"[:max_chars]

    # M5 — token-overlap rerank score in [0, 1]
    def rerank_scores(self, query: str, docs: list[str]) -> list[float]:
        q_toks = set(query.lower().split())
        out = []
        for d in docs:
            d_toks = set(d.lower().split())
            inter = len(q_toks & d_toks)
            union = len(q_toks | d_toks) or 1
            out.append(inter / union)
        return out

    # M6 — deterministic answer "stream"
    def synthesize_answer(self, prompt: str) -> Iterator[str]:
        yield f"[mock-answer:{len(prompt)} chars of context]"
