"""Pluggable model-inference boundary (SURVEY §2.8 M1-M6).

The reference talks to local ONNX models and the OpenAI HTTP API
(/root/reference/src/embedding.rs, openai.rs, rerank.rs). Here every model
call sits behind ``ModelProvider`` so:

- the dataflow around models is total and deterministic under the mock
  provider (the oracle-checkable configuration), and
- a real provider (HTTP endpoint or in-process model) plugs into the SAME
  mapInPandas stages without touching pipeline code.

Batch boundary: providers consume/produce Python lists inside Arrow-batched
``mapInPandas`` stages (operators in plans.indexing / plans.retrieval).
The reference's embed batch size is 32 (main.rs:288); the Spark equivalent
knob is spark.sql.execution.arrow.maxRecordsPerBatch (session.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol


@dataclass
class Classification:
    """Mirrors QueryClassification (hyde.rs:60-69)."""

    language: str | None
    intent: str
    wants_code: bool
    confidence: float
    target_folders: list[str] | None
    target_extensions: list[str] | None
    exclude_patterns: list[str] | None


class ModelProvider(Protocol):
    dim: int

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        """M1 (embedding.rs:112-129)."""
        ...

    def classify_query(self, query: str) -> Classification:
        """M3 (hyde.rs:350-466)."""
        ...

    def hyde_document(self, query: str, intent: str, max_chars: int) -> str:
        """M4 (hyde.rs:317-347)."""
        ...

    def rerank_scores(self, query: str, docs: list[str]) -> list[float]:
        """M5 (rerank.rs:7-19)."""
        ...

    def synthesize_answer(self, prompt: str):
        """M6 (hyde.rs:605-764): yields answer tokens (driver-side
        stream — outside the DataFrame plane by design, SURVEY §1.4)."""
        ...
