"""Shared filesystem-path helpers for the storage-layout modules.

One place to strip the ``file:`` scheme that ``input_file_name()`` and
Spark write paths carry (previously re-implemented per module — a fix
like URI-decoding would have had to land four times).
"""

from __future__ import annotations


def strip_scheme(path: str) -> str:
    """``file:/x`` → ``/x`` (local filesystem only; plain paths pass
    through unchanged)."""
    return path[len("file:"):] if path.startswith("file:") else path
