"""Chunking operator tests: char-window spec edge cases + the structured
(syntax-aware) splitter."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators.chunking import (
    chunk_structured,
    chunk_text,
    split_structured,
)

RUST = (
    "use std::io;\n\n"
    "fn main() {\n    println!(\"hi\");\n}\n\n"
    "fn helper(x: i32) -> i32 {\n    x + 1\n}\n\n"
    "struct Point { x: f32, y: f32 }\n"
)


def test_split_structured_boundaries():
    chunks = split_structured(RUST, "Rust", max_chars=60)
    # every declaration starts a piece; merged forward under the cap
    assert all(len(c) <= 60 for c in chunks)
    assert "".join(chunks) == RUST  # lossless
    starts = [c.lstrip().split("(")[0].split()[0] for c in chunks if c.strip()]
    assert "fn" in {s for s in starts} or "use" in {s for s in starts}


def test_split_structured_unknown_lang_falls_back_to_window():
    text = "x" * 250
    chunks = split_structured(text, None, max_chars=100)
    assert [len(c) for c in chunks] == [100, 100, 50]


def test_split_structured_oversized_decl_hard_wraps():
    text = "fn big() {\n" + "a" * 500 + "\n}\n"
    chunks = split_structured(text, "Rust", max_chars=100)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks) == text


def test_chunk_text_empty_and_exact_boundary(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a" * 120), (3, "b" * 121)], "doc_id bigint, text string"
    )
    out = chunk_text(df, max_chars=120).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc  # empty text -> no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 120
    assert len(by_doc[3]) == 2 and by_doc[3][1]["chunk_len"] == 1


def test_chunk_structured_dataframe(spark):
    df = spark.createDataFrame(
        [("src/main.rs", "Rust", RUST), ("docs/a.md", "Markdown", "# T\nbody\n## S\nmore\n")],
        "path string, language string, content string",
    )
    rows = chunk_structured(df, max_chars=60).collect()
    assert {r["path"] for r in rows} == {"src/main.rs", "docs/a.md"}
    # chunk_seq dense per path from 0
    for path in ("src/main.rs", "docs/a.md"):
        seqs = sorted(r["chunk_seq"] for r in rows if r["path"] == path)
        assert seqs == list(range(len(seqs)))
    assert all(r["chunk_len"] <= 60 for r in rows)
