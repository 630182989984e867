"""P6 reference-format parity: the Spark prompt must equal an independent
Python re-derivation of hyde.rs:645-740's formatting, character for
character."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators import context as C

ROWS = [
    # (rank, file, code, language, extension, distance, chunk_index)
    # chunk_index is the PRE-FILTER enumerate position (hyde.rs:1227-1231):
    # non-contiguous values pin that filters leave holes in printed ids
    (1, "./src/hyde.rs", "fn hyde_impl() {}\n", "Rust", "rs", 0.312, 0),
    (2, "src/main.rs", "  fn main() {}  ", None, "rs", 0.4, 3),
    (3, "README.md", "# Docs", "Markdown", None, 0.55, 5),
]
QUERY = "how does retrieval work"
INTENT = "how_it_works"


def _expected() -> str:
    # independent mirror of the Rust format! calls
    snippets = []
    for rank, file, code, lang, ext, dist, cidx in ROWS:
        lang_info = f" [{lang.upper()}]" if lang else ""
        ext_info = f".{ext}" if ext else ""
        clean = file
        while clean.startswith("./"):
            clean = clean[2:]
        snippets.append(
            f"## Code Reference {rank} - {clean}{ext_info}{lang_info}\n"
            f"**Location:** {clean}\n"
            f"**Relevance Score:** {dist:.3f} (lower = more relevant)\n"
            f"**Chunk ID:** {cidx}\n\n"
            f"```{lang or 'rust'}\n"
            f"{code.strip()}```\n"
        )
    instruction = C.INTENT_INSTRUCTIONS[INTENT]
    return (
        f"# User Query\n{QUERY}\n\n# Analysis Task\n{instruction}\n\n"
        f"# System Context\nYou are analyzing a software repository\n\n"
        f"# Available Code References\n" + "\n\n".join(snippets) + "\n\n"
        + C.OUTPUT_TEMPLATE
    )


def test_prompt_matches_reference_format(spark):
    df = spark.createDataFrame(
        [
            (0, r[0], r[1], r[2], r[3], r[4], float(r[5]), r[6], INTENT, QUERY)
            for r in ROWS
        ],
        "query_id bigint, rank int, file string, code string, language string, "
        "extension string, distance double, chunk_index int, intent string, "
        "query_text string",
    )
    out = C.assemble_prompt(df, F.col("query_text")).collect()
    assert len(out) == 1
    got = out[0]["user_prompt"]
    exp = _expected()
    assert got == exp, (
        "first divergence at char "
        f"{next((i for i, (a, b) in enumerate(zip(got, exp)) if a != b), min(len(got), len(exp)))}:"
        f"\n...got: {got[:200]!r}\n...exp: {exp[:200]!r}"
    )


def test_template_preserves_hard_breaks():
    # the two markdown hard-break lines from hyde.rs:701/713
    assert "## 2. Investigation Plan  \n" in C.OUTPUT_TEMPLATE
    assert "- <Data flow through the system>  \n" in C.OUTPUT_TEMPLATE
