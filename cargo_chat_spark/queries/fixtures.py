"""Deterministic fixture relations for the retrieval-operator queries.

The driver's testdata has no code-chunk corpus, so the FIXTURES.md
`candidates` / `queries` schemas are synthesized — arithmetically, from
``documents.doc_id`` — in BOTH engines (Spark column exprs here, DuckDB CTE
SQL below). The synthesis is itself a registered correctness query
(``candidates_fixture``) so any drift between the two definitions fails the
gate before it can poison downstream operator checks.

Coverage engineering (FIXTURES.md):
- folders cycle through src/ lib/ docs/ tests/ src/util/ (mod 5)
- extensions cycle rs py js md txt go rst (mod 7; code + doc + unsupported)
- every 13th row has NULL extension (exercises path-fallback branches)
- every 11th row has NULL language
- every 17th row is named readme_N.* (exercises path-marker doc detection)
- distance = (doc_id*37 mod 1000)/1000 → exact cross-doc ties at period
  1000, exercising the chunk_id tie-break
- query_id = doc_id % 4 → four classification rows covering both sides of
  the 0.7/0.8 confidence gates, folder/ext/exclude filters on and off
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.functions.language import detect_language_expr
from cargo_chat_spark.functions.localframe import local_frame
from cargo_chat_spark.sources.testdata import load_table

# Moduli 5 and 7 are coprime with the 4 query classes, so every query sees
# every folder and extension (a %6/%8 cycle would alias with query_id%4 and
# silently blind e.g. the exclude-pattern check).
_FOLDERS = ["src", "lib", "docs", "tests", "src/util"]
_EXTS = ["rs", "py", "js", "md", "txt", "go", "rst"]


def candidates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    folder = F.element_at(
        F.array(*[F.lit(x) for x in _FOLDERS]), (doc_id % 5 + 1).cast("int")
    )
    ext_true = F.element_at(
        F.array(*[F.lit(x) for x in _EXTS]), (doc_id % 7 + 1).cast("int")
    )
    stem = F.when(
        doc_id % 17 == 0, F.concat(F.lit("readme_"), doc_id.cast("string"))
    ).otherwise(F.concat(F.lit("file_"), doc_id.cast("string")))
    fname = F.concat(stem, F.lit("."), ext_true)
    file = F.concat(folder, F.lit("/"), fname)
    return d.select(
        doc_id.alias("chunk_id"),
        (doc_id % 4).alias("query_id"),
        file.alias("file"),
        F.substring(F.col("text"), 1, 300).alias("code"),
        F.when(doc_id % 11 == 0, F.lit(None).cast("string"))
        .otherwise(detect_language_expr(ext_true))
        .alias("language"),
        F.when(doc_id % 13 == 0, F.lit(None).cast("string"))
        .otherwise(ext_true)
        .alias("extension"),
        ((doc_id * 37 % 1000).cast("double") / F.lit(1000.0)).alias("distance"),
    )


# DuckDB mirror — keep in lockstep with candidates_df (gate: candidates_fixture)
CANDIDATES_SQL = """
    SELECT
        doc_id AS chunk_id,
        doc_id % 4 AS query_id,
        f.folder || '/' || f.fname AS file,
        substring(d.text, 1, 300) AS code,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             ELSE CASE f.ext_true
                 WHEN 'rs' THEN 'Rust' WHEN 'py' THEN 'Python'
                 WHEN 'js' THEN 'JavaScript' WHEN 'md' THEN 'Markdown'
                 WHEN 'go' THEN 'Go' ELSE NULL END
        END AS language,
        CASE WHEN doc_id % 13 = 0 THEN NULL ELSE f.ext_true END AS extension,
        CAST(doc_id * 37 % 1000 AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS distance
    FROM documents d, LATERAL (
        SELECT
            list_extract(['src','lib','docs','tests','src/util'],
                         CAST(doc_id % 5 + 1 AS INT)) AS folder,
            list_extract(['rs','py','js','md','txt','go','rst'],
                         CAST(doc_id % 7 + 1 AS INT)) AS ext_true,
            (CASE WHEN doc_id % 17 = 0 THEN 'readme_' || CAST(doc_id AS VARCHAR)
                  ELSE 'file_' || CAST(doc_id AS VARCHAR) END)
              || '.' ||
            list_extract(['rs','py','js','md','txt','go','rst'],
                         CAST(doc_id % 7 + 1 AS INT)) AS fname
    ) f
"""

# Four classification rows (FIXTURES.md `queries` schema). Both gates
# (0.7 / 0.8), folder+ext+exclude filters, language priority, doc branch.
_CLASSIFICATIONS = [
    # (query_id, q_language, intent, wants_code, confidence,
    #  target_folders, target_extensions, exclude_patterns, k)
    (0, "rust", "implementation", True, 0.9, ["src"], ["rs"], ["tests"], 8),
    (1, None, "how_it_works", True, 0.75, None, [".py", "go"], None, 8),
    (2, "python", "explanation", False, 0.6, None, None, None, 8),
    (3, None, "debugging", True, 0.72, ["docs", "lib"], None, ["target"], 8),
]

_CLASS_SCHEMA = (
    "query_id bigint, q_language string, intent string, wants_code boolean, "
    "confidence double, target_folders array<string>, "
    "target_extensions array<string>, exclude_patterns array<string>, k int"
)


def classification_df(spark: SparkSession) -> DataFrame:
    return local_frame(spark, _CLASSIFICATIONS, _CLASS_SCHEMA)


def _sql_list(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR[])"
    inner = ", ".join(f"'{x}'" for x in v)
    return f"[{inner}]"


def _class_rows_sql() -> str:
    rows = []
    for q, lang, intent, wc, conf, tf, te, ep, k in _CLASSIFICATIONS:
        lang_s = f"'{lang}'" if lang else "CAST(NULL AS VARCHAR)"
        rows.append(
            f"({q}, {lang_s}, '{intent}', {str(wc).upper()}, "
            f"CAST({conf} AS DOUBLE), {_sql_list(tf)}, {_sql_list(te)}, "
            f"{_sql_list(ep)}, {k})"
        )
    return ",\n        ".join(rows)


CLASSIFICATIONS_SQL = f"""
    SELECT * FROM (VALUES
        {_class_rows_sql()}
    ) AS t(query_id, q_language, intent, wants_code, confidence,
           target_folders, target_extensions, exclude_patterns, k)
"""


def joined_candidates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """candidates ⋈ their query's classification row (broadcast — the
    classification side is tiny by construction)."""
    return candidates_df(spark, sf_dir).join(
        F.broadcast(classification_df(spark)), "query_id"
    )
