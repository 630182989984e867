"""Repo-profiling correctness queries (SURVEY §2.6 A3-A7, §2.3 F6-F7,
§2.5 O8-O9, §2.7 U2) over a synthesized ``repo_files`` relation.

The fixture maps each document to a file in a per-source "repository"
(repo = documents.source, 20 repos): every 19th doc is a build file with
framework-needle content, every 23rd (non-build) a README variant, the rest
code files. Content derives newlines from the document text so Rust
``lines()`` semantics (trailing-newline off-by-one) are exercised — every
3rd file gets a trailing newline. Rare Swift (~short) and C files exercise
the top-5 truncation and the >10-line HAVING gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cargo_chat_spark.caching import memo_persist
from cargo_chat_spark.functions.language import (
    detect_language_expr,
    detect_language_sql_case,
)
from cargo_chat_spark.functions.paths import (
    extension_from_path,
    extension_from_path_sql,
)
from cargo_chat_spark.operators import profile as P
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.functions.localframe import local_frame

_BUILD_NAMES = [
    "Cargo.toml", "package.json", "pom.xml", "build.gradle", "go.mod",
    "pyproject.toml", "requirements.txt", "yarn.lock", "Makefile",
]
_BUILD_CONTENTS = [
    "tokio serde clap sqlx",          # 4 Rust probes hit
    "react next typescript vite",     # 4 JS probes hit
    "spring junit jackson",           # 3 Java probes hit
    "gradle kotlin",                  # no dispatch for build.gradle
    "gin cobra gorm",                 # 3 Go probes hit
    "poetry fastapi",                 # only 'poetry' dispatched for pyproject
    "fastapi numpy pandas torch",     # torch != pytorch (negative case)
    "react",                          # yarn.lock not dispatched
    "all: build",
]
_README_NAMES = ["README.md", "README.txt", "README"]


def repo_files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized repo_files relation, memo-persisted per (session, sf_dir).

    The persist boundary is load-bearing twice over: (a) seven profiling
    queries (and repo_profile's five sub-aggregates) share the synthesis
    projection, and (b) the synthesis CASE tree is so wide that fusing it
    into a downstream HashAggregate's whole-stage codegen blows Janino's
    64 KB method limit — Spark then silently runs the WHOLE stage
    interpreted. The InMemoryTableScan in between keeps each codegen unit
    small enough to compile (asserted by tests/test_plan_shapes.py)."""
    return memo_persist(spark, ("repo_files", sf_dir), lambda: _repo_files_build(spark, sf_dir))


def _repo_files_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    is_build = doc_id % 19 == 0
    is_readme = ~is_build & (doc_id % 23 == 0)
    bidx = (F.expr("doc_id DIV 19") % 9 + 1).cast("int")
    ridx = (F.expr("doc_id DIV 23") % 3 + 1).cast("int")
    ext = (
        F.when(doc_id % 101 == 5, "swift")
        .when(doc_id % 41 == 7, "c")
        .otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in ["rs", "py", "js", "md", "txt", "go", "rst"]]),
                (doc_id % 7 + 1).cast("int"),
            )
        )
    )
    # short content for swift rows keeps per-repo Swift totals <= 10 lines
    # (negative case for the F7 HAVING gate)
    cut = F.when(doc_id % 101 == 5, 25).otherwise(200)
    base = F.regexp_replace(F.substring(F.col("text"), 1, cut), " ", "\n")
    content_text = F.when(doc_id % 3 == 0, F.concat(base, F.lit("\n"))).otherwise(base)
    filename = (
        F.when(is_build, F.element_at(F.array(*[F.lit(x) for x in _BUILD_NAMES]), bidx))
        .when(is_readme, F.element_at(F.array(*[F.lit(x) for x in _README_NAMES]), ridx))
        .otherwise(F.concat(F.lit("file_"), doc_id.cast("string"), F.lit("."), ext))
    )
    content = F.when(
        is_build, F.element_at(F.array(*[F.lit(x) for x in _BUILD_CONTENTS]), bidx)
    ).otherwise(content_text)
    return d.select(
        doc_id.alias("file_id"),
        F.col("source").alias("repo"),
        filename.alias("filename"),
        content.alias("content"),
    )


REPO_FILES_SQL = """
    SELECT
        doc_id AS file_id,
        source AS repo,
        CASE
            WHEN doc_id % 19 = 0 THEN
                list_extract(['Cargo.toml','package.json','pom.xml','build.gradle','go.mod',
                              'pyproject.toml','requirements.txt','yarn.lock','Makefile'],
                             CAST((doc_id // 19) % 9 + 1 AS INT))
            WHEN doc_id % 23 = 0 THEN
                list_extract(['README.md','README.txt','README'],
                             CAST((doc_id // 23) % 3 + 1 AS INT))
            ELSE 'file_' || CAST(doc_id AS VARCHAR) || '.' ||
                 (CASE WHEN doc_id % 101 = 5 THEN 'swift'
                       WHEN doc_id % 41 = 7 THEN 'c'
                       ELSE list_extract(['rs','py','js','md','txt','go','rst'],
                                         CAST(doc_id % 7 + 1 AS INT)) END)
        END AS filename,
        CASE
            WHEN doc_id % 19 = 0 THEN
                list_extract(['tokio serde clap sqlx','react next typescript vite',
                              'spring junit jackson','gradle kotlin','gin cobra gorm',
                              'poetry fastapi','fastapi numpy pandas torch','react',
                              'all: build'],
                             CAST((doc_id // 19) % 9 + 1 AS INT))
            ELSE
                replace(substring(text, 1, CASE WHEN doc_id % 101 = 5 THEN 25 ELSE 200 END),
                        ' ', chr(10))
                || (CASE WHEN doc_id % 3 = 0 THEN chr(10) ELSE '' END)
        END AS content
    FROM documents
"""

_RF = f"WITH repo_files AS ({REPO_FILES_SQL})"


@register("repo_files_fixture", sql=f"{_RF} SELECT * FROM repo_files")
def repo_files_fixture(spark, sf_dir):
    """Parity gate for the repo_files synthesis."""
    return repo_files_df(spark, sf_dir)


# --------------------------------------------------- A3 + F7 + O8: languages
_LINES_SQL = f"""{_RF},
counted AS (
    SELECT repo,
        {detect_language_sql_case(extension_from_path_sql('filename'))} AS language,
        {P.rust_line_count_sql('content')} AS line_count
    FROM repo_files
    WHERE NOT {P.is_build_file_sql('filename')}
)
SELECT repo, language, CAST(SUM(line_count) AS BIGINT) AS total_lines
FROM counted WHERE language IS NOT NULL
GROUP BY repo, language
"""


@register("lines_by_language", sql=_LINES_SQL)
def lines_by_language(spark, sf_dir):
    """A3 (repo.rs:73-79): per-repo per-language line sums, Rust lines()
    semantics, build files skipped (the walk `continue`s on them)."""
    rf = repo_files_df(spark, sf_dir)
    lang = detect_language_expr(extension_from_path(F.col("filename")))
    return (
        rf.where(~P.is_build_file(F.col("filename")))
        .withColumn("language", lang)
        .where(F.col("language").isNotNull())
        .groupBy("repo", "language")
        .agg(F.sum(P.rust_line_count(F.col("content"))).alias("total_lines"))
    )


_PRIMARY_SQL = f"""{_RF},
counted AS (
    SELECT repo,
        {detect_language_sql_case(extension_from_path_sql('filename'))} AS language,
        {P.rust_line_count_sql('content')} AS line_count
    FROM repo_files
    WHERE NOT {P.is_build_file_sql('filename')}
),
grouped AS (
    SELECT repo, language, CAST(SUM(line_count) AS BIGINT) AS total_lines
    FROM counted WHERE language IS NOT NULL
    GROUP BY repo, language
),
ranked AS (
    SELECT repo, language, total_lines,
        CAST(row_number() OVER (
            PARTITION BY repo ORDER BY total_lines DESC, language
        ) AS INT) AS lang_rank
    FROM grouped
)
SELECT * FROM ranked WHERE lang_rank <= 5 AND total_lines > 10
"""


@register("primary_languages", sql=_PRIMARY_SQL)
def primary_languages(spark, sf_dir):
    """O8+F7 (repo.rs:125-141): top-5 languages by lines desc (language
    name tie-break pins the HashMap's nondeterminism), then HAVING > 10."""
    w = Window.partitionBy("repo").orderBy(F.desc("total_lines"), F.asc("language"))
    return (
        lines_by_language(spark, sf_dir)
        .withColumn("lang_rank", F.row_number().over(w))
        .where((F.col("lang_rank") <= 5) & (F.col("total_lines") > 10))
    )


# ------------------------------------------------------- F6 + A4: build files
_BUILD_SQL = f"""{_RF}
SELECT repo, array_to_string(list_sort(list(filename)), '|') AS build_files
FROM repo_files
WHERE {P.is_build_file_sql('filename')}
GROUP BY repo
"""


def _build_files_arr(spark, sf_dir):
    rf = repo_files_df(spark, sf_dir)
    return (
        rf.where(P.is_build_file(F.col("filename")))
        .groupBy("repo")
        .agg(F.array_sort(F.collect_list("filename")).alias("build_files"))
    )


@register("build_files_by_repo", sql=_BUILD_SQL)
def build_files_by_repo(spark, sf_dir):
    """A4 (repo.rs:64-70): build filenames per repo; sorted (not deduped —
    the reference keeps duplicates) for deterministic order. The list is
    emitted '|'-joined: the driver's canonicalizer requires hashable
    (scalar) output cells, so arrays are serialized identically in both
    engines."""
    return _build_files_arr(spark, sf_dir).select(
        "repo", F.array_join("build_files", "|").alias("build_files")
    )


# ------------------------------------------------------ A5 + U2 + O9: frameworks
_FRAMEWORKS_SQL = f"""{_RF},
probes AS ({P.probes_sql()}),
hits AS (
    SELECT DISTINCT rf.repo, p.framework
    FROM repo_files rf JOIN probes p ON rf.filename = p.build_file
    WHERE contains(rf.content, p.needle)
)
SELECT repo, array_to_string(list_sort(list(framework))[1:10], '|') AS frameworks
FROM hits GROUP BY repo
"""


def _frameworks_arr(spark, sf_dir):
    rf = repo_files_df(spark, sf_dir)
    hits = (
        rf.join(F.broadcast(P.probes_df(spark)), rf.filename == F.col("build_file"))
        .where(F.col("content").contains(F.col("needle")))
        .select("repo", "framework")
        .distinct()
    )
    return hits.groupBy("repo").agg(
        F.slice(F.array_sort(F.collect_list("framework")), 1, 10).alias("frameworks")
    )


@register("frameworks_by_repo", sql=_FRAMEWORKS_SQL)
def frameworks_by_repo(spark, sf_dir):
    """A5 (repo.rs:144-358): substring probes over dispatched build files;
    sort + dedup + truncate 10 (repo.rs:161-163). The 42-row probe table
    broadcasts. Output '|'-joined (harness needs hashable cells)."""
    return _frameworks_arr(spark, sf_dir).select(
        "repo", F.array_join("frameworks", "|").alias("frameworks")
    )


# ----------------------------------------------------------- A6: readme summary
_README_SQL = f"""{_RF},
candidates AS (
    SELECT repo, filename, content, file_id,
        CASE filename WHEN 'README.md' THEN 1 WHEN 'README.txt' THEN 2 ELSE 3 END AS prio
    FROM repo_files
    WHERE filename IN ('README.md', 'README.txt', 'README')
),
first_readme AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY repo ORDER BY prio, file_id
        ) AS rn FROM candidates
    ) WHERE rn = 1
),
summarized AS (
    SELECT repo,
        trim(substring(array_to_string(string_split(content, chr(10))[1:5], ' '), 1, 200))
            AS s
    FROM first_readme
)
SELECT repo, CASE WHEN s = '' THEN NULL ELSE s || '...' END AS readme_summary
FROM summarized
"""


@register("readme_summary", sql=_README_SQL)
def readme_summary(spark, sf_dir):
    """A6 (repo.rs:363-385): first README candidate by (README.md,
    README.txt, README) priority; first 5 lines joined, 200-char cap,
    '...' suffix; empty → NULL."""
    rf = repo_files_df(spark, sf_dir)
    prio = (
        F.when(F.col("filename") == "README.md", 1)
        .when(F.col("filename") == "README.txt", 2)
        .otherwise(3)
    )
    w = Window.partitionBy("repo").orderBy("prio", "file_id")
    first = (
        rf.where(F.col("filename").isin(_README_NAMES))
        .withColumn("prio", prio)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    s = F.trim(
        F.substring(
            F.array_join(F.slice(F.split(F.col("content"), "\n", -1), 1, 5), " "),
            1,
            200,
        )
    )
    return first.select(
        "repo",
        F.when(s == "", F.lit(None).cast("string"))
        .otherwise(F.concat(s, F.lit("...")))
        .alias("readme_summary"),
    )


# -------------------------------------------------------- A7: profile assembly
_PROFILE_SQL = f"""{_RF},
counted AS (
    SELECT repo,
        {detect_language_sql_case(extension_from_path_sql('filename'))} AS language,
        {P.rust_line_count_sql('content')} AS line_count
    FROM repo_files
    WHERE NOT {P.is_build_file_sql('filename')}
),
grouped AS (
    SELECT repo, language, SUM(line_count) AS total_lines
    FROM counted WHERE language IS NOT NULL
    GROUP BY repo, language
),
lang_ranked AS (
    SELECT repo, language, total_lines,
        row_number() OVER (PARTITION BY repo ORDER BY total_lines DESC, language) AS r
    FROM grouped
),
primary_langs AS (
    SELECT repo, list(language ORDER BY r) AS primary_languages
    FROM lang_ranked WHERE r <= 5 AND total_lines > 10
    GROUP BY repo
),
builds AS (
    SELECT repo, list_sort(list(filename)) AS build_files
    FROM repo_files WHERE {P.is_build_file_sql('filename')}
    GROUP BY repo
),
probes AS ({P.probes_sql()}),
fw_hits AS (
    SELECT DISTINCT rf.repo, p.framework
    FROM repo_files rf JOIN probes p ON rf.filename = p.build_file
    WHERE contains(rf.content, p.needle)
),
fw AS (
    SELECT repo, list_sort(list(framework))[1:10] AS frameworks
    FROM fw_hits GROUP BY repo
),
readmes AS (
    SELECT repo,
        trim(substring(array_to_string(string_split(content, chr(10))[1:5], ' '), 1, 200)) AS s
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY repo
            ORDER BY CASE filename WHEN 'README.md' THEN 1
                     WHEN 'README.txt' THEN 2 ELSE 3 END, file_id
        ) AS rn
        FROM repo_files WHERE filename IN ('README.md', 'README.txt', 'README')
    ) WHERE rn = 1
),
assembled AS (
    SELECT
        r.repo AS name,
        COALESCE(pl.primary_languages, CAST([] AS VARCHAR[])) AS primary_languages,
        COALESCE(b.build_files, CAST([] AS VARCHAR[])) AS build_files,
        COALESCE(f.frameworks, CAST([] AS VARCHAR[])) AS frameworks,
        CASE WHEN rm.s = '' THEN NULL ELSE rm.s || '...' END AS readme_summary
    FROM (SELECT DISTINCT repo FROM repo_files) r
    LEFT JOIN primary_langs pl USING (repo)
    LEFT JOIN builds b ON b.repo = r.repo
    LEFT JOIN fw f ON f.repo = r.repo
    LEFT JOIN readmes rm ON rm.repo = r.repo
)
SELECT name,
    COALESCE(array_to_string(primary_languages, '|'), '') AS primary_languages,
    COALESCE(array_to_string(build_files, '|'), '') AS build_files,
    COALESCE(array_to_string(frameworks, '|'), '') AS frameworks,
    readme_summary,
    CASE
        WHEN len(primary_languages) = 0 AND len(frameworks) = 0
            THEN 'the ''' || name || ''' repository'
        ELSE '''' || name || ''', ' ||
            array_to_string(
                list_filter([
                    CASE WHEN len(primary_languages) = 1
                         THEN 'a ' || primary_languages[1] || ' codebase'
                         WHEN len(primary_languages) > 1
                         THEN 'a multi-language codebase primarily using ' ||
                              {P.human_list_sql('primary_languages')}
                         ELSE NULL END,
                    CASE WHEN len(frameworks) > 0
                         THEN 'built with ' || {P.human_list_sql('frameworks')}
                         ELSE NULL END
                ], x -> x IS NOT NULL), ' ')
    END AS description,
    {P.project_type_sql('build_files', 'primary_languages')} AS project_type
FROM assembled
"""


@register("repo_profile", sql=_PROFILE_SQL)
def repo_profile(spark, sf_dir):
    """A7 (repo.rs:24-47, 388-453): full profile per repo — primary
    languages, build files, frameworks, readme summary, human-readable
    description, project type. All joins are per-repo (20 keys) after
    per-repo aggregation — at scale each sub-aggregate shuffles once on
    repo and the final assembly is a co-partitioned multi-join. List
    columns are emitted '|'-joined (harness needs hashable cells)."""
    repos = repo_files_df(spark, sf_dir).select("repo").distinct()
    pl = (
        primary_languages(spark, sf_dir)
        .groupBy("repo")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang_rank", "language"))),
                lambda x: x["language"],
            ).alias("primary_languages")
        )
    )
    empty = F.array().cast("array<string>")
    prof = (
        repos.join(pl, "repo", "left")
        .join(_build_files_arr(spark, sf_dir), "repo", "left")
        .join(_frameworks_arr(spark, sf_dir), "repo", "left")
        .join(readme_summary(spark, sf_dir), "repo", "left")
        .select(
            F.col("repo").alias("name"),
            F.coalesce("primary_languages", empty).alias("primary_languages"),
            F.coalesce("build_files", empty).alias("build_files"),
            F.coalesce("frameworks", empty).alias("frameworks"),
            "readme_summary",
        )
    )
    langs = F.col("primary_languages")
    fws = F.col("frameworks")
    lang_part = (
        F.when(F.size(langs) == 1, F.concat(F.lit("a "), F.element_at(langs, 1), F.lit(" codebase")))
        .when(
            F.size(langs) > 1,
            F.concat(
                F.lit("a multi-language codebase primarily using "),
                P.human_list(langs),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    fw_part = F.when(
        F.size(fws) > 0, F.concat(F.lit("built with "), P.human_list(fws))
    ).otherwise(F.lit(None).cast("string"))
    description = F.when(
        (F.size(langs) == 0) & (F.size(fws) == 0),
        F.concat(F.lit("the '"), F.col("name"), F.lit("' repository")),
    ).otherwise(
        F.concat(
            F.lit("'"),
            F.col("name"),
            F.lit("', "),
            F.array_join(
                F.filter(F.array(lang_part, fw_part), lambda x: x.isNotNull()), " "
            ),
        )
    )
    return (
        prof.withColumn("description", description)
        .withColumn(
            "project_type",
            P.project_type_expr(F.col("build_files"), F.col("primary_languages")),
        )
        .select(
            "name",
            F.array_join("primary_languages", "|").alias("primary_languages"),
            F.array_join("build_files", "|").alias("build_files"),
            F.array_join("frameworks", "|").alias("frameworks"),
            "readme_summary",
            "description",
            "project_type",
        )
    )


# ------------------------------------------------ S1-S3: repo walk gate
# The REAL filesystem walk (sources/repo.py::scan_repo), value-hash gated
# (r7 verdict item 6 — converts the S1-S3 pytest-only rows to oracle rows):
# a deterministic fixture tree is materialized on disk, walked BOTH ways
# (S1 gitignore walk / S3 profile walk), and the resulting
# (walk, path, n_chars, extension) rows must equal a DuckDB VALUES literal
# derived from the same module constants. n_chars gates the S2 content
# read+UTF-8 decode; extension rides the walk output to gate P1 over real
# paths. The tree exercises anchored patterns, dir-only patterns, nested
# .gitignore negation, **-globs, and excluded-parent pruning — the same
# gitignore(5) surface tests/test_pipelines.py pins against the reference
# semantics (chunker.rs:36-40, ignore crate standard filters).

_WALK_RULES = {
    ".gitignore": "*.log\n/main.rs\nlogs/\nvendor/\n**/gen_out\n",
    "src/.gitignore": "!keep.log\ngen/*.rs\n!gen/precious.rs\n",
}
_WALK_FILES = {
    "main.rs": "fn other() {}\n",                # anchored /main.rs -> ignored
    "README.md": "# Demo repo\n",
    "Cargo.toml": '[package]\nname = "x"\n',
    "src/main.rs": "fn main() {}\n",
    "src/debug.log": "dbg\n",                    # parent *.log -> ignored
    "src/keep.log": "keep\n",                    # nested negation -> kept
    "src/gen/out.rs": "x\n",                     # nested gen/*.rs -> ignored
    "src/gen/precious.rs": "y\n",                # nested negation -> kept
    "vendor/lib.rs": "v\n",                      # pruned subtree
    "logs/a.txt": "l\n",                         # dir-only pattern
    "a/b/gen_out/deep.txt": "d\n",               # **-glob pruned dir
}
_WALK_KEPT = [
    "README.md",
    "Cargo.toml",
    "src/main.rs",
    "src/keep.log",
    "src/gen/precious.rs",
]


def _walk_fixture_root() -> str:
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), f"ccs_repo_walk_{os.getpid()}"
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    for rel, content in {**_WALK_RULES, **_WALK_FILES}.items():
        p = os.path.join(root, rel.replace("/", os.sep))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            f.write(content)
    return root


def _walk_oracle_sql() -> str:
    def _sq(s: str) -> str:
        return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

    rows = [("all", p) for p in sorted(_WALK_FILES)] + [
        ("gitignore", p) for p in sorted(_WALK_KEPT)
    ]
    values = ",\n  ".join(
        f"({_sq(w)}, {_sq(p)}, {_sq(_WALK_FILES[p])})" for w, p in rows
    )
    return f"""
WITH expected(walk, path, content) AS (VALUES
  {values})
SELECT walk, path,
       CAST(length(content) AS BIGINT) AS n_chars,
       {extension_from_path_sql('path')} AS extension
FROM expected
"""


@register("repo_walk", sql=_walk_oracle_sql())
def repo_walk(spark, sf_dir):
    """S1 gitignore walk + S3 profile walk + S2 content read over a
    committed fixture tree (sf-independent by design; the gate pins the
    WALK, the corpus gates pin the data plane)."""
    from cargo_chat_spark.sources.repo import scan_repo

    root = _walk_fixture_root()

    def one(flag: bool, label: str):
        return scan_repo(spark, root, respects_gitignore=flag).select(
            F.lit(label).alias("walk"),
            "path",
            F.length("content").cast("bigint").alias("n_chars"),
            "extension",
        )

    return one(True, "gitignore").unionByName(one(False, "all"))


# ----------------------------------------- S5/S7: profile sidecar roundtrip
@register("profile_roundtrip", sql=_PROFILE_SQL)
def profile_roundtrip(spark, sf_dir):
    """S7->S5 parity gate (sources/index_io.py::write_profile/
    read_profile; save main.rs:373-376, cache-or-recompute load
    main.rs:183-237): every repo's assembled profile is served through
    the JSON sidecar — read_profile first (the cache branch), computing
    and write_profile-ing on a miss (the recompute branch), exactly the
    reference's load order — and the served rows must equal
    repo_profile's oracle verbatim. A field lost, reordered, or mangled
    by the JSON round-trip hash-mismatches.

    The per-repo loop is driver-side and bounded (one sidecar per repo,
    ~20 at any SF: sidecars are per-INDEX artifacts, not data-plane
    rows — the reference keeps exactly one profile.json per index)."""
    import os
    import tempfile

    from cargo_chat_spark.sources.index_io import read_profile, write_profile

    cols = [
        "name", "primary_languages", "build_files", "frameworks",
        "readme_summary", "description", "project_type",
    ]
    # bounded collect: one row per repo (the profile aggregate's output)
    prof_rows = repo_profile(spark, sf_dir).collect()
    # PID-keyed root: stable within one process, never racing another run
    out_root = os.path.join(
        tempfile.gettempdir(),
        f"ccs_profile_roundtrip_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    served = []
    for r in prof_rows:
        idx_dir = os.path.join(out_root, r["name"])
        os.makedirs(idx_dir, exist_ok=True)
        got = read_profile(idx_dir)          # S5: cache hit?
        if got is None:                      # miss -> recompute + save (S7)
            write_profile({c: r[c] for c in cols}, idx_dir)
            got = read_profile(idx_dir)
        served.append(tuple(got[c] for c in cols))
    return local_frame(spark, 
        served,
        "name string, primary_languages string, build_files string, "
        "frameworks string, readme_summary string, description string, "
        "project_type string",
    )
