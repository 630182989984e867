"""Repo-profiling operators (SURVEY §2.6 A1-A7, §2.3 F6-F7, §2.5 O8-O9,
§2.7 U2).

Re-expresses /root/reference/src/repo.rs as grouped aggregations over a
``repo_files`` relation (repo, filename, content, …) instead of a
sequential directory walk — one shuffle per aggregate, scales per-repo.

Each helper ships its Spark Column form and its DuckDB SQL form side by
side (same pattern as operators.filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from cargo_chat_spark.functions.localframe import local_frame
from pyspark.sql import functions as F

# F6 build-file allowlist (repo.rs:87-122), compared on lowercased filename.
BUILD_FILES = [
    "cargo.toml", "cargo.lock", "package.json", "package-lock.json",
    "yarn.lock", "pom.xml", "build.gradle", "gradle.properties", "makefile",
    "cmake.txt", "cmakelists.txt", "pyproject.toml", "poetry.lock",
    "requirements.txt", "setup.py", "gemfile", "gemfile.lock", "go.mod",
    "go.sum", "build.rs", "build.zig", "dune-project", "dune", "mix.exs",
    "rebar.config", "stack.yaml", "cabal.project", "project.clj", "deps.edn",
    "composer.json", "composer.lock",
]

# A5 framework probes (repo.rs:169-358): (exact build filename, substring
# needle in that file's content, framework label).
FRAMEWORK_PROBES: list[tuple[str, str, str]] = [
    ("Cargo.toml", "tokio", "Tokio"), ("Cargo.toml", "actix", "Actix"),
    ("Cargo.toml", "axum", "Axum"), ("Cargo.toml", "warp", "Warp"),
    ("Cargo.toml", "rocket", "Rocket"), ("Cargo.toml", "serde", "Serde"),
    ("Cargo.toml", "clap", "Clap"), ("Cargo.toml", "diesel", "Diesel"),
    ("Cargo.toml", "sqlx", "SQLx"), ("Cargo.toml", "bevy", "Bevy"),
    ("Cargo.toml", "tauri", "Tauri"),
    ("package.json", "react", "React"), ("package.json", "vue", "Vue"),
    ("package.json", "angular", "Angular"), ("package.json", "svelte", "Svelte"),
    ("package.json", "next", "Next.js"), ("package.json", "nuxt", "Nuxt.js"),
    ("package.json", "express", "Express"), ("package.json", "fastify", "Fastify"),
    ("package.json", "nestjs", "NestJS"), ("package.json", "typescript", "TypeScript"),
    ("package.json", "webpack", "Webpack"), ("package.json", "vite", "Vite"),
    ("pom.xml", "spring", "Spring"), ("pom.xml", "junit", "JUnit"),
    ("pom.xml", "hibernate", "Hibernate"), ("pom.xml", "jackson", "Jackson"),
    ("pom.xml", "maven", "Maven"),
    ("requirements.txt", "django", "Django"), ("requirements.txt", "flask", "Flask"),
    ("requirements.txt", "fastapi", "FastAPI"), ("requirements.txt", "numpy", "NumPy"),
    ("requirements.txt", "pandas", "Pandas"), ("requirements.txt", "pytorch", "PyTorch"),
    ("requirements.txt", "tensorflow", "TensorFlow"),
    ("pyproject.toml", "poetry", "Poetry"),
    ("go.mod", "gin", "Gin"), ("go.mod", "echo", "Echo"),
    ("go.mod", "fiber", "Fiber"), ("go.mod", "gorm", "GORM"),
    ("go.mod", "cobra", "Cobra"),
]

# A7 project-type dispatch (repo.rs:433-453), exact-case filename match.
PROJECT_TYPES: list[tuple[str, str]] = [
    ("Cargo.toml", "Rust project"),
    ("package.json", "Node.js project"),
    ("pom.xml", "Maven Java project"),
    ("build.gradle", "Gradle project"),
    ("go.mod", "Go module"),
    ("pyproject.toml", "Python project"),
]


def is_build_file(filename: Column) -> Column:
    return F.lower(filename).isin(BUILD_FILES)


def is_build_file_sql(filename: str) -> str:
    names = ", ".join(f"'{n}'" for n in BUILD_FILES)
    return f"(lower({filename}) IN ({names}))"


def rust_line_count(content: Column) -> Column:
    """Rust ``str::lines().count()`` (repo.rs:76): a trailing newline does
    not start a new line; empty string has 0 lines. SURVEY §7 flags this
    off-by-one vs naive split()."""
    n = F.size(F.split(content, "\n", -1))
    return (
        F.when(content == "", 0)
        .when(content.endswith("\n"), n - 1)
        .otherwise(n)
        .cast("bigint")
    )


def rust_line_count_sql(content: str) -> str:
    return f"""(CASE
        WHEN {content} = '' THEN 0
        WHEN ends_with({content}, chr(10))
            THEN len(string_split({content}, chr(10))) - 1
        ELSE len(string_split({content}, chr(10)))
    END)"""


def human_list(items: Column, conjunction: str = "and") -> Column:
    """Oxford-comma list rendering (repo.rs:388-400): "a", "a and b",
    "a, b, and c". Input order preserved."""
    n = F.size(items)
    first = F.element_at(items, 1)
    last = F.element_at(items, -1)
    return (
        F.when(n == 0, F.lit(""))
        .when(n == 1, first)
        .when(n == 2, F.concat(first, F.lit(f" {conjunction} "), last))
        .otherwise(
            F.concat(
                F.array_join(F.slice(items, 1, n - 1), ", "),
                F.lit(f", {conjunction} "),
                last,
            )
        )
    )


def human_list_sql(items: str, conjunction: str = "and") -> str:
    return f"""(CASE
        WHEN len({items}) = 0 THEN ''
        WHEN len({items}) = 1 THEN {items}[1]
        WHEN len({items}) = 2 THEN {items}[1] || ' {conjunction} ' || {items}[2]
        ELSE array_to_string({items}[1:len({items})-1], ', ')
             || ', {conjunction} ' || {items}[len({items})]
    END)"""


def probes_df(spark: SparkSession) -> DataFrame:
    return local_frame(spark, 
        FRAMEWORK_PROBES, "build_file string, needle string, framework string"
    )


def probes_sql() -> str:
    rows = ",\n        ".join(
        f"('{b}', '{n}', '{f}')" for b, n, f in FRAMEWORK_PROBES
    )
    return (
        "SELECT * FROM (VALUES\n        "
        + rows
        + "\n    ) AS probes(build_file, needle, framework)"
    )


def project_type_expr(build_files_sorted: Column, primary_languages: Column) -> Column:
    """First (alphabetically — collection is sorted for determinism,
    SURVEY §2.11) build file with a known type, else primary language,
    else 'software project' (repo.rs:433-453)."""
    known = F.array(*[F.lit(n) for n, _ in PROJECT_TYPES])
    matches = F.filter(build_files_sorted, lambda x: F.array_contains(known, x))
    first_match = F.when(F.size(matches) > 0, F.element_at(matches, 1))
    mapped = None
    for name, label in PROJECT_TYPES:
        clause = (first_match == name, F.lit(label))
        mapped = F.when(*clause) if mapped is None else mapped.when(*clause)
    lang_fallback = F.when(
        F.size(primary_languages) > 0,
        F.concat(F.element_at(primary_languages, 1), F.lit(" project")),
    ).otherwise(F.lit("software project"))
    return mapped.otherwise(lang_fallback)


def project_type_sql(build_files_sorted: str, primary_languages: str) -> str:
    known = ", ".join(f"'{n}'" for n, _ in PROJECT_TYPES)
    whens = "\n            ".join(
        f"WHEN '{n}' THEN '{label}'" for n, label in PROJECT_TYPES
    )
    return f"""(CASE list_extract(
            list_filter({build_files_sorted}, x -> x IN ({known})), 1)
            {whens}
            ELSE CASE WHEN len({primary_languages}) > 0
                 THEN {primary_languages}[1] || ' project'
                 ELSE 'software project' END
        END)"""
