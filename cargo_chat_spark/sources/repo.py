"""Repository file sources (SURVEY §2.1 S1-S3).

The reference does two directory walks:
- S1 chunking walk honoring .gitignore / hidden-file filters
  (/root/reference/src/chunker.rs:36-40, WalkBuilder standard_filters)
- S3 profiling walk with NO gitignore (/root/reference/src/repo.rs:54-62)

Spark-first form: ``binaryFile`` datasource with recursive lookup — the
scan distributes across executors, prunes on pathGlobFilter, and yields
(path, modificationTime, length, content). Gitignore semantics aren't a
Spark-native concept; ``respects_gitignore=True`` applies the standard
filters driver-side on the (tiny) path listing before the distributed
content read, matching S1; False reproduces S3.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.functions.paths import extension_from_path


def _gitignore_patterns(root: str) -> list[str]:
    patterns: list[str] = []
    gi = os.path.join(root, ".gitignore")
    if os.path.isfile(gi):
        with open(gi, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith("#"):
                    patterns.append(line.rstrip("/"))
    return patterns


def _ignored(rel: str, patterns: list[str]) -> bool:
    parts = rel.split(os.sep)
    for pat in patterns:
        if any(fnmatch.fnmatch(p, pat) for p in parts):
            return True
        if fnmatch.fnmatch(rel, pat):
            return True
    return False


def scan_repo(
    spark: SparkSession, root: str, respects_gitignore: bool = True
) -> DataFrame:
    """File DataFrame: path (repo-relative), content (string), extension.

    Hidden files/dirs are skipped when respects_gitignore (standard
    filters); unreadable/non-UTF8 content decodes with replacement (the
    reference skips with a warning — S2, chunker.rs:80-87; we keep the row
    and let downstream filters drop it, flagged by is_valid_utf8)."""
    patterns = _gitignore_patterns(root) if respects_gitignore else []
    keep: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        rel_dir = os.path.relpath(dirpath, root)
        if respects_gitignore:
            dirnames[:] = [
                d
                for d in dirnames
                if not d.startswith(".")
                and not _ignored(os.path.normpath(os.path.join(rel_dir, d)), patterns)
            ]
        for fn in filenames:
            if respects_gitignore and fn.startswith("."):
                continue
            rel = os.path.normpath(os.path.join(rel_dir, fn))
            if respects_gitignore and _ignored(rel, patterns):
                continue
            keep.append(rel)
    if not keep:
        return spark.createDataFrame([], "path string, content binary")

    # Distributed content read: the path list is small (driver-side walk),
    # the bytes are read executor-side via the binaryFile source.
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.col("path"),
            F.col("content"),
        )
    )
    rel_paths = spark.createDataFrame([(p,) for p in keep], "rel_path string")
    root_uri_len = len("file:" + os.path.abspath(root)) + 1
    files = files.withColumn(
        "rel_path", F.expr(f"substring(path, {root_uri_len + 1})")
    )
    return (
        files.join(F.broadcast(rel_paths), "rel_path")
        .select(
            F.col("rel_path").alias("path"),
            F.decode("content", "UTF-8").alias("content"),
        )
        .withColumn("extension", extension_from_path(F.col("path")))
    )
