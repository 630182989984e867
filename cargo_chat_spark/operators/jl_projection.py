"""Johnson-Lindenstrauss random projection with a re-derivable matrix.

The dimension-reduction lever for the ANN ladder: project embeddings
from 64 to 16 dims with a dense ±1 sign matrix (Achlioptas 2003 — ±1
entries satisfy the JL lemma with the same constants as Gaussian) and
run distance work in the reduced space at 4× less bandwidth. The sign
matrix is DERIVED, not stored: sign(j, i) = parity of the shared
md5-based h32 over "jl|j|i" (functions/hashing.py), so every executor
— and the DuckDB oracle — reconstructs the identical matrix from the
seed string alone; there is no matrix artifact to version, broadcast,
or drift (the same discipline as the RP-LSH plane family,
queries/ann_lsh.py).

Unnormalized projection: E[(s_j · x)²] = ‖x‖² per component, so
E[‖Px‖²] = K·‖x‖² — consumers compare distances WITHIN the projected
space (ranking is scale-invariant) and the distortion report divides
by K explicitly.

Determinism: products are exact (±1 × double), sums left-fold in
element order via zip_with + aggregate — the same accumulation-order
contract the kNN oracle already relies on (functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cargo_chat_spark.functions.hashing import h32_py

JL_SEED = "jl"


def sign_matrix(out_dim: int, in_dim: int) -> list[list[int]]:
    """out_dim × in_dim ±1 matrix from md5 parity — identical in every
    engine/process that follows the same derivation."""
    return [
        [
            1 if h32_py(f"{JL_SEED}|{j}|{i}") % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def project_col(vec: Column, signs: list[list[int]]) -> Column:
    """array<double> of len(signs) JL components: comp_j = Σ_i s_ji·x_i,
    left-fold in element order (zip_with + aggregate, the vectors.py
    accumulation contract)."""
    comps = []
    for row in signs:
        srow = F.array(*[F.lit(float(s)) for s in row])
        prods = F.zip_with(vec, srow, lambda x, s: x.cast("double") * s)
        comps.append(F.aggregate(prods, F.lit(0.0), lambda a, v: a + v))
    return F.array(*comps)


def project(
    df: DataFrame,
    vec_col: str,
    signs: list[list[int]],
    out_col: str = "projected",
) -> DataFrame:
    return df.withColumn(out_col, project_col(F.col(vec_col), signs))


def project_sql(vec_sql: str, signs: list[list[int]]) -> str:
    """DuckDB twin: list of list_sum left-folds over the same literal
    sign rows, same element order, same DOUBLE promotion."""
    comps = []
    for row in signs:
        lit = "[" + ", ".join(str(s) for s in row) + "]"
        comps.append(
            f"list_sum(list_transform(generate_series(1, {len(row)}),"
            f" i -> CAST({vec_sql}[i] AS DOUBLE) * ({lit})[i]))"
        )
    return "[" + ", ".join(comps) + "]"
