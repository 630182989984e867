"""Local replica of the DRIVER's correctness gate, pandas path included.

The pytest harness (tests/test_oracle_harness.py) canonicalizes cells in
pure Python; the driver instead routes BOTH engines' results through pandas
(toPandas / duckdb .df()), sorts columns by name, sorts rows, and
value-hashes. That pandas layer has its own failure modes — ns-timestamp
overflow (CORRECTNESS_r07: user_value_scd2), list cells in sort_values —
so this sim reproduces it: any query that passes here should pass the
driver's gate at the same sf.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] \
        [--window | --all | name [name ...]]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            # datetime objects from duckdb land as object; force through
            # pandas datetime conversion like the driver's frame does
            if s.map(lambda v: hasattr(v, "isoformat")).any():
                df[c] = pd.to_datetime(s)  # raises OutOfBoundsDatetime
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def _vhash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def run(names, sf_dir, spark, con) -> dict:
    from cargo_chat_spark.queries import catalog

    out = {}
    for name in names:
        t0 = time.time()
        row = {"ok": False, "err": None, "weak": False}
        try:
            sdf = catalog.SPARK_QUERIES[name](spark, sf_dir)
            spd = sdf.toPandas()
            if name not in catalog.ORACLE_SQL:
                row.update(ok=True, weak=True, spark_rows=len(spd))
            else:
                dpd = con.execute(catalog.ORACLE_SQL[name]).df()
                sc, dc = _canon(spd), _canon(dpd)
                row["spark_rows"] = len(sc)
                row["oracle_rows"] = len(dc)
                row["rows_match"] = len(sc) == len(dc)
                row["schema_match"] = list(sc.columns) == list(dc.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _vhash(sc) == _vhash(dc)
                )
                row["ok"] = row["hash_match"]
        except Exception as e:  # noqa: BLE001 — sim mirrors driver's catch-all
            row["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        row["sec"] = round(time.time() - t0, 2)
        out[name] = row
        status = "ok" if row["ok"] else ("WEAK" if row["weak"] else "FAIL")
        print(f"  {name}: {status} ({row['sec']}s)", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cargo_chat_spark.queries import catalog
    from cargo_chat_spark.session import get_spark
    from cargo_chat_spark.sources.testdata import TABLES

    if args.window:
        names = list(catalog.GATE_WINDOW)
    elif args.all:
        names = list(catalog.SPARK_QUERIES)
    else:
        names = args.names
    if not names:
        ap.error("give names, --window, or --all")

    spark = get_spark(app_name="driver_sim", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    res = run(names, args.sf, spark, con)
    n_ok = sum(r["ok"] and not r["weak"] for r in res.values())
    n_weak = sum(r["weak"] for r in res.values())
    n_fail = sum(not r["ok"] for r in res.values())
    print(f"ok={n_ok} weak={n_weak} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
