"""Self-check harness mimicking the driver's correctness gate:
runs every queries() entry and its oracle_sql() side by side, compares
row count + sorted-column values (orderless hash-equivalent).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,))
                              else v)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return (f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} "
                f"sql={sorted(sql_df.columns)}")
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT ray={len(ray_df)} sql={len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Emulate the driver's value-hash: exact equality, dtype-kind
        # sensitive (int64 vs float64 is a hash mismatch).
        if av.dtype.kind != bv.dtype.kind and {av.dtype.kind,
                                               bv.dtype.kind} <= {"i", "u",
                                                                  "f"}:
            return (f"DTYPE col={c} ray={av.dtype} sql={bv.dtype} "
                    f"(driver hash would differ)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # Driver-calibrated: round-1 hashes caught 6th-decimal diffs
            # but tolerated 1e-8 float32 widening noise → compare at 6 dp.
            x = np.round(av.astype(float).to_numpy(), 6)
            y = np.round(bv.astype(float).to_numpy(), 6)
            ok = bool(np.all((x == y) | (np.isnan(x) & np.isnan(y))))
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            mism = (av.astype(str) != bv.astype(str))
            idx = mism[mism].index[:3].tolist()
            return (f"VALUES col={c} first diffs at {idx}: "
                    f"ray={av.iloc[idx].tolist() if idx else '?'} "
                    f"sql={bv.iloc[idx].tolist() if idx else '?'}")
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as E
    qs, sqls = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: "
                  f"{str(e)[:160]}")
            failures += 1
            continue
        if name not in sqls:
            print(f"{name:28s} rows-only ({len(ray_df)} rows, "
                  f"{time.time() - t0:.1f}s)")
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"{name:28s} SQL-ERROR {type(e).__name__}: "
                  f"{str(e)[:160]}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        if verdict != "OK":
            failures += 1
        print(f"{name:28s} {verdict}  ({len(ray_df)} rows, "
              f"{time.time() - t0:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
