"""Driver-style correctness sweep: run every __ray_entry__ query AND its
DuckDB oracle at a given sf dir, compare rows + schema + values (column-name
sorted). The value compare is DRIVER-FAITHFUL: a canonical byte
serialization that is dtype-sensitive (int64 32 != float64 32.0) and
zero-sign-sensitive (-0.0 != +0.0) — CORRECTNESS_r03's two red rows passed
np.array_equal locally while the driver's hash failed them on exactly
these two representation classes. Usage:

    python tools/correctness_check.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def col_equal(a: pd.Series, b: pd.Series) -> tuple[bool, str]:
    """Canonical-representation equality, mimicking a value hash that sees
    dtype and the bit pattern of every value (NaN payloads canonicalized)."""
    an, bn = a.to_numpy(), b.to_numpy()
    if len(an) != len(bn):
        return False, "length"
    # strict: ANY dtype difference is a representation difference, including
    # float32 vs float64 — the same local-pass/driver-fail class this tool
    # exists to catch
    if an.dtype != bn.dtype:
        return False, f"dtype {an.dtype} vs {bn.dtype}"
    if an.dtype.kind in "iu":
        return bool(np.array_equal(an, bn)), "int values"
    if an.dtype.kind == "f":
        an = an.astype(np.float64, copy=True)
        bn = bn.astype(np.float64, copy=True)
        an[np.isnan(an)] = np.nan  # canonical quiet-NaN payload
        bn[np.isnan(bn)] = np.nan
        if an.tobytes() == bn.tobytes():
            return True, ""
        bad = an.view(np.uint64) != bn.view(np.uint64)
        i = int(np.argmax(bad))
        return False, (f"{int(bad.sum())} byte-diffs, first at row {i}: "
                       f"{an[i]!r} vs {bn[i]!r} (equal={an[i] == bn[i]})")
    for i, (x, y) in enumerate(zip(an, bn)):
        if x != y or type(x) is not type(y):
            return False, f"row {i}: {x!r} ({type(x).__name__}) vs {y!r} ({type(y).__name__})"
    return True, ""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    spec = importlib.util.spec_from_file_location("re_", os.path.join(REPO, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, oracles = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = canon(to_df(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(df)} rows ({wall:.1f}s) [no oracle, declared]")
            n_rows_only += 1
            continue
        try:
            odf = canon(con.execute(oracles[name]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {exc}")
            n_fail += 1
            continue
        ok = list(df.columns) == list(odf.columns) and len(df) == len(odf)
        why = "schema/rows"
        if ok:
            for c in df.columns:
                same, detail = col_equal(df[c], odf[c])
                if not same:
                    ok, why = False, f"col {c}: {detail}"
                    break
        if ok:
            print(f"pass  {name}: {len(df)} rows ({wall:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {why} (ray {len(df)} vs sql {len(odf)})")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
