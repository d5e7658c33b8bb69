"""Driver-mimic correctness sweep: run queries() vs oracle_sql() in DuckDB.

Usage (from the repo root, so Ray workers can import the package):

    python tools/oracle_sweep.py [query ...]

With no arguments, sweeps every oracled query. Comparison is strict:
sorted column names, float values rounded to 6 decimals, rows sorted by
all columns, then stringified cell-by-cell equality — which is dtype-
sensitive (int64 65 != float64 65.0), deliberately stricter than the
pandas-canon parity test so oracle-side dtype drift is caught before the
per-round driver hashes values.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns),
                          key=lambda s: s.astype(str)).reset_index(drop=True)


def main() -> int:
    sys.path.insert(0, REPO)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import __ray_entry__ as ent

    qs = ent.queries()
    oracles = ent.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF}/{t}.parquet')")

    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            print("usage: oracle_sweep.py [query ...] [--out FILE]")
            return 2
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or [n for n in qs if n in oracles]
    fails = []
    detail: dict[str, dict] = {}
    for name in names:
        if name not in oracles:
            print(f"SKIP {name}: no oracle", flush=True)
            continue
        t0 = time.time()
        try:
            got = _norm(_to_pandas(qs[name](SF)))
            want = _norm(con.execute(oracles[name]).fetchdf())
            rows = len(got) == len(want)
            schema = list(got.columns) == list(want.columns)
            vals = False
            if rows and schema:
                a, b = got.astype(str).values, want.astype(str).values
                vals = bool((a == b).all())
            ok = rows and schema and vals
            detail[name] = {
                "ok": ok, "rows": len(got), "oracle_rows": len(want),
                "schema_match": schema, "vals_match": vals,
                "secs": round(time.time() - t0, 2)}
            print(f"{'OK ' if ok else 'FAIL'} {name} "
                  f"rows={len(got)}/{len(want)} schema={schema} vals={vals} "
                  f"{time.time() - t0:.1f}s", flush=True)
            if not ok:
                fails.append(name)
                if rows and schema:
                    diff = (a != b).any(axis=1)
                    print("  engine:", got[diff].head(3).to_dict("records"))
                    print("  oracle:", want[diff].head(3).to_dict("records"))
                else:
                    print("  engine cols:", list(got.columns))
                    print("  oracle cols:", list(want.columns))
        except Exception as exc:
            fails.append(name)
            detail[name] = {"ok": False, "error": str(exc)}
            print(f"ERR  {name}: {exc}", flush=True)
            traceback.print_exc()

    summary = {"sf": SF, "checked": len(names), "fails": fails,
               "queries": detail}
    if out_path:  # per-round machine-verifiable artifact (VERDICT r4 item 2)
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({"sf": SF, "checked": len(names), "fails": fails}))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
