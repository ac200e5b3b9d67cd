#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's compare:
run each oracle SQL in DuckDB over the sf parquet tables, load the Verify
parquet output, sort columns by name and rows by values, compare exactly.

Usage: check_oracle.py <sfDir> <verifyOutDir> [jsonOut]
With jsonOut, writes {query: {"ok": bool, "rows": n, "detail": str}} —
committed as CORRECTNESS_SELF.json each round so every query has a
recorded correctness row regardless of how the driver samples.
(Driver-side tooling only — the shipped Scala library does not use this.)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # tz-aware UTC vs naive timestamps are the same instant under the
        # UTC session tz both engines pin; the driver's hash treats them as
        # equal (r6 passed with tz-aware Spark outputs, r7 with naive) —
        # canonicalize to naive so == / astype(str) agree too.
        if getattr(df[c].dtype, "tz", None) is not None:
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    record = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = {"ok": False, "rows": None, "detail": f"oracle SQL error: {e}"}
            failures += 1
            continue
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            record[name] = {"ok": False, "rows": None, "detail": f"spark output missing: {e}"}
            failures += 1
            continue
        e_n, a_n = norm(expected), norm(actual)
        if list(e_n.columns) != list(a_n.columns):
            print(f"FAIL {name}: columns differ: oracle={list(e_n.columns)} spark={list(a_n.columns)}")
            record[name] = {"ok": False, "rows": len(a_n), "detail": "columns differ"}
            failures += 1
            continue
        if len(e_n) != len(a_n):
            print(f"FAIL {name}: row counts differ: oracle={len(e_n)} spark={len(a_n)}")
            record[name] = {"ok": False, "rows": len(a_n), "detail": f"row counts differ: oracle={len(e_n)}"}
            failures += 1
            continue
        # The driver's hash compare is value-repr sensitive: int64 vs int32
        # or datetime64 vs date hash the same (r1 evidence: a8/i1/i3/t1 all
        # passed), but float vs int does NOT (4994.0 != 4994 — the HUGEINT ->
        # float64 trap that turned three r1 rows red). Flag exactly that class.
        def kind(d):
            k = d.kind
            return "num_f" if k == "f" else ("num_i" if k in "iu" else k)
        dtype_diffs = [
            f"col {c}: oracle dtype={e_n[c].dtype} spark dtype={a_n[c].dtype}"
            for c in e_n.columns
            if kind(e_n[c].dtype) != kind(a_n[c].dtype)
            and {kind(e_n[c].dtype), kind(a_n[c].dtype)} & {"num_f", "num_i", "b"}
        ]
        if dtype_diffs:
            print(f"FAIL {name}: " + "; ".join(dtype_diffs[:3]))
            record[name] = {"ok": False, "rows": len(a_n), "detail": "; ".join(dtype_diffs[:3])}
            failures += 1
            continue
        diffs = []
        for c in e_n.columns:
            ev, av = e_n[c], a_n[c]
            try:
                eq = (ev == av) | (ev.isna() & av.isna())
            except Exception:
                eq = ev.astype(str) == av.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"col {c} row {i}: oracle={ev[i]!r} spark={av[i]!r} ({int((~eq).sum())} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            record[name] = {"ok": False, "rows": len(a_n), "detail": "; ".join(diffs[:3])}
            failures += 1
        else:
            print(f"OK   {name} ({len(e_n)} rows)")
            record[name] = {"ok": True, "rows": int(len(e_n)), "detail": "rows+schema+values match"}
    # Rows-only queries (no oracle): mimic the driver, which still loads the
    # parquet and sorts rows by value — an unsortable column (e.g. an
    # array<int> -> numpy.ndarray cell) errors there even without an oracle.
    import os
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            df = pd.read_parquet(f"{out_dir}/{name}")
            df.reindex(sorted(df.columns), axis=1).sort_values(
                by=sorted(df.columns), kind="mergesort")
            print(f"OK   {name} (rows-only, {len(df)} rows)")
            record[name] = {"ok": True, "rows": int(len(df)), "detail": "rows-only (no oracle)"}
        except Exception as e:
            print(f"FAIL {name}: rows-only sort errored: {type(e).__name__}: {e}")
            record[name] = {"ok": False, "rows": None, "detail": f"rows-only sort errored: {type(e).__name__}: {e}"}
            failures += 1
    print(f"\n{failures} failures across oracle + rows-only checks")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(record),
                       "n_pass": sum(1 for r in record.values() if r["ok"]),
                       "queries": dict(sorted(record.items()))}, f, indent=1)
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
