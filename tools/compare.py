#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares: row count, column names/types, and cell values
(columns sorted by name, rows sorted lexicographically).
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (no oracle)"); continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = (~eq).argmax()
                diffs.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r} ({(~eq).sum()} cells)")
            elif a.dtype.kind == "f" and b.dtype.kind == "f":
                # -0.0 == 0.0 passes the value check but the driver's byte
                # hash distinguishes them (the q351 class): flag any cell
                # where values are equal but IEEE sign bits differ.
                nn = ~(a.isna().values | b.isna().values)
                sz = nn & (np.signbit(a.values) != np.signbit(b.values))
                if sz.any():
                    i = sz.argmax()
                    diffs.append(
                        f"{c}[{i}]: signed-zero {a.iloc[i]!r} vs {b.iloc[i]!r} ({sz.sum()} cells)")
        # Driver's hash is type-sensitive (DuckDB HUGEINT/int32 drift is a
        # real fail there), so the local gate must be strictly harder:
        # dtype mismatch = FAIL, not a note. Exception: pandas timestamp
        # RESOLUTION (ns from pyarrow parquet reads vs us from DuckDB
        # fetchdf) is a client-library artifact, not engine typing — the
        # driver's hash treats equal instants as equal (all timestamp
        # queries pass its gate) — so datetime64[*] canonicalizes before
        # the check.
        def dt(t):
            s = str(t)
            return "datetime64[us]" if s.startswith("datetime64") else s
        sd = {c: dt(t) for c, t in got.dtypes.items()}
        wd = {c: dt(t) for c, t in want.dtypes.items()}
        if sd != wd:
            dd = {c: (sd[c], wd[c]) for c in sd if sd[c] != wd[c]}
            diffs.append(f"dtype diff: {dd}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3])); n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
