#!/usr/bin/env python3
"""Local self-check harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/oracle_sql.json, registers the sf parquet tables as
DuckDB views, runs each oracle, loads the corresponding Spark parquet dump,
sorts columns by name, and compares row-by-row (exact, with a float report).
NOT part of the shipped library — dev tooling only.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def survey_keys():
    """SURVEY.md §2 table keys — the coverage contract."""
    import re
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    if not os.path.exists(path):
        return None
    return set(re.findall(r"^\| \d+ \| `(q_\w+)` \|", open(path).read(), re.M))

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Key-set drift gate (full runs only): SURVEY §2 == registered
    # queries (the dumped dirs) == oracle entries. Any mismatch is a
    # hard fail so the three inventories can never drift apart.
    if not only:
        sv = survey_keys()
        dumped = {os.path.basename(d) for d in glob.glob(os.path.join(outdir, "q_*")) if os.path.isdir(d)}
        oracle_keys = set(json.load(open(os.path.join(outdir, "oracle_sql.json"))).keys())
        if sv is not None:
            drift = [("SURVEY-only", sv - dumped), ("queries-only", dumped - sv),
                     ("oracle-only", oracle_keys - dumped), ("queries-without-oracle", dumped - oracle_keys)]
            bad = {k: sorted(v) for k, v in drift if v}
            if bad:
                brief = {k: (len(v), v[:5]) for k, v in bad.items()}
                print(f"FAIL key-set drift (count, first 5): {brief}")
                sys.exit(1)
            print(f"key sets consistent: {len(sv)} keys in SURVEY == queries == oracles")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        bad = []
        for c in g.columns:
            a, b = g[c], e[c]
            if pd.api.types.is_float_dtype(a):
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    d = (a - b).abs().max()
                    bad.append(f"{c} (maxdiff={d})")
            else:
                eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = int(np.argmax(~eq.values))
                    bad.append(f"{c} (e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r})")
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
