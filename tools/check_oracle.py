#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: compare Verify.scala's parquet
dumps against the DuckDB oracle SQL, exactly (sorted columns + rows).

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not pq:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(pq)], ignore_index=True)
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE-SQL-ERROR {name}: {e}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA-MISMATCH {name}: got {list(g.columns)} exp {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"ROWCOUNT-MISMATCH {name}: got {len(g)} exp {len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            # The driver hashes stringified values, so a dtype mismatch IS a
            # failure even when == would coerce: DuckDB's windowed sum(BIGINT)
            # returns HUGEINT -> pandas float64, and "73.0" != "73". Round 5
            # lost q84/q87 to exactly this; CAST the oracle side to BIGINT.
            if gv.dtype.kind != ev.dtype.kind:
                print(f"   {c}: DTYPE-MISMATCH got {gv.dtype} exp {ev.dtype}")
                bad_cols.append(c)
                continue
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                eq = np.array_equal(gv.astype(float), ev.astype(float), equal_nan=True)
            else:
                eq = (pd.Series(gv).astype(str) == pd.Series(ev).astype(str)).all()
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"VALUE-MISMATCH {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                gv, ev = g[c].to_numpy(), e[c].to_numpy()
                if gv.dtype.kind == 'f':
                    d = np.abs(gv.astype(float) - ev.astype(float))
                    i = int(np.nanargmax(d))
                    print(f"   {c}: maxdiff={np.nanmax(d):.3e} at row {i}: got {gv[i]!r} exp {ev[i]!r}")
                else:
                    neq = pd.Series(gv).astype(str) != pd.Series(ev).astype(str)
                    i = int(neq.idxmax())
                    print(f"   {c}: first diff at row {i}: got {gv[i]!r} exp {ev[i]!r}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"OK {name} ({len(g)} rows)")
    # rows-only queries
    for d in sorted(glob.glob(os.path.join(outdir, "q*"))):
        name = os.path.basename(d)
        if name not in oracle:
            pq = glob.glob(os.path.join(d, "*.parquet"))
            n = sum(len(pd.read_parquet(p)) for p in pq) if pq else 0
            print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
