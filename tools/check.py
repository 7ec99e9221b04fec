#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only —
the shipped library is pure Scala).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf dir's
parquet tables, and compares row count, column names, and values
(sorted columns, sorted rows, floats rounded)."""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(outdir, sfdir):
    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_rows, got_cols = got.fetchall(), [c[0] for c in got.description]
        if name not in oracle:
            print(f"  rows-only  {name:28s} rows={len(got_rows)}")
            n_rows_only += 1
            continue
        exp = con.execute(oracle[name])
        exp_rows, exp_cols = exp.fetchall(), [c[0] for c in exp.description]
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  FAIL cols  {name}: got {gc} want {ec}")
            n_fail += 1
        elif gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"  FAIL rows  {name}: {len(gr)} vs {len(er)} rows; first diffs: {bad}")
            n_fail += 1
        else:
            print(f"  ok         {name:28s} rows={len(gr)}")
            n_pass += 1
    print(f"pass={n_pass} fail={n_fail} rows_only={n_rows_only}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
