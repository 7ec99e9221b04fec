#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only —
the shipped library is pure Scala).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [only_csv]

`only_csv` (optional, comma-separated entry names) restricts the
sweep — the resume path for big-SF runs. Each oracle runs with a
disk spill directory and an explicit memory limit, and any per-entry
DuckDB error (OOM on a huge sf1 oracle, most likely) is caught,
reported as `FAIL err`, and the connection rebuilt so one heavy
oracle cannot abort the rest of the sweep.

Reads each <name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf dir's
parquet tables, and compares row count, column names, dtypes, and
values (sorted columns, sorted rows, floats rounded).

IMPORTANT: both sides are compared through pandas DataFrames (`.df()`),
NOT `fetchall()`. The driver's checker converts DuckDB results to
pandas, and that conversion layer has bitten twice: ns-precision
timestamps (round 1) and HUGEINT windowed sums rendering as float64
("1.0" vs Spark's "1", round 2). `fetchall()` yields native Python
ints and can never see either class of bug, so this gate must go
through the same pandas layer the driver uses — including a
dtype-KIND parity assertion (int vs float vs datetime vs object),
so a HUGEINT→float64 oracle column fails here before it fails in
the driver. Width differences (int32 vs int64, float32 vs float64)
are normalized first — they stringify identically and the driver's
value compare tolerates them (7 green r2 rows have them)."""
import sys, json, glob
import duckdb


def canon(df):
    """(sorted cols, sorted stringified rows, dtype kinds in col order).

    Integer widths → int64 and float widths → float64 before
    stringifying, so np.float32 values round like Python floats and
    int32/int64 render the same; the *kind* (i/f/M/b/O) must match,
    because a kind flip is exactly the conversion-layer bug class
    ("1.0" vs "1") that the driver's string compare trips on."""
    df = df[sorted(df.columns)].copy()
    kinds = []
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
            k = "i"
        elif k == "f":
            df[c] = df[c].astype("float64")
        kinds.append(k)
    rows = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        rows.append(tuple(vals))
    rows.sort()
    return list(df.columns), rows, kinds


def connect(sfdir):
    import os, tempfile
    con = duckdb.connect()
    # spill instead of bad_alloc on the huge sf1 oracles; leave
    # headroom for the pandas conversion of big results
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duck_spill'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("CHECK_MEMLIMIT", "48GB"))
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        # driver testdata ships single files; ScaleUp-derived sf dirs
        # are Spark-written DIRECTORIES of part files — glob those
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main(outdir, sfdir, only=None):
    con = connect(sfdir)
    only_set = set(only.split(",")) if only else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if only_set is not None and name not in only_set:
            continue
        got_df = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            print(f"  rows-only  {name:28s} rows={len(got_df)}")
            n_rows_only += 1
            continue
        try:
            exp_df = con.execute(oracle[name]).df()
        except duckdb.Error as e:
            print(f"  FAIL err   {name}: {type(e).__name__}: {str(e)[:120]}")
            n_fail += 1
            try:
                con.close()
            except Exception:
                pass
            con = connect(sfdir)  # a dead/OOM'd connection is unusable
            continue
        gc, gr, gt = canon(got_df)
        ec, er, et = canon(exp_df)
        if gc != ec:
            print(f"  FAIL cols  {name}: got {gc} want {ec}")
            n_fail += 1
        elif gt != et:
            bad = [(c, a, b) for c, a, b in zip(gc, gt, et) if a != b]
            print(f"  FAIL dkind {name}: (col, spark, oracle) diffs: {bad}")
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
