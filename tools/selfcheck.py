#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: schema (column names sorted), row count,
and a hash of the full value multiset (columns sorted by name, rows
sorted by all columns, floats kept as-is so only bit-identical or
round()-stabilized values pass — same standard the driver applies).
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return out


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    import datetime, decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def fetch(rel):
    """Fetch through pandas, like the driver's comparator — this is what
    surfaces DuckDB HUGEINT (e.g. sum(BIGINT)) as float64, so an
    integer-typed Spark column vs an uncast oracle sum FAILS here too
    (the round-1 window_sessionize red was invisible to fetchall())."""
    df = rel.df()
    cols = list(df.columns)
    rows = []
    for r in df.itertuples(index=False, name=None):
        clean = []
        for v in r:
            if v is None or (isinstance(v, float) and v != v):
                clean.append(None)
            elif type(v).__name__ == "ndarray":
                raise TypeError(
                    f"raw array column (driver comparator cannot hash): {v!r:.60}")
            else:
                clean.append(v)
        rows.append(tuple(clean))
    return cols, rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        try:
            gcols, grows = fetch(got)
        except TypeError as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if name not in oracle:
            print(f"skip  {name}: rows-only ({len(grows)} rows)")
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = fetch(exp)
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL  {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            failures += 1
            continue
        cg, ce = canon(grows, gcols), canon(erows, ecols)
        if len(cg) != len(ce):
            print(f"FAIL  {name}: rowcount {len(cg)} != {len(ce)}")
            failures += 1
        elif cg != ce:
            diff = next(i for i, (a, b) in enumerate(zip(cg, ce)) if a != b)
            print(f"FAIL  {name}: values differ at sorted-row {diff}:")
            print(f"      spark:  {cg[diff]}")
            print(f"      duckdb: {ce[diff]}")
            failures += 1
        else:
            print(f"ok    {name}: {len(cg)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
