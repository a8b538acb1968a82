#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [q1,q2,...]

An optional third argument restricts the check to a comma-separated
list of query names (for targeted re-verification after editing one
query, pairing with `runMain graft.Verify <sf> <out> <q1,q2>`).

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL (oracle_sql.json) in DuckDB against the sf_dir
parquet tables, sorts columns by name, and compares cell-by-cell.
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def main(outdir, sfdir, names=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if names:
        keep = set(names.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
        missing = keep - set(oracle)
        if missing:
            print(f"WARN unknown query names: {sorted(missing)}")
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                fail += 1
                continue
            if got.shape != want.shape:
                print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
                fail += 1
                continue
            g = [[norm(v) for v in row] for row in got.itertuples(index=False)]
            w = [[norm(v) for v in row] for row in want.itertuples(index=False)]
            if g == w:
                print(f"OK   {name} ({got.shape[0]} rows)")
                ok += 1
            else:
                bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
                print(f"FAIL {name}: first diff row {bad}:\n  spark={g[bad]}\n  duck ={w[bad]}")
                fail += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
