#!/usr/bin/env python3
"""10x-scale oracle sweep (VERDICT r13 stretch): run the FULL contract
oracle comparison at /tmp/sf1 (10x the sf0.1 gate), where the committed
all-pairs oracle SQLs are infeasible (50k docs -> 1.25G list_intersect
pairs; the sf0.1 gotcha already bans check_oracle there).

The shared-pair-table trick, applied as a PROVABLE textual rewrite: the
13 oracles built on `FROM sh a JOIN sh b ON a.doc_id < b.doc_id` all
verify a positive-threshold overlap metric (jaccard >= 0.8, containment
>= 0.9), and any pair passing such a threshold shares >= 1 bigram — so
routing the join through an inverted-index candidate subquery (pairs
sharing >= 1 gram, 11.3M candidates at 10x vs 1.25G all-pairs, built
from the oracle's OWN sh CTE so probe-augmented variants stay covered)
is EXACT, not approximate. q_dedup_incremental's dd-x-bb form gets the
same treatment (its join predicate is literally `intersection >= 1`).

Two modes:
  prove:  python3 tools/check_oracle_10x.py --prove <dump> <sfdir>
          runs ORIGINAL vs REWRITTEN oracle SQL at a small sf and
          asserts identical results for every rewritten query — the
          equivalence certificate, recorded in BASELINE.md.
  sweep:  python3 tools/check_oracle_10x.py <dump> <sfdir> [names]
          the check_oracle.py comparison with rewrites applied and
          directory-parquet (glob) table views; per-query wall time
          printed for the BASELINE 10x table.
"""
import json, math, os, sys, time
import duckdb
import pandas

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# the all-pairs core shared by the 13 jaccard/containment-family
# oracles, and its inverted-index-candidate equivalent (exact for every
# positive-threshold overlap predicate downstream)
PAIR_CORE = "FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
PAIR_REWRITE = """FROM (SELECT DISTINCT p1.doc_id AS cid_a, p2.doc_id AS cid_b
    FROM (SELECT doc_id, u.g FROM sh, unnest(grams) AS u(g)) p1
    JOIN (SELECT doc_id, u.g FROM sh, unnest(grams) AS u(g)) p2
      ON p1.g = p2.g AND p1.doc_id < p2.doc_id) _cand
  JOIN sh a ON a.doc_id = _cand.cid_a
  JOIN sh b ON b.doc_id = _cand.cid_b"""

INCR_CORE = "FROM dd JOIN bb ON len(list_intersect(dd.grams, bb.grams)) >= 1"
INCR_REWRITE = """FROM (SELECT DISTINCT p1.doc_id AS cid_d, p2.doc_id AS cid_b
    FROM (SELECT doc_id, u.g FROM dd, unnest(grams) AS u(g)) p1
    JOIN (SELECT doc_id, u.g FROM bb, unnest(grams) AS u(g)) p2
      ON p1.g = p2.g) _cand
  JOIN dd ON dd.doc_id = _cand.cid_d
  JOIN bb ON bb.doc_id = _cand.cid_b"""

# q_contamination: train x bench coverage (>= 0.5 > 0) — the same
# shared-gram argument between the two sides makes the candidate route
# exact
CONTAM_CORE = "FROM t, b\nWHERE"
CONTAM_REWRITE = """FROM (SELECT DISTINCT p1.train_id AS cid_t, p2.bench_id AS cid_b
    FROM (SELECT train_id, u.g FROM t, unnest(grams) AS u(g)) p1
    JOIN (SELECT bench_id, u.g FROM b, unnest(grams) AS u(g)) p2
      ON p1.g = p2.g) _cand
  JOIN t ON t.train_id = _cand.cid_t
  JOIN b ON b.bench_id = _cand.cid_b
WHERE"""


def ahash64(b):
    """Exact replica of graft.functions.PHash64.compute (integer
    cross-multiplied stripe-mean aHash) — vectorized. Sums of uint8
    bytes stay far below 2^53, so the float64 bincount weights are
    exact before the int64 cast."""
    import numpy as np
    n = len(b)
    if n == 0:
        return 0
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    idx = (np.arange(n, dtype=np.int64) * 64) // n
    sums = np.bincount(idx, weights=arr, minlength=64).astype(np.int64)
    cnts = np.bincount(idx, minlength=64).astype(np.int64)
    total = int(sums.sum())
    h = 0
    for i in range(64):
        if cnts[i] > 0 and sums[i] * n > total * cnts[i]:
            h |= 1 << i
    return h


def phash_overflow(con, cap=64):
    """q_phash_dedup's overflow_buckets, derived by the SAME capped rule
    the engine applies (VERDICT r15 #3) instead of the gate-calibrated
    literal 0: overflowing exact-aHash classes (size > cap, among the
    cocc >= 2 dup mass — singletons cannot overflow) plus overflowing
    rep-band buckets (4 x 16-bit chunks over class-representative
    hashes, > cap distinct reps). At the gate scales this computes 0
    (== the committed literal, the prove-mode certificate); at 100x it
    reports the true 3124 + 4 the engine honestly accounts."""
    from collections import defaultdict
    df = con.execute("SELECT doc_id, text FROM documents").fetchdf()
    base = ("a" * 10 + "z" * 10) * 32
    planted = [(9200001, base), (9200002, base[:305] + "c" + base[306:]),
               (9200003, ("z" * 10 + "a" * 10) * 32)]
    cls = defaultdict(list)
    for mid, t in zip(df["doc_id"], df["text"]):
        cls[ahash64(t.encode("utf-8"))].append(int(mid))
    for mid, t in planted:
        cls[ahash64(t.encode("utf-8"))].append(mid)
    class_ov = sum(1 for m in cls.values() if len(m) > cap)
    band_occ = defaultdict(int)
    for h in cls:  # one distinct rep per class per band
        for b in range(4):
            band_occ[(b, (h >> (b * 16)) & 0xFFFF)] += 1
    band_ov = sum(1 for v in band_occ.values() if v > cap)
    return class_ov + band_ov


def rewrite(sql):
    """Returns (rewritten_sql, was_rewritten).

    Besides routing the all-pairs join through the candidate subquery,
    the sh/pairs CTEs are marked MATERIALIZED: DuckDB inlines plain
    CTEs per reference, so a graph oracle referencing `pairs` 3-4 times
    would re-evaluate the candidate join and the jaccard verification
    that many times (measured: one q_adamic_adar ran 19+ minutes at 10x
    without the hint, ~2 minutes with it). MATERIALIZED is purely an
    evaluation hint — results are unchanged, and prove mode asserts so.
    """
    out = sql
    hit = PAIR_CORE in out or INCR_CORE in out or CONTAM_CORE in out
    if hit:
        out = out.replace("sh AS (", "sh AS MATERIALIZED (", 1)
        out = out.replace("pairs AS (", "pairs AS MATERIALIZED (", 1)
        out = out.replace(PAIR_CORE, PAIR_REWRITE)
        out = out.replace(INCR_CORE, INCR_REWRITE)
        out = out.replace(CONTAM_CORE, CONTAM_REWRITE)
    return out, hit


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    # pandas NaT (a null timestamp) is != itself, like NaN — two NULL
    # effective_to cells compared unequal and failed q_scd2_dimension at
    # 10x despite identical frames (round 15). It is a singleton, so an
    # identity probe normalizes it without touching array-valued cells
    # (pd.isna on an array returns an array and would raise here).
    if v is pandas.NaT:
        return "NaT"
    return v


def cells_eq(a, b):
    """Cell comparison with DOUBLE-SUM tolerance (10x sweep only — the
    sf0.01 driver gate stays bit-exact after round(,4)): a 600k-row
    double sum at 1e10 magnitude accumulates order-dependent ulp error
    ~1e-4, past the oracles' 4-decimal rounding, so engine-vs-DuckDB
    sums differ at relative ~1e-13 (measured: 53049574168.3994 vs
    .3998). rel_tol 1e-10 passes accumulation order and nothing else —
    a genuinely wrong aggregate is off by far more."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b or math.isclose(a, b, rel_tol=1e-10, abs_tol=1e-9)
    return a == b


def rows_eq(g, w):
    return len(g) == len(w) and all(
        len(x) == len(y) and all(cells_eq(a, b) for a, b in zip(x, y))
        for x, y in zip(g, w))


def make_views(con, sfdir):
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")


def frame(df):
    df = df[sorted(df.columns)]
    return list(df.columns), [[norm(v) for v in row]
                              for row in df.itertuples(index=False)]


def prove(dump, sfdir):
    con = duckdb.connect()
    make_views(con, sfdir)
    oracle = json.load(open(f"{dump}/oracle_sql.json"))
    bad = 0
    n = 0
    for name, sql in sorted(oracle.items()):
        new, hit = rewrite(sql)
        if name == "q_phash_dedup":
            # cap-aware overflow certificate: at a gate scale the
            # derived rule must reproduce the committed literal 0
            n += 1
            derived = phash_overflow(con)
            lit = int(con.execute(sql).fetchdf()["overflow_buckets"][0])
            if derived == lit:
                print(f"PROVE ok   {name} (derived overflow {derived} == literal)")
            else:
                print(f"PROVE FAIL {name}: derived overflow {derived} != literal {lit}")
                bad += 1
            continue
        if not hit:
            continue
        n += 1
        a = frame(con.execute(sql).fetchdf())
        b = frame(con.execute(new).fetchdf())
        if a == b:
            print(f"PROVE ok   {name} ({len(a[1])} rows identical)")
        else:
            print(f"PROVE FAIL {name}: original and rewritten differ")
            bad += 1
    print(f"\nprove: {n - bad}/{n} rewrites identical to the originals")
    return 1 if bad else 0


def sweep(dump, sfdir, names=None):
    con = duckdb.connect()
    make_views(con, sfdir)
    oracle = json.load(open(f"{dump}/oracle_sql.json"))
    if names:
        keep = set(names.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    ok = fail = 0
    rewritten = 0
    for name, sql in sorted(oracle.items()):
        sql, hit = rewrite(sql)
        if name == "q_phash_dedup":
            hit = True  # cap-aware overflow replaces the gate literal
        rewritten += int(hit)
        t0 = time.time()
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{dump}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            if name == "q_phash_dedup":
                want["overflow_buckets"] = phash_overflow(con)
            gc, g = frame(got)
            wc, w = frame(want)
            dt = time.time() - t0
            if gc != wc:
                print(f"FAIL {name}: columns {gc} vs {wc}")
                fail += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                fail += 1
            elif rows_eq(g, w):
                tag = " (rewritten)" if hit else ""
                print(f"OK   {name} ({len(g)} rows, {dt:.1f}s{tag})")
                ok += 1
            else:
                bad = next(i for i, (x, y) in enumerate(zip(g, w))
                           if not (len(x) == len(y) and
                                   all(cells_eq(a, b) for a, b in zip(x, y))))
                print(f"FAIL {name}: first diff row {bad}:\n  spark={g[bad]}\n  duck ={w[bad]}")
                fail += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail, {len(oracle)} total ({rewritten} oracles rewritten)")
    return 1 if fail else 0


if __name__ == "__main__":
    if sys.argv[1] == "--prove":
        sys.exit(prove(sys.argv[2], sys.argv[3]))
    sys.exit(sweep(sys.argv[1], sys.argv[2],
                   sys.argv[3] if len(sys.argv) > 3 else None))
