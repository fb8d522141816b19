#!/usr/bin/env python3
"""DuckDB-oracle timing sweep, invoked by graft.Bench to pair every bench
snapshot with the oracle's numbers at the same commit and scale factor.

Usage: python3 tools/oracle_bench.py <sfDir> <oracleSqlJson> [passes]

Runs each oracle SQL from the JSON map over the sfDir parquet tables and
prints ONE JSON object: {"total": sec, "threads": n, "queries": {name: sec}}.
Timing discipline mirrors the Spark side: interleaved sweeps, min per
query (this host has multi-second noise bursts; back-to-back repeats of
one query let a single burst poison all of its passes).
"""
import json, os, sys, time


def main(sf_dir, sql_json, passes=2):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. the 10x-replicated bench corpus):
            # a directory of part files, globbed for duckdb
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(sql_json))
    names = sorted(oracle)
    # warm pass primes the buffer pool / casts, mirroring Spark's warm sweep
    for n in names:
        try:
            con.sql(oracle[n]).fetchall()
        except Exception:
            pass
    times = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            try:
                con.sql(oracle[n]).fetchall()
                times[n].append(time.perf_counter() - t0)
            except Exception:
                times[n].append(-1.0)
    best = {n: (round(min(v), 4) if all(x >= 0 for x in v) else -1)
            for n, v in times.items()}
    total = round(sum(v for v in best.values() if v >= 0), 4)
    threads = con.sql("SELECT current_setting('threads')").fetchone()[0]
    # per-pass times alongside the min: a noise burst in one pass is then
    # legible in the artifact instead of silently inflating/deflating "min"
    all_passes = {n: [round(x, 4) for x in v] for n, v in times.items()}
    # explicit failure list — the Scala side keys its paired-min validity
    # off THIS, not off scanning the document for -1 sentinels (which
    # legitimately appear in per-pass arrays)
    failed = sorted(n for n, v in best.items() if v < 0)
    print(json.dumps({"total": total, "threads": int(threads),
                      "failed": failed, "queries": best,
                      "passes": all_passes}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 2))
