#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name, and compares row count + values. With a
third argument, also writes a machine-readable per-query summary (used by
tools/native_verify.sh for the standing native-dir evidence artifact).
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (replicated or ScaleGen-generated corpus):
            # a directory of part files, globbed for duckdb
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    def fail(name, detail):
        nonlocal n_fail
        print(f"FAIL {name}: {detail}"); n_fail += 1
        results[name] = {"pass": False, "detail": detail}
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            fail(name, "no spark output"); continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            fail(name, str(e)); continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            fail(name, f"columns {list(got.columns)} != {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            fail(name, f"rows {len(got)} != {len(exp)}"); continue
        # The driver hashes RENDERED values, so an int64 vs float64 column
        # (e.g. DuckDB HUGEINT from an uncast sum(BIGINT) -> pandas float64)
        # fails there even though Python equality holds (3 == 3.0). Mirror
        # that strictness: dtype kinds must agree.
        kind_bad = [(c, got[c].dtype, exp[c].dtype) for c in got.columns
                    if got[c].dtype.kind != exp[c].dtype.kind]
        if kind_bad:
            c, gk, ek = kind_bad[0]
            fail(name, f"col {c} dtype kind spark={gk} oracle={ek}")
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), exp[c].tolist()
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                mismatch = (c, bad, a[bad], b[bad]); break
        if mismatch:
            c, i, a, b = mismatch
            fail(name, f"col {c} row {i}: spark={a!r} oracle={b!r}")
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            results[name] = {"pass": True, "rows": len(got)}
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
