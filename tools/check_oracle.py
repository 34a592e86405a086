#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.execute(sql).df()
            # driver behavior: sort columns by name, then compare values
            got = got[sorted(got.columns)]
            exp = exp[sorted(exp.columns)]
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
                n_fail += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
                n_fail += 1
                continue
            # driver-hasher parity: a pandas dtype KIND divergence (e.g.
            # DuckDB HUGEINT -> object/float64 vs Spark long -> int64)
            # renders differently under the driver's value hasher even when
            # `norm` hides it here. Width-only differences (int32 vs int64)
            # render identically and are fine — r02 proved the driver
            # accepts them.
            if [d.kind for d in got.dtypes] != [d.kind for d in exp.dtypes]:
                print(f"FAIL {name}: dtype kinds {[str(d) for d in got.dtypes]}"
                      f" vs {[str(d) for d in exp.dtypes]}")
                n_fail += 1
                continue
            # row-order-insensitive compare (sort rows by normalized repr)
            g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
            e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False))
            if g == e:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    # queries without oracle: weaker rows-only check over the result dirs
    import os
    produced = {d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(produced - set(oracle)):
        if only and name not in only:
            continue
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
        print(f"{'PASS' if rows > 0 else 'FAIL'} {name} (no oracle; rows={rows})")
        if rows > 0:
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
