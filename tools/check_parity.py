#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir> [q1,q2,...]

For each query with oracle SQL: read Spark's parquet dump, run the
oracle SQL in DuckDB over the same sf parquet tables, sort columns by
name, compare schema-ish (column names), row counts, and values
(exact, after canonical string rendering).

Set SPARK_GRAFT_PARITY_FILE=PARITY_LOCAL.json to also write the
per-query verdicts + summary as a committed artifact (the repo's own
correctness claim, robust to driver-side CORRECTNESS_r{N}.json
glitches like r15's empty file). Full runs only — a subset run is
marked "subset": true so it can never masquerade as catalog parity.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def render(df: pd.DataFrame):
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    verdicts = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1
            verdicts[name] = {"status": "fail", "reason": "no spark output dir"}
            continue
        try:
            files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            verdicts[name] = {"status": "fail",
                              "reason": f"{type(e).__name__}: {e}"[:200]}
            continue
        sdf, ddf = canon(sdf), canon(ddf)
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}")
            n_fail += 1
            verdicts[name] = {"status": "fail", "reason": "column mismatch"}
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); n_fail += 1
            verdicts[name] = {"status": "fail",
                              "reason": f"rows {len(sdf)} vs {len(ddf)}"}
            continue
        # dtype check (schema match)
        dt_s = [str(x) for x in sdf.dtypes]; dt_d = [str(x) for x in ddf.dtypes]
        if dt_s != dt_d:
            print(f"WARN {name}: dtypes {list(zip(sdf.columns, dt_s, dt_d))}")
        rs, rd = render(sdf), render(ddf)
        bad = [i for i, (a, b) in enumerate(zip(rs, rd)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:")
            print(f"  spark: {rs[i][:300]}")
            print(f"  duck : {rd[i][:300]}")
            n_fail += 1
            verdicts[name] = {"status": "fail",
                              "reason": f"{len(bad)} differing rows"}
        else:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
            verdicts[name] = {"status": "pass", "rows": len(sdf)}
    # rows-only queries
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if only and name not in only:
            continue
        if os.path.isdir(p) and name not in oracle:
            files = sorted(glob.glob(f"{p}/*.parquet"))
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n}")
            verdicts[name] = {"status": "rows_only", "rows": n}
    print(f"\n{n_pass} passed, {n_fail} failed")
    parity_file = os.environ.get("SPARK_GRAFT_PARITY_FILE")
    if parity_file:
        with open(parity_file, "w") as f:
            json.dump({"metric": "oracle_parity", "sf": sf_dir,
                       "passed": n_pass, "failed": n_fail,
                       "subset": bool(only),
                       "generated_by": "tools/check_parity.py",
                       "queries": verdicts}, f, indent=0, sort_keys=True)
            f.write("\n")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
