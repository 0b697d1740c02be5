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

Isolation (r17 verdict #1): every per-query compare runs in a FORKED
child process with its own DuckDB connection under a defensive
PRAGMA memory_limit (PARITY_MEM_LIMIT, default 6GB; DuckDB spills to
PARITY_TMP instead of ballooning) and a wall-clock timeout
(PARITY_TIMEOUT seconds, default 600). A child that is OOM-killed,
segfaults, or hangs degrades to a single FAIL row — it can never take
down the whole artifact (r15/r17 CORRECTNESS files arrived EMPTY when
one heavy oracle killed the compare process). Each verdict also
records the child's peak RSS (MiB) so oracle-memory regressions are
visible in the artifact itself. Set PARITY_NO_FORK=1 to run in-process
(debugging only).
"""
import sys, json, glob, os, signal, resource

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MEM_LIMIT = os.environ.get("PARITY_MEM_LIMIT", "6GB")
TIMEOUT_S = int(os.environ.get("PARITY_TIMEOUT", "600"))
SPILL_DIR = os.environ.get("PARITY_TMP", "/tmp/duckdb_spill")


def canon(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def render(df):
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


def compare_one(sf_dir, out_dir, name, sql):
    """One oracle compare on a fresh DuckDB connection. Returns a
    verdict dict (no I/O besides reads). Runs inside the fork."""
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.execute(f"PRAGMA memory_limit='{MEM_LIMIT}'")
    con.execute(f"PRAGMA temp_directory='{SPILL_DIR}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        return {"status": "fail", "reason": "no spark output dir"}
    try:
        files = sorted(glob.glob(f"{spark_dir}/*.parquet"))
        sdf = pd.concat([pd.read_parquet(f) for f in files])
        ddf = con.execute(sql).df()
    except Exception as e:
        return {"status": "fail", "reason": f"{type(e).__name__}: {e}"[:200]}
    sdf, ddf = canon(sdf), canon(ddf)
    if list(sdf.columns) != list(ddf.columns):
        return {"status": "fail",
                "reason": f"columns {list(sdf.columns)} vs {list(ddf.columns)}"[:200]}
    # dtype drift computed before any row compare so a failing query
    # keeps the diagnostic that likely explains its row diff
    dt_s = [str(x) for x in sdf.dtypes]
    dt_d = [str(x) for x in ddf.dtypes]
    warn = None
    if dt_s != dt_d:
        warn = f"dtypes {list(zip(sdf.columns, dt_s, dt_d))}"[:300]
    if len(sdf) != len(ddf):
        v = {"status": "fail", "reason": f"rows {len(sdf)} vs {len(ddf)}"}
        if warn:
            v["warn"] = warn
        return v
    rs, rd = render(sdf), render(ddf)
    bad = [i for i, (a, b) in enumerate(zip(rs, rd)) if a != b]
    if bad:
        i = bad[0]
        v = {"status": "fail", "reason": f"{len(bad)} differing rows",
             "first_diff": {"row": i, "spark": rs[i][:300], "duck": rd[i][:300]}}
        if warn:
            v["warn"] = warn
        return v
    v = {"status": "pass", "rows": len(sdf)}
    if warn:
        v["warn"] = warn
    return v


def isolated_compare(sf_dir, out_dir, name, sql):
    """Fork, run compare_one in the child, stream the verdict back.
    OOM-kill / crash / timeout of the child → a FAIL verdict, never a
    dead parent."""
    rfd, wfd = os.pipe()
    pid = os.fork()
    if pid == 0:
        os.close(rfd)
        rc = 0
        try:
            v = compare_one(sf_dir, out_dir, name, sql)
        except Exception as e:
            v = {"status": "fail",
                 "reason": f"compare crashed: {type(e).__name__}: {e}"[:200]}
            rc = 1
        v["peak_mib"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
        payload = json.dumps(v).encode()
        with os.fdopen(wfd, "wb") as w:
            w.write(payload)
        os._exit(rc)
    os.close(wfd)
    data = b""
    timed_out = False

    def on_alarm(*_):
        raise InterruptedError()

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(TIMEOUT_S)
    try:
        with os.fdopen(rfd, "rb") as r:
            data = r.read()
    except InterruptedError:
        timed_out = True
        os.kill(pid, signal.SIGKILL)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    _, status = os.waitpid(pid, 0)
    if timed_out:
        return {"status": "fail", "reason": f"oracle timeout after {TIMEOUT_S}s"}
    if data:
        try:
            return json.loads(data.decode())
        except ValueError:
            pass
    if os.WIFSIGNALED(status):
        return {"status": "fail",
                "reason": f"compare process killed by signal {os.WTERMSIG(status)}"}
    return {"status": "fail",
            "reason": f"compare process exit {os.WEXITSTATUS(status)} with no verdict"}


def main(sf_dir, out_dir, only=None):
    import pandas as pd
    os.makedirs(SPILL_DIR, exist_ok=True)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    verdicts = {}
    in_process = os.environ.get("PARITY_NO_FORK") == "1"
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if in_process:
            v = compare_one(sf_dir, out_dir, name, sql)
        else:
            v = isolated_compare(sf_dir, out_dir, name, sql)
        verdicts[name] = v
        if v["status"] == "pass":
            n_pass += 1
            peak = f" peak {v['peak_mib']:.0f} MiB" if "peak_mib" in v else ""
            print(f"PASS {name} ({v['rows']} rows){peak}")
            if "warn" in v:
                print(f"WARN {name}: {v['warn']}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {v['reason']}")
            if "first_diff" in v:
                print(f"  spark: {v['first_diff']['spark']}")
                print(f"  duck : {v['first_diff']['duck']}")
            if "warn" in v:
                print(f"WARN {name}: {v['warn']}")
        sys.stdout.flush()
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
                       "mem_limit": MEM_LIMIT, "timeout_s": TIMEOUT_S,
                       "generated_by": "tools/check_parity.py",
                       "queries": verdicts}, f, indent=0, sort_keys=True)
            f.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
