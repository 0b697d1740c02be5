#!/usr/bin/env python3
"""Per-oracle DuckDB peak-memory prober (r17 verdict #1).

Usage: python3 tools/oracle_mem.py <sfDir> <verifyOutDir> [q1,q2,...]

Forks one child process per oracle query; the child opens its own
DuckDB connection over the sf parquet views, executes the oracle SQL,
and reports its own ru_maxrss back through a pipe. A child that dies
(kernel OOM-kill, segfault) or hangs past the timeout is recorded as
such without taking the parent down — the same isolation contract
check_parity.py uses.

Output: one line per query `PEAK <MiB> <name>` (sorted descending at
the end), so the worst oracles are measurable before/after a
restructure.
"""
import sys, json, os, resource, struct, signal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

TIMEOUT_S = int(os.environ.get("ORACLE_MEM_TIMEOUT", "300"))


def child_run(sf_dir, sql, wfd):
    import duckdb
    con = duckdb.connect()
    lim = os.environ.get("ORACLE_MEM_LIMIT")
    if lim:
        con.execute(f"PRAGMA memory_limit='{lim}'")
        os.makedirs("/tmp/duckdb_spill", exist_ok=True)
        con.execute("PRAGMA temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n = len(con.execute(sql).fetchall())
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    os.write(wfd, struct.pack("qq", peak_kb, n))


def measure(sf_dir, name, sql):
    rfd, wfd = os.pipe()
    pid = os.fork()
    if pid == 0:
        os.close(rfd)
        try:
            child_run(sf_dir, sql, wfd)
            os._exit(0)
        except Exception as e:
            sys.stderr.write(f"{name}: {type(e).__name__}: {e}\n")
            os._exit(1)
    os.close(wfd)
    signal.alarm(TIMEOUT_S)
    try:
        data = b""
        while len(data) < 16:
            chunk = os.read(rfd, 16 - len(data))
            if not chunk:
                break
            data += chunk
        signal.alarm(0)
    except InterruptedError:
        os.kill(pid, signal.SIGKILL)
        os.waitpid(pid, 0)
        return None, "timeout"
    finally:
        os.close(rfd)
    _, status = os.waitpid(pid, 0)
    if len(data) == 16 and os.WIFEXITED(status) and os.WEXITSTATUS(status) == 0:
        peak_kb, nrows = struct.unpack("qq", data)
        return peak_kb / 1024.0, nrows
    if os.WIFSIGNALED(status):
        return None, f"killed by signal {os.WTERMSIG(status)}"
    return None, f"exit {os.WEXITSTATUS(status)}"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    signal.signal(signal.SIGALRM, lambda *a: (_ for _ in ()).throw(InterruptedError()))
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        peak, info = measure(sf_dir, name, sql)
        if peak is None:
            print(f"FAIL {name}: {info}", flush=True)
            results.append((float("inf"), name, info))
        else:
            print(f"PEAK {peak:8.1f} MiB  {name} ({info} rows)", flush=True)
            results.append((peak, name, info))
    print("\n=== sorted by peak ===")
    for peak, name, info in sorted(results, reverse=True)[:20]:
        p = "OOM/TO" if peak == float("inf") else f"{peak:8.1f}"
        print(f"{p} MiB  {name}")


if __name__ == "__main__":
    main()
