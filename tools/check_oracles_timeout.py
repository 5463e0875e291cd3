#!/usr/bin/env python3
"""10x-gate variant of check_oracles.py: same frame-compare, but each
oracle runs in a subprocess with a wall-clock budget. The ORACLE SQL is
deliberately naive (that's what makes it an oracle); at 10x a few naive
spellings are themselves super-linear (e.g. an unblocked fuzzy join) and
must be reported as infeasible-oracle rather than hanging the gate.

Usage: python3 tools/check_oracles_timeout.py <sfDir> <verifyOutDir> [timeout_sec]
"""
import sys, json, multiprocessing as mp


def one(sf, out, q, sql, conn):
    import duckdb
    TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    try:
        import os
        con = duckdb.connect()
        con.execute("SET memory_limit='24GB'")  # bomb oracles fail fast
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):  # Spark-written table = directory of parts
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        s = con.execute(
            f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").df()
        o = con.execute(sql).df()
        cols = sorted(s.columns)
        if sorted(o.columns) != cols:
            conn.send(("schema", f"{cols} vs {sorted(o.columns)}")); return
        # STRICT dtypes — ONE implementation, shared with check_oracles.py
        # (the r8 HUGEINT escape was exactly a two-sites drift): fail on
        # dtype-family mismatch, widen only within a family.
        from check_oracles import family, widen_within_family
        bad = [f"{c}: spark {s[c].dtype} vs oracle {o[c].dtype}"
               for c in cols if family(s[c].dtype) != family(o[c].dtype)]
        if bad:
            conn.send(("dtype", "; ".join(bad))); return
        widen_within_family(s, o, cols)
        s = s[cols].sort_values(cols).reset_index(drop=True)
        o = o[cols].sort_values(cols).reset_index(drop=True)
        if s.equals(o):
            conn.send(("ok", f"{len(s)} rows"))
        else:
            conn.send(("mismatch", f"{len(s)}/{len(o)} rows"))
    except Exception as e:
        conn.send(("error", str(e)[:200]))


def main(sf, out, budget):
    import time
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    counts = {"ok": 0, "timeout": 0, "other": 0}
    times = []  # per-oracle wall time — the round-close cost gate
    for q, sql in sorted(sqls.items()):
        rx, tx = mp.Pipe(False)
        p = mp.Process(target=one, args=(sf, out, q, sql, tx))
        t0 = time.monotonic()
        p.start(); p.join(budget)
        wall = time.monotonic() - t0
        if p.is_alive():
            p.terminate(); p.join()
            print(f"TIMEOUT {q} (> {budget}s oracle)")
            counts["timeout"] += 1
            times.append((budget, q, "timeout"))
        else:
            kind, msg = rx.recv() if rx.poll() else ("error", "no result")
            print(f"{'ok  ' if kind == 'ok' else 'FAIL'} {q}: {kind} {msg} "
                  f"[{wall:.1f}s]")
            counts["ok" if kind == "ok" else "other"] += 1
            times.append((wall, q, kind))
    print(f"\n{counts['ok']} ok, {counts['timeout']} oracle-timeout, "
          f"{counts['other']} failed, {len(sqls)} with oracles")
    print("\nslowest oracles (wall s — any >30 s at sf0.01 must be respelled):")
    for wall, q, kind in sorted(times, reverse=True)[:15]:
        print(f"  {wall:7.1f}  {q} ({kind})")
    return 0 if counts["other"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 300))
