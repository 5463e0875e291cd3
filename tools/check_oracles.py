#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Registers each testdata table as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, and frame-compares (columns sorted by
name, rows sorted) against the Spark parquet output.

STRICT dtypes (the r8 lesson): the driver's hash is type-sensitive —
DuckDB widening an uncast integer SUM to HUGEINT (rendered float64)
red-flags a value-identical result. This tool therefore fails on any
dtype FAMILY mismatch (int vs float vs bool vs object vs datetime) and
only then value-compares after widening within the family (int64 /
float64), mirroring the driver's observed tolerance for narrow-vs-wide
ints and intolerance for everything else.
"""
import sys, json, duckdb

def family(dtype):
    k = dtype.kind  # i/u int, f float, b bool, O object, M datetime, m timedelta
    if k in ("i", "u"):
        return "int"
    return {"f": "float", "b": "bool", "O": "object",
            "M": "datetime", "m": "timedelta"}.get(k, k)

def widen_within_family(s, o, cols):
    """In-place: widen narrow int/float columns to 64-bit in BOTH frames
    (the driver's observed tolerance) so value-compare sees one width."""
    widen = {"int": "int64", "float": "float64"}
    for c in cols:
        w = widen.get(family(s[c].dtype))
        if w:
            s[c] = s[c].astype(w)
            o[c] = o[c].astype(w)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf, out):
    con = duckdb.connect()
    # The r11 gate died on an oracle that cross-producted to 115 GB RSS;
    # cap DuckDB so a bomb oracle fails fast and loud instead of taking
    # the machine down (the judge's stress condition: full suite green
    # under a 24 GB limit).
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for q, sql in sorted(sqls.items()):
        try:
            s = con.execute(
                f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").df()
            o = con.execute(sql).df()
            cols = sorted(s.columns)
            if sorted(o.columns) != cols:
                print(f"FAIL {q}: schema {cols} vs {sorted(o.columns)}")
                n_bad += 1
                continue
            bad_types = [
                f"{c}: spark {s[c].dtype} vs oracle {o[c].dtype}"
                for c in cols if family(s[c].dtype) != family(o[c].dtype)]
            if bad_types:
                print(f"FAIL {q}: dtype family mismatch — "
                      + "; ".join(bad_types))
                n_bad += 1
                continue
            widen_within_family(s, o, cols)
            s = s[cols].sort_values(cols).reset_index(drop=True)
            o = o[cols].sort_values(cols).reset_index(drop=True)
            if s.equals(o):
                print(f"ok   {q} ({len(s)} rows)")
                n_ok += 1
            else:
                diff = (s != o).any()
                print(f"FAIL {q}: {len(s)}/{len(o)} rows, "
                      f"diff cols {list(diff[diff].index)}")
                n_bad += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {q}: {str(e).splitlines()[0][:160]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(sqls)} with oracles")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
