#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle and compare (row count, column names,
sorted-row value hash). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, math, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # exact double repr
    return repr(v)

def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return names, "\x1e".join(canon_rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
            gn, gh = frame_key(got_cols, got)
            en, eh = frame_key(exp_cols, exp)
            if gn != en:
                print(f"FAIL {name}: columns {gn} vs {en}")
            elif len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            elif gh != eh:
                # find first differing row for debugging
                g = sorted(gh.split("\x1e")); e = sorted(eh.split("\x1e"))
                diff = next((a, b) for a, b in zip(g, e) if a != b)
                print(f"FAIL {name}: value hash mismatch; first diff:\n  got {diff[0][:300]}\n  exp {diff[1][:300]}")
            else:
                print(f"PASS {name} ({len(got)} rows)"); n_pass += 1; continue
            n_fail += 1
        except Exception as ex:
            print(f"ERROR {name}: {str(ex)[:300]}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
