#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
raw tables in <sfDir>, and compares: row count, column names, and a
hash of all values (columns sorted by name, rows sorted by all
columns) — the strictest plausible reading of the driver's check.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell rendering: floats via repr (full precision), rest str
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    # optional committed artifact (CORRECTNESS_SELF.json): per-gate
    # status, so every round carries its own correctness record even
    # when the driver's artifact comes back empty
    results = {}
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and canon(got) != canon(want):
            problems.append("value hash mismatch")
            g = got.reindex(sorted(got.columns), axis=1).sort_values(by=sorted(got.columns)).reset_index(drop=True)
            w = want.reindex(sorted(want.columns), axis=1).sort_values(by=sorted(want.columns)).reset_index(drop=True)
            for i in range(min(len(g), len(w))):
                if canon(g.iloc[[i]]) != canon(w.iloc[[i]]):
                    problems.append(f"first diff row {i}:\n  got  {g.iloc[i].to_dict()}\n  want {w.iloc[i].to_dict()}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)); n_fail += 1
            results[name] = {"status": "fail", "rows": len(got),
                             "problems": problems}
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            results[name] = {"status": "pass", "rows": len(got)}
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    json_out = os.environ.get("CHECK_JSON_OUT")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"pass": n_pass, "fail": n_fail, "total": len(names),
                       "sf_dir": sf_dir, "gates": results}, f, indent=1,
                      sort_keys=True)
            f.write("\n")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
