#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, registers each parquet table as a DuckDB view,
runs the oracle SQL, and compares (schema-name set, row count, sorted
values) against the Spark-written parquet in <verifyOutDir>/<name>/.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir, resume_after=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qname, sql in sorted(oracle.items()):
        if resume_after is not None and qname <= resume_after:
            n_skip += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {qname}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(glob.glob(f"{out_dir}/{qname}/*.parquet")[0])
        except Exception as e:
            print(f"FAIL {qname}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols = sorted(want.column_names)
        gcols = sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {qname}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        wrows = sorted(tuple(norm(r[c]) for c in wcols) for r in want.to_pylist())
        grows = sorted(tuple(norm(r[c]) for c in gcols) for r in got.to_pylist())
        if wrows != grows:
            diffs = [(w, g) for w, g in zip(wrows, grows) if w != g]
            print(f"FAIL {qname}: {len(want)} vs {len(got)} rows; first diffs: {diffs[:3]}")
            n_fail += 1
            continue
        # schema types (loose): report but don't fail on arrow type mismatch
        wt = {f.name: str(f.type) for f in want.schema}
        gt = {f.name: str(f.type) for f in got.schema}
        tdiff = {k: (wt[k], gt[k]) for k in wt if wt[k] != gt.get(k)}
        flag = f"  [type-diff {tdiff}]" if tdiff else ""
        print(f"PASS {qname} ({len(want)} rows){flag}")
        n_pass += 1
    if n_skip:
        # a resumed run is PARTIAL verification — make that impossible to
        # mistake for a full green run
        print(f"== !! PARTIAL RUN: skipped {n_skip} queries <= '{resume_after}' "
              f"(resume) — totals below cover only the remainder !!")
    print(f"== {n_pass} pass, {n_fail} fail"
          + (f" ({n_skip} skipped via resume — NOT a full verification)" if n_skip else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
