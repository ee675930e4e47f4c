#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json path]

Reads each <verifyOutDir>/<name>/ parquet result (written by
graft.Verify), runs the matching oracle SQL from oracle_sql.json in
DuckDB over the source tables in <sfDir>, sorts columns by name and
rows by all columns, and compares values exactly. With --json, also
writes a per-query record in the driver's CORRECTNESS_r{N}.json shape
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err) so multi-SF sweeps are machine-checkable (tools/check_3sf.py).
Driver-side tooling only — not part of the library.
"""
import json, sys, glob, math
import duckdb

def norm(v):
    if isinstance(v, float):
        # exact compare, but normalize -0.0 and NaN representation
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    return v

def main(sf_dir, out_dir, json_path=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_rowsonly = 0
    records = {}
    def rec(name, rows_match=None, schema_match=None, hash_match=None,
            spark_rows=None, oracle_rows=None, err=None):
        records[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}
    produced = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracles) - produced):
        print(f"[FAIL] {name}: no output written (query threw in Verify)")
        rec(name, err="no output written (query threw in Verify)")
        n_bad += 1
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        # Verify poisons a failed query's dir: stale parquet deleted,
        # FAILED.parquet left with the exception text. Report it as a
        # per-query FAIL instead of crashing the whole gate on an
        # unreadable "parquet" file.
        marker = os.path.join(d, "FAILED.parquet")
        if os.path.isfile(marker):
            msg = open(marker, errors="replace").read().strip().splitlines()
            print(f"[FAIL] {name}: query threw in Verify: {msg[0] if msg else '?'}")
            rec(name, err=f"query threw in Verify: {msg[0] if msg else '?'}")
            n_bad += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{d}*.parquet')")
            got_cols = sorted(got_rel.columns)
            got_sel = ", ".join(f'"{c}"' for c in got_cols)
            got = con.sql(f"SELECT {got_sel} FROM got_rel ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: unreadable output: {e}")
            rec(name, err=f"unreadable output: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            rec(name, spark_rows=len(got), err="no_oracle")
            n_rowsonly += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols = sorted(exp_rel.columns)
            exp_sel = ", ".join(f'"{c}"' for c in exp_cols)
            exp = con.sql(f"SELECT {exp_sel} FROM exp_rel ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            rec(name, spark_rows=len(got), err=f"oracle SQL error: {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"[FAIL] {name}: columns differ: spark={got_cols} oracle={exp_cols}")
            rec(name, rows_match=len(got) == len(exp), schema_match=False,
                hash_match=False, spark_rows=len(got), oracle_rows=len(exp))
            n_bad += 1
            continue
        # The driver's hash is dtype-sensitive (DuckDB HUGEINT vs Spark
        # BIGINT fails it even when values match) — compare dtypes too.
        got_types = [str(t) for t in con.sql(f"SELECT {got_sel} FROM got_rel").types]
        exp_types = [str(t) for t in con.sql(f"SELECT {exp_sel} FROM exp_rel").types]
        if got_types != exp_types:
            print(f"[FAIL] {name}: dtypes differ (driver hash would mismatch):")
            for c, gt, et in zip(got_cols, got_types, exp_types):
                if gt != et:
                    print(f"    {c}: spark={gt} oracle={et}")
            rec(name, rows_match=len(got) == len(exp), schema_match=False,
                hash_match=False, spark_rows=len(got), oracle_rows=len(exp))
            n_bad += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got]
        e = [tuple(norm(v) for v in r) for r in exp]
        if g == e:
            print(f"[ok] {name}: {len(g)} rows hash-match")
            rec(name, rows_match=True, schema_match=True, hash_match=True,
                spark_rows=len(g), oracle_rows=len(e))
            n_ok += 1
        else:
            n_bad += 1
            print(f"[FAIL] {name}: {len(g)} spark rows vs {len(e)} oracle rows")
            rec(name, rows_match=len(g) == len(e), schema_match=True,
                hash_match=False, spark_rows=len(g), oracle_rows=len(e))
            gs, es = set(g), set(e)
            for r in list(gs - es)[:3]:
                print(f"    spark-only:  {r}")
            for r in list(es - gs)[:3]:
                print(f"    oracle-only: {r}")
            # near-miss float diagnosis
            if len(g) == len(e):
                for i, (rg, re_) in enumerate(zip(g, e)):
                    if rg != re_:
                        print(f"    first row diff at {i}: spark={rg} oracle={re_}")
                        break
    print(f"\n{n_ok} ok, {n_bad} FAIL, {n_rowsonly} rows-only")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    jp = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("--json requires a path argument")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        sys.exit("usage: check_oracle.py <sfDir> <verifyOutDir> [--json path]")
    sys.exit(main(argv[0], argv[1], jp))
