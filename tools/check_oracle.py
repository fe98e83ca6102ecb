#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut] [onlyCsv]
       [--mat | --mat=selfcheck]

`--mat` materializes byte-identical shared WITH prefixes as DuckDB
temp tables once per gate run and rewrites the participating oracles
to read them (tools/cte_mat.py) — the sf1 replay-dedup path (VERDICT
r17 #6). `--mat=selfcheck` additionally evaluates every rewritten
oracle BOTH ways and fails loudly on any divergence: run it once at
sf0.01 before an sf1 run trusts the rewrite.

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over views
of the sfDir parquet tables, sorts columns by name + rows by all
columns, and compares values exactly. Mirrors (at least as strictly)
what the driver does, so a PASS here should mean a PASS in
CORRECTNESS_r{N}.json.

`onlyCsv` (comma-separated query names) restricts the run to those
queries; with `jsonOut` pointing at an existing artifact the re-checked
entries are MERGED into it (and n_pass/n_fail recomputed) — the
targeted re-adjudication path for a gate run that lost single queries
to an environmental failure (e.g. a transient disk-full in the spill
dir) without re-paying the full multi-hour oracle pass.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    mat_mode = None  # None | "mat" | "selfcheck"
    argv = []
    for a in sys.argv[1:]:
        if a == "--mat":
            mat_mode = "mat"
        elif a == "--mat=selfcheck":
            mat_mode = "selfcheck"
        else:
            argv.append(a)
    sf_dir, out_dir = argv[0], argv[1]
    json_out = argv[2] if len(argv) > 2 else None
    only = set(argv[3].split(",")) if len(argv) > 3 and argv[3] else None
    results = {}
    oracle_names = set(json.loads(
        (Path(out_dir) / "oracle_sql.json").read_text()).keys())
    if only and json_out and Path(json_out).exists():
        results = json.loads(Path(json_out).read_text()).get("queries", {})
        # drop stale rows for queries renamed/removed from the registry
        # since the prior artifact (ADVICE r16): without this, targeted
        # re-check merges keep dead entries and inflate n_pass. Keep
        # rows whose prior status says they never HAD an oracle
        # (ADVICE r17: e.g. a driver-recorded err=no_oracle entry) —
        # absence from oracle_sql.json is their normal state, not
        # staleness.
        results = {k: v for k, v in results.items()
                   if k in oracle_names or v.get("err") == "no_oracle"
                   or v.get("status") == "no_oracle"}
    con = duckdb.connect()
    # an in-memory DuckDB has no temp directory, so a big oracle
    # (e.g. the ANN replays at the sf1 gate) ABORTS at the memory
    # limit instead of spilling; give it a spill dir so heavy
    # replays degrade to disk instead of killing the whole gate
    con.execute("PRAGMA temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table (e.g. the derived sf1 corpus)
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    import time
    mats_alive, rewrites, mat_sec = set(), {}, 0.0
    if mat_mode:
        import cte_mat
        running = {k: v for k, v in oracle.items()
                   if only is None or k in only}
        mat_plan, rewrites = cte_mat.plan(running)
        t0 = time.time()
        for table, chain in mat_plan:
            try:
                con.execute(cte_mat.mat_sql(table, chain))
                mats_alive.add(table)
            except Exception as e:
                print(f"MAT-FALLBACK {table} ({chain[-1][0]}): "
                      f"{str(e)[:120]}")
        mat_sec = round(time.time() - t0, 2)
        print(f"== materialized {len(mats_alive)}/{len(mat_plan)} shared "
              f"CTEs in {mat_sec}s; {len(rewrites)} queries rewritten ==")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        inline_sql = sql
        used_mat = False
        if name in rewrites:
            import cte_mat
            rw = cte_mat.rewritten_sql(sql, rewrites[name], mats_alive)
            if rw is not None:
                sql = rw
                used_mat = True
        res_dir = Path(out_dir) / name
        t0 = time.time()

        def record(status, detail=""):
            results[name] = {"status": status, "detail": detail,
                             "oracle_sec": round(time.time() - t0, 2)}

        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            record("fail", "no spark output")
            n_fail += 1
            continue
        try:
            got = pq.read_table(str(res_dir)).to_pandas()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record("fail", str(e)[:200])
            n_fail += 1
            continue
        if used_mat and mat_mode == "selfcheck":
            # the rewrite trust gate: the materialized form must equal
            # the inline form EXACTLY (values and dtypes) before any
            # larger scale is allowed to rely on it
            try:
                inline_want = con.execute(inline_sql).fetchdf()
            except Exception as e:
                print(f"FAIL {name}: selfcheck inline form errored: {e}")
                record("fail", f"mat_selfcheck inline error {str(e)[:150]}")
                n_fail += 1
                continue
            wn, iw = normalize(want), normalize(inline_want)
            if not (list(wn.columns) == list(iw.columns)
                    and len(wn) == len(iw)
                    and all(str(wn[c].dtype) == str(iw[c].dtype)
                            for c in wn.columns)
                    and wn.equals(iw)):
                print(f"FAIL {name}: MAT SELFCHECK divergence — "
                      "materialized form != inline form")
                record("fail", "mat_selfcheck divergence")
                n_fail += 1
                continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            record("fail", f"columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            record("fail", f"rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        # The driver hashes TYPED values: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT from SUM() OVER
        # lowered to float64 by pandas) hash-mismatches even when every
        # value compares equal — exactly the r07 failure class. Flag it.
        dt_bad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            record("fail", f"dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            # vectorized fast path: Series.equals is exact (values and
            # dtype, NaN==NaN) at C speed — the Python loop below cost
            # ~100s PER 6M-row query at the sf1 gate and exists only to
            # report the first mismatching position, so run it only
            # when a column actually differs (or the fast path cannot
            # tell, e.g. exotic object payloads)
            try:
                if g[c].equals(w[c]):
                    continue
            except Exception:
                pass
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                eq = (a == b) or (a is None and b is None)
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b))
                if not eq:
                    try:  # pandas NaT/None mismatches
                        import pandas as pd
                        eq = pd.isna(a) and pd.isna(b)
                    except Exception:
                        pass
                if not eq:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
            record("fail", f"col={c} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
            record("pass", f"{len(g)} rows, {len(g.columns)} cols")
            n_pass += 1
    if only is not None:
        # merged totals over the full artifact, not just this subset.
        # Rows retained because they legitimately carry no oracle
        # (status/err == no_oracle — including driver-format rows with
        # no "status" key at all) are neither passes nor failures:
        # counting them as fails would exit 1 on a fully-passing merge.
        def _no_oracle(r):
            return (r.get("status") == "no_oracle"
                    or r.get("err") == "no_oracle")
        n_pass = sum(1 for r in results.values()
                     if r.get("status") == "pass")
        n_fail = sum(1 for r in results.values()
                     if r.get("status") != "pass" and not _no_oracle(r))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        doc = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "queries": results}
        if mat_mode:
            doc["mat"] = {"mode": mat_mode, "tables": len(mats_alive),
                          "rewritten": len(rewrites),
                          "build_sec": mat_sec}
        Path(json_out).write_text(json.dumps(doc, indent=1))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
