#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify parquet
dumps (columns sorted by name, rows sorted by all columns, values compared
with exact/None-tolerant equality and tiny float epsilon)."""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(df):
    import pandas as pd
    cols = sorted(df.columns)
    df = df[cols]
    recs = []
    for t in df.itertuples(index=False):
        rec = []
        for v in t:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                rec.append(None)
            elif hasattr(v, "isoformat"):
                rec.append(v.isoformat())
            elif isinstance(v, (bool,)):
                rec.append(bool(v))
            elif isinstance(v, float):
                rec.append(v)
            else:
                try:
                    if pd.isna(v):
                        rec.append(None)
                        continue
                except (TypeError, ValueError):
                    pass
                rec.append(v)
        recs.append(tuple(rec))
    recs.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, recs


def eq_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, (float, int)):
        return abs(a - float(b)) <= 1e-9 * max(1.0, abs(a))
    if isinstance(b, float) and isinstance(a, (float, int)):
        return abs(float(a) - b) <= 1e-9 * max(1.0, abs(b))
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    return str(a) == str(b)


def main(sf_dir, out_dir):
    global pd
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gr = rows_of(got)
        wc, wr = rows_of(want)
        if [c.lower() for c in gc] != [c.lower() for c in wc]:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rowcount {len(gr)} vs {len(wr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, wr)):
            if not all(eq_cell(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
