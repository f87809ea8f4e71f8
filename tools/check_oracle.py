#!/usr/bin/env python3
"""Dev-loop oracle checker mimicking the driver: run each oracle SQL in
DuckDB over the sf parquet tables, compare row count / columns / value hash
against the Verify parquet dump."""
import duckdb, json, sys, glob, os
import pandas as pd
import hashlib

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    # driver testdata is one bare file per table; ScaleUp soak data uses
    # a <table>.parquet DIRECTORY of part files — glob in that case
    path = f"{sf_dir}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# ORACLE_OVERRIDES: json file of {query: sql} merged over the dump's
# oracle_sql.json — used by the sf10 gate, whose pair-CC queries need
# COLLAPSE-AWARE oracle SQL (the row-level mirrors pay the copies^2 the
# engine collapsed away; the distinct-(cell,vector) twins mirror the
# engine's collapse, equivalence pinned engine-side in SimilaritySpec
# and cross-checked against the row-level SQL at sf0.1/sf1).
if os.environ.get("ORACLE_OVERRIDES"):
    oracle.update(json.load(open(os.environ["ORACLE_OVERRIDES"])))

def canon(df):
    """Driver-strict canonicalization: sort_values over ALL columns (raises
    TypeError on unhashable cells, e.g. raw arrays — exactly like the
    driver's pandas canonicalizer), then hash str(cell) per value so dtype
    drift (int64 vs float64: '5' vs '5.0') fails the hash as it does in
    the driver. No float reformatting — the repo's portability contract
    requires bit-identical doubles, so leniency here only hides bugs."""
    df = df.reindex(sorted(df.columns), axis=1)
    # NOTE: like the driver, rows tying under sort_values but differing
    # under str() (only the +0.0/-0.0 pair can do this) stay in input
    # order — a theoretical order-dependence we keep deliberately,
    # because mirroring the driver's canonicalizer exactly is this
    # script's contract (a "fixed" local gate that diverges from the
    # hard signal is how the round-6 reds slipped through)
    df = df.sort_values(by=list(df.columns))
    rows = ["\x1f".join(str(v) for v in row)
            for row in df.itertuples(index=False)]
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"{name:24s} NO SPARK OUTPUT"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
    try:
        ora_df = con.execute(sql).df()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}"); fails += 1; continue
    ok_rows = len(spark_df) == len(ora_df)
    ok_cols = sorted(spark_df.columns) == sorted(ora_df.columns)
    try:
        ok_hash = ok_rows and ok_cols and canon(spark_df) == canon(ora_df)
    except (TypeError, ValueError) as e:
        # the driver's canonicalizer crashes on unsortable cells (raw
        # arrays) and records the row as err — fail it here too.
        # (pandas raises TypeError on the multi-column lexsort path but
        # ValueError on a single array-typed column's sort_values)
        print(f"{name:24s} CANON CRASH (unsortable column): {e}")
        fails += 1
        continue
    status = "OK" if (ok_rows and ok_cols and ok_hash) else f"rows={ok_rows}({len(spark_df)}/{len(ora_df)}) cols={ok_cols} hash={ok_hash}"
    if not (ok_rows and ok_cols and ok_hash):
        fails += 1
        if ok_rows and ok_cols:
            # show dtype and a sample diff
            print(f"{name:24s} {status}")
            print("  spark dtypes:", dict(spark_df.dtypes.astype(str)))
            print("  oracle dtypes:", dict(ora_df.dtypes.astype(str)))
            continue
    print(f"{name:24s} {status}")
print(f"\n{fails} failures")
