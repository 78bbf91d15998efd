"""Driver simulation: load __spark_entry__ by file path from a foreign cwd,
smoke entry(), then compare every queries() entry vs oracle_sql() at sf0.01."""
import importlib.util, json, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driversim")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "| schema:", [f.name for f in df.schema.fields])
print("ENTRY sample:", rows[0].asDict() if rows else None)

import duckdb, pandas as pd
qs, osql = mod.queries(), mod.oracle_sql()
print("QUERIES:", sorted(qs), "| ORACLES:", sorted(osql))
SF="/root/testdata/sf0.01"
TABLES="region nation customer supplier part orders lineitem events documents embeddings".split()
fail = 0
for name in sorted(qs):
    sdf = qs[name](spark, SF).toPandas()
    if name not in osql:
        print(f"{name}: rows-only check, rows={len(sdf)}"); continue
    con = duckdb.connect()
    for t in TABLES: con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    odf = con.execute(osql[name]).fetchdf(); con.close()
    ok_cols = set(sdf.columns)==set(odf.columns)
    ok_rows = len(sdf)==len(odf)
    # order-insensitive value compare: sort columns by name, rows by all cols
    def canon(d):
        d = d[sorted(d.columns)].copy()
        for c in d.columns:
            if pd.api.types.is_datetime64_any_dtype(d[c]): d[c]=pd.to_datetime(d[c]).dt.tz_localize(None)
        return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)
    a,b = canon(sdf), canon(odf)
    mismatches = []
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            eq = ((a[c]-b[c]).abs() <= 1e-9*b[c].abs().clip(lower=1)) | (a[c].isna()&b[c].isna())
        else:
            eq = (a[c]==b[c]) | (a[c].isna()&b[c].isna())
        if not eq.all(): mismatches.append((c,int((~eq).sum())))
    # dtype-aware pass: the driver's value hash distinguishes 42 from 42.0,
    # so a float column on one side vs integer on the other (the DuckDB
    # HUGEINT->float64 hazard for SUM(BIGINT) OVER) is a hash fail even
    # when every value compares equal. Treat it as a mismatch here too.
    for c in a.columns:
        fa = pd.api.types.is_float_dtype(a[c]); fb = pd.api.types.is_float_dtype(b[c])
        if fa != fb: mismatches.append((c, f"dtype {a[c].dtype} vs {b[c].dtype}"))
    status = "MATCH" if (ok_cols and ok_rows and not mismatches) else "MISMATCH"
    if status=="MISMATCH": fail+=1
    print(f"{name}: {status} rows={len(sdf)}/{len(odf)} cols_ok={ok_cols} diffs={mismatches}")
print("RESULT:", "FAIL" if fail else "PASS")
spark.stop()
