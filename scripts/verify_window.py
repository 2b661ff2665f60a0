"""Full driver-window rehearsal: run the first 50 queries() entries of
__spark_entry__.py at sf0.01 with their DuckDB oracles side-by-side and
replay the driver's pandas canonicalization — the local stand-in for
the driver's CORRECTNESS harness (see .claude/skills/verify/SKILL.md).

Usage: python scripts/verify_window.py            # full 50-entry window
Edit the `window` list below (or post-process) to spot-check entries.
"""
import sys, math, time, traceback
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
import duckdb
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.local.dir", "/dev/shm/spark-verify")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        # duckdb .df() widens DATE to midnight datetime64; spark keeps date
        return s[:-9] if s.endswith("T00:00:00") else s
    return str(v)
qs, osql = mod.queries(), mod.oracle_sql()
window = list(qs)[:50]
green = rowsonly = red = 0
for name in window:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
        canon(sdf)
        if name in osql:
            ddf = con.execute(osql[name]).df()
            sset = sorted("|".join(norm(v) for v in r) for r in sdf.itertuples(index=False))
            dset = sorted("|".join(norm(v) for v in r) for r in ddf.itertuples(index=False))
            ok = sset == dset and sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, ddf.columns))
            tag = "GREEN" if ok else "RED-HASH"
            if ok: green += 1
            else: red += 1
            print(f"{tag:9s} {name:28s} s={len(sdf)} d={len(ddf)} {time.time()-t0:.1f}s", flush=True)
            if not ok:
                ds=set(dset); print("   only-spark:", [x for x in sset if x not in ds][:2])
                ss=set(sset); print("   only-duck :", [x for x in dset if x not in ss][:2])
        else:
            rowsonly += 1
            print(f"{'ROWS-OK':9s} {name:28s} s={len(sdf)} {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        red += 1
        print(f"{'RED-ERR':9s} {name:28s} {type(e).__name__}: {str(e)[:160]}", flush=True)
print(f"\nSUMMARY green={green} rows_only={rowsonly} red={red} / {len(window)}")
