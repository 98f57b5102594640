"""Driver-style local check: run each queries() entry and its oracle SQL
side-by-side, compare rowcount/schema/values (order-insensitive)."""
import sys, os, time, warnings
warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/repo")
import ray, duckdb
import pandas as pd
import numpy as np

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR", log_to_driver=False)

import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] if len(sys.argv) > 2 else None

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def to_df(x):
    import pyarrow as pa, ray.data
    if isinstance(x, ray.data.Dataset):
        x = pa.concat_tables(list(x.iter_batches(batch_format="pyarrow")))
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x

qs = E.queries(); os_ = E.oracle_sql()
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = to_df(fn(SF))
    except Exception as e:
        import traceback; traceback.print_exc()
        fails.append((name, f"EXC {e}")); print(f"{name:24s} EXCEPTION {e}"); continue
    dt = time.time() - t0
    if name not in os_:
        print(f"{name:24s} rows={len(res):6d}  (rows-only) {dt:.1f}s")
        continue
    try:
        odf = con.sql(os_[name]).df()
    except Exception as e:
        fails.append((name, f"SQL EXC {e}")); print(f"{name:24s} ORACLE SQL EXC {e}"); continue
    ok_rows = len(res) == len(odf)
    rcols = sorted(res.columns); ocols = sorted(odf.columns)
    ok_schema = rcols == ocols
    ok_vals = False
    if ok_rows and ok_schema:
        a = res[rcols].sort_values(rcols, kind="mergesort").reset_index(drop=True)
        b = odf[rcols].sort_values(rcols, kind="mergesort").reset_index(drop=True)
        try:
            for c in rcols:
                av, bv = a[c], b[c]
                if av.dtype != bv.dtype:
                    try:
                        av = av.astype(bv.dtype)
                    except Exception:
                        pass
                if av.dtype.kind == "f":
                    assert np.allclose(av.fillna(-1e300), bv.fillna(-1e300), rtol=0, atol=0), c
                else:
                    assert (av.fillna("~N").values == bv.fillna("~N").values).all() if av.dtype == object else (av.values == bv.values).all(), c
            ok_vals = True
        except AssertionError as e:
            ok_vals = False
            badcol = str(e)
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    if status == "FAIL":
        detail = f"rows {len(res)}/{len(odf)} schema {rcols}/{ocols}"
        if ok_rows and ok_schema:
            detail = f"values differ in col {badcol}"
        fails.append((name, detail))
        print(f"{name:24s} FAIL  {detail}  {dt:.1f}s")
    else:
        print(f"{name:24s} OK    rows={len(res):6d} {dt:.1f}s")

print()
print("FAILURES:" if fails else "ALL PASS")
for n, d in fails:
    print(" ", n, d)
ray.shutdown()
