"""Driver-mimic correctness sweep: run SPARK_QUERIES entries against their
DuckDB oracle twins at an arbitrary SF dir with EXACT value equality (stricter
than the pytest twin's 1e-9 float tolerance — the driver hashes values, so only
bit-identical results count). Used in r5 to verify all 123 contract entries at
sf0.01 before rotating the driver's first-50 oracle window (COVERAGE.md).

  VW_SF=/root/testdata/sf0.01 VW_START=0 VW_N=123 python scripts/verify_contract_local.py

Writes per-query results to VW_OUT (default /tmp/verify_window_result.json)."""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import pandas as pd

from tests.oracle_compare import duck_con
from snowplow_elasticsearch_loader_spark.session import get_spark
from snowplow_elasticsearch_loader_spark.contract import SPARK_QUERIES, ORACLE_SQL

SF = os.environ.get("VW_SF", "/root/testdata/sf0.01")
N = int(os.environ.get("VW_N", "50"))
START = int(os.environ.get("VW_START", "0"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

spark = get_spark("local[32]", app_name="verify-window")
con = duck_con(SF)
names = list(SPARK_QUERIES)[START:START + N]
if os.environ.get("VW_NAMES"):
    names = [n for n in os.environ["VW_NAMES"].split(",") if n in SPARK_QUERIES]
results = {}
for name in names:
    t0 = time.time()
    row = {"rows": None, "schema": None, "exact": None, "err": None}
    try:
        got = SPARK_QUERIES[name](spark, SF).toPandas()
        if name in ORACLE_SQL:
            want = con.execute(ORACLE_SQL[name]).fetchdf()
            row["rows"] = len(got) == len(want)
            row["schema"] = sorted(got.columns) == sorted(want.columns)
            if row["rows"] and row["schema"]:
                g, w = norm(got), norm(want)
                ok = True
                for c in g.columns:
                    if pd.api.types.is_float_dtype(g[c]):
                        col_ok = all(
                            (isinstance(a, float) and isinstance(b, float) and
                             ((math.isnan(a) and math.isnan(b)) or a == b))
                            for a, b in zip(g[c], w[c].astype("float64"))
                        )
                    else:
                        col_ok = (g[c].astype(str) == w[c].astype(str)).all()
                    if not col_ok:
                        ok = False
                        row["err"] = f"col {c} mismatch"
                        break
                row["exact"] = ok
            else:
                row["exact"] = False
        else:
            row["rows"] = len(got) >= 0
            row["exact"] = "rows-only"
    except Exception as e:  # noqa: BLE001
        row["err"] = f"{type(e).__name__}: {e}"[:300]
    row["sec"] = round(time.time() - t0, 2)
    results[name] = row
    status = "OK " if row["exact"] in (True, "rows-only") else "FAIL"
    print(f"{status} {name} {row['sec']}s {row['err'] or ''}", flush=True)

bad = [k for k, v in results.items() if v["exact"] not in (True, "rows-only")]
print(json.dumps({"bad": bad, "n": len(results)}))
with open(os.environ.get("VW_OUT", "/tmp/verify_window_result.json"), "w") as f:
    json.dump(results, f, indent=1)
