#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare (sorted columns, sorted rows) against the
parquet Verify dumped. Usage: oracle_check.py <sfdir> <verify_out>"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders","lineitem",
            "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Verify.scala emits every SQL under both "<q>" and "<q>.parquet" (the latter
# for the driver, which keys its compare by output dir name) — check each once.
oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{outdir}/{name}.parquet/*.parquet")
        t = pq.read_table(files[0]) if files else None
        spark_rows = [tuple(d.values()) for d in t.to_pylist()]
        spark_cols = t.schema.names
        duck = con.execute(sql)
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
        s_rows, s_cols = canon(spark_rows, list(spark_cols))
        d_rows, d_cols = canon(duck_rows, duck_cols)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            fails += 1
        elif s_rows != d_rows:
            diff_s = [r for r in s_rows if r not in set(d_rows)][:3]
            diff_d = [r for r in d_rows if r not in set(s_rows)][:3]
            print(f"FAIL {name}: rows differ n_spark={len(s_rows)} n_duck={len(d_rows)}")
            print(f"  spark-only: {diff_s}")
            print(f"  duck-only : {diff_d}")
            fails += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    except Exception as e:
        print(f"ERR  {name}: {type(e).__name__}: {e}")
        fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
