#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle comparison.
Usage: check_oracle.py <verify_outdir> <sfdir>"""
import duckdb, glob, json, sys
import numpy as np
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark output missing {e}"); fails += 1; continue
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(exp.columns)} vs {list(got.columns)}"); fails += 1; continue
    if exp.shape != got.shape:
        print(f"FAIL {name}: shape {exp.shape} vs {got.shape}"); fails += 1; continue
    schema_note = ""
    for c in exp.columns:
        if str(exp[c].dtype) != str(got[c].dtype):
            schema_note += f" [{c}: {exp[c].dtype} vs {got[c].dtype}]"
    bad = []
    zeros = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        try:
            if e.dtype.kind == "f" and g.dtype.kind == "f":
                # Bit-faithful: the driver hashes canonical bytes, so
                # -0.0 vs +0.0 (invisible to ==) must count as a diff.
                ev, gv = e.to_numpy(), g.to_numpy()
                same = (e.isna() & g.isna()) | (
                    (e == g) & (np.signbit(ev) == np.signbit(gv)))
                for side, v in (("oracle", ev), ("spark", gv)):
                    nz = np.signbit(v) & (v == 0.0)
                    if nz.any():
                        zeros.append(f"{side}:{c}@row{int(np.argmax(nz))}")
            else:
                same = (e.isna() & g.isna()) | (e == g)
        except Exception:
            same = e.astype(str) == g.astype(str)
        if not same.all():
            idx = same[~same].index[0]
            bad.append(f"{c}@row{idx}: oracle={e[idx]!r} spark={g[idx]!r}")
    if zeros:
        # Negative zero anywhere is a parity hazard even when both
        # engines agree today — flag it loudly (but only fail on diffs).
        print(f"NEGZERO {name}: {'; '.join(zeros[:6])}")
    if bad:
        print(f"FAIL {name}: {len(bad)} cols differ; {'; '.join(bad[:3])}{schema_note}"); fails += 1
    else:
        print(f"OK   {name} rows={len(exp)}{schema_note}")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
