"""r15 measurement sweep (throwaway): bitext nprobe curve, near-dup
n_tables curve at the derived-target candidate counts, and top-k LSH
recall — Spark-side audit rows only (no oracle), feeding the r15
capacity-derivation choices before any constant changes ship.

SUPERSEDED (ADVICE r15): the near-dup tier no longer reads a
NEARDUP_LSH_TABLES constant — embedding_neardup_lsh_verified derives
its table count from NEARDUP_LSH_T_BY_B[b] — so the n_tables loop
below would silently time IDENTICAL configs.  The recorded
SWEEP_R15.json numbers were produced against the r15 tree where the
constant existed; do not re-run.
"""
import sys

sys.exit("r15_sweep.py is superseded — see module docstring (ADVICE r15)")

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from amazon_books_review_spark import session
from amazon_books_review_spark.plans import northstar_queries as nq

spark = session.get_session()
out = {}

for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    tag = sf.rsplit("sf", 1)[-1]

    # --- bitext nprobe curve ---
    for np_ in (2, 4, 8):
        nq.BITEXT_KM_NPROBE = np_
        t0 = time.time()
        row = nq.bitext_kmeans_recall_audit(spark, sf).collect()[0].asDict()
        row["sec"] = round(time.time() - t0, 2)
        out[f"bitext_np{np_}_sf{tag}"] = row
        print(f"bitext nprobe={np_} sf{tag}: {row}", flush=True)
    nq.BITEXT_KM_NPROBE = 2

    # --- near-dup n_tables curve ---
    for nt in (8, 27):
        nq.NEARDUP_LSH_TABLES = nt
        t0 = time.time()
        row = nq.neardup_lsh_recall_audit(spark, sf).collect()[0].asDict()
        row["sec"] = round(time.time() - t0, 2)
        out[f"neardup_T{nt}_sf{tag}"] = row
        # wall time of the verified tier alone (the bench entry)
        t0 = time.time()
        n = nq.embedding_neardup_lsh_verified(spark, sf).count()
        out[f"neardup_T{nt}_sf{tag}"]["tier_sec"] = round(time.time() - t0, 2)
        out[f"neardup_T{nt}_sf{tag}"]["tier_rows"] = n
        print(f"neardup T={nt} sf{tag}: {out[f'neardup_T{nt}_sf{tag}']}", flush=True)
    nq.NEARDUP_LSH_TABLES = 8

    # --- top-k LSH recall (existing audit, current 2 tables) ---
    t0 = time.time()
    rows = [r.asDict() for r in nq.ann_recall_audit(spark, sf).collect()]
    out[f"ann_recall_sf{tag}"] = {"rows": rows, "sec": round(time.time() - t0, 2)}
    print(f"ann_recall sf{tag}: {rows}", flush=True)

with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
print("WROTE", sys.argv[1], flush=True)
