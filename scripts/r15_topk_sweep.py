"""r15: top-k LSH recall vs exact cosine top-k at n_tables 1/2/4 —
grounds the LSH_TABLES derivation (VERDICT r14 #4)."""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from amazon_books_review_spark import session
from amazon_books_review_spark.plans import northstar_queries as nq

spark = session.get_session()
out = {}

for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    tag = sf.rsplit("sf", 1)[-1]
    exact = (
        nq.similarity_cosine_topk(spark, sf)
        .select("query_id", "neighbor_id")
        .collect()
    )
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    for nt in (1, 2, 4):
        nq.LSH_TABLES = nt
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in nq.similarity_lsh_topk(spark, sf)
            .select("query_id", "neighbor_id")
            .collect()
        }
        sec = round(time.time() - t0, 2)
        hit = len(exact_set & got)
        out[f"topk_T{nt}_sf{tag}"] = {
            "n_exact": len(exact_set), "n_lsh": len(got), "n_hit": hit,
            "recall_pct": round(100 * hit / max(1, len(exact_set))),
            "sec": sec,
        }
        print(f"topk T={nt} sf{tag}: {out[f'topk_T{nt}_sf{tag}']}", flush=True)
    nq.LSH_TABLES = 2

with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
print("WROTE", sys.argv[1], flush=True)
