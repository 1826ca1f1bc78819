"""r18: orthogonalized-hyperplane experiment (VERDICT r17 #8,
carried from the r17 candidate list).  Question: does Gram-Schmidt
orthogonalization of each table's md5-derived hyperplanes raise the
per-table hit rate enough to cut the derived table count T at fixed
recall (fewer tables = linearly less exchange)?

Method (numpy replica, no Spark — the quantities are pure geometry):
seed-4242 fixture at N vectors, the 2000-probe exact stratum at the
0.45 near-dup threshold, sign signatures under (a) the shipped
i.i.d. md5 planes and (b) the same planes orthogonalized per table
(Gram-Schmidt in float64, deterministic — an oracle could inline the
resulting constants exactly like the i.i.d. ones).  For each scheme:
per-table Hamming-<=pb hit rate over the exact pairs, union recall
at every T up to 32, and the smallest T reaching the 90% derivation
target.  Decision rule: ship only if T drops materially at equal
recall; otherwise record the curve and kill (VERDICT: keep-or-kill
with a measured curve, timeboxed).

Usage: python scripts/r18_ortho_planes.py OUT.json [N] [B] [PB]
"""
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from amazon_books_review_spark.functions import similarity
from amazon_books_review_spark.plans import northstar_queries as nq

N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
B = int(sys.argv[3]) if len(sys.argv) > 3 else 13
PB = int(sys.argv[4]) if len(sys.argv) > 4 else 2
N_SAMPLE = 2000
SEED = 4242
T_MAX = 32
TH = nq.COSINE_DUP_THRESHOLD

rng = np.random.default_rng(SEED)
v = rng.normal(size=(N, nq.EMB_DIM))
v /= np.linalg.norm(v, axis=1, keepdims=True)
# match the engine fixture's storage type (float32 parquet)
v = v.astype(np.float32).astype(np.float64)

# exact pairs, sampled stratum (a < N_SAMPLE, a < b orientation
# irrelevant for coverage geometry)
sims = np.round(v[:N_SAMPLE] @ v.T, 6)
ia, ib = np.nonzero(sims >= TH)
keep = ia != ib
pa, pb_ = ia[keep], ib[keep]
print(f"N={N} b={B} pb={PB} exact sampled pairs={len(pa)}", flush=True)


def gram_schmidt(p: np.ndarray) -> np.ndarray:
    q = p.astype(np.float64).copy()
    for i in range(len(q)):
        for j in range(i):
            q[i] -= (q[i] @ q[j]) * q[j]
        q[i] /= np.linalg.norm(q[i])
    return q


def coverage(planes_fn) -> dict:
    """Per-table covered masks for the exact pair set; returns the
    per-table hit rates and union recall by T."""
    covered = np.zeros((T_MAX, len(pa)), dtype=bool)
    for t in range(T_MAX):
        p = planes_fn(t)
        bits_a = (v[pa] @ p.T) >= 0
        bits_b = (v[pb_] @ p.T) >= 0
        covered[t] = (bits_a != bits_b).sum(axis=1) <= PB
    hit = covered.mean(axis=1)
    union = np.zeros(len(pa), dtype=bool)
    recall_by_t = []
    for t in range(T_MAX):
        union |= covered[t]
        recall_by_t.append(round(100.0 * union.mean(), 2))
    return {
        "per_table_hit_pct_mean": round(100.0 * hit.mean(), 2),
        "recall_by_T": recall_by_t,
        "min_T_for_90": next(
            (t + 1 for t, r in enumerate(recall_by_t) if r >= 90.0), None
        ),
    }


def iid_planes(t: int) -> np.ndarray:
    return np.array(similarity.deterministic_planes(B, nq.EMB_DIM, t))


def ortho_planes(t: int) -> np.ndarray:
    return gram_schmidt(iid_planes(t))


iid = coverage(iid_planes)
ortho = coverage(ortho_planes)
out = {
    "n_vectors": N, "n_planes": B, "probe_bits": PB,
    "threshold": TH, "n_exact_sampled_pairs": int(len(pa)),
    "iid": iid, "ortho": ortho, "seed": SEED,
}
print(json.dumps(out, indent=1), flush=True)
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
