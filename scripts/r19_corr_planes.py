"""r19: correlated-hyperplane sweep (VERDICT r18 #6 — the follow-up
the ortho kill pointed at).  The r18 measurement showed
orthogonalization LOWERS whole-signature pair agreement (min-T-for-90
rose 18 -> 20), i.e. slight positive correlation between a table's
plane normals RAISES it.  Question: does deliberately dialing
correlation up cut the derived table count T at fixed recall?

Scheme: per table t, mix each i.i.d. md5 plane g_i with one shared
md5 direction c_t (itself the table's extra plane, index B — fully
deterministic and oracle-inlinable like the shipped family):

    p_i = normalize(sqrt(1 - a^2) * g_i + a * c_t)

Pairwise normal correlation ~= a^2.  a=0 is the shipped i.i.d.
family.  For each strength a: per-table Hamming-<=pb hit rate over
the exact sampled pair set, union recall by T, min T reaching the 90%
derivation target — the same harness and decision rule as the r18
ortho kill (scripts/r18_ortho_planes.py): ship only if min-T-for-90
drops materially; otherwise record the curve and kill.

The geometry to watch: correlation concentrates the planes toward
c_t's great circle, which raises P(all-bits-agree) for near pairs
(good: fewer tables) but also raises it for far pairs (bad: bucket
occupancy grows — the quadratic verify term).  The sweep therefore
also records the BACKGROUND all-agree rate over random (non-near)
pairs as an occupancy proxy: a win must cut T without inflating it.

Usage: python scripts/r19_corr_planes.py OUT.json [N] [B] [PB]
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
ALPHAS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.7]

rng = np.random.default_rng(SEED)
v = rng.normal(size=(N, nq.EMB_DIM))
v /= np.linalg.norm(v, axis=1, keepdims=True)
v = v.astype(np.float32).astype(np.float64)

sims = np.round(v[:N_SAMPLE] @ v.T, 6)
ia, ib = np.nonzero(sims >= TH)
keep = ia != ib
pa, pb_ = ia[keep], ib[keep]
# background pairs (occupancy proxy): random non-near pairs
brng = np.random.default_rng(SEED + 1)
ba = brng.integers(0, N, 20000)
bb = brng.integers(0, N, 20000)
bkeep = ba != bb
ba, bb = ba[bkeep], bb[bkeep]
print(f"N={N} b={B} pb={PB} exact sampled pairs={len(pa)}"
      f" background pairs={len(ba)}", flush=True)


def planes_for(t: int, alpha: float) -> np.ndarray:
    # B i.i.d. planes + the shared direction as plane index B of the
    # SAME prefix-stable family (deterministic, oracle-inlinable)
    fam = np.array(similarity.deterministic_planes(B + 1, nq.EMB_DIM, t))
    g, c = fam[:B], fam[B]
    g = g / np.linalg.norm(g, axis=1, keepdims=True)
    c = c / np.linalg.norm(c)
    p = np.sqrt(1.0 - alpha * alpha) * g + alpha * c
    return p / np.linalg.norm(p, axis=1, keepdims=True)


def coverage(alpha: float) -> dict:
    covered = np.zeros((T_MAX, len(pa)), dtype=bool)
    bg_agree = np.zeros(T_MAX)
    for t in range(T_MAX):
        p = planes_for(t, alpha)
        bits_a = (v[pa] @ p.T) >= 0
        bits_b = (v[pb_] @ p.T) >= 0
        covered[t] = (bits_a != bits_b).sum(axis=1) <= PB
        gb_a = (v[ba] @ p.T) >= 0
        gb_b = (v[bb] @ p.T) >= 0
        bg_agree[t] = ((gb_a != gb_b).sum(axis=1) <= PB).mean()
    hit = covered.mean(axis=1)
    union = np.zeros(len(pa), dtype=bool)
    recall_by_t = []
    for t in range(T_MAX):
        union |= covered[t]
        recall_by_t.append(round(100.0 * union.mean(), 2))
    return {
        "alpha": alpha,
        "per_table_hit_pct_mean": round(100.0 * hit.mean(), 2),
        "bg_pair_hit_pct_mean": round(100.0 * bg_agree.mean(), 4),
        "recall_by_T": recall_by_t,
        "min_T_for_90": next(
            (t + 1 for t, r in enumerate(recall_by_t) if r >= 90.0), None
        ),
    }


sweep = [coverage(a) for a in ALPHAS]
for s in sweep:
    print(f"alpha={s['alpha']}: hit={s['per_table_hit_pct_mean']}%"
          f" bg={s['bg_pair_hit_pct_mean']}% minT90={s['min_T_for_90']}",
          flush=True)
out = {
    "n_vectors": N, "n_planes": B, "probe_bits": PB, "threshold": TH,
    "n_exact_sampled_pairs": int(len(pa)),
    "n_background_pairs": int(len(ba)),
    "sweep": sweep, "seed": SEED,
}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1)
print("wrote", sys.argv[1], flush=True)
