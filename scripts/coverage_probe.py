#!/usr/bin/env python
"""Probe-coverage ceiling for an IVF-PQ index: recall upper bound vs nprobe.

For each query, compute the top-nprobe coarse lists (rotated query x
centroids, exactly the list ranking `IVFPQIndex.search_device` uses) and
report the fraction of exact-GT neighbors whose list is probed. That
fraction is the recall ceiling of ANY candidate generator / refine depth at
that nprobe: a neighbor whose list is never scanned cannot be recovered.
Reference analogue: the nprobe sweep in apps/nvdb_ivf_eval.cpp — this
isolates the coverage term the sweep can only show mixed with ADC ranking.

Host-numpy only (no device): the 8M flagship's diagnostic must not compete
with the chip. Reports coverage plus where non-covered neighbors' lists
rank, which says how much MORE nprobe would buy.
"""
import argparse

import numpy as np

from nvdb_tpu.formats import gtbin, vecbin


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index")
    ap.add_argument("queries")
    ap.add_argument("gt")
    ap.add_argument("--nprobe", type=int, nargs="+", default=[16, 32, 64, 128, 256])
    ap.add_argument("--metric", default="l2",
                    help="list ranking: 'l2' = 2qc - c^2 (what search_device "
                         "does); 'dot' = qc; 'corr:B' = 2qc - c^2 + B*var "
                         "with per-list variance estimated as 1 - |c|^2 "
                         "(exact for unit-norm rows, E[x]=c)")
    args = ap.parse_args()

    z = np.load(args.index)
    cents = z["centroids"].astype(np.float32)          # [nlist, d]
    rot = z["rotation"]
    slot_ids = z["slot_ids"]                           # [nlist, lcap]
    nlist = cents.shape[0]
    n = int(z["meta"][0])

    # list_of: same derivation as IVFPQIndex.build (ivf_pq.py) — zeros, then
    # live slots overwrite; spilled/absent rows keep list 0 (counted probed
    # only if list 0 is probed, i.e. effectively unreachable).
    list_of = np.zeros(n, np.int64)
    live = slot_ids >= 0
    for li in range(nlist):
        list_of[slot_ids[li][live[li]]] = li
    in_any = np.zeros(n, bool)
    for li in range(nlist):
        in_any[slot_ids[li][live[li]]] = True

    q = vecbin.VecbinFile(args.queries).rows_f32(0, None)
    gt_ids = np.asarray(gtbin.read_gtbin(args.gt)[1])  # [Q, k]
    if rot.size:
        q = q @ rot
    cs = q @ cents.T                                   # [Q, nlist]
    c2 = np.sum(cents * cents, axis=1)[None, :]
    if args.metric == "l2":
        # identical to search_device/_topS_centroids: 2qc - c^2
        cs = 2.0 * cs - c2
    elif args.metric.startswith("corr:"):
        beta = float(args.metric.split(":")[1])
        cs = 2.0 * cs - c2 + beta * np.maximum(1.0 - c2, 0.0)
    # never probe empty lists (k-means dead centroids sit near the origin and
    # the variance correction would otherwise boost them to the top)
    cs = np.where((live.sum(1) > 0)[None, :], cs, -np.inf)
    order = np.argsort(-cs, axis=1)                    # [Q, nlist] best-first
    rank_of = np.empty_like(order)
    np.put_along_axis(rank_of, order, np.arange(nlist)[None, :].repeat(len(q), 0), 1)

    gt_list = list_of[gt_ids]                          # [Q, k]
    gt_rank = np.take_along_axis(rank_of, gt_list, 1)  # probe rank of each GT's list
    placed = in_any[gt_ids]
    print(f"N={n} nlist={nlist} Q={len(q)} k={gt_ids.shape[1]} "
          f"placed={placed.mean():.6f} (unplaced GT rows can never be found)")
    for np_ in args.nprobe:
        cov = ((gt_rank < np_) & placed).mean()
        print(f"nprobe={np_:4d} coverage={cov:.4f}")
    # where do the missed neighbors' lists rank? (tells if more probes help)
    miss = gt_rank[placed & (gt_rank >= min(args.nprobe))]
    if miss.size:
        qs = np.percentile(gt_rank[placed], [50, 90, 99, 99.9])
        print("gt-list probe-rank percentiles p50/p90/p99/p99.9:",
              " ".join(f"{v:.0f}" for v in qs))


if __name__ == "__main__":
    main()
