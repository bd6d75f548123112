"""Paired A/B latency comparison with 95% confidence intervals — the
reference's CUDA-kernel methodology (paired runs, nPairs=30, 95% CI,
Performance_CUDA.md:77-111) as a first-class tool.

Runs two configurations interleaved (A, B, A, B, ...) against the same store
and queries, reports per-pair deltas, mean delta and its normal-approx 95% CI,
and whether the interval excludes zero."""

from __future__ import annotations

import math
import time

import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch-q", type=int, default=8)
    p.add_argument("--pairs", type=int, default=30)
    p.add_argument("--a", default="pallas", choices=["pallas", "jnp"])
    p.add_argument("--b", default="jnp", choices=["pallas", "jnp"])
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.flat import FlatIndex
    from nvdb_tpu.store import VectorStore

    store = VectorStore.from_vecbin(args.base)
    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32()[: args.batch_q]

    idx_a = FlatIndex(store, backend=args.a)
    idx_b = FlatIndex(store, backend=args.b)
    for idx in (idx_a, idx_b):  # warmup/compile both before pairing
        idx.search(queries, args.k)

    deltas = []
    for _ in range(args.pairs):
        t0 = time.perf_counter()
        idx_a.search(queries, args.k)
        ta = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        idx_b.search(queries, args.k)
        tb = (time.perf_counter() - t0) * 1e3
        deltas.append(ta - tb)

    d = np.asarray(deltas)
    mean = float(d.mean())
    half = 1.96 * float(d.std(ddof=1)) / math.sqrt(len(d))
    verdict = ("A faster" if mean + half < 0 else
               "B faster" if mean - half > 0 else "no significant difference")
    print(f"pairs={len(d)} batch_q={args.batch_q} k={args.k}")
    print(f"mean(A-B) = {mean:+.4f} ms  95% CI [{mean-half:+.4f}, {mean+half:+.4f}]")
    print(f"verdict: {verdict}")
    print(f"RESULT ab_a={args.a} ab_b={args.b} pairs={len(d)} "
          f"mean_delta_ms={mean:.6f} ci_half_ms={half:.6f}")


if __name__ == "__main__":
    main()
