"""Build an IVF-Flat or IVF-(O)PQ index from a vecbin base — the nvdb_ivf_build /
nvdb_ivfpq_build analogue (apps/nvdb_ivf_build.cpp, apps/nvdb_ivfpq_build.cpp).

Flag defaults honor the reference's env vars via config.py: IVF_NLIST,
IVF_TRAIN, PQ_M, USE_OPQ, OPQ_NITER (SURVEY.md §5 knob inventory), so the
reference's sweep scripts translate 1:1; CLI flags override env."""

from __future__ import annotations

import time

from nvdb_tpu import config
from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("out", help="output index path (.npz)")
    ivf_env = config.IVFConfig.from_env()
    pq_env = config.PQConfig.from_env()
    p.add_argument("--kind", default="ivfflat", choices=["ivfflat", "ivfpq"])
    p.add_argument("--nlist", type=int, default=ivf_env.nlist)
    p.add_argument("--train", type=int, default=ivf_env.train_size)
    p.add_argument("--iters", type=int, default=ivf_env.n_iters)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16", "i8"],
                   help="packed payload dtype (ivfflat only)")
    p.add_argument("--pq-m", type=int, default=pq_env.m)
    p.add_argument("--opq", dest="opq", action="store_true",
                   default=pq_env.use_opq)
    p.add_argument("--no-opq", dest="opq", action="store_false")
    p.add_argument("--opq-iters", type=int, default=pq_env.opq_iters)
    p.add_argument("--pad-factor", type=float, default=None,
                   help="list capacity = pad_factor * N/nlist "
                        "(default: 1.5 ivfflat, 2.5 ivfpq — codes are cheap)")
    p.add_argument("--spill-candidates", type=int, default=4,
                   help="overflow rows try their S nearest lists before the "
                        "last-resort pour into any free list")
    p.add_argument("--repack-from", default=None, metavar="IDX",
                   help="reuse a trained index's rotation/centroids/codebooks "
                        "and only re-pack (+ re-encode for pq) the lists at "
                        "the new --pad-factor/--spill-candidates (minutes "
                        "instead of the full k-means/OPQ build)")
    p.add_argument("--replicas", type=int, default=1,
                   help="ivfpq --repack-from only: encode each row in its "
                        "top-R lists (replicated assignment; codes are cheap, "
                        "R=2 ~doubles coverage per probe)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--corpus-refine", type=int, default=0, metavar="ITERS",
                   help=">0: corpus-scale Lloyd passes + dead-centroid "
                        "reseeding after the subsample k-means (one corpus "
                        "upload per pass; reclaims lists the subsample "
                        "quantizer left corpus-dead)")
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.ivf_flat import IVFFlatIndex
    from nvdb_tpu.index.ivf_pq import IVFPQIndex

    if args.pad_factor is None:
        if args.repack_from:
            # repack exists to ESCAPE tight packing: default to the roomier
            # repack-method capacities, not the build defaults (a default
            # ivfflat repack at the build pad would be a same-capacity no-op)
            args.pad_factor = 2.5 if args.kind == "ivfflat" else 4.0
        else:
            args.pad_factor = 1.5 if args.kind == "ivfflat" else 2.5
    f = vecbin.VecbinFile(args.base)
    rows = f.rows_f32()
    t0 = time.perf_counter()
    if args.repack_from:
        if args.kind == "ivfpq":
            idx = IVFPQIndex.repack(
                IVFPQIndex.load(args.repack_from), rows,
                pad_factor=args.pad_factor,
                spill_candidates=args.spill_candidates,
                replicas=args.replicas)
        else:
            if args.replicas != 1:
                p.error("--replicas is ivfpq-only (flat payload replication "
                        "doubles full-vector memory; use ivfpq)")
            idx = IVFFlatIndex.repack(
                IVFFlatIndex.load(args.repack_from), rows,
                pad_factor=args.pad_factor,
                spill_candidates=args.spill_candidates)
    elif args.kind == "ivfflat":
        idx = IVFFlatIndex.build(
            rows, nlist=args.nlist, dtype=args.dtype, train_size=args.train,
            n_iters=args.iters, pad_factor=args.pad_factor,
            spill_candidates=args.spill_candidates, seed=args.seed,
            corpus_refine_iters=args.corpus_refine)
    else:
        idx = IVFPQIndex.build(
            rows, nlist=args.nlist, m=args.pq_m, use_opq=args.opq,
            train_size=args.train, n_iters=args.iters, opq_iters=args.opq_iters,
            pad_factor=args.pad_factor,
            spill_candidates=args.spill_candidates, seed=args.seed,
            corpus_refine_iters=args.corpus_refine)
    dt = time.perf_counter() - t0
    idx.save(args.out)
    print(f"built {args.kind} nlist={getattr(idx, 'nlist', args.nlist)} "
          f"over N={f.count} in {dt:.2f}s; "
          f"index_bytes={idx.index_bytes} ({idx.index_bytes/1e6:.1f} MB) "
          f"spilled={idx.n_spilled} -> {args.out}")


if __name__ == "__main__":
    main()
