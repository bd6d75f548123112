"""Generate a synthetic L2-normalized vecbin dataset (benchmarking stand-in for
the arXiv embedding pipeline, scripts/build_vecbin_chunked.py)."""

from __future__ import annotations

import os

import numpy as np

from nvdb_tpu.formats import synth, vecbin
from nvdb_tpu.tools._common import make_parser


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("out")
    p.add_argument("--count", type=int, required=True)
    p.add_argument("--dim", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clusters", type=int, default=0,
                   help="0 = iid gaussian; else mixture-of-gaussians")
    p.add_argument("--spread", type=float, default=0.25)
    p.add_argument("--low-rank", type=int, default=0, metavar="INTRINSIC",
                   help=">0: low-intrinsic-dimension manifold data (the "
                        "realistic regime for PQ/OPQ; real embeddings are "
                        "low-rank)")
    p.add_argument("--hard", type=int, default=0, metavar="INTRINSIC",
                   help=">0: hierarchical Zipf topic corpus with strong "
                        "overlap — recall-vs-nprobe actually slopes (the "
                        "regime of the reference's nlist x nprobe surface)")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16", "i8"])
    p.add_argument("--raw12", action="store_true", help="legacy raw12 header")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted write (or extend a smaller "
                        "same-seed file to a larger --count): chunks are "
                        "seeded by row offset, so the payload prefix is "
                        "identical either way. f32/bf16 only.")
    args = p.parse_args(argv)
    if args.raw12 and args.dtype != "f32":
        p.error("--raw12 is an f32-only legacy format (use --dtype f32)")

    chunk = 262144
    resume_rows = 0
    if args.resume and os.path.exists(args.out):
        payload = os.path.getsize(args.out) - vecbin.HEADER_BYTES
        row_bytes = args.dim * (1 if args.dtype == "i8" else
                                2 if args.dtype == "bf16" else 4)
        # floor to a chunk boundary: chunk_seed == row offset, so regenerating
        # from the boundary reproduces the same rows an uninterrupted run would
        resume_rows = max(payload // row_bytes // chunk * chunk, 0)
    with vecbin.StreamingVecbinWriter(args.out, args.dim, args.dtype,
                                      resume_rows=resume_rows) as w:
        done = resume_rows
        if resume_rows:
            print(f"resuming at row {resume_rows}", flush=True)
        while done < args.count:
            n = min(chunk, args.count - done)
            if args.hard > 0:
                rows = synth.hard(n, args.dim, intrinsic=args.hard,
                                  topics=max(args.clusters, 256),
                                  seed=args.seed, chunk_seed=done)
            elif args.low_rank > 0:
                rows = synth.low_rank(n, args.dim, intrinsic=args.low_rank,
                                      n_clusters=max(args.clusters, 64),
                                      spread=args.spread, seed=args.seed,
                                      chunk_seed=done)
            elif args.clusters > 0:
                # same seed -> same global cluster centers across chunks;
                # chunk_seed varies assignments/noise per chunk
                rows = synth.clustered(n, args.dim, args.clusters, args.spread,
                                       seed=args.seed, chunk_seed=done)
            else:
                rows = synth.normalized_gaussian(n, args.dim, seed=args.seed + done)
            if args.dtype == "i8":
                q, s = vecbin.quantize_i8(rows)
                w.append(q, s)
            elif args.dtype == "bf16":
                w.append(vecbin.to_bf16(rows))
            else:
                w.append(rows)
            done += n
    info = vecbin.VecbinFile(args.out).info
    print(f"wrote {info.count} x {info.dim} {info.dtype_str} -> {args.out}")
    if args.raw12:
        # materialize before rewriting: f.vectors is a read memmap of args.out,
        # and opening the same path for write would truncate it mid-copy
        f = vecbin.VecbinFile(args.out)
        rows = np.array(f.vectors)
        del f
        vecbin.write_vecbin(args.out, rows, legacy_raw12=True)
        print("rewrote as raw12")


if __name__ == "__main__":
    main()
