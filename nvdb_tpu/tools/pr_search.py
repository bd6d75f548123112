"""Load a saved partition index and print top-k ids per query — the
nvdb_hnsw_search analogue (apps/nvdb_hnsw_search.cpp:33-57); --nprobe is the
efSearch-analogue knob."""

from __future__ import annotations

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("index")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=64)
    p.add_argument("--base", default=None,
                   help="base vecbin to enable exact rerank")
    p.add_argument("--rerank-k", type=int, default=0)
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.partition import PartitionRerankIndex

    refine_rows = vecbin.VecbinFile(args.base).rows_f32() if args.base else None
    idx = PartitionRerankIndex.load(args.index, refine_rows=refine_rows)
    qf = vecbin.VecbinFile(args.query)
    vals, ids = idx.search(qf.rows_f32(), args.k, args.nprobe,
                           rerank_k=args.rerank_k)
    for qi in range(ids.shape[0]):
        print(f"query {qi}: " + " ".join(
            f"{ids[qi, r]}({vals[qi, r]:.4f})" for r in range(args.k)))


if __name__ == "__main__":
    main()
