"""Minimal demo: run one query (or a few) through the exact flat index and
print top-k ids/scores (the nvdb_search analogue, apps/nvdb_search.cpp:26-40)."""

from __future__ import annotations

from nvdb_tpu.formats import vecbin
from nvdb_tpu.tools._common import make_parser, setup_jax


def main(argv=None):
    p = make_parser(__doc__)
    p.add_argument("base")
    p.add_argument("query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--q", type=int, default=1, help="number of queries to run")
    args = p.parse_args(argv)
    setup_jax(args)

    from nvdb_tpu.index.flat import FlatIndex
    from nvdb_tpu.store import VectorStore

    store = VectorStore.from_vecbin(args.base)
    qf = vecbin.VecbinFile(args.query)
    queries = qf.rows_f32(0, min(args.q, qf.count))
    vals, ids = FlatIndex(store, backend=args.backend).search(queries, args.k)
    for qi in range(queries.shape[0]):
        print(f"query {qi}:")
        for rank in range(args.k):
            print(f"  #{rank}: id={ids[qi, rank]} score={vals[qi, rank]:.6f}")


if __name__ == "__main__":
    main()
