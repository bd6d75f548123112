"""Sharded flat scan: per-shard top-k + ICI all-gather merge.

The distributed re-expression of the reference's map/partial-reduce/combine
pattern (per-thread TopKBuffer partials merged sequentially,
flat_index_omp.cpp:36-75): each device scans its row shard with the fused Pallas
kernel, converts local ids to global ids, then an ``all_gather`` over the
``rows`` ICI axis + a final [S*k] -> [k] top-k merge (replicated on every
device) produces the global result. Queries can additionally be sharded over the
``q`` mesh axis; the merge then only gathers over ``rows``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nvdb_tpu.dist import mesh as meshmod
from nvdb_tpu.kernels import dispatch


def sharded_flat_topk(
    mesh: Mesh,
    queries: jax.Array,           # [B, Dp] (replicated or sharded over "q")
    vectors: jax.Array,           # [Np, Dp] sharded over "rows"
    scales: Optional[jax.Array],  # [Np] sharded over "rows"
    n_valid: int,
    k: int,
    backend: str = "auto",
    shard_queries: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Global exact top-k over the sharded store. Returns replicated (or
    q-sharded) [B, k] scores/ids with global row ids."""
    S = mesh.shape[meshmod.ROWS]
    Np = vectors.shape[0]
    assert Np % S == 0
    rows_per_shard = Np // S

    q_spec = P(meshmod.QUERIES, None) if shard_queries else P(None, None)

    def local(q, v, s):
        sid = jax.lax.axis_index(meshmod.ROWS)
        local_n = jnp.clip(n_valid - sid * rows_per_shard, 0, rows_per_shard)
        s1 = s.reshape(-1) if s is not None else None
        vals, ids = dispatch.flat_topk(q, v, s1, local_n, k, backend=backend)
        gids = jnp.where(ids >= 0, ids + sid * rows_per_shard, -1)
        # merge partial top-k over the rows axis (rides ICI)
        av = jax.lax.all_gather(vals, meshmod.ROWS, axis=0)   # [S, B, k]
        ai = jax.lax.all_gather(gids, meshmod.ROWS, axis=0)
        B = q.shape[0]
        av = jnp.moveaxis(av, 0, 1).reshape(B, S * k)
        ai = jnp.moveaxis(ai, 0, 1).reshape(B, S * k)
        top_vals, idx = jax.lax.top_k(av, k)
        return top_vals, jnp.take_along_axis(ai, idx, axis=1)

    out_specs = (q_spec, q_spec)
    if scales is None:
        return jax.shard_map(
            lambda q, v: local(q, v, None),
            mesh=mesh, in_specs=(q_spec, P(meshmod.ROWS, None)),
            out_specs=out_specs, check_vma=False,
        )(queries, vectors)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, P(meshmod.ROWS, None), P(meshmod.ROWS)),
        out_specs=out_specs, check_vma=False,
    )(queries, vectors, scales)


def sharded_lloyd_step(
    mesh: Mesh,
    data: jax.Array,      # [Np, Dp] f32, sharded over "rows"
    centroids: jax.Array, # [K, Dp] f32, replicated
    n_valid: int,
) -> Tuple[jax.Array, jax.Array]:
    """One distributed Lloyd iteration: local one-hot-matmul partial sums on
    each shard, ``psum`` over the rows axis, replicated centroid update.
    This is the framework's "training step" (index build = training here);
    the single-chip version lives in kernels/kmeans.py."""
    from nvdb_tpu.kernels.kmeans import _lloyd_step

    S = mesh.shape[meshmod.ROWS]
    R = data.shape[0] // S
    k = centroids.shape[0]

    def local(v, c):
        sid = jax.lax.axis_index(meshmod.ROWS)
        # zero out padding rows so they don't pull centroids; they land in
        # cluster argmin but with zero vectors -> subtract their count instead:
        # simpler: mask by weighting. Compute on all rows, then remove padding
        # contribution via a validity mask folded into the one-hot.
        local_n = jnp.clip(n_valid - sid * R, 0, R)
        valid = (jnp.arange(R) < local_n).astype(v.dtype)
        vw = v * valid[:, None]
        sums, counts, obj = _lloyd_step(vw[None], c, k)
        # padding rows are zero vectors: they contribute nothing to sums but do
        # inflate counts of whatever cluster argmin picks; correct the counts.
        from nvdb_tpu.kernels.kmeans import _assign_chunk

        pad_assign = _assign_chunk(vw, c)
        pad_onehot = jax.nn.one_hot(pad_assign, k, dtype=jnp.float32)
        pad_counts = jnp.sum(pad_onehot * (1.0 - valid)[:, None], axis=0)
        counts = counts - pad_counts
        sums = jax.lax.psum(sums, meshmod.ROWS)
        counts = jax.lax.psum(counts, meshmod.ROWS)
        obj = jax.lax.psum(obj, meshmod.ROWS)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        keep = counts[:, None] > 0.5
        return jnp.where(keep, new, c), obj / jnp.float32(max(n_valid, 1))

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(meshmod.ROWS, None), P()),
        out_specs=(P(), P()), check_vma=False,
    )(data, centroids)


class ShardedFlatIndex:
    """Flat exact index over a row-sharded store — the multi-chip FlatIndex.

    Builds its own mesh over the available devices; host numpy rows are placed
    with NamedSharding so each device holds only its shard (the 100M-scale
    configuration of BASELINE.json configs[4])."""

    def __init__(self, store, mesh: Optional[Mesh] = None, backend: str = "auto"):
        from nvdb_tpu.store import VectorStore  # noqa: F401  (type only)

        self.mesh = mesh if mesh is not None else meshmod.row_mesh()
        self.store = store
        self.backend = backend
        self._jit_cache = {}

    def _compiled(self, b: int, k: int):
        key = (b, k)
        fn = self._jit_cache.get(key)
        if fn is None:
            n_valid = self.store.n
            mesh = self.mesh
            backend = self.backend
            has_scales = self.store.scales is not None

            if has_scales:
                def run(q, v, s):
                    return sharded_flat_topk(mesh, q, v, s, n_valid, k, backend)
            else:
                def run(q, v):
                    return sharded_flat_topk(mesh, q, v, None, n_valid, k, backend)
            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def search_device(self, queries: jax.Array, k: int):
        fn = self._compiled(queries.shape[0], k)
        if self.store.scales is not None:
            return fn(queries, self.store.vectors, self.store.scales)
        return fn(queries, self.store.vectors)

    def search(self, queries, k: int):
        import numpy as np

        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q_n = queries.shape[0]
        qp = self.store.pad_queries(queries)
        b = 8
        while b < q_n:
            b *= 2
        if b != q_n:
            qp = np.concatenate(
                [qp, np.zeros((b - q_n, qp.shape[1]), dtype=np.float32)], axis=0)
        vals, ids = self.search_device(jnp.asarray(qp), k)
        return np.asarray(vals)[:q_n], np.asarray(ids)[:q_n]
