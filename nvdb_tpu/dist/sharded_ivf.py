"""Sharded IVF-Flat: inverted lists partitioned across the device mesh.

Distributed probing strategy: the coarse centroid table is sharded with the
lists, so each device ranks its LOCAL centroids and probes its local top-
``nprobe_per_shard`` lists; partial top-k results (global row ids) are merged
with an ``all_gather`` over the ``rows`` ICI axis. The union of per-shard
probes plays the role of the reference's global top-nprobe (FAISS
nvdb_ivf_eval.cpp:478-489); with lists spread randomly across shards the
probed set is a superset-quality approximation at equal total probes, and it
needs NO global coarse ranking step. This is the 100M-scale configuration of
BASELINE.json configs[4]: lists live where their payload lives, every probe is
local, only [S, B, k] candidates ride the interconnect."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nvdb_tpu.dist import mesh as meshmod
from nvdb_tpu.index.ivf_flat import IVFFlatIndex, _ivf_search_block
from nvdb_tpu.utils import cdiv, round_up


class ShardedIVFFlatIndex:
    """IVF-Flat with lists (and their packed payload) sharded over the mesh."""

    def __init__(self, mesh: Mesh, centroids, packed, slot_ids, slot_scales,
                 n: int, d: int):
        self.mesh = mesh
        self.centroids = centroids
        self.packed = packed
        self.slot_ids = slot_ids
        self.slot_scales = slot_scales
        self.n = n
        self.d = d
        self._jit_cache = {}

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def lcap(self) -> int:
        return self.packed.shape[1]

    @property
    def index_bytes(self) -> int:
        b = self.packed.size * self.packed.dtype.itemsize
        b += self.slot_ids.size * 4 + self.centroids.size * 4
        if self.slot_scales is not None:
            b += self.slot_scales.size * 4
        return b

    @classmethod
    def from_index(cls, ivf: IVFFlatIndex, mesh: Optional[Mesh] = None
                   ) -> "ShardedIVFFlatIndex":
        """Re-shard a built single-device index across the mesh. nlist is
        padded to a multiple of the shard count with poisoned far-away
        centroids (empty lists, coarse score ~ -1e6, never probed over a real
        list)."""
        mesh = mesh if mesh is not None else meshmod.row_mesh()
        S = mesh.shape[meshmod.ROWS]
        nlist = ivf.nlist
        nl_pad = round_up(nlist, S)

        cents = np.asarray(ivf.centroids)
        packed = np.asarray(ivf.packed)
        sids = np.asarray(ivf.slot_ids)
        if nl_pad != nlist:
            pad_c = np.zeros((nl_pad - nlist, cents.shape[1]), cents.dtype)
            pad_c[:, 0] = 1e3  # huge norm => coarse score ~ -1e6
            cents = np.concatenate([cents, pad_c], axis=0)
            packed = np.concatenate(
                [packed, np.zeros((nl_pad - nlist,) + packed.shape[1:],
                                  packed.dtype)], axis=0)
            sids = np.concatenate(
                [sids, np.full((nl_pad - nlist, sids.shape[1]), -1, np.int32)],
                axis=0)

        sh = NamedSharding(mesh, P(meshmod.ROWS, None))
        sh3 = NamedSharding(mesh, P(meshmod.ROWS, None, None))
        scales = None
        if ivf.slot_scales is not None:
            sc = np.asarray(ivf.slot_scales)
            if nl_pad != nlist:
                sc = np.concatenate(
                    [sc, np.ones((nl_pad - nlist, sc.shape[1]), np.float32)],
                    axis=0)
            scales = jax.device_put(jnp.asarray(sc), sh)
        return cls(
            mesh,
            jax.device_put(jnp.asarray(cents), sh),
            jax.device_put(jnp.asarray(packed, dtype=ivf.packed.dtype), sh3),
            jax.device_put(jnp.asarray(sids), sh),
            scales, ivf.n, ivf.d)

    # -- search ----------------------------------------------------------------

    def _compiled(self, b: int, k: int, nprobe_per_shard: int):
        key = (b, k, nprobe_per_shard)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        mesh = self.mesh
        has_scales = self.slot_scales is not None

        def local(q, c, pk, si, ss):
            v, i = _ivf_search_block(q, c, pk, si, ss, k, nprobe_per_shard)
            av = jax.lax.all_gather(v, meshmod.ROWS, axis=0)   # [S, B, k]
            ai = jax.lax.all_gather(i, meshmod.ROWS, axis=0)
            B = q.shape[0]
            S = av.shape[0]
            av = jnp.moveaxis(av, 0, 1).reshape(B, S * k)
            ai = jnp.moveaxis(ai, 0, 1).reshape(B, S * k)
            tv, idx = jax.lax.top_k(av, k)
            return tv, jnp.take_along_axis(ai, idx, axis=1)

        row3 = P(meshmod.ROWS, None, None)
        row2 = P(meshmod.ROWS, None)
        if has_scales:
            fn = jax.jit(jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(None, None), row2, row3, row2, row2),
                out_specs=(P(None, None), P(None, None)), check_vma=False))
        else:
            fn = jax.jit(jax.shard_map(
                lambda q, c, pk, si: local(q, c, pk, si, None), mesh=mesh,
                in_specs=(P(None, None), row2, row3, row2),
                out_specs=(P(None, None), P(None, None)), check_vma=False))
        self._jit_cache[key] = fn
        return fn

    def search(self, queries: np.ndarray, k: int, nprobe: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """``nprobe`` = TOTAL probes across shards (matching the single-device
        knob); each shard probes ceil(nprobe / S) of its local lists."""
        S = self.mesh.shape[meshmod.ROWS]
        per_shard = max(1, min(cdiv(nprobe, S), self.nlist // S))

        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        qn = queries.shape[0]
        dp = self.centroids.shape[1]
        qp = np.zeros((qn, dp), np.float32)
        qp[:, : self.d] = queries[:, : self.d]
        bp = 8
        while bp < qn:
            bp *= 2
        block = np.zeros((bp, dp), np.float32)
        block[:qn] = qp
        fn = self._compiled(bp, k, per_shard)
        args = (jnp.asarray(block), self.centroids, self.packed, self.slot_ids)
        if self.slot_scales is not None:
            args = args + (self.slot_scales,)
        v, i = fn(*args)
        return np.asarray(v)[:qn], np.asarray(i)[:qn]
