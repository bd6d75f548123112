"""IVF-Flat index — TPU-native replacement for FAISS ``IndexIVFFlat``
(nvdb_ivf_build.cpp:59-95, searched in nvdb_ivf_eval.cpp:478-489).

TPU-first design decisions (vs FAISS's ragged inverted lists):

- **Fixed-capacity packed lists.** Rows are assigned to their nearest centroid
  with *spill-to-next-nearest* when a list is full (capacity ~ pad_factor x
  mean list size), then physically packed into a dense ``[nlist, Lcap, Dp]``
  array. Probing ``nprobe`` lists is therefore a gather of CONTIGUOUS slabs —
  no per-row gathers, static shapes, MXU-friendly batched matmuls. The padding
  slots carry id -1 and zero vectors and are masked out of every top-k.
  (This replaces FAISS's ragged list scan; the spill trades a tiny recall
  epsilon for fully static shapes — see tests/test_ivf.py recall gates.)
- **Coarse quantizer on the MXU**: one [B, Dp] x [Dp, nlist] matmul, L2 rank
  via ||c||^2 - 2 q.c.
- dtype ladder: packed payload may be f32 / bf16 / int8 (+ per-slot scale),
  same encodings as the flat store.

Persistence: ``save``/``load`` to a single .npz (the write_index/read_index
parity, nvdb_ivf_build.cpp:94, nvdb_ivf_eval.cpp:390).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.kernels import kmeans
from nvdb_tpu.utils import round_up


def _pack_lists(
    rows_enc: np.ndarray,          # [N, D] encoded payload (f32/bf16/i8)
    scales: Optional[np.ndarray],  # [N] f32 for i8
    assign: np.ndarray,            # [N] int32 nearest-centroid
    dists: Optional[np.ndarray],   # [N, S] distances to top-S centroids for spill
    alts: Optional[np.ndarray],    # [N, S] the top-S centroid ids
    nlist: int,
    lcap: int,
    d_padded: int,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], int]:
    """Pack rows into fixed-capacity lists, spilling overflow to the row's
    next-nearest centroid with free space (lists with free slots as a last
    resort). Fully vectorized (one pass per spill candidate), so packing 100M
    rows is numpy-speed, not a Python loop.
    Returns (packed [nlist, lcap, Dp], slot_ids [nlist, lcap], slot_scales, n_spilled)."""
    n, d = rows_enc.shape
    fill = np.zeros(nlist, dtype=np.int64)
    slot_of = np.full(n, -1, dtype=np.int64)
    list_of = np.full(n, -1, dtype=np.int64)
    spilled = 0

    if alts is None:
        alts = assign[:, None]

    def group_ranks(keys: np.ndarray) -> np.ndarray:
        """Rank of each element within its key group (stable order)."""
        m = keys.shape[0]
        order_ = np.argsort(keys, kind="stable")
        sk = keys[order_]
        is_start = np.r_[True, sk[1:] != sk[:-1]]
        start_pos = np.maximum.accumulate(np.where(is_start, np.arange(m), 0))
        ranks_sorted = np.arange(m) - start_pos
        ranks = np.empty(m, dtype=np.int64)
        ranks[order_] = ranks_sorted
        return ranks

    unplaced = np.arange(n)
    for s in range(alts.shape[1]):
        if unplaced.size == 0:
            break
        cand = alts[unplaced, s].astype(np.int64)
        ranks = group_ranks(cand)
        slots = fill[cand] + ranks
        ok = slots < lcap
        rows_ok = unplaced[ok]
        list_of[rows_ok] = cand[ok]
        slot_of[rows_ok] = slots[ok]
        np.add.at(fill, cand[ok], 1)
        if s > 0:
            spilled += int(rows_ok.size)
        unplaced = unplaced[~ok]

    if unplaced.size:
        # last resort: pour leftovers into whatever lists still have space
        free = lcap - fill
        dest = np.repeat(np.arange(nlist), free)[: unplaced.size]
        if dest.size < unplaced.size:
            raise ValueError("total list capacity too small for all rows")
        ranks = group_ranks(dest)
        list_of[unplaced] = dest
        slot_of[unplaced] = fill[dest] + ranks
        np.add.at(fill, dest, 1)
        spilled += int(unplaced.size)

    packed = np.zeros((nlist, lcap, d_padded), dtype=rows_enc.dtype)
    slot_ids = np.full((nlist, lcap), -1, dtype=np.int32)
    packed[list_of, slot_of, :d] = rows_enc
    slot_ids[list_of, slot_of] = np.arange(n, dtype=np.int32)
    slot_scales = None
    if scales is not None:
        slot_scales = np.ones((nlist, lcap), dtype=np.float32)
        slot_scales[list_of, slot_of] = scales
    return packed, slot_ids, slot_scales, spilled


def _coarse_probes(queries, centroids, slot_ids, nprobe):
    """Coarse top-nprobe lists by L2 (argmax 2 q.c - ||c||^2), with EMPTY
    lists masked out of the ranking. k-means dead centroids keep their init
    positions — actual corpus rows, unit-norm on normalized corpora — so
    near the query they OUTRANK every real cell mean (whose norm is < 1
    as an average of unit vectors), flooding the top of the ranking with
    zero-candidate lists that burn probe slots. Measured on the 8M x 768
    flagship (nlist=16384, 1,845 dead lists): GT-list coverage@nprobe=64
    .9617 -> .9970 from this mask alone (scripts/coverage_probe.py,
    BENCHMARKS 8M section)."""
    qc = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
    live = (slot_ids >= 0).any(axis=1)[None, :]
    _, probes = jax.lax.top_k(jnp.where(live, 2.0 * qc - c2, -jnp.inf),
                              nprobe)
    return probes


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_block(
    queries: jax.Array,       # [B, Dp] f32
    centroids: jax.Array,     # [nlist, Dp] f32
    packed: jax.Array,        # [nlist, Lcap, Dp]
    slot_ids: jax.Array,      # [nlist, Lcap] int32
    slot_scales,              # [nlist, Lcap] f32 | None
    k: int,
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    probes = _coarse_probes(queries, centroids, slot_ids, nprobe)  # [B, P]

    cand = jnp.take(packed, probes, axis=0)                   # [B, P, L, Dp]
    sids = jnp.take(slot_ids, probes, axis=0)                 # [B, P, L]
    if cand.dtype == jnp.float32:
        scores = jnp.einsum("bd,bpld->bpl", queries, cand,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    else:
        scores = jnp.einsum("bd,bpld->bpl", queries.astype(jnp.bfloat16),
                            cand.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    if slot_scales is not None:
        scores = scores * jnp.take(slot_scales, probes, axis=0)
    scores = jnp.where(sids >= 0, scores, -jnp.inf)
    B = queries.shape[0]
    flat = scores.reshape(B, -1)
    vals, idx = jax.lax.top_k(flat, k)
    ids = jnp.take_along_axis(sids.reshape(B, -1), idx, axis=1)
    return vals, ids


@dataclasses.dataclass
class IVFFlatIndex:
    centroids: jax.Array                 # [nlist, Dp] f32
    packed: jax.Array                    # [nlist, Lcap, Dp]
    slot_ids: jax.Array                  # [nlist, Lcap] int32
    slot_scales: Optional[jax.Array]     # [nlist, Lcap] f32
    n: int
    d: int
    dtype_code: int
    n_spilled: int = 0

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

    # -- build ---------------------------------------------------------------

    @classmethod
    def build(
        cls,
        rows_f32: np.ndarray,
        nlist: int,
        dtype: str = "f32",
        train_size: int = 50_000,      # IVF_TRAIN analogue (nvdb_ivf_build.cpp:44)
        n_iters: int = 10,
        pad_factor: float = 1.5,
        spill_candidates: int = 4,
        seed: int = 0,
        corpus_refine_iters: int = 0,
    ) -> "IVFFlatIndex":
        n, d = rows_f32.shape
        dp = round_up(d, 128)

        # train coarse quantizer on a subsample
        train = rows_f32[:min(train_size, n)]
        train_p = np.zeros((train.shape[0], dp), np.float32)
        train_p[:, :d] = train
        cents, _ = kmeans.kmeans_fit(jax.random.PRNGKey(seed),
                                     jnp.asarray(train_p), nlist, n_iters=n_iters)

        # top-S nearest centroids per row (for assignment + spill)
        data_p = np.zeros((n, dp), np.float32)
        data_p[:, :d] = rows_f32

        if corpus_refine_iters > 0:
            # corpus-scale Lloyd + dead-centroid reseeding (VERDICT r3 #3):
            # the subsample-trained quantizer leaves corpus-dead lists the
            # probe ranking must mask; full-corpus passes reclaim them
            cents = kmeans.corpus_refine(data_p, cents,
                                         n_iters=corpus_refine_iters,
                                         seed=seed + 1)
        S = min(spill_candidates, nlist)
        alts = np.asarray(_topS_centroids(jnp.asarray(data_p), cents, S))

        lcap = round_up(int(np.ceil(n / nlist * pad_factor)), 32)  # 32 = strictest dtype sublane tile

        code = vecbin.dtype_code(dtype)
        scales = None
        if code == vecbin.DTYPE_I8:
            enc, scales = vecbin.quantize_i8(rows_f32)
        elif code == vecbin.DTYPE_BF16:
            enc = vecbin.to_bf16(rows_f32)
        else:
            enc = rows_f32.astype(np.float32)

        packed, slot_ids, slot_scales, spilled = _pack_lists(
            enc, scales, alts[:, 0], None, alts, nlist, lcap, dp)

        jdt = {vecbin.DTYPE_F32: jnp.float32, vecbin.DTYPE_BF16: jnp.bfloat16,
               vecbin.DTYPE_I8: jnp.int8}[code]
        return cls(
            centroids=cents,
            packed=jnp.asarray(packed, dtype=jdt),
            slot_ids=jnp.asarray(slot_ids),
            slot_scales=jnp.asarray(slot_scales) if slot_scales is not None else None,
            n=n, d=d, dtype_code=code, n_spilled=spilled)

    @classmethod
    def repack(
        cls,
        idx: "IVFFlatIndex",
        rows_f32: np.ndarray,
        pad_factor: float = 2.5,
        spill_candidates: int = 8,
    ) -> "IVFFlatIndex":
        """Re-balance the inverted lists at a new capacity / spill depth
        WITHOUT re-training the coarse quantizer (see IVFPQIndex.repack for
        why: on skewed corpora tight fixed-capacity packing relegates
        overflow rows to far lists, capping recall)."""
        n, d = rows_f32.shape
        nlist = idx.nlist
        dp = idx.packed.shape[2]
        data_p = np.zeros((n, dp), np.float32)
        data_p[:, :d] = rows_f32
        S = min(spill_candidates, nlist)
        alts = np.asarray(_topS_centroids(jnp.asarray(data_p), idx.centroids, S))
        lcap = round_up(int(np.ceil(n / nlist * pad_factor)), 32)

        code = idx.dtype_code
        scales = None
        if code == vecbin.DTYPE_I8:
            enc, scales = vecbin.quantize_i8(rows_f32)
        elif code == vecbin.DTYPE_BF16:
            enc = vecbin.to_bf16(rows_f32)
        else:
            enc = rows_f32.astype(np.float32)

        packed, slot_ids, slot_scales, spilled = _pack_lists(
            enc, scales, alts[:, 0], None, alts, nlist, lcap, dp)
        jdt = {vecbin.DTYPE_F32: jnp.float32, vecbin.DTYPE_BF16: jnp.bfloat16,
               vecbin.DTYPE_I8: jnp.int8}[code]
        return cls(
            centroids=idx.centroids,
            packed=jnp.asarray(packed, dtype=jdt),
            slot_ids=jnp.asarray(slot_ids),
            slot_scales=(jnp.asarray(slot_scales)
                         if slot_scales is not None else None),
            n=n, d=d, dtype_code=code, n_spilled=spilled)

    # -- search ----------------------------------------------------------------

    def search_device(self, queries: jax.Array, k: int, nprobe: int,
                      backend: str = "jnp") -> Tuple[jax.Array, jax.Array]:
        """Device-resident path: queries [B, Dp] already padded/on-device;
        returns device arrays. Avoids per-call host->device transfers (the
        serving path; host ``search`` wraps this)."""
        if backend == "auto":
            from nvdb_tpu.kernels.dispatch import default_backend
            backend = default_backend()
        nprobe = min(nprobe, self.nlist)
        fn = _ivf_probe_pallas if backend == "pallas" else _ivf_search_block
        return fn(queries, self.centroids, self.packed, self.slot_ids,
                  self.slot_scales, k, nprobe)

    def search(self, queries: np.ndarray, k: int, nprobe: int,
               q_chunk: int = 32, backend: str = "jnp"
               ) -> Tuple[np.ndarray, np.ndarray]:
        """backend="jnp": slab-gather + batched einsum (throughput-friendly).
        backend="pallas": scalar-prefetch probe kernel — each probed list slab
        is DMA'd HBM->VMEM exactly once, no materialized gather (latency path)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        qn = queries.shape[0]
        dp = self.packed.shape[2]
        qp = np.zeros((qn, dp), np.float32)
        qp[:, : self.d] = queries[:, : self.d]
        nprobe = min(nprobe, self.nlist)

        vals_out = np.empty((qn, k), np.float32)
        ids_out = np.empty((qn, k), np.int64)
        for s in range(0, qn, q_chunk):
            e = min(s + q_chunk, qn)
            b = e - s
            bp = 8
            while bp < b:
                bp *= 2
            block = np.zeros((bp, dp), np.float32)
            block[:b] = qp[s:e]
            v, i = self.search_device(jnp.asarray(block), k, nprobe,
                                      backend=backend)
            vals_out[s:e] = np.asarray(v)[:b]
            ids_out[s:e] = np.asarray(i)[:b]
        return vals_out, ids_out

    # -- persistence -----------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path,
            centroids=np.asarray(self.centroids),
            packed=np.asarray(self.packed).view(np.uint8)
            if self.packed.dtype == jnp.bfloat16 else np.asarray(self.packed),
            packed_dtype=np.array(self.dtype_code),
            slot_ids=np.asarray(self.slot_ids),
            slot_scales=(np.asarray(self.slot_scales)
                         if self.slot_scales is not None else np.zeros(0, np.float32)),
            meta=np.array([self.n, self.d, self.n_spilled], dtype=np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "IVFFlatIndex":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        code = int(z["packed_dtype"])
        packed = z["packed"]
        if code == vecbin.DTYPE_BF16:
            import ml_dtypes

            packed = packed.view(ml_dtypes.bfloat16)
        jdt = {vecbin.DTYPE_F32: jnp.float32, vecbin.DTYPE_BF16: jnp.bfloat16,
               vecbin.DTYPE_I8: jnp.int8}[code]
        n, d, spilled = (int(x) for x in z["meta"])
        sc = z["slot_scales"]
        return cls(
            centroids=jnp.asarray(z["centroids"]),
            packed=jnp.asarray(packed, dtype=jdt),
            slot_ids=jnp.asarray(z["slot_ids"]),
            slot_scales=jnp.asarray(sc) if sc.size else None,
            n=n, d=d, dtype_code=code, n_spilled=spilled)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_probe_pallas(
    queries: jax.Array, centroids: jax.Array, packed: jax.Array,
    slot_ids: jax.Array, slot_scales, k: int, nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """Coarse top-nprobe (jnp) + the scalar-prefetch Pallas probe kernel."""
    from nvdb_tpu.kernels.ivf_scan import pallas_ivf_probe_topk

    probes = _coarse_probes(queries, centroids, slot_ids, nprobe)
    return pallas_ivf_probe_topk(queries, probes, packed, slot_ids,
                                 slot_scales, k)


@functools.partial(jax.jit, static_argnames=("s",))
def _topS_centroids(data: jax.Array, cents: jax.Array, s: int) -> jax.Array:
    """[N, Dp] x [K, Dp] -> [N, S] ids of the S nearest centroids (L2), chunked."""
    def chunk_fn(chunk):
        dots = jnp.dot(chunk, cents.T, preferred_element_type=jnp.float32)
        c2 = jnp.sum(cents * cents, axis=1)[None, :]
        _, ids = jax.lax.top_k(2.0 * dots - c2, s)
        return ids

    n = data.shape[0]
    c = min(65536, n)
    while n % c != 0:
        c //= 2
    return jax.lax.map(chunk_fn, data.reshape(n // c, c, -1)).reshape(n, s)
