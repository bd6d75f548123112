"""Exact flat-scan index.

One index subsumes the reference's entire scan family — FlatIndex /
FlatIndexOMP / FlatIndexAsync / FlatIndexPool (flat_index{,_omp,_async,_pool}.cpp)
— because on TPU the scheduling variants are just grid partitioning inside one
fused kernel, and cross-chip scale-out is sharding (SURVEY.md §2.4.1). Query
batching (the reference's bench-side batched path, nvdb_bench.cpp:47-158) is the
native mode here: B queries share one stream of the base.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvdb_tpu.kernels import dispatch
from nvdb_tpu.store import VectorStore


# Batch sizes are bucketed to powers of two (>= 8, the f32 sublane count) to
# bound the number of jit recompiles while keeping tile shapes MXU-friendly.
_MIN_B = 8


def _bucket_batch(b: int) -> int:
    p = _MIN_B
    while p < b:
        p *= 2
    return p


class FlatIndex:
    """Exact top-k search over a :class:`VectorStore` by dot product.

    ``quantize_queries`` (int8 stores only): quantize queries to int8 per-row
    max-abs/127 and use the native int8 MXU matmul — 2x compute rate and the
    reference's "query stays f32" guarantee traded for ~0.4% quantization
    noise on the query side (opt-in; off = reference-parity accuracy).

    ``refine_k`` (with quantize_queries): the EXACT i8 mode (VERDICT r2 next
    #7) — the i8 x i8 scan returns its top-refine_k, then a fused dot-metric
    rerank re-scores those candidates with the ORIGINAL f32 queries against
    the same store, restoring the f32-query ranking (the reference keeps
    queries f32 precisely to avoid this tradeoff, Performance.md:242-255;
    here exactness costs ~refine_k rows of rerank instead of half the scan
    rate). One fused program: scan -> rerank, no intermediate fetch.

    Measured refine_k guidance (1M x 768 iid-gaussian — the WORST case for
    query-quantization ranking error): the qi8 top-16 covers the true
    f32-query top-10 at 1.00000, and refine_k=16 reproduces the exact
    oracle ranking at 98% of the raw qi8 scan rate; deeper candidate scans
    pay top-k extraction rounds (k=32 costs ~2x) for no accuracy gain
    (bench_artifacts/exact_i8_r3.txt). Keep refine_k ~ 1.5-2x k."""

    def __init__(self, store: VectorStore, backend: str = "auto",
                 quantize_queries: bool = False, refine_k: int = 0,
                 metric: str = "dot"):
        from nvdb_tpu.formats import vecbin as _vb

        self.store = store
        self.backend = backend
        # EXACT_METRIC analogue (nvdb_ivf_eval.cpp:353): "l2" ranks by
        # 2 q.r - ||r||^2 (exact on un-normalized corpora; jnp path only)
        if metric not in ("dot", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.quantize_queries = (quantize_queries and metric == "dot"
                                 and store.dtype_code == _vb.DTYPE_I8)
        self.refine_k = refine_k if self.quantize_queries else 0
        self._jit_cache: dict = {}

    # -- device-level call (jit-compiled per (B, k) bucket) -------------------

    def _compiled(self, b_padded: int, k: int):
        key = (b_padded, k)
        fn = self._jit_cache.get(key)
        if fn is None:
            backend = self.backend
            n_valid = self.store.n
            has_scales = self.store.scales is not None

            # vectors/scales are jit ARGUMENTS, never closure constants: a
            # closed-over device array is embedded into the lowered module as a
            # literal, which forces a device->host transfer of the whole base at
            # trace time (catastrophic for GB-scale stores).
            if self.quantize_queries:
                refine_k = max(self.refine_k, k) if self.refine_k else 0

                def run(queries, vectors, scales):
                    amax = jnp.max(jnp.abs(queries), axis=1)
                    qs = jnp.where(amax > 0, amax / 127.0, 1.0)
                    q8 = jnp.clip(jnp.round(queries / qs[:, None]),
                                  -127, 127).astype(jnp.int8)
                    kk = refine_k if refine_k else k
                    v, i = dispatch.flat_topk(
                        q8, vectors, scales, n_valid, kk, backend=backend,
                        query_scales=qs)
                    if refine_k:
                        # exact i8 mode: re-score the i8 x i8 candidates
                        # with the f32 queries (dot metric), fused; backend
                        # picked from the measured size crossover
                        v, i = dispatch.exact_refine(queries, i, vectors,
                                                     scales, k, metric="dot")
                    return v, i
            elif has_scales:
                def run(queries, vectors, scales):
                    return dispatch.flat_topk(
                        queries, vectors, scales, n_valid, k, backend=backend,
                        metric=self.metric)
            else:
                def run(queries, vectors):
                    return dispatch.flat_topk(
                        queries, vectors, None, n_valid, k, backend=backend,
                        metric=self.metric)

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    def search_device(self, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        """queries [B, Dp] already padded & device-resident; returns device arrays."""
        fn = self._compiled(queries.shape[0], k)
        if self.store.scales is not None:
            return fn(queries, self.store.vectors, self.store.scales)
        return fn(queries, self.store.vectors)

    # -- host-level convenience API -------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """queries [Q, d] f32 on host -> (scores [Q, k] f32, ids [Q, k] int32).

        Pads dims and the batch (to a power-of-two bucket), runs on device,
        strips padding.
        """
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        q_n = queries.shape[0]
        qp = self.store.pad_queries(queries)
        b = _bucket_batch(q_n)
        if b != q_n:
            qp = np.concatenate(
                [qp, np.zeros((b - q_n, qp.shape[1]), dtype=np.float32)], axis=0)
        vals, ids = self.search_device(jax.numpy.asarray(qp), k)
        return np.asarray(vals)[:q_n], np.asarray(ids)[:q_n]

    def warmup(self, batch_sizes=(_MIN_B,), k: int = 10) -> None:
        """Pre-compile the scan for the given batch buckets (the reference's
        warmup loops, nvdb_bench.cpp:317-322)."""
        d = self.store.d
        for b in batch_sizes:
            q = np.zeros((b, d), dtype=np.float32)
            v, i = self.search(q, k)
            jax.block_until_ready((v, i))


def build_ground_truth(
    store: VectorStore, queries: np.ndarray, k: int, batch: int = 256,
    backend: str = "auto", metric: str = "dot",
) -> np.ndarray:
    """Exact top-k ids for all queries — the nvdb_gt_build core
    (nvdb_gt_build.cpp:74-127). Returns uint32 ids [Q, k].
    ``metric="l2"`` is the EXACT_METRIC=L2 analogue (exact L2 rank on
    un-normalized corpora; identical ids on normalized ones)."""
    idx = FlatIndex(store, backend=backend, metric=metric)
    out = []
    for s in range(0, queries.shape[0], batch):
        _, ids = idx.search(queries[s : s + batch], k)
        out.append(ids)
    return np.concatenate(out, axis=0).astype(np.uint32)


def build_ground_truth_chunked(
    path: str, queries: np.ndarray, k: int, batch: int = 256,
    row_chunk: int = 1_000_000, verbose: bool = False, metric: str = "dot",
) -> np.ndarray:
    """Exact f32 GT for a corpus LARGER than device HBM: stream row chunks
    (mmap slice -> device), exact-scan each against all query batches with
    HIGHEST-precision f32 matmuls, and k-merge the per-chunk winners on the
    host. Same result as the resident path, peak device memory = one
    chunk. (The reference's gt_build streams the file once on the CPU the
    same way, nvdb_gt_build.cpp:74-127.) ``verbose`` prints per-chunk
    progress to stderr (tools pass True — an 8M GT runs ~1 h with no other
    output); library callers stay silent by default."""
    import sys
    import time

    from nvdb_tpu.formats import vecbin
    from nvdb_tpu.kernels import ops
    from nvdb_tpu.utils import round_up

    f = vecbin.VecbinFile(path)
    Q, d = queries.shape
    dp = round_up(d, 128)
    qpad = np.zeros((Q, dp), np.float32)
    qpad[:, :d] = queries
    qdev = jnp.asarray(qpad)

    all_v: list[np.ndarray] = []
    all_i: list[np.ndarray] = []
    t0 = time.perf_counter()
    for c0 in range(0, f.count, row_chunk):
        c1 = min(c0 + row_chunk, f.count)
        if verbose:
            print(f"[gt +{time.perf_counter() - t0:6.1f}s] chunk "
                  f"{c0}..{c1} of {f.count}", file=sys.stderr, flush=True)
        rows = f.rows_f32(c0, c1)
        n = c1 - c0
        npad = round_up(n, 1024)
        block = np.zeros((npad, dp), np.float32)
        block[:n, :d] = rows
        del rows
        dev = jnp.asarray(block)
        del block
        cv = np.empty((Q, k), np.float32)
        ci = np.empty((Q, k), np.int64)
        for s in range(0, Q, batch):
            v, i = ops.scan_topk(qdev[s:s + batch], dev, None, n, k,
                                 metric=metric)
            cv[s:s + batch] = np.asarray(v)
            ci[s:s + batch] = np.asarray(i).astype(np.int64) + c0
        all_v.append(cv)
        all_i.append(ci)
        del dev
    vs = np.concatenate(all_v, axis=1)               # [Q, n_chunks*k]
    isel = np.concatenate(all_i, axis=1)
    order = np.argsort(-vs, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(isel, order, axis=1).astype(np.uint32)
