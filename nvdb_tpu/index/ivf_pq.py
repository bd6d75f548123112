"""IVF-PQ / IVF-OPQ-PQ index with optional exact refine.

TPU-native replacement for FAISS ``IndexIVFPQ`` (+ ``OPQMatrix`` /
``IndexPreTransform``, nvdb_ivfpq_build.cpp:78-96) and the two-stage
ANN + exact-rerank pipeline of nvdb_ivf_eval.cpp:478-634 / cuda_refine.cu —
except the whole pipeline (coarse probe -> ADC scan -> candidate top-R ->
exact rerank) is ONE on-device program: no H2D/D2H staging, the refine
candidates are gathered straight from the HBM-resident flat store.

Layout mirrors IVFFlatIndex: fixed-capacity packed lists, payload = PQ codes
``[nlist, M, Lcap]`` uint8 (list-major, subspace rows, slot lanes — the
layout the Pallas ADC kernel's one-hot construction is native in; see
kernels/adc_scan.py). All geometry lives in OPQ-rotated space; queries are
rotated once at search time. Codes encode rotated residuals w.r.t. the list
each row is PACKED in (spilled rows encode vs their actual list, so ADC
stays consistent).
"""

from __future__ import annotations

import dataclasses
import functools
import sys
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvdb_tpu.index.ivf_flat import _coarse_probes, _pack_lists, _topS_centroids
from nvdb_tpu.kernels import adc_scan, kmeans, ops, pq
from nvdb_tpu.utils import round_up


@functools.partial(jax.jit,
                   static_argnames=("k", "nprobe", "m", "backend", "dedup",
                                    "ids_mode"))
def _ivfpq_search_block(
    q_rot: jax.Array,         # [B, Dp] rotated queries
    centroids: jax.Array,     # [nlist, Dp]
    codebooks: jax.Array,     # [M, 256, dsub]
    codes: jax.Array,         # [nlist, M, Lcap] uint8 (transposed layout)
    slot_ids: jax.Array,      # [nlist, Lcap] int32
    k: int,
    nprobe: int,
    m: int,
    backend: str = "jnp",
    dedup: int = 0,           # replica count of the index (<=1: ids unique)
    fills: Optional[jax.Array] = None,  # [nlist] int32 (gen-4 chunk skip)
    ids_mode: str = "dma",    # "key" (gen-5): prefix-packed, replicas==1 only
) -> Tuple[jax.Array, jax.Array]:
    B = q_rot.shape[0]
    # empty lists masked from the coarse ranking — see _coarse_probes
    # (ivf_flat.py): dead k-means centroids otherwise outrank real cell
    # means near the query (8M flagship: coverage@64 .9617 -> .9970)
    probes = _coarse_probes(q_rot, centroids, slot_ids, nprobe)  # [B, P]

    cents_p = jnp.take(centroids, probes, axis=0)                # [B, P, Dp]
    residuals = q_rot[:, None, :] - cents_p                      # [B, P, Dp]
    lut = pq.adc_lut(residuals.reshape(B * nprobe, -1), codebooks, m)

    if backend == "pallas":
        # gather-free nibble one-hot kernel; LUT pre-split [B, P, M, 16, 16].
        # bf16 here is free precision-wise (the kernel rounds to bf16 for the
        # one-hot matmul anyway) and halves the [B, P, M, 256] slab — at
        # B=256, P=64, m=96 that slab is 1.6 GB in f32, a real OOM risk.
        # k > 128 widens the kernel's slot buffer to ceil(k/128) sublane
        # rows (deep-k candidate generation past the old 128-lane refine
        # ceiling, VERDICT r3 #2); the dma kernel's merge absorbs
        # replicated duplicates in any row, so no post-pass dedup
        return adc_scan.pallas_adc_topk(
            lut.astype(jnp.bfloat16).reshape(B, nprobe, m, 16, 16),
            probes, codes, slot_ids, k, fills=fills, ids_mode=ids_mode)

    lut = lut.reshape(B, nprobe, m, pq.KSUB)                     # [B, P, M, 256]
    code_slab = jnp.take(codes, probes, axis=0)                  # [B, P, M, L]
    code_slab = jnp.swapaxes(code_slab, -1, -2)                  # [B, P, L, M]
    sids = jnp.take(slot_ids, probes, axis=0)                    # [B, P, L]
    scores = pq.adc_scores(lut, code_slab)                       # [B, P, L] (-L2)
    scores = jnp.where(sids >= 0, scores, -jnp.inf)
    if dedup > 1:
        # every slot could be one of `dedup` copies: widen by that factor
        # before collapsing, or the deduped row can hold fewer than k ids
        w = min(dedup * k, scores.reshape(B, -1).shape[1])
        vals, idx = jax.lax.top_k(scores.reshape(B, -1), w)
        ids = jnp.take_along_axis(sids.reshape(B, -1), idx, axis=1)
        return ops.dedup_topk(vals, ids, k)
    vals, idx = jax.lax.top_k(scores.reshape(B, -1), k)
    ids = jnp.take_along_axis(sids.reshape(B, -1), idx, axis=1)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "backend", "metric"))
def _refine_block(
    queries: jax.Array,       # [B, Dp] queries IN THE STORE'S SPACE (see note)
    cand_ids: jax.Array,      # [B, R] int32 (-1 padded)
    vectors: jax.Array,       # [Np, Dp] flat store payload
    scales,                   # [Np] | None
    k: int,
    backend: str = "jnp",
    norms2=None,              # [Np] f32 (VectorStore.norms2) for pallas
    metric: str = "l2",       # EXACT_METRIC=L2|DOT (nvdb_ivf_eval.cpp:353,436)
    res_cents=None,           # residual-i8 store: [nlist, Dp] f32
    res_ids=None,             # residual-i8 store: [Np] int32
) -> Tuple[jax.Array, jax.Array]:
    """Exact rerank of ADC candidates against the full-precision store —
    the cuda_l2_topk_batch role (cuda_refine.cu:839-1175), fused on-device.
    backend="pallas" streams candidate rows HBM->VMEM by id-driven async
    copies (kernels/rerank.py) instead of materializing the [B, R, Dp]
    gather slab in HBM. metric="l2" ranks by 2 q.r - ||r||^2 (the default,
    matching refine_topk_l2_ids); "dot" by the scaled dot product — on
    normalized corpora the ranks coincide (gtbin_format.h:11-15).

    Residual-i8 stores (res_cents/res_ids set, store.is_residual): rows
    dequantize as cent + s*codes — the residual's ~1.8x smaller quant step
    moves the 8M refine ceiling .9760 -> .9900 at the same byte budget.
    ``queries`` must then be in the store's ROTATED space (callers pass
    q_rot; the dot is rotation-invariant so scores are unchanged)."""
    if backend == "pallas":
        from nvdb_tpu.kernels.rerank import pallas_rerank

        return pallas_rerank(queries, cand_ids, vectors, scales, k,
                             norms2=norms2, metric=metric,
                             res_cents=res_cents, res_ids=res_ids)
    safe = jnp.maximum(cand_ids, 0)
    rows = jnp.take(vectors, safe, axis=0).astype(jnp.float32)   # [B, R, Dp]
    if scales is not None:
        rows = rows * jnp.take(scales, safe, axis=0)[:, :, None]
    if res_cents is not None:
        rows = rows + jnp.take(res_cents, jnp.take(res_ids, safe), axis=0)
    return ops.exact_rerank(queries, rows, cand_ids, k, metric=metric)


@dataclasses.dataclass
class IVFPQIndex:
    rotation: Optional[jax.Array]     # [Dp, Dp] f32 (OPQ) or None
    centroids: jax.Array              # [nlist, Dp] f32 (rotated space)
    codebooks: jax.Array              # [M, 256, dsub] f32
    codes: jax.Array                  # [nlist, M, Lcap] uint8 (transposed)
    slot_ids: jax.Array               # [nlist, Lcap] int32
    n: int
    d: int
    m: int
    n_spilled: int = 0
    replicas: int = 1                 # >1: each row encoded in its top-R lists
    _fills: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False, compare=False)
    _ids_mode: Optional[str] = dataclasses.field(
        default=None, repr=False, compare=False)

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def lcap(self) -> int:
        return self.codes.shape[2]

    def fills(self) -> jax.Array:
        """[nlist] live-slot counts (1 + last live slot id), cached — the
        gen-4 chunk-skip operand: on repacked indexes most of each list's
        capacity is padding the ADC kernel need not score."""
        if self._fills is None:
            from nvdb_tpu.kernels.adc_scan import list_fills
            self._fills = list_fills(self.slot_ids)
        return self._fills

    def ids_mode(self) -> str:
        """Kernel id strategy: 'key' (gen-5 — no slot-id DMA, ids derived
        from list*lcap+lane) when its preconditions hold (prefix-packed
        lists + globally unique slot ids), else 'dma'. Checked once on
        the host and cached."""
        if self._ids_mode is None:
            from nvdb_tpu.kernels.adc_scan import is_prefix_packed
            ok = self.replicas <= 1 and bool(is_prefix_packed(self.slot_ids))
            self._ids_mode = "key" if ok else "dma"
        return self._ids_mode

    @property
    def index_bytes(self) -> int:
        b = self.codes.size + self.slot_ids.size * 4
        b += self.centroids.size * 4 + self.codebooks.size * 4
        if self.rotation is not None:
            b += self.rotation.size * 4
        return b

    # -- build -----------------------------------------------------------------

    @classmethod
    def build(
        cls,
        rows_f32: np.ndarray,
        nlist: int,
        m: int = 64,                   # PQ_M analogue (must divide Dp)
        use_opq: bool = True,          # USE_OPQ
        train_size: int = 50_000,      # IVF_TRAIN
        n_iters: int = 10,
        opq_iters: int = 4,            # OPQ_NITER
        # codes are ~1 byte/dim: generous list padding costs little memory and
        # halves spill at high nlist (measured 28-43% spill at pad 1.5 with
        # nlist >> natural cluster count)
        pad_factor: float = 2.5,
        spill_candidates: int = 4,
        seed: int = 0,
        # codebook quality knobs (round-1 recall gap, VERDICT next-round #2):
        # residuals exist for ALL rows anyway, so codebooks train on a much
        # larger slice than the coarse quantizer, with more Lloyd iterations
        # (FAISS trains PQ with 25 iters on ~256 pts/centroid)
        cb_train_size: Optional[int] = None,   # None -> min(n, 262144)
        cb_iters: int = 12,
        # >0: corpus-scale Lloyd passes + dead-centroid reseeding after the
        # subsample k-means (VERDICT r3 #3 — at 8M/nlist=16K the subsample
        # quantizer left 11% of lists corpus-dead); costs one corpus
        # upload per pass
        corpus_refine_iters: int = 0,
    ) -> "IVFPQIndex":
        n, d = rows_f32.shape
        dp = round_up(d, 128)
        assert dp % m == 0, f"m={m} must divide padded dim {dp}"
        key = jax.random.PRNGKey(seed)
        stage = _stage_logger(n)

        stage("pad corpus")
        data_p = np.zeros((n, dp), np.float32)
        data_p[:, :d] = rows_f32
        t = min(train_size, n)

        # OPQ rotation trained on raw training rows (the OPQMatrix pretransform)
        rot = None
        if use_opq:
            key, ko = jax.random.split(key)
            # OPQ's [M, T, dsub] subspace views tile dsub (e.g. 8) up to the
            # 128-lane TPU layout — a 16x memory blow-up, 49 GB at T=1M.
            # Rotation quality saturates far below coarse-quantizer train
            # sizes anyway; cap independently of --train.
            t_opq = min(t, 131072)
            stage(f"train OPQ rotation (t={t_opq})")
            rot_np, _ = pq.train_opq(ko, data_p[:t_opq], m,
                                     n_opq_iters=opq_iters)
            rot = jnp.asarray(rot_np)
            stage("apply rotation")
            if n >= _HOST_BUILD_ROWS:
                data_rot = _rotate_inplace_host(data_p, rot_np)
            else:
                data_rot = _host_chunked(lambda x: x @ rot, data_p)
                del data_p
        else:
            data_rot = data_p

        # coarse quantizer in rotated space
        stage(f"k-means coarse quantizer (t={t}, nlist={nlist})")
        key, kc = jax.random.split(key)
        cents, _ = kmeans.kmeans_fit(kc, jnp.asarray(data_rot[:t]), nlist,
                                     n_iters=n_iters)

        if corpus_refine_iters > 0:
            stage(f"corpus-scale Lloyd refinement "
                  f"({corpus_refine_iters} passes)")
            cents = kmeans.corpus_refine(
                data_rot, cents, n_iters=corpus_refine_iters, seed=seed + 1,
                log=lambda msg: stage(msg))

        stage("coarse assignment (top-S centroids, device-chunked)")
        S = min(spill_candidates, nlist)
        alts = _host_chunked(lambda x: _topS_centroids(x, cents, S),
                             data_rot)
        # 128: Lcap is the LANE dim of the transposed code layout (adc kernel)
        lcap = round_up(int(np.ceil(n / nlist * pad_factor)), 128)

        # pack ROW IDS first (codes depend on the packed list's centroid)
        stage(f"pack lists (lcap={lcap})")
        dummy = np.zeros((n, 1), np.float32)
        _, slot_ids, _, spilled = _pack_lists(
            dummy, None, alts[:, 0], None, alts, nlist, lcap, 1)

        # residuals vs the packed list's centroid, then PQ codebooks + encode
        cents_np = np.asarray(cents)
        # zeros, not empty: SPILLED rows are in no list, so their list_of
        # entry is never assigned below — with np.empty the residual
        # subtraction would index cents_np with uninitialized garbage
        # (out-of-bounds crash when a stale page holds a large value).
        # Centroid 0 is harmless: spilled rows' residuals/codes are unused.
        list_of = np.zeros(n, np.int64)
        li, si = np.nonzero(slot_ids >= 0)
        list_of[slot_ids[li, si]] = li
        # in-place chunked subtraction: at 8M rows the fancy-index temp
        # cents_np[list_of] alone is 24.6 GB
        stage("residual subtraction")
        for s in range(0, n, 1_000_000):
            data_rot[s:s + 1_000_000] -= cents_np[list_of[s:s + 1_000_000]]
        residuals = data_rot

        tcb = min(n, cb_train_size or 262144)
        stage(f"train PQ codebooks (t={tcb})")
        key, kb = jax.random.split(key)
        cb = pq.train_codebooks(kb, jnp.asarray(residuals[:tcb]), m,
                                n_iters=cb_iters)

        stage("PQ encode")
        if n >= _HOST_BUILD_ROWS:
            codes_rows = _encode_host(residuals, np.asarray(cb), m)
        else:
            codes_rows = _host_chunked(
                lambda x: _encode_chunked(x, cb, m), residuals)
        stage("scatter codes into list slabs")
        codes = np.zeros((nlist, m, lcap), np.uint8)
        codes[li, :, si] = codes_rows[slot_ids[li, si]]

        stage("upload index arrays")
        return cls(rotation=rot, centroids=cents, codebooks=cb,
                   codes=jnp.asarray(codes), slot_ids=jnp.asarray(slot_ids),
                   n=n, d=d, m=m, n_spilled=spilled)

    @classmethod
    def repack(
        cls,
        idx: "IVFPQIndex",
        rows_f32: np.ndarray,
        pad_factor: float = 4.0,   # the measured sweet spot (BENCHMARKS §4)
        spill_candidates: int = 8,
        replicas: int = 1,
    ) -> "IVFPQIndex":
        """Re-balance the inverted lists with a larger capacity / deeper spill
        WITHOUT retraining rotation, coarse centroids, or PQ codebooks (those
        are corpus-level; packing is layout — minutes instead of the full
        k-means+OPQ build). The reference has no analogue: FAISS lists are
        growable vectors with no capacity/coverage tradeoff, while the TPU
        slab layout trades lcap (ADC bytes scanned per probe) against spill
        (rows relegated to far lists, where probing misses them). On skewed
        corpora the tight default packing costs real recall — repack walks
        that frontier cheaply.

        replicas > 1 additionally encodes every row in each of its top-R
        lists (replicated assignment, the ScaNN/SOAR idea): PQ codes are
        ~m bytes/row, so R=2 buys roughly double coverage per probe for a
        sliver of the corpus size. Search collapses duplicate ids (the
        Pallas merge by construction; the jnp path via ops.dedup_topk)."""
        n, d = rows_f32.shape
        nlist = idx.nlist
        dp = idx.centroids.shape[1]
        m = idx.m
        stage = _stage_logger(n)
        stage("pad corpus")
        data_p = np.zeros((n, dp), np.float32)
        data_p[:, :d] = rows_f32
        if idx.rotation is not None:
            stage("apply rotation")
            rot = idx.rotation
            if n >= _HOST_BUILD_ROWS:
                data_rot = _rotate_inplace_host(data_p, np.asarray(rot))
            else:
                data_rot = _host_chunked(lambda x: x @ rot, data_p)
                del data_p
        else:
            data_rot = data_p

        R = max(1, min(replicas, nlist))
        S = min(max(spill_candidates, R), nlist)
        stage("coarse assignment (top-S centroids, device-chunked)")
        alts = _host_chunked(
            lambda x: _topS_centroids(x, idx.centroids, S), data_rot)
        # virtual rows: copy r of row i prefers the (r+1)-th nearest list
        if R > 1:
            alts_v = np.concatenate(
                [np.concatenate([alts[:, r:],
                                 np.repeat(alts[:, -1:], r, axis=1)], axis=1)
                 for r in range(R)], axis=0)
        else:
            alts_v = alts
        n_v = n * R
        lcap = round_up(int(np.ceil(n_v / nlist * pad_factor)), 128)

        stage(f"pack lists (lcap={lcap}, replicas={R})")
        dummy = np.zeros((n_v, 1), np.float32)
        _, slot_vids, _, spilled = _pack_lists(
            dummy, None, alts_v[:, 0], None, alts_v, nlist, lcap, 1)

        # residual of each PLACED virtual row vs its packed list's centroid
        cents_np = np.asarray(idx.centroids)
        li, si = np.nonzero(slot_vids >= 0)
        vids = slot_vids[li, si]
        rids = vids % n
        order = np.argsort(vids)  # encode rows in virtual-id order
        ro, lo = rids[order], li[order]
        stage("residual gather/subtract")
        residuals = np.empty((ro.shape[0], data_rot.shape[1]), np.float32)
        for s in range(0, ro.shape[0], 1_000_000):
            e = s + 1_000_000
            residuals[s:e] = data_rot[ro[s:e]] - cents_np[lo[s:e]]

        stage("PQ encode")
        if residuals.shape[0] >= _HOST_BUILD_ROWS:
            codes_rows = _encode_host(residuals, np.asarray(idx.codebooks), m)
        else:
            codes_rows = _host_chunked(
                lambda x: _encode_chunked(x, idx.codebooks, m), residuals)
        stage("scatter codes into list slabs")
        codes = np.zeros((nlist, m, lcap), np.uint8)
        codes[li[order], :, si[order]] = codes_rows
        slot_ids = np.where(slot_vids >= 0, slot_vids % n, -1).astype(np.int32)
        stage("upload index arrays")

        return cls(rotation=idx.rotation, centroids=idx.centroids,
                   codebooks=idx.codebooks, codes=jnp.asarray(codes),
                   slot_ids=jnp.asarray(slot_ids),
                   n=n, d=d, m=m, n_spilled=spilled, replicas=R)

    # -- search ----------------------------------------------------------------

    def search_device(self, queries: jax.Array, k: int, nprobe: int,
                      refine_k: int = 0, refine_store=None,
                      backend: str = "auto",
                      for_refine: bool = False,
                      refine_metric: str = "l2",
                      ids_mode: Optional[str] = None,
                      ) -> Tuple[jax.Array, jax.Array]:
        """Device-resident path: padded on-device queries in, device arrays out
        (coarse -> ADC -> optional fused exact refine, one program chain).

        ``for_refine=True`` declares the results are CANDIDATES a separate
        exact-refine stage will re-score (ivf_eval's staged stage A): the
        gen-5 packed-key kernel (bf16-granular ranking) is then eligible
        even though refine_k == 0 here. ``refine_metric`` is the
        EXACT_METRIC=L2|DOT knob of the refine stage.

        ``ids_mode`` overrides the candidate-generator pick (None = auto:
        'key' for refine candidates when prefix-packed, else 'dma'). The
        key kernel ranks at bf16 granularity, which at 8M costs a measured
        ~.004 recall below the exact-f32 candidate ceiling at deep
        refine_k; ids_mode='dma' buys that back for ~15% more ANN time
        (BENCHMARKS.md round-4 8M ladder)."""
        if backend == "auto":
            from nvdb_tpu.kernels.dispatch import default_backend
            backend = default_backend()
        # The key/gather kernels derive ids as list*lcap+lane, which is only
        # correct on prefix-packed, replicas==1 indexes (pallas_adc_topk's
        # "callers must guard" contract) — a forced override on any other
        # index would silently return wrong ids.
        if ids_mode in ("key", "gather") and self.ids_mode() != "key":
            raise ValueError(
                f"ids_mode={ids_mode!r} requires a prefix-packed index with "
                f"replicas == 1 (this index: replicas={self.replicas}, "
                f"auto mode {self.ids_mode()!r}); use ids_mode='dma' or None")
        nprobe = min(nprobe, self.nlist)
        if refine_k > 0:
            # refining fewer than k candidates can't produce k results
            # (exact_rerank would top_k(k) over refine_k < k rows)
            refine_k = max(refine_k, k)
        kk = max(k, refine_k)
        q_rot = queries @ self.rotation if self.rotation is not None else queries
        v, i = _ivfpq_search_block(q_rot, self.centroids, self.codebooks,
                                   self.codes, self.slot_ids, kk, nprobe,
                                   self.m, backend=backend,
                                   dedup=self.replicas,
                                   fills=(self.fills()
                                          if backend == "pallas" else None),
                                   # the key kernel's packed merge ranks at
                                   # bf16 granularity — use it only as a
                                   # CANDIDATE GENERATOR (refine re-scores
                                   # in f32); ADC-only searches keep the
                                   # exact-f32-ranking DMA kernel
                                   ids_mode=(ids_mode or
                                             (self.ids_mode()
                                              if backend == "pallas"
                                              and (refine_k > 0 or for_refine)
                                              else "dma")))
        if refine_k > 0:
            if refine_store is None:
                raise ValueError("refine_k > 0 requires refine_store")
            # refine backend picked from the measured size crossover, not
            # blindly inheriting the ADC backend
            from nvdb_tpu.kernels.dispatch import refine_backend
            rb = (refine_backend(queries.shape[0], refine_k)
                  if backend == "pallas" else backend)
            # residual-i8 refine stores dequantize vs the index's ROTATED
            # centroids — score them with q_rot (dot is rotation-invariant)
            residual = getattr(refine_store, "is_residual", False)
            v, i = _refine_block(
                q_rot if residual else queries, i[:, :refine_k],
                refine_store.vectors, refine_store.scales, k, backend=rb,
                norms2=(refine_store.norms2()
                        if rb == "pallas" and refine_metric == "l2" else None),
                metric=refine_metric,
                res_cents=refine_store.res_cents if residual else None,
                res_ids=refine_store.res_ids if residual else None)
        return v[:, :k], i[:, :k]

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: int,
        refine_k: int = 0,             # REFINE_K analogue; 0 = ADC ranking only
        refine_store=None,             # VectorStore with original vectors
        q_chunk: int = 256,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host convenience path: numpy in/out, one device dispatch per
        ``q_chunk`` queries (padded up to the power-of-two bucket so the
        compile cache stays small). Each dispatch pays the ~1.3 ms relay
        overhead, so the default chunk is large (256, not 8): at Q=1000 the
        old q_chunk=8 default spent ~8x more dispatches than compute. The
        device/chained paths (search_device, ivf_eval --chained) remain the
        real serving story."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        qn = queries.shape[0]
        dp = self.centroids.shape[1]
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
                                      refine_k=refine_k,
                                      refine_store=refine_store)
            vals_out[s:e] = np.asarray(v)[:b, :k]
            ids_out[s:e] = np.asarray(i)[:b, :k]
        return vals_out, ids_out

    # -- persistence -----------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path,
            rotation=(np.asarray(self.rotation)
                      if self.rotation is not None else np.zeros(0, np.float32)),
            centroids=np.asarray(self.centroids),
            codebooks=np.asarray(self.codebooks),
            codes=np.asarray(self.codes),
            slot_ids=np.asarray(self.slot_ids),
            # 5th field = codes-layout version: 2 -> [nlist, M, Lcap];
            # 6th = replicas (absent on v1 files -> 1)
            meta=np.array([self.n, self.d, self.m, self.n_spilled, 2,
                           self.replicas], np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        rot = z["rotation"]
        meta = [int(x) for x in z["meta"]]
        n, d, m, spilled = meta[:4]
        codes = z["codes"]
        if len(meta) < 5 or meta[4] < 2:
            codes = np.ascontiguousarray(codes.transpose(0, 2, 1))  # v1 layout
        return cls(
            rotation=jnp.asarray(rot) if rot.size else None,
            centroids=jnp.asarray(z["centroids"]),
            codebooks=jnp.asarray(z["codebooks"]),
            codes=jnp.asarray(codes),
            slot_ids=jnp.asarray(z["slot_ids"]),
            n=n, d=d, m=m, n_spilled=spilled,
            replicas=meta[5] if len(meta) > 5 else 1)


def _stage_logger(n: int):
    """Stage-timestamp prints (stderr) for corpus-scale builds: a 10M-row
    build runs tens of minutes across host/device stages with no other
    output — opaque without this. Small builds (tests) stay silent."""
    if n < _HOST_BUILD_ROWS:
        return lambda msg: None
    t0 = time.perf_counter()

    def log(msg):
        print(f"[build +{time.perf_counter() - t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)
    return log


def _host_chunked(fn, rows_np: np.ndarray,
                  chunk: int = 1_000_000) -> np.ndarray:
    """Apply a device function over host rows in chunks and reassemble on
    the host — build-time scalability seam: an 8M x 768 f32 corpus is
    24.6 GB, larger than HBM, so whole-corpus uploads OOM. One chunk
    (<= ~3 GB) is resident at a time."""
    outs = []
    for s in range(0, rows_np.shape[0], chunk):
        outs.append(np.asarray(fn(jnp.asarray(rows_np[s:s + chunk]))))
    return np.concatenate(outs, axis=0)


# Above this row count, build stages whose OUTPUT is corpus-sized run on the
# host (BLAS matmul / argmin) instead of round-tripping the device: through
# the axon relay, device->host streams at single-digit MB/s with multi-minute
# stalls, so a 10M x 768 rotated copy (30 GB down) would dominate the whole
# build. The device keeps the stages where compute scales with N * nlist and
# the download is tiny (coarse assignment via _topS_centroids: [N, S] ids).
_HOST_BUILD_ROWS = 2_000_000


def _rotate_inplace_host(data_p: np.ndarray, rot_np: np.ndarray,
                         chunk: int = 1_000_000) -> np.ndarray:
    """data_p @ rot, chunked in place on the host (BLAS): ~12 TFLOP at
    10M x 768 — minutes of CPU vs hours of relay D2H for the same copy."""
    rot_np = np.asarray(rot_np, np.float32)
    for s in range(0, data_p.shape[0], chunk):
        data_p[s:s + chunk] = data_p[s:s + chunk] @ rot_np
    return data_p


def _encode_host(residuals: np.ndarray, cb_np: np.ndarray, m: int,
                 chunk: int = 262_144) -> np.ndarray:
    """Host PQ encode: per-subspace argmin over 256 centers, matching
    kernels/pq.encode (argmin L2, first-occurrence ties). The [N, M] uint8
    output stays on the host — no corpus-sized D2H."""
    cb_np = np.asarray(cb_np, np.float32)          # [M, 256, dsub]
    dsub = cb_np.shape[2]
    half_norms = 0.5 * np.sum(cb_np * cb_np, axis=2)   # [M, 256]
    out = np.empty((residuals.shape[0], m), np.uint8)
    for s in range(0, residuals.shape[0], chunk):
        x = residuals[s:s + chunk]
        for j in range(m):
            xj = x[:, j * dsub:(j + 1) * dsub]
            # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
            out[s:s + chunk, j] = np.argmax(
                xj @ cb_np[j].T - half_norms[j], axis=1).astype(np.uint8)
    return out


@functools.partial(jax.jit, static_argnames=("m",))
def _encode_chunked(residuals: jax.Array, codebooks: jax.Array, m: int) -> jax.Array:
    n = residuals.shape[0]
    c = min(65536, n)
    while n % c != 0:
        c //= 2
    chunks = residuals.reshape(n // c, c, -1)
    return jax.lax.map(lambda ch: pq.encode(ch, codebooks, m), chunks).reshape(n, m)
