"""Partition-then-rerank index — the TPU-native replacement for hnswlib's HNSW
graph (nvdb_hnsw_build.cpp / nvdb_hnsw_search.cpp / nvdb_hnsw_eval.cpp).

Graph traversal is hostile to TPUs (pointer chasing, dynamic shapes); the
TPU-shaped equivalent at the same recall/memory point is a balanced partition
index probed with batched matmuls:

- partitions = k-means over the corpus (nlist ~ sqrt-ish of N), packed with the
  same fixed-capacity layout as IVF-Flat;
- a query probes the ``nprobe`` nearest partitions (the efSearch-analogue
  accuracy knob, env HNSW_EF_SEARCH) with exact bf16 scoring on the MXU;
- an optional exact f32 rerank of the top candidates removes bf16 near-tie
  noise.

Memory: packed bf16 payload ~= 2 * pad_factor * N * D bytes — well under
hnswlib's f32-vectors + graph (e.g. 789-834 MB for 500K x 384,
Performance.md:484-492).

``tune_nprobe`` picks the smallest nprobe hitting a target recall on a
validation split — the analogue of sweeping efSearch (Performance.md:450-470).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from nvdb_tpu.index.ivf_flat import IVFFlatIndex
from nvdb_tpu.store import VectorStore
from nvdb_tpu.eval.recall import recall_at_k


@dataclasses.dataclass
class PartitionRerankIndex:
    ivf: IVFFlatIndex
    refine_store: Optional[VectorStore]   # f32/bf16 exact store for rerank

    @property
    def n(self) -> int:
        return self.ivf.n

    @property
    def index_bytes(self) -> int:
        """Self-contained search structure size (packed bf16 payload + ids +
        centroids). The optional f32 refine store is NOT counted, following the
        reference's accounting: its PQ+refine pipeline reports 41-42 MB index
        size while reranking from the separately-mmap'd base
        (Performance.md:619-625, nvdb_ivf_eval.cpp:278-307)."""
        return self.ivf.index_bytes

    @classmethod
    def build(
        cls,
        rows_f32: np.ndarray,
        nlist: Optional[int] = None,
        dtype: str = "bf16",
        with_refine: bool = True,
        train_size: int = 100_000,
        n_iters: int = 10,
        # roomier packing than the raw IVF default: on Zipf-skewed corpora
        # tight lists relegate overflow rows to far partitions, capping the
        # recall ceiling below the exact-probing curve (BENCHMARKS §4/§7);
        # bf16 payload makes the extra capacity cheap
        pad_factor: float = 2.0,
        spill_candidates: int = 8,
        seed: int = 0,
        refine_dtype: str = "f32",     # "f32" | "res_i8"
    ) -> "PartitionRerankIndex":
        n = rows_f32.shape[0]
        if nlist is None:
            # sqrt-scaled partition count, clamped to sane bounds
            nlist = int(np.clip(2 ** int(np.round(np.log2(np.sqrt(n) * 2))),
                                16, 8192))
        ivf = IVFFlatIndex.build(rows_f32, nlist=nlist, dtype=dtype,
                                 train_size=train_size, n_iters=n_iters,
                                 pad_factor=pad_factor,
                                 spill_candidates=spill_candidates,
                                 seed=seed)
        store = None
        if with_refine and refine_dtype == "res_i8":
            store = cls._residual_store(rows_f32, ivf)
        elif with_refine:
            store = VectorStore.from_numpy(rows_f32, "f32")
        return cls(ivf=ivf, refine_store=store)

    @staticmethod
    def _residual_store(rows_f32: np.ndarray, ivf: IVFFlatIndex
                        ) -> VectorStore:
        """Residual-i8 refine store vs the index's OWN partition centroids
        (the round-4 residual trick, `quantize_i8 --residual`): the partition
        assignment already names each row's nearest centroid, and residual
        amax is ~1.8x smaller than row amax on clustered corpora, so the
        same 1 byte/dim ranks ~2x finer than plain-i8 — and 4x smaller
        than the f32 store this index shipped with through round 4."""
        from nvdb_tpu.formats import vecbin as _vb

        n = rows_f32.shape[0]
        sids = np.asarray(ivf.slot_ids)
        li, si = np.nonzero(sids >= 0)
        list_of = np.zeros(n, np.int32)
        list_of[sids[li, si]] = li.astype(np.int32)
        cents = np.asarray(ivf.centroids, np.float32)    # [nlist, Dp]
        dp = cents.shape[1]
        if rows_f32.shape[1] != dp:
            rows_f32 = np.pad(rows_f32,
                              ((0, 0), (0, dp - rows_f32.shape[1])))
        codes, sc = _vb.quantize_i8(rows_f32 - cents[list_of])
        store = VectorStore.from_numpy(codes, "i8", scales=sc)
        return store.attach_residual(cents, list_of)

    def search(self, queries: np.ndarray, k: int, nprobe: int,
               rerank_k: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """rerank_k > 0: take top-rerank_k bf16 candidates, exact-rerank in f32
        (dot metric, matching the GT convention)."""
        if rerank_k <= k:
            return self.ivf.search(queries, k, nprobe)
        vals, ids = self.ivf.search(queries, rerank_k, nprobe)
        import jax.numpy as jnp

        store = self.refine_store
        if store is None:
            return vals[:, :k], ids[:, :k]
        from nvdb_tpu.kernels import dispatch

        q = jnp.asarray(store.pad_queries(np.atleast_2d(queries)))
        cid = jnp.asarray(ids, dtype=jnp.int32)
        rv, ri = dispatch.exact_refine(
            q, cid, store.vectors, store.scales, k, metric="dot",
            res_cents=store.res_cents, res_ids=store.res_ids)
        return np.asarray(rv), np.asarray(ri)

    def search_device(self, queries, k: int, nprobe: int,
                      rerank_k: int = 0, backend: str = "auto"):
        """Device-resident serving path: padded [B, Dp] on-device queries in,
        device arrays out — probe + optional exact rerank fused in one
        program chain, no host sync (the loop shape the reference's HNSW
        eval times per query, nvdb_hnsw_eval.cpp:165-199; here batches
        chain on-device like ivf_eval --chained)."""
        if rerank_k <= k or self.refine_store is None:
            return self.ivf.search_device(queries, k, nprobe,
                                          backend=backend)
        import jax.numpy as jnp

        from nvdb_tpu.kernels import dispatch

        _, cid = self.ivf.search_device(queries, rerank_k, nprobe,
                                        backend=backend)
        store = self.refine_store
        return dispatch.exact_refine(queries, cid.astype(jnp.int32),
                                     store.vectors, store.scales, k,
                                     metric="dot",
                                     res_cents=store.res_cents,
                                     res_ids=store.res_ids)

    def save(self, path: str) -> None:
        """Persist the self-contained search structure (the saveIndex parity,
        nvdb_hnsw_build.cpp:51). The refine store is rebuilt from the base
        vecbin at load time (shared deployment state, not serialized)."""
        self.ivf.save(path)

    @classmethod
    def load(cls, path: str, refine_rows: Optional[np.ndarray] = None
             ) -> "PartitionRerankIndex":
        ivf = IVFFlatIndex.load(path)
        store = (VectorStore.from_numpy(refine_rows, "f32")
                 if refine_rows is not None else None)
        return cls(ivf=ivf, refine_store=store)

    def tune_nprobe(self, queries_val: np.ndarray, gt_val: np.ndarray, k: int,
                    target_recall: float = 0.98,
                    candidates=(1, 2, 4, 8, 16, 32, 64, 128, 256)) -> int:
        """Smallest nprobe whose recall on the validation set reaches the
        target (efSearch-knee analogue, Performance.md:450-470)."""
        for np_ in candidates:
            if np_ > self.ivf.nlist:
                break
            _, ids = self.search(queries_val, k, np_)
            if recall_at_k(ids, gt_val, k=k) >= target_recall:
                return np_
        return min(self.ivf.nlist, candidates[-1])
