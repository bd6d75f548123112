"""HBM-resident embedding store.

The TPU analogue of the reference's zero-copy mmap ``VectorDataset``
(vector_dataset.cpp:24-94) *plus* its CUDA-side process-global device cache of the
base matrix (cuda_refine.cu:25-38, 179-204): rows live in device HBM as a single
padded dense array, dtype-aware (f32 / bf16 / int8 + per-row f32 scales), optionally
sharded over a device mesh axis with ``NamedSharding``.

Padding policy: rows are padded up to a multiple of ``row_block`` (and of the shard
count) and dims up to a multiple of 128 (TPU lane width). Padding rows are zero and
masked out of every scan by ``n`` (the valid-row count); padding dims are zero in
both store and queries so dot products are unaffected.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nvdb_tpu.formats import vecbin
from nvdb_tpu.utils import round_up

# dtype-code -> jnp dtype of the device payload
_JNP_BY_CODE = {
    vecbin.DTYPE_F32: jnp.float32,
    vecbin.DTYPE_BF16: jnp.bfloat16,
    vecbin.DTYPE_F16: jnp.bfloat16,  # f16 files are re-encoded to the TPU-native bf16
    vecbin.DTYPE_I8: jnp.int8,
}

DEFAULT_ROW_BLOCK = 4096  # divisible tile sizes up to the VMEM-model max


@jax.jit
def _residual_norms2(vectors, scales, res_cents, res_ids):
    """[Np] f32 squared norms of DEQUANTIZED residual-store rows
    (cent + s*codes), chunked so the f32 dequant slab stays bounded."""
    n = vectors.shape[0]
    c = 65536
    while n % c != 0:
        c //= 2

    def f(args):
        v, s, i = args
        row = jnp.take(res_cents, i, axis=0) + v.astype(jnp.float32) * s[:, None]
        return jnp.sum(row * row, axis=1)

    d = vectors.shape[1]
    return jax.lax.map(f, (vectors.reshape(n // c, c, d),
                           scales.reshape(n // c, c),
                           res_ids.reshape(n // c, c))).reshape(n)


@dataclasses.dataclass
class VectorStore:
    """Device-resident base matrix.

    vectors: [Np, Dp] (padded), dtype f32 | bf16 | int8
    scales:  [Np] f32 per-row scales (int8 only; padding rows get scale 1.0)
    n, d:    valid row / dim counts
    dtype_code: vecbin DTYPE_* describing the *store* encoding
    src_dtype_code: dtype of the file it came from (for bytes-per-query parity)
    """

    vectors: jax.Array
    scales: Optional[jax.Array]
    n: int
    d: int
    dtype_code: int
    src_dtype_code: int
    # lazily cached [Np] f32 squared row norms (raw payload; int8 scale is
    # applied at score time) — the rerank kernel's precomputed-norm input
    _norms2: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False, compare=False)
    # RESIDUAL-i8 refine store (r4): ``vectors`` hold int8 residuals vs a
    # coarse centroid — dequant row i = res_cents[res_ids[i]] + scales[i] *
    # vectors[i]. Halving the quantization step this way moves the 8M
    # refine ceiling .9760 -> .9900 at the SAME byte budget (measured,
    # BENCHMARKS r4): residual amax is ~1.8x smaller than row amax on the
    # hard corpus. Centroids live in the source quantizer's ROTATED space,
    # so queries scoring a residual store must be rotated the same way
    # (callers pass q_rot; orthogonal rotation preserves the dot).
    res_cents: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False, compare=False)   # [nlist, Dp] f32
    res_ids: Optional[jax.Array] = dataclasses.field(
        default=None, repr=False, compare=False)   # [Np] int32

    @property
    def is_residual(self) -> bool:
        return self.res_cents is not None

    def norms2(self) -> jax.Array:
        if self._norms2 is None:
            from nvdb_tpu.kernels.rerank import store_norms2
            if self.is_residual:
                # DEQUANTIZED row norms (cent + s*codes): the l2-metric
                # rerank needs the true ||row||^2, not the code norms
                self._norms2 = _residual_norms2(
                    self.vectors, self.scales, self.res_cents, self.res_ids)
            else:
                self._norms2 = jax.jit(store_norms2)(self.vectors)
        return self._norms2

    def attach_residual(self, cents: np.ndarray, list_of: np.ndarray
                        ) -> "VectorStore":
        """Mark an int8 store as RESIDUAL codes vs ``cents`` (host arrays:
        the coarse centroids [nlist, >=d] and per-row list ids [n]); padding
        rows map to centroid 0 with scale 1 (never gathered — candidate ids
        are always valid rows)."""
        assert self.dtype_code == vecbin.DTYPE_I8, "residual stores are i8"
        dp = self.d_padded
        c = np.zeros((cents.shape[0], dp), np.float32)
        c[:, : min(cents.shape[1], dp)] = cents[:, :dp]
        ids = np.zeros((self.n_padded,), np.int32)
        ids[: self.n] = list_of[: self.n]
        # res_ids follow the payload's row sharding (the sharded refine's
        # in_spec is P(ROWS)); centroids replicate like queries
        id_sharding = _row_sharding_1d(self.vectors.sharding)
        self.res_cents = jax.device_put(jnp.asarray(c))
        self.res_ids = jax.device_put(jnp.asarray(ids), id_sharding)
        self._norms2 = None
        return self

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_numpy(
        cls,
        x: np.ndarray,
        dtype: str = "f32",
        scales: Optional[np.ndarray] = None,
        row_block: int = DEFAULT_ROW_BLOCK,
        sharding: Optional[jax.sharding.Sharding] = None,
        n_shards: int = 1,
        src_dtype_code: Optional[int] = None,
    ) -> "VectorStore":
        """Build a store from host rows.

        ``x`` is either raw f32 rows (converted per ``dtype``) or rows already in
        the target encoding (then ``scales`` must accompany i8).
        """
        code = vecbin.dtype_code(dtype)
        n, d = x.shape
        if code == vecbin.DTYPE_I8 and x.dtype != np.int8:
            x, scales = vecbin.quantize_i8(x)
        jdt = _JNP_BY_CODE[code]

        np_pad = round_up(max(n, 1), row_block * max(n_shards, 1))
        dp = round_up(d, 128)
        host = np.zeros((np_pad, dp), dtype=np.float32 if code != vecbin.DTYPE_I8 else np.int8)
        host[:n, :d] = np.asarray(x, dtype=host.dtype) if code != vecbin.DTYPE_I8 else x
        if code in (vecbin.DTYPE_BF16, vecbin.DTYPE_F16):
            host = host.astype(np.dtype(jnp.bfloat16.dtype))
        vecs = jax.device_put(jnp.asarray(host, dtype=jdt), sharding)

        sc = None
        if code == vecbin.DTYPE_I8:
            s_host = np.ones((np_pad,), dtype=np.float32)
            assert scales is not None
            s_host[:n] = scales
            s_sharding = None
            if sharding is not None:
                s_sharding = _row_sharding_1d(sharding)
            sc = jax.device_put(jnp.asarray(s_host), s_sharding)

        # store_code after any re-encoding (f16 -> bf16)
        store_code = vecbin.DTYPE_BF16 if code == vecbin.DTYPE_F16 else code
        return cls(vecs, sc, n, d, store_code,
                   src_dtype_code if src_dtype_code is not None else code)

    @classmethod
    def from_vecbin(
        cls,
        path: str,
        row_block: int = DEFAULT_ROW_BLOCK,
        sharding: Optional[jax.sharding.Sharding] = None,
        n_shards: int = 1,
    ) -> "VectorStore":
        """Streamed load: each device shard is materialized straight from the
        mmap'd file via ``jax.make_array_from_callback`` — peak host memory is
        one shard block, not a full padded copy (the zero-copy spirit of the
        reference's mmap loader, mmap_file.cpp:39-56, carried to device upload).
        """
        f = vecbin.VecbinFile(path)
        code = f.dtype
        store_code = vecbin.DTYPE_BF16 if code == vecbin.DTYPE_F16 else code
        jdt = _JNP_BY_CODE[code]
        n, d = f.count, f.dim
        np_pad = round_up(max(n, 1), row_block * max(n_shards, 1))
        dp = round_up(d, 128)

        host_dt = (np.int8 if store_code == vecbin.DTYPE_I8
                   else np.dtype(jnp.bfloat16.dtype)
                   if store_code == vecbin.DTYPE_BF16 else np.float32)

        def block_cb(index):
            rs, cs = index[0], index[1]
            r0 = rs.start or 0
            r1 = rs.stop if rs.stop is not None else np_pad
            block = np.zeros((r1 - r0, dp), dtype=host_dt)
            v0, v1 = min(r0, n), min(r1, n)
            if v1 > v0:
                rows = np.asarray(f.vectors[v0:v1])
                if store_code == vecbin.DTYPE_BF16:
                    rows = rows.astype(np.dtype(jnp.bfloat16.dtype))
                block[: v1 - v0, :d] = rows
            c0 = cs.start or 0
            c1 = cs.stop if cs.stop is not None else dp
            return block[:, c0:c1]

        shard = sharding if sharding is not None else (
            jax.sharding.SingleDeviceSharding(jax.devices()[0]))
        vecs = jax.make_array_from_callback((np_pad, dp), shard, block_cb)
        vecs = jnp.asarray(vecs, dtype=jdt) if vecs.dtype != jdt else vecs

        sc = None
        if store_code == vecbin.DTYPE_I8:
            s_host = np.ones((np_pad,), dtype=np.float32)
            s_host[:n] = np.asarray(f.scales)
            s_sharding = _row_sharding_1d(sharding) if sharding is not None else None
            sc = jax.device_put(jnp.asarray(s_host), s_sharding)
        return cls(vecs, sc, n, d, store_code, code)

    # -- properties -----------------------------------------------------------

    @property
    def n_padded(self) -> int:
        return self.vectors.shape[0]

    @property
    def d_padded(self) -> int:
        return self.vectors.shape[1]

    @property
    def payload_bytes(self) -> int:
        """Reference ``bytes_per_query`` semantics: valid payload + aux bytes of
        the store encoding (nvdb_bench.cpp:414-421)."""
        return vecbin.payload_and_aux_bytes(self.n, self.d, self.dtype_code)

    @property
    def hbm_bytes(self) -> int:
        """Actual HBM bytes streamed per full scan (padded shapes)."""
        b = self.n_padded * self.d_padded * self.vectors.dtype.itemsize
        if self.scales is not None:
            b += self.n_padded * 4
        return b

    def pad_queries(self, q: np.ndarray) -> np.ndarray:
        """Zero-pad query dims to the store's padded dim."""
        q = np.asarray(q, dtype=np.float32)
        if q.shape[1] == self.d_padded:
            return q
        out = np.zeros((q.shape[0], self.d_padded), dtype=np.float32)
        out[:, : q.shape[1]] = q[:, : self.d]
        return out


def _row_sharding_1d(sharding: jax.sharding.Sharding) -> Optional[jax.sharding.Sharding]:
    """Derive the 1-D per-row sharding (for scales) from a 2-D row sharding."""
    if isinstance(sharding, jax.sharding.NamedSharding):
        row_axis = sharding.spec[0] if len(sharding.spec) else None
        return jax.sharding.NamedSharding(
            sharding.mesh, jax.sharding.PartitionSpec(row_axis))
    return None
