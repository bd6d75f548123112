"""Product quantization: codebook training, OPQ rotation, encoding, ADC LUTs.

TPU-native replacement for FAISS's ``IndexIVFPQ`` + ``OPQMatrix`` training
(nvdb_ivfpq_build.cpp:78-96): all M subspace codebooks are trained as ONE
vmapped k-means (M parallel Lloyd runs on the MXU), the OPQ rotation is the
orthogonal-Procrustes SVD update, and ADC lookup tables are batched matmuls.

Conventions:
- dsub = Dp / M; codebooks ``[M, 256, dsub]`` f32; codes ``[N, M]`` uint8.
- Encoding operates on rotated residuals ``(x - coarse_centroid) @ R``.
- L2 metric throughout (the gt metric is dot==L2 on normalized vectors,
  gtbin_format.h:11-15).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvdb_tpu.kernels import kmeans

NBITS = 8
KSUB = 1 << NBITS  # 256 codewords per subspace


def split_subspaces(x: jax.Array, m: int) -> jax.Array:
    """[N, D] -> [M, N, dsub]."""
    n, d = x.shape
    return jnp.moveaxis(x.reshape(n, m, d // m), 1, 0)


@functools.partial(jax.jit, static_argnames=("m", "n_iters"))
def train_codebooks(key: jax.Array, train: jax.Array, m: int,
                    n_iters: int = 8) -> jax.Array:
    """Train M subspace codebooks jointly: vmapped Lloyd over subspaces.
    train: [T, D] (already rotated residuals). Returns [M, 256, dsub]."""
    subs = split_subspaces(train, m)                    # [M, T, dsub]
    keys = jax.random.split(key, m)
    fit = jax.vmap(lambda k, d: kmeans.kmeans_fit(k, d, KSUB, n_iters=n_iters)[0])
    return fit(keys, subs)


@functools.partial(jax.jit, static_argnames=("m",))
def encode(x: jax.Array, codebooks: jax.Array, m: int) -> jax.Array:
    """[N, D] rotated residuals -> [N, M] uint8 codes (chunked argmin)."""
    subs = split_subspaces(x, m)                        # [M, N, dsub]
    a = jax.vmap(kmeans.assign, in_axes=(0, 0))(subs, codebooks)  # [M, N]
    return jnp.moveaxis(a, 0, 1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("m",))
def decode(codes: jax.Array, codebooks: jax.Array, m: int) -> jax.Array:
    """[N, M] codes -> [N, D] reconstruction."""
    # take per subspace then stack lanes
    recon = jax.vmap(lambda cb, c: jnp.take(cb, c, axis=0),
                     in_axes=(0, 1))(codebooks, codes.astype(jnp.int32))
    return jnp.moveaxis(recon, 0, 1).reshape(codes.shape[0], -1)


def train_opq(
    key: jax.Array,
    train: np.ndarray,        # [T, D] residuals, f32
    m: int,
    n_opq_iters: int = 5,     # OPQ_NITER analogue
    n_kmeans_iters: int = 6,
) -> Tuple[np.ndarray, jax.Array]:
    """Alternating OPQ (Ge et al.): fix R -> train PQ on X R; fix codebooks ->
    R = U V^T from SVD(X^T X_hat) (orthogonal Procrustes). Returns (R [D, D],
    codebooks [M, 256, dsub])."""
    x = jnp.asarray(train, dtype=jnp.float32)
    d = x.shape[1]
    r = jnp.eye(d, dtype=jnp.float32)
    cb = None
    for it in range(n_opq_iters):
        key, kt = jax.random.split(key)
        xr = x @ r
        cb = train_codebooks(kt, xr, m, n_iters=n_kmeans_iters)
        xhat = decode(encode(xr, cb, m), cb, m)         # [T, D]
        u, _, vt = jnp.linalg.svd(x.T @ xhat, full_matrices=False)
        r = u @ vt
    return np.asarray(r), cb


@functools.partial(jax.jit, static_argnames=("m",))
def adc_lut(residuals: jax.Array, codebooks: jax.Array, m: int) -> jax.Array:
    """ADC lookup tables for L2: residuals [B, D] (already rotated) ->
    lut [B, M, 256] where lut[b, mi, j] = ||res_m - cb[mi, j]||^2."""
    subs = split_subspaces(residuals, m)                 # [M, B, dsub]
    # HIGHEST: the LUT defines the ADC ranking; keep it consistent with the
    # f32 encode-side distances (default precision loses ~1e-1)
    dots = jnp.einsum("mbd,mjd->bmj", subs, codebooks,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(codebooks * codebooks, axis=2)          # [M, 256]
    r2 = jnp.sum(subs * subs, axis=2)                    # [M, B]
    return r2.T[:, :, None] - 2.0 * dots + c2[None, :, :]


def adc_scores(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """lut [..., M, 256], codes [..., L, M] uint8 -> negated-L2 scores [..., L]
    (larger is better, matching the dot-score convention everywhere else)."""
    idx = jnp.swapaxes(codes.astype(jnp.int32), -1, -2)  # [..., M, L]
    gathered = jnp.take_along_axis(lut, idx, axis=-1)    # [..., M, L]
    return -jnp.sum(gathered, axis=-2)
