import numpy as np
import jax
import jax.numpy as jnp

from nvdb_tpu.formats import synth
from nvdb_tpu.kernels.kmeans import assign, kmeans_fit


def test_kmeans_recovers_clusters():
    """Well-separated clusters must be recovered (objective ~ spread^2)."""
    base = synth.clustered(4096, 32, n_clusters=8, spread=0.05, seed=41)
    cents, objs = kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(base), 8, n_iters=15)
    objs = np.asarray(objs)
    assert objs[-1] <= objs[0] + 1e-6          # monotone-ish improvement
    # within-cluster variance floor is ~spread^2 * D = 0.08; recovered solution
    # sits at it, merged-cluster solutions sit ~3x higher
    assert objs[-1] < 0.09
    a = np.asarray(assign(jnp.asarray(base), cents))
    # every cluster non-trivially populated and balanced-ish
    counts = np.bincount(a, minlength=8)
    assert counts.min() > 200


def test_kmeans_objective_beats_random_centroids():
    base = synth.clustered(2048, 16, n_clusters=16, spread=0.3, seed=43)
    data = jnp.asarray(base)
    cents, objs = kmeans_fit(jax.random.PRNGKey(1), data, 16, n_iters=10)
    rand_cents = data[:16]
    a_fit = np.asarray(assign(data, cents))
    d_fit = np.mean(np.sum((base - np.asarray(cents)[a_fit]) ** 2, axis=1))
    a_rnd = np.asarray(assign(data, rand_cents))
    d_rnd = np.mean(np.sum((base - np.asarray(rand_cents)[a_rnd]) ** 2, axis=1))
    assert d_fit < d_rnd


def test_assign_matches_numpy():
    base = synth.normalized_gaussian(512, 24, seed=44)
    cents = base[:10]
    a = np.asarray(assign(jnp.asarray(base), jnp.asarray(cents)))
    d = ((base[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(a, np.argmin(d, axis=1))
