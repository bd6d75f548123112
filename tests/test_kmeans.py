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


def test_corpus_refine_reclaims_dead_centroids():
    """A quantizer trained on a starved subsample leaves corpus-dead lists;
    corpus_refine must reclaim them (fewer dead, lower objective) without
    touching healthy structure. VERDICT r3 #3."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nvdb_tpu.formats import synth
    from nvdb_tpu.kernels import kmeans

    base = synth.clustered(8000, 64, n_clusters=64, seed=13)
    k = 64
    cents_fit, _ = kmeans.kmeans_fit(jax.random.PRNGKey(0),
                                     jnp.asarray(base[:2000]), k, n_iters=6)
    # plant the 8M failure mode directly: 12 centroids stranded outside the
    # data ball (at 8M these were stale unit-norm init rows the subsample
    # never updated, vs norm<1 live means — BENCHMARKS §4d: 11% dead)
    rng = np.random.default_rng(5)
    stranded = rng.standard_normal((12, 64)).astype(np.float32)
    stranded *= 3.0 / np.linalg.norm(stranded, axis=1, keepdims=True)
    cents0 = jnp.asarray(np.concatenate(
        [np.asarray(cents_fit)[:-12], stranded]))

    def stats(cents):
        a = np.asarray(kmeans.assign(jnp.asarray(base), cents))
        counts = np.bincount(a, minlength=k)
        picked = np.asarray(cents)[a]
        obj = float(np.mean(np.sum((base - picked) ** 2, axis=1)))
        return int((counts == 0).sum()), obj

    dead0, obj0 = stats(cents0)
    assert dead0 >= 10  # the scenario is real: stranded centroids are dead

    cents1 = kmeans.corpus_refine(base, cents0, n_iters=2, chunk=4096,
                                  pool_rows=4096)
    dead1, obj1 = stats(cents1)
    assert dead1 < dead0
    assert dead1 <= max(1, k // 50)      # <=2% dead after refinement
    assert obj1 < obj0                   # exact Lloyd passes improve the fit


def test_corpus_refine_noop_on_healthy_quantizer():
    """On a well-trained quantizer with zero dead lists, refinement is a
    pure Lloyd polish: dead stays 0 and the objective cannot get worse."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nvdb_tpu.formats import synth
    from nvdb_tpu.kernels import kmeans

    base = synth.clustered(6000, 64, n_clusters=16, seed=14)
    k = 16
    cents0, _ = kmeans.kmeans_fit(jax.random.PRNGKey(1),
                                  jnp.asarray(base), k, n_iters=10)

    def stats(cents):
        a = np.asarray(kmeans.assign(jnp.asarray(base), cents))
        counts = np.bincount(a, minlength=k)
        picked = np.asarray(cents)[a]
        return int((counts == 0).sum()), float(
            np.mean(np.sum((base - picked) ** 2, axis=1)))

    dead0, obj0 = stats(cents0)
    cents1 = kmeans.corpus_refine(base, cents0, n_iters=1, chunk=2048)
    dead1, obj1 = stats(cents1)
    assert dead1 == dead0 == 0
    assert obj1 <= obj0 + 1e-6
