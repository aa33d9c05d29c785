import jax
import numpy as np

from nerf_pytorch_paeng_tpu.train.batching import RayPool, build_ray_pool
from nerf_pytorch_paeng_tpu.utils.synth import make_synth_scene


def test_pool_contents_and_shuffle():
    imgs, K, poses = make_synth_scene(n_views=3, H=4, W=5)
    i_train = np.array([0, 2])
    pool = build_ray_pool(imgs, K, poses, i_train, jax.random.PRNGKey(0))
    assert pool.shape == (2 * 4 * 5, 3, 3)
    # the rgb slots must be a permutation of the train images' pixels
    got = np.sort(np.asarray(pool[:, 2, :]).reshape(-1))
    want = np.sort(imgs[i_train].reshape(-1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ray_pool_cursor_and_epoch():
    imgs, K, poses = make_synth_scene(n_views=2, H=4, W=4)
    pool = build_ray_pool(imgs, K, poses, np.array([0, 1]),
                          jax.random.PRNGKey(0))
    rp = RayPool(pool, jax.random.PRNGKey(1))
    n_total = pool.shape[0]           # 32
    seen = []
    for _ in range(n_total // 8):     # one epoch of batches of 8
        o, d, rgb = rp.next_batch(8)
        assert o.shape == (8, 3) and rgb.shape == (8, 3)
        seen.append(np.asarray(rgb))
    assert rp.epoch == 0
    # next batch triggers reshuffle -> epoch increments
    rp.next_batch(8)
    assert rp.epoch == 1
    # the first epoch visited every pixel exactly once
    got = np.sort(np.concatenate(seen).reshape(-1))
    want = np.sort(np.asarray(pool[:, 2, :]).reshape(-1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ray_pool_fast_forward_matches_sequential():
    """fast_forward(steps, n) must reproduce the exact (pool order,
    cursor, epoch, key) a fresh pool reaches after `steps` sequential
    next_start(n) calls — including exact-multiple step counts, where the
    pending reshuffle has NOT yet happened (it fires on the next call)."""
    imgs, K, poses = make_synth_scene(n_views=2, H=4, W=4)   # pool M=32
    for steps, n in ((0, 8), (3, 8), (4, 8), (5, 8), (11, 8),
                     (7, 5), (10, 5)):
        pool = build_ray_pool(imgs, K, poses, np.array([0, 1]),
                              jax.random.PRNGKey(0))
        a = RayPool(pool, jax.random.PRNGKey(1))
        starts = [a.next_start(n) for _ in range(steps)]
        b = RayPool(pool, jax.random.PRNGKey(1))
        b.fast_forward(steps, n)
        assert (a.i_batch, a.epoch) == (b.i_batch, b.epoch), (steps, n)
        np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))
        np.testing.assert_array_equal(np.asarray(a.pool), np.asarray(b.pool))
        # and the NEXT batch matches too (covers the pending-reshuffle
        # edge at exact epoch multiples)
        assert a.next_start(n) == b.next_start(n), (steps, n)
        np.testing.assert_array_equal(np.asarray(a.pool), np.asarray(b.pool))
