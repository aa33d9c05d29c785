import jax
import jax.numpy as jnp
import numpy as np

from nerf_pytorch_paeng_tpu.ops.sampling import sample_pdf, stratified_z_vals


def test_stratified_within_bins():
    key = jax.random.PRNGKey(0)
    n_rays, S, near, far = 32, 16, 2.0, 6.0
    z = np.asarray(stratified_z_vals(key, n_rays, near, far, S))
    assert z.shape == (n_rays, S)
    # each jittered sample stays inside its own bin (lower/upper bounds)
    t = np.linspace(0, 1, S, dtype=np.float32)
    base = near * (1 - t) + far * t
    mids = 0.5 * (base[1:] + base[:-1])
    upper = np.concatenate([mids, base[-1:]])
    lower = np.concatenate([base[:1], mids])
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    # strictly increasing along a ray
    assert (np.diff(z, axis=-1) > 0).all()


def test_stratified_deterministic():
    key = jax.random.PRNGKey(0)
    z = np.asarray(stratified_z_vals(key, 4, 0.0, 1.0, 8, perturb=False))
    want = np.broadcast_to(np.linspace(0, 1, 8, dtype=np.float32), (4, 8))
    np.testing.assert_allclose(z, want, atol=1e-7)


def np_sample_pdf_det(bins, weights, n):
    """Independent numpy oracle for deterministic inverse-CDF sampling."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, n, dtype=np.float32),
                        (*cdf.shape[:-1], n))
    out = np.empty_like(u)
    for b in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[b], u[b], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_b, cdf_a = cdf[b][below], cdf[b][above]
        bins_b, bins_a = bins[b][below], bins[b][above]
        denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u[b] - cdf_b) / denom
        out[b] = bins_b + t * (bins_a - bins_b)
    return out


def test_sample_pdf_matches_oracle_det():
    rng = np.random.default_rng(0)
    B, nb, n = 5, 9, 13
    bins = np.sort(rng.uniform(0, 6, size=(B, nb)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(B, nb - 1)).astype(np.float32)
    got = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                jnp.asarray(weights), n, det=True))
    want = np_sample_pdf_det(bins, weights, n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    # all mass in one bin -> all samples land inside that bin
    bins = jnp.asarray(np.linspace(0, 8, 9, dtype=np.float32)[None].repeat(3, 0))
    weights = np.zeros((3, 8), np.float32)
    weights[:, 4] = 1.0
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins,
                              jnp.asarray(weights), 64, det=False))
    # bin 4 spans [4, 5]; the +1e-5 regulariser leaks a tiny bit of mass
    frac_inside = ((s >= 4.0) & (s <= 5.0)).mean()
    assert frac_inside > 0.98


def test_sample_pdf_range():
    rng = np.random.default_rng(2)
    bins = np.sort(rng.uniform(2, 6, size=(4, 63)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(4, 62)).astype(np.float32)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(2), jnp.asarray(bins),
                              jnp.asarray(weights), 128, det=False))
    assert s.shape == (4, 128)
    assert (s >= bins.min() - 1e-5).all() and (s <= bins.max() + 1e-5).all()
