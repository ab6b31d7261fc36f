"""Stochastic perturbed-obs EnKF (Burgers et al. 1998) — an extension
beyond the reference's deterministic EnSRF (efa_xray/assimilation/ensrf.py).

Key properties tested:
* with zero perturbations the analysis MEAN equals the serial EnSRF mean
  exactly (same gain, same serial order);
* averaged over perturbation draws, the posterior variance matches the
  EnSRF posterior variance (the textbook stochastic/deterministic
  equivalence in expectation);
* API parity: diagnostics, QC masking, localization options.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.assimilation.enkf import (
    EnKF,
    draw_ob_perturbations,
    enkf_blocked,
    enkf_serial,
)
from efa_xray_tpu.config import FilterConfig


def _toy(nstate=60, nmems=16, nobs=7, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-60, 60, nstate)
    lon = rng.uniform(0, 360, nstate)
    prior = rng.normal(280, 3, (nstate, nmems))
    rows = rng.integers(0, nstate, nobs)
    ye = prior[rows]
    obs = core.ObsArrays(
        values=jnp.asarray(ye.mean(1) + rng.normal(0, 1, nobs), dtype),
        errors=jnp.ones(nobs, dtype),
        lats=jnp.asarray(lat[rows], dtype),
        lons=jnp.asarray(lon[rows], dtype),
        radii=jnp.full(nobs, 3000.0, dtype),
        assim=jnp.asarray(rng.random(nobs) > 0.15),
    )
    bm = jnp.asarray(prior.mean(1), dtype)
    bp = jnp.asarray(prior - prior.mean(1, keepdims=True), dtype)
    tm = jnp.asarray(ye.mean(1), dtype)
    tp = jnp.asarray(ye - ye.mean(1, keepdims=True), dtype)
    return bm, bp, tm, tp, jnp.asarray(lat, dtype), jnp.asarray(lon, dtype), obs


def test_perturbations_centered_and_variance_exact():
    key = jax.random.PRNGKey(3)
    errors = jnp.asarray([1.0, 4.0, 0.25])
    eps = draw_ob_perturbations(key, errors, nmems=32, scale=True)
    np.testing.assert_allclose(np.asarray(eps.mean(axis=1)), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(eps.var(axis=1, ddof=1)), np.asarray(errors), rtol=1e-10
    )


def test_zero_perturbations_single_ob_identities():
    """One ob, eps = 0: the EnKF mean equals the EnSRF mean exactly (same
    gain), and the pert increments differ by exactly the beta factor
    (EnSRF applies beta*K, the stochastic filter the full K).  With more
    obs the serial paths diverge, because each filter's updated tail feeds
    the next gain."""
    bm, bp, tm, tp, blat, blon, obs = _toy(nobs=1)
    obs = obs._replace(assim=jnp.ones_like(obs.assim))
    eps0 = jnp.zeros((1, bp.shape[1]), bp.dtype)
    bm_k, bp_k, *_ = enkf_serial(bm, bp, tm, tp, blat, blon, obs, eps0,
                                 localize=True)
    bm_s, bp_s, *_ = core.ensrf_serial(bm, bp, tm, tp, blat, blon, obs,
                                       localize=True)
    np.testing.assert_allclose(np.asarray(bm_k), np.asarray(bm_s),
                               rtol=1e-12, atol=1e-12)
    ye = tp[0]
    kdenom = float(jnp.var(ye)) + float(obs.errors[0])
    beta = 1.0 / (1.0 + np.sqrt(float(obs.errors[0]) / kdenom))
    np.testing.assert_allclose(
        np.asarray(bp - bp_s), beta * np.asarray(bp - bp_k),
        rtol=1e-10, atol=1e-12,
    )
    # Full gain over-contracts relative to the beta-scaled square root.
    assert float(jnp.var(bp_k)) < float(jnp.var(bp_s))


def test_monte_carlo_variance_matches_ensrf():
    """E over draws of the stochastic posterior variance = EnSRF posterior
    variance (checked per state row, averaged over 160 draws)."""
    bm, bp, tm, tp, blat, blon, obs = _toy(nstate=40, nmems=20, nobs=5,
                                           seed=4)
    obs = obs._replace(assim=jnp.ones_like(obs.assim),
                       radii=jnp.full_like(obs.radii, jnp.inf))
    bm_s, bp_s, *_ = core.ensrf_serial(bm, bp, tm, tp, blat, blon, obs,
                                       localize=False)
    var_srf = np.asarray(jnp.var(bp_s, axis=1, ddof=1))

    nmc = 160
    keys = jax.random.split(jax.random.PRNGKey(7), nmc)

    def one(key):
        eps = draw_ob_perturbations(key, obs.errors, bp.shape[1], scale=True)
        _, bp_k, *_ = enkf_serial(bm, bp, tm, tp, blat, blon, obs, eps,
                                  localize=False)
        return jnp.var(bp_k, axis=1, ddof=1)

    var_mc = np.asarray(jax.lax.map(one, keys)).mean(axis=0)
    # Row-averaged agreement well inside MC noise.
    ratio = var_mc.mean() / var_srf.mean()
    assert 0.9 < ratio < 1.1, ratio
    np.testing.assert_allclose(var_mc, var_srf, rtol=0.35)


@pytest.mark.parametrize("localize,fast_geometry",
                         [(True, False), (True, True), (False, False)])
def test_enkf_blocked_equals_serial(localize, fast_geometry):
    """The blocked two-phase EnKF (tail scan + Gram-corrected block sweep
    with apply_rows=z) is algebraically identical to the serial scan for
    the same perturbation draw — including QC-masked obs."""
    bm, bp, tm, tp, lat, lon, obs = _toy(nobs=23, seed=4)
    eps = draw_ob_perturbations(jax.random.PRNGKey(9),
                                obs.errors, bp.shape[1])
    s = enkf_serial(bm, bp, tm, tp, lat, lon, obs, eps,
                    localize=localize, fast_geometry=fast_geometry)
    for bs in (4, 8, 23, 64):
        b = enkf_blocked(bm, bp, tm, tp, lat, lon, obs, eps,
                         localize=localize, fast_geometry=fast_geometry,
                         block_size=bs)
        for i in range(4):
            np.testing.assert_allclose(np.asarray(b[i]), np.asarray(s[i]),
                                       atol=1e-9)
        for f in range(5):
            np.testing.assert_allclose(np.asarray(b[4][f]),
                                       np.asarray(s[4][f]), atol=1e-9)


def test_enkf_blocked_equals_serial_vertical():
    """Vertical-localization parity of the blocked EnKF."""
    bm, bp, tm, tp, lat, lon, obs = _toy(nobs=15, seed=6)
    rng = np.random.default_rng(7)
    obs = obs._replace(
        verts=jnp.asarray(rng.uniform(100, 900, 15), jnp.float64),
        vert_radii=jnp.full(15, 300.0, jnp.float64),
    )
    bvert = jnp.asarray(rng.uniform(100, 900, bm.shape[0]), jnp.float64)
    eps = draw_ob_perturbations(jax.random.PRNGKey(3),
                                obs.errors, bp.shape[1])
    s = enkf_serial(bm, bp, tm, tp, lat, lon, obs, eps, localize=True,
                    vertical=True, body_vert=bvert)
    b = enkf_blocked(bm, bp, tm, tp, lat, lon, obs, eps, localize=True,
                     vertical=True, body_vert=bvert, block_size=8)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(b[i]), np.asarray(s[i]),
                                   atol=1e-9)


def test_enkf_class_serial_vs_blocked_method():
    """EnKF dispatches on FilterConfig.method; both produce the same
    analysis for the same seed (float64)."""
    state = make_demo_state(nmems=14, seed=8)
    obs = make_demo_obs(state, nobs=9, seed=9, radius=1500.0)
    cfg_b = FilterConfig(localization="GC", dtype="float64",
                         method="blocked")
    cfg_s = FilterConfig(localization="GC", dtype="float64",
                         method="serial")
    post_b, _ = EnKF(state, list(obs), config=cfg_b, verbose=False,
                     seed=21).update()
    post_s, _ = EnKF(state, list(obs), config=cfg_s, verbose=False,
                     seed=21).update()
    np.testing.assert_allclose(np.asarray(post_b.data),
                               np.asarray(post_s.data), atol=1e-9)


def test_enkf_class_end_to_end():
    state = make_demo_state(nmems=18, seed=2)
    obs = make_demo_obs(state, nobs=8, seed=3, radius=1200.0)
    cfg = FilterConfig(localization="GC", dtype="float64")
    filt = EnKF(state, list(obs), config=cfg, verbose=False, seed=11)
    post, batch = filt.update()
    assert post.data.shape == state.data.shape
    assert np.asarray(batch.assimilated).any()
    # posterior pulls toward obs on average
    d_prior = np.abs(batch.values - batch.prior_mean)
    d_post = np.abs(batch.values - batch.post_mean)
    ok = np.asarray(batch.assimilated, bool)
    assert d_post[ok].mean() < d_prior[ok].mean()
    # reproducible for a fixed seed
    post2, _ = EnKF(state, list(obs), config=cfg, verbose=False,
                    seed=11).update()
    np.testing.assert_array_equal(np.asarray(post.data),
                                  np.asarray(post2.data))
    # different seed, different (but finite) analysis perturbations
    post3, _ = EnKF(state, list(obs), config=cfg, verbose=False,
                    seed=12).update()
    assert not np.array_equal(np.asarray(post.data), np.asarray(post3.data))
    assert np.isfinite(np.asarray(post3.data)).all()


def test_enkf_cycles_lorenz96_beats_free_run():
    """Stochastic EnKF in the cycling harness: analysis RMSE must clearly
    beat the forecast-only RMSE over a Lorenz-96 twin (and stay finite —
    i.e. no filter divergence with the per-cycle perturbation advance)."""
    from efa_xray_tpu.models import lorenz96 as l96
    from efa_xray_tpu.models.cycling import CyclingHarness

    n, m = 40, 20
    truth0, ens0 = l96.spinup_ensemble(nvars=n, nmems=m, seed=2)
    lats, lons = l96.fake_latlon(n)

    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        solver="enkf",
        enkf_seed=3,
        inflation=1.05,
        config=FilterConfig(localization="GC", dtype="float64"),
        obs_operator_rows=np.arange(0, n, 2),
    )
    stats = harness.run(ens0, truth0, ncycles=25, seed=5)
    rmse = np.asarray([s.analysis_rmse for s in stats])
    bg_rmse = np.asarray([s.background_rmse for s in stats])
    assert np.isfinite(rmse).all()
    # analyses improve on backgrounds, and late-cycle analyses lock on
    assert rmse[5:].mean() < bg_rmse[5:].mean()
    assert rmse[-8:].mean() < 1.0


def test_enkf_sharded_matches_single_device():
    """Sharded stochastic EnKF (state sharded, obs tail + perturbation
    table replicated) must reproduce the single-device analysis — same
    seed, same draws, row-local updates."""
    from efa_xray_tpu.parallel import make_mesh

    state = make_demo_state(ny=8, nx=8, nmems=12, seed=6)
    obs = make_demo_obs(state, nobs=9, seed=7, radius=1100.0)
    cfg = FilterConfig(localization="GC", dtype="float64")
    post1, _ = EnKF(state, list(obs), config=cfg, verbose=False,
                    seed=4).update()
    post8, _ = EnKF(state, list(obs), config=cfg, verbose=False,
                    seed=4, mesh=make_mesh()).update()
    np.testing.assert_allclose(np.asarray(post8.data), np.asarray(post1.data),
                               rtol=1e-10, atol=1e-10)
    # the serial method on the mesh agrees too (same draws, fp-identical
    # algorithm family)
    cfg_s = FilterConfig(localization="GC", dtype="float64",
                         method="serial")
    post8s, _ = EnKF(state, list(obs), config=cfg_s, verbose=False,
                     seed=4, mesh=make_mesh()).update()
    np.testing.assert_allclose(np.asarray(post8s.data),
                               np.asarray(post1.data), atol=1e-9)
