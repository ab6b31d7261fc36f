"""Numerical and geometric edge cases the production path must survive."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_demo_state
from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.observation.localization import gaspari_cohn, haversine
from efa_xray_tpu.observation.observation import Observation


def _core_arrays(nstate=60, nmems=12, nobs=4, seed=0, collapse=False):
    rng = np.random.default_rng(seed)
    prior = rng.normal(280, 3, (nstate, nmems))
    if collapse:
        prior[:] = prior[:, :1]  # zero ensemble spread everywhere
    lats = rng.uniform(-80, 80, nstate)
    lons = rng.uniform(0, 360, nstate)
    rows = rng.integers(0, nstate, nobs)
    ye = prior[rows]
    obs = core.ObsArrays(
        values=jnp.asarray(ye.mean(1) + rng.normal(0, 1, nobs)),
        errors=jnp.ones(nobs),
        lats=jnp.asarray(lats[rows]),
        lons=jnp.asarray(lons[rows]),
        radii=jnp.full(nobs, 2000.0),
        assim=jnp.ones(nobs, dtype=bool),
    )
    pj = jnp.asarray(prior)
    bm = jnp.mean(pj, axis=1)
    bp = pj - bm[:, None]
    tmye = jnp.asarray(ye)
    tm = jnp.mean(tmye, axis=1)
    tp = tmye - tm[:, None]
    return bm, bp, tm, tp, jnp.asarray(lats), jnp.asarray(lons), obs


def test_collapsed_ensemble_no_nans():
    """Zero ensemble spread: varye=0, kdenom=R, gain=0 -> identity update,
    never NaN (the reference divides by kdenom=R>0, same here)."""
    bm, bp, tm, tp, lats, lons, obs = _core_arrays(collapse=True)
    for method, kw in (("serial", {}), ("blocked", {"block_size": 2})):
        fn = core.ensrf_serial if method == "serial" else core.ensrf_blocked
        bm2, bp2, _, _, diags = fn(bm, bp, tm, tp, lats, lons, obs,
                                   localize=True, **kw)
        assert np.isfinite(np.asarray(bm2)).all()
        assert np.isfinite(np.asarray(bp2)).all()
        # perts are all zero -> no perturbation update
        np.testing.assert_allclose(np.asarray(bp2), np.asarray(bp), atol=1e-12)


def test_duplicate_observations_at_same_point():
    state = make_demo_state(nmems=12)
    s = state.structure
    ob = Observation(value=281.0, obtype=s.var_names[0], time=s.times64()[0],
                     error=1.0, lat=float(s.lat[2, 2]), lon=float(s.lon[2, 2]),
                     assimilate_this=True, localize_radius=1500.0)
    import copy

    obs = [ob, copy.deepcopy(ob), copy.deepcopy(ob)]
    post, batch = EnSRF(state, obs, verbose=False, loc="GC").update()
    assert batch.assimilated.all()
    # Repeated identical obs: posterior variance strictly decreases each time
    assert batch.post_var[2] < batch.post_var[0]
    assert np.isfinite(np.asarray(post.data)).all()


def test_polar_and_dateline_geometry():
    # Distances at the pole and across the dateline stay finite and sane
    d_pole = float(haversine((90.0, 0.0), (90.0, 179.0)))
    assert d_pole == pytest.approx(0.0, abs=1e-6)
    d_dateline = float(haversine((0.0, 179.5), (0.0, -179.5)))
    assert d_dateline == pytest.approx(111.2, abs=1.0)
    w = np.asarray(gaspari_cohn(jnp.asarray([d_dateline]), 500.0))
    assert 0.9 < w[0] <= 1.0


def test_observation_at_pole_assimilates():
    rng = np.random.default_rng(1)
    ny, nx, nmems = 5, 8, 10
    lat1d = np.linspace(80.0, 90.0, ny)
    lon1d = np.linspace(0.0, 315.0, nx)
    lon, lat = np.meshgrid(lon1d, lat1d)
    times = np.datetime64("2026-08-01") + np.arange(2) * np.timedelta64(6, "h")
    data = rng.normal(250, 3, (2, ny, nx, nmems))
    from efa_xray_tpu.state.ensemble import EnsembleState

    state = EnsembleState.from_vardict(
        {"T2m": data},
        {"validtime": times, "lat": lat, "lon": lon, "mem": np.arange(nmems)},
        dtype="float64",
    )
    ob = Observation(value=251.0, obtype="T2m", time=times[0], error=1.0,
                     lat=90.0, lon=45.0, assimilate_this=True,
                     localize_radius=800.0)
    post, batch = EnSRF(state, [ob], verbose=False, loc="GC").update()
    assert batch.assimilated.all()
    assert np.isfinite(np.asarray(post.data)).all()


def test_tiny_error_variance_stable():
    """Near-perfect obs (R -> 0): beta -> 1/2-ish, gain -> kcov/varye;
    must stay finite (kdenom >= varye > 0 for a spread ensemble)."""
    bm, bp, tm, tp, lats, lons, obs = _core_arrays()
    obs = obs._replace(errors=jnp.full(obs.errors.shape, 1e-12))
    bm2, bp2, _, _, _ = core.ensrf_blocked(bm, bp, tm, tp, lats, lons, obs,
                                           localize=True, block_size=2)
    assert np.isfinite(np.asarray(bm2)).all()
    assert np.isfinite(np.asarray(bp2)).all()


def test_huge_radius_equals_no_localization():
    bm, bp, tm, tp, lats, lons, obs = _core_arrays(seed=3)
    big = obs._replace(radii=jnp.full(obs.radii.shape, 1e12))
    r1 = core.ensrf_blocked(bm, bp, tm, tp, lats, lons, big,
                            localize=True, block_size=2)
    r2 = core.ensrf_blocked(bm, bp, tm, tp, lats, lons, obs._replace(
        radii=jnp.full(obs.radii.shape, jnp.inf)), localize=True, block_size=2)
    r3 = core.ensrf_blocked(bm, bp, tm, tp, lats, lons, obs,
                            localize=False, block_size=2)
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r3[0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(r2[0]), np.asarray(r3[0]), atol=1e-12)
