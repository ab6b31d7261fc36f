"""Gridded cycling-DA integration test on the 2-D Lorenz-96 variant.

The 1-D L96 test (test_lorenz96.py) places every state variable on the
equator, so its localization footprints are effectively one-dimensional.
This suite exercises the REAL spherical machinery in a cycling loop:
a 2-D lat-lon grid spanning ±60°, genuinely 2-D Gaspari-Cohn footprints
(meridional + zonal), and covariances that couple latitude rows through
the model dynamics.  The reference has no dynamical model or cycling
driver at all (SURVEY.md §1.5)."""

import numpy as np

import jax.numpy as jnp
import pytest

from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.models import l96_2d as m2
from efa_xray_tpu.models.cycling import CyclingHarness


def test_l96_2d_dynamics_chaotic_and_meridionally_coupled():
    truth, ens = m2.spinup_ensemble(ny=8, nx=32, nmems=20, seed=0)
    assert truth.shape == (8, 32)
    assert ens.shape == (20, 8, 32)
    assert bool(jnp.isfinite(ens).all())
    # chaos: nearby trajectories diverge
    a = m2.integrate(truth, nsteps=200)
    b = m2.integrate(truth + 1e-4, nsteps=200)
    assert float(jnp.abs(a - b).max()) > 0.1
    # meridional coupling: a perturbation confined to the southernmost row
    # must spread north, with amplitude decreasing away from the source
    p = truth.at[0].add(0.5)
    c = m2.integrate(truth, nsteps=40)
    d = m2.integrate(p, nsteps=40)
    rowdiff = np.abs(np.asarray(c - d)).max(axis=1)
    assert rowdiff[1] > 1e-2  # reached the neighbor row
    assert rowdiff[0] > rowdiff[3] > rowdiff[7]  # decays with distance


def test_l96_2d_gridded_cycling_beats_obs_error_and_free_run():
    """Half-observed 2-D grid, RTPS inflation, 3000-km GC localization:
    the analysis must settle well below the observation error and far
    below the free-running ensemble."""
    ny, nx, nm, ncycles = 8, 32, 20, 30
    lat, lon = m2.grid_latlon(ny, nx)
    truth, ens = m2.spinup_ensemble(ny=ny, nx=nx, nmems=nm, seed=1)
    fc = m2.make_flat_forecast(ny, nx, nsteps=2)
    rows = np.arange(0, ny * nx, 2)  # observe every other grid point

    h = CyclingHarness(
        forecast=fc,
        state_lats=lat.ravel(),
        state_lons=lon.ravel(),
        ob_error=1.0,
        localize_radius=3000.0,
        obs_operator_rows=rows,
        config=FilterConfig(rtps_alpha=0.6),
    )
    stats = h.run(ens.reshape(nm, -1), truth.ravel(), ncycles, seed=3)
    last10 = float(np.mean([s.analysis_rmse for s in stats[-10:]]))

    free = m2.integrate(ens, nsteps=2 * ncycles)
    tr = m2.integrate(truth, nsteps=2 * ncycles)
    free_rmse = float(jnp.sqrt(jnp.mean((jnp.mean(free, 0) - tr) ** 2)))

    assert last10 < 0.7  # well below sigma_obs = 1 (measured ~0.37)
    assert last10 < free_rmse / 4.0  # free run is ~4.1


def test_cycling_raises_loudly_on_forecast_divergence():
    """Over-aggressive adaptive inflation throws a member off the L96-2D
    attractor around cycle 25; the harness must raise at the diverging
    cycle instead of silently cycling NaN statistics."""
    ny, nx, nm = 8, 32, 20
    lat, lon = m2.grid_latlon(ny, nx)
    truth, ens = m2.spinup_ensemble(ny=ny, nx=nx, nmems=nm, seed=1)
    fc = m2.make_flat_forecast(ny, nx, nsteps=2)
    rows = np.arange(0, ny * nx, 2)
    h = CyclingHarness(
        forecast=fc,
        state_lats=lat.ravel(),
        state_lons=lon.ravel(),
        ob_error=1.0,
        localize_radius=3000.0,
        obs_operator_rows=rows,
        adaptive_inflation=True,  # lambda ~4 here = x2 perts per cycle
    )
    with pytest.raises(RuntimeError, match="forecast diverged at cycle"):
        h.run(ens.reshape(nm, -1), truth.ravel(), 30, seed=3)


def test_public_api_cycling_adaptive_inflation_stays_on_attractor():
    """Mini production-cycled config (benchmarks/cycled_production.py)
    through the PUBLIC API — EnsembleState + ObservationBatch +
    EnSRF(inflation=AdaptiveInflation).update() per cycle — with the
    full production inflation controls (sqrt-lambda application, evolved
    std, damping, field cap).  Regression for two measured divergences:
    lambda applied unsquare-rooted doubled the inflation in log space
    every cycle, and the undamped/uncapped field ratcheted multiplicatively
    at peripherally-observed points until the forecast left the attractor
    (NaN by cycle ~9)."""
    from efa_xray_tpu.assimilation.adaptive_inflation import (
        AdaptiveInflation,
    )
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.observation import forward as _fwd
    from efa_xray_tpu.observation.observation import ObservationBatch
    from efa_xray_tpu.state.ensemble import EnsembleState
    from efa_xray_tpu.state.structure import StateStructure
    from efa_xray_tpu.utils import timeutil

    ny, nx, nm, nobs = 16, 32, 12, 120
    ngrid = ny * nx
    truth, ens = m2.spinup_ensemble(ny=ny, nx=nx, nmems=nm, seed=3)
    lat, lon = m2.grid_latlon(ny, nx)
    times = np.datetime64("2026-08-01T00:00:00") + np.arange(1)
    structure = StateStructure.build(["X"], times, lat, lon, nm)
    rng = np.random.default_rng(11)
    ob_lats = rng.uniform(-55.0, 55.0, nobs)
    ob_lons = rng.uniform(0.0, 360.0, nobs)
    times_s = timeutil.to_epoch_seconds(np.repeat(times[0], nobs))
    taps = _fwd.build_taps(structure, ob_lats, ob_lons, times_s,
                           np.zeros(nobs, dtype=np.int32))
    cfg = FilterConfig(
        localization="GC", dtype="float64", outlier_threshold=4.0,
        adaptive_sd_evolve=True, adaptive_sd_min=0.15,
        adaptive_damp=0.9, adaptive_max=4.0,
    )
    adapt = AdaptiveInflation(
        EnsembleState(jnp.transpose(ens, (1, 2, 0))[None, None], structure),
        ("adaptive", "/nonexistent.nc", (1.0, 0.6)),
    )
    rmse = []
    for _ in range(8):
        truth = m2.integrate(truth, nsteps=4)
        ens = m2.integrate(ens, nsteps=4)
        ye_t = np.asarray(
            _fwd.apply_taps_obj(truth.reshape(ngrid, 1), taps)
        )[:, 0]
        batch = ObservationBatch(
            values=ye_t + rng.normal(0, 1.0, nobs),
            errors=np.ones(nobs),
            lats=ob_lats, lons=ob_lons, times_s=times_s,
            obtypes=["X"] * nobs,
            localize_radius=np.full(nobs, 2000.0),
            assimilate_flags=np.ones(nobs, bool),
            verts=np.full(nobs, np.nan),
            descriptions=[None] * nobs,
        )
        state = EnsembleState(
            jnp.transpose(ens, (1, 2, 0))[None, None], structure
        )
        post, _ = EnSRF(state, batch, inflation=adapt, config=cfg,
                        verbose=False).update()
        p = np.asarray(post.data)
        assert np.isfinite(p).all()
        rmse.append(float(np.sqrt(np.mean(
            (p[0, 0].mean(-1) - np.asarray(truth)) ** 2))))
        ens = jnp.transpose(jnp.asarray(p[0, 0]), (2, 0, 1))
    lam = adapt.mean["X"]
    assert np.isfinite(lam).all()
    assert lam.max() <= 4.0 + 1e-9  # the cap held
    assert lam.min() >= 1.0 - 1e-9
    assert rmse[-1] < rmse[0]  # the DA is actually helping
