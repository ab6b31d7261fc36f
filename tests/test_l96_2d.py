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
