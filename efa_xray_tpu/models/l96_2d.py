"""Two-dimensional Lorenz-96 variant on a lat-lon grid, for gridded
cycling-DA integration tests.

The reference has no dynamical model at all (SURVEY.md §1.5 — its demo
pulls live GEFS point data over THREDDS); :mod:`efa_xray_tpu.models.lorenz96`
covers the canonical 1-D ring.  This module adds a genuinely GRIDDED
chaotic testbed so cycling DA can be exercised with real spherical
geometry — 2-D Gaspari-Cohn localization footprints, meridionally
anisotropic covariances, off-equator observation networks — instead of
the ring's degenerate all-points-on-the-equator layout.

Construction (a standard synthetic-testbed composition, not a published
named model): each latitude row runs the classic Lorenz-96 zonal dynamics

    dX[j,i]/dt = (X[j,i+1] - X[j,i-2]) X[j,i-1] - X[j,i] + F

(cyclic in ``i``, the longitude index), coupled across rows by scale-free
meridional diffusion

    + kappa * (X[j+1,i] - 2 X[j,i] + X[j-1,i])

with insulated (one-sided) north/south edges.  The diffusion is weak
relative to the O(10) L96 terms, so each row stays on the chaotic L96
attractor while errors and covariances propagate in latitude — exactly
the structure 2-D localization is meant to respect.  The grid rows carry
real latitudes (default ±60°, no pole rows), so haversine distances,
GC localization and the forward-operator machinery all apply unchanged.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tendency(x, forcing: float = 8.0, kappa: float = 1.0):
    """dX/dt on a ``[..., ny, nx]`` state: per-row zonal L96 + meridional
    diffusion (Neumann edges)."""
    zonal = (
        jnp.roll(x, -1, axis=-1) - jnp.roll(x, 2, axis=-1)
    ) * jnp.roll(x, 1, axis=-1) - x + forcing
    up = jnp.concatenate([x[..., 1:2, :], x[..., :-1, :]], axis=-2)
    down = jnp.concatenate([x[..., 1:, :], x[..., -2:-1, :]], axis=-2)
    return zonal + kappa * (up - 2.0 * x + down)


@functools.partial(jax.jit, static_argnames=("nsteps",))
def integrate(x0, dt: float = 0.05, nsteps: int = 1, forcing: float = 8.0,
              kappa: float = 1.0):
    """RK4 for ``nsteps`` steps on ``[..., ny, nx]`` states (members as
    leading axes broadcast elementwise)."""

    def rk4_step(x, _):
        k1 = tendency(x, forcing, kappa)
        k2 = tendency(x + 0.5 * dt * k1, forcing, kappa)
        k3 = tendency(x + 0.5 * dt * k2, forcing, kappa)
        k4 = tendency(x + dt * k3, forcing, kappa)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    x, _ = jax.lax.scan(rk4_step, x0, None, length=nsteps)
    return x


def spinup_ensemble(
    ny: int = 8,
    nx: int = 32,
    nmems: int = 20,
    seed: int = 0,
    dt: float = 0.05,
    spinup_steps: int = 400,
    forcing: float = 8.0,
    kappa: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(truth [ny, nx], ensemble [nmems, ny, nx])`` on the
    attractor."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    truth = forcing + 0.5 * jax.random.normal(k1, (ny, nx))
    truth = integrate(truth, dt=dt, nsteps=spinup_steps, forcing=forcing,
                      kappa=kappa)
    ens = truth[None] + 1.0 * jax.random.normal(k2, (nmems, ny, nx))
    ens = integrate(ens, dt=dt, nsteps=spinup_steps // 4, forcing=forcing,
                    kappa=kappa)
    return truth, ens


def grid_latlon(ny: int, nx: int, lat_max: float = 60.0
                ) -> Tuple[np.ndarray, np.ndarray]:
    """2-D ``(lat, lon)`` arrays ``[ny, nx]`` for the model grid: rows at
    ``ny`` latitudes in ``[-lat_max, lat_max]`` (no pole rows), periodic
    longitudes.  Flatten (C-order) for :class:`CyclingHarness`
    ``state_lats``/``state_lons``."""
    lat1 = np.linspace(-lat_max, lat_max, ny)
    lon1 = np.arange(nx) * (360.0 / nx)
    lon, lat = np.meshgrid(lon1, lat1)
    return lat, lon


def make_flat_forecast(
    ny: int, nx: int, dt: float = 0.05, nsteps: int = 4,
    forcing: float = 8.0, kappa: float = 1.0,
) -> Callable:
    """Forecast callable on FLAT states (``[nvars]`` truth or
    ``[nmems, nvars]`` ensembles, ``nvars = ny*nx`` C-order) for
    :class:`efa_xray_tpu.models.cycling.CyclingHarness`."""

    def forecast(flat):
        x = jnp.asarray(flat)
        grid = x.reshape(x.shape[:-1] + (ny, nx))
        out = integrate(grid, dt=dt, nsteps=nsteps, forcing=forcing,
                        kappa=kappa)
        return out.reshape(x.shape)

    return forecast
