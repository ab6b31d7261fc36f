"""Lorenz-96 toy dynamical model for cycling-DA integration tests.

The reference has no dynamical model at all (its demo pulls live GEFS data
over THREDDS, ``efa_demo.ipynb`` cell 6, unavailable offline); Lorenz-96 is
the standard EnKF sanity benchmark (BASELINE.md config 1) and gives this
framework a self-contained cycling workload: forecast with ``lax.scan``'d
RK4, assimilate, repeat.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tendency(x, forcing: float = 8.0):
    """dx_i/dt = (x_{i+1} - x_{i-2}) x_{i-1} - x_i + F (cyclic)."""
    return (jnp.roll(x, -1, axis=-1) - jnp.roll(x, 2, axis=-1)) * jnp.roll(
        x, 1, axis=-1
    ) - x + forcing


@functools.partial(jax.jit, static_argnames=("nsteps",))
def integrate(x0, dt: float = 0.05, nsteps: int = 1, forcing: float = 8.0):
    """RK4 integration for ``nsteps`` steps; works on batched states
    (members as leading axes broadcast elementwise)."""

    def rk4_step(x, _):
        k1 = tendency(x, forcing)
        k2 = tendency(x + 0.5 * dt * k1, forcing)
        k3 = tendency(x + 0.5 * dt * k2, forcing)
        k4 = tendency(x + dt * k3, forcing)
        return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    x, _ = jax.lax.scan(rk4_step, x0, None, length=nsteps)
    return x


def spinup_ensemble(
    nvars: int = 40,
    nmems: int = 20,
    seed: int = 0,
    dt: float = 0.05,
    spinup_steps: int = 400,
    forcing: float = 8.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (truth [nvars], ensemble [nmems, nvars]) on the attractor."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    truth = forcing + 0.5 * jax.random.normal(k1, (nvars,))
    truth = integrate(truth, dt=dt, nsteps=spinup_steps, forcing=forcing)
    ens = truth[None, :] + 1.0 * jax.random.normal(k2, (nmems, nvars))
    ens = integrate(ens, dt=dt, nsteps=spinup_steps // 4, forcing=forcing)
    return truth, ens


def fake_latlon(nvars: int) -> Tuple[np.ndarray, np.ndarray]:
    """Place the cyclic L96 variables evenly around the equator so the
    great-circle machinery (localization, nearest points) applies."""
    lons = np.linspace(0.0, 360.0, nvars, endpoint=False)
    lats = np.zeros(nvars)
    return lats, lons
