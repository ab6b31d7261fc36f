#!/usr/bin/env python
"""Production-style cycling DA on Lorenz-96 with adaptive inflation.

Demonstrates the full operational loop the reference only sketches:
forecast -> (adaptively) inflate -> assimilate -> learn inflation from
innovations -> verify -> repeat, with rank-histogram and innovation-
consistency diagnostics at the end.

Run: ``python examples/cycling_adaptive.py [--cycles 40]``
"""

import argparse

import numpy as np

import jax.numpy as jnp

from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.assimilation.adaptive_inflation import _anderson_update
from efa_xray_tpu.models import lorenz96 as l96
from efa_xray_tpu.observation.localization import gaspari_cohn, haversine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=40)
    ap.add_argument("--nvars", type=int, default=40)
    ap.add_argument("--nmems", type=int, default=20)
    ap.add_argument("--ob-error", type=float, default=1.0)
    args = ap.parse_args()

    nvars, nmems = args.nvars, args.nmems
    rng = np.random.default_rng(7)
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=7)
    lats, lons = l96.fake_latlon(nvars)
    obs_idx = np.arange(0, nvars, 2)
    nobs = len(obs_idx)
    radius = 4000.0

    # Adaptive inflation state: one lambda per state variable.
    lam = jnp.ones(nvars)
    lam_sd = 0.6

    print(f"{'cyc':>4} {'bg_rmse':>8} {'an_rmse':>8} {'spread':>7} {'lam_mean':>8}")
    for c in range(args.cycles):
        truth = l96.integrate(truth, nsteps=4)
        ens = l96.integrate(ens, nsteps=4)

        # adaptive inflation of the perturbations
        mean = jnp.mean(ens, axis=0)
        ens = mean + jnp.sqrt(lam)[None, :] * (ens - mean)

        yobs = np.asarray(truth)[obs_idx] + rng.normal(0, np.sqrt(args.ob_error), nobs)
        sv = jnp.asarray(ens, dtype=jnp.float64).T
        bm = jnp.mean(sv, axis=1)
        bp = sv - bm[:, None]
        ye = sv[obs_idx]
        obs = core.ObsArrays(
            values=jnp.asarray(yobs),
            errors=jnp.full(nobs, args.ob_error),
            lats=jnp.asarray(lats[obs_idx]),
            lons=jnp.asarray(lons[obs_idx]),
            radii=jnp.full(nobs, radius),
            assim=jnp.ones(nobs, dtype=bool),
        )
        bg_rmse = float(jnp.sqrt(jnp.mean((bm - truth) ** 2)))
        bm2, bp2, _, _, diags = core.ensrf_blocked(
            bm, bp, jnp.mean(ye, axis=1), ye - jnp.mean(ye, axis=1)[:, None],
            jnp.asarray(lats), jnp.asarray(lons), obs,
            localize=True, block_size=8,
        )
        ens = (bm2[:, None] + bp2).T
        an_rmse = float(jnp.sqrt(jnp.mean((bm2 - truth) ** 2)))
        spread = float(jnp.mean(jnp.std(ens, axis=0)))

        # Anderson-2009 inflation update from the innovations
        innov2 = (jnp.asarray(yobs) - diags.prior_mean) ** 2
        for i in range(nobs):
            gamma = gaspari_cohn(
                haversine((jnp.asarray(lats), jnp.asarray(lons)),
                          (lats[obs_idx[i]], lons[obs_idx[i]])),
                radius,
            )
            lam = _anderson_update(
                lam, lam_sd, gamma, innov2[i], diags.prior_var[i], args.ob_error
            )

        if c % 5 == 0 or c == args.cycles - 1:
            print(f"{c:>4} {bg_rmse:8.3f} {an_rmse:8.3f} {spread:7.3f} "
                  f"{float(jnp.mean(lam)):8.3f}")

    assert an_rmse < np.sqrt(args.ob_error), "cycling did not converge"
    print("converged: analysis RMSE below observation error")


if __name__ == "__main__":
    main()
