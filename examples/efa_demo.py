#!/usr/bin/env python
"""Ensemble Forecast Adjustment demo — offline twin of ``efa_demo.ipynb``.

Reproduces the reference notebook's workflow end to end without network
access: a GEFS-like point-forecast ensemble (the notebook fetched one from
Unidata THREDDS, cell 6), observations of the early lead times, a serial
square-root assimilation of the whole forecast TRAJECTORY (so later lead
times adjust through time covariances — the EFA idea), and the
spaghetti/variance panels the notebook's ipywidgets viewer drew (cells
14-16), saved as a PNG.

Run: ``python examples/efa_demo.py [--out efa_demo.png]``
"""

import argparse

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from efa_xray_tpu import EnSRF, EnsembleState, Observation
from efa_xray_tpu.utils.demo_data import get_ensemble_point


def build_point_state(point_data, varname):
    """Wrap an (ntimes, nens) point forecast as a 1-location EnsembleState
    (the EFA trick: the whole trajectory is the state vector)."""
    arr = point_data[varname]  # [nt, nens]
    nt, nens = arr.shape
    return EnsembleState.from_vardict(
        {varname: arr[:, None, :]},  # (nt, nloc=1, nens)
        {
            "validtime": point_data["times"],
            "lat": np.asarray([point_data["lat"]]),
            "lon": np.asarray([point_data["lon"]]),
            "mem": np.arange(nens),
        },
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="efa_demo.png")
    ap.add_argument("--n-obs", type=int, default=5)
    ap.add_argument("--ob-error", type=float, default=1.0)
    ap.add_argument("--inflation", type=float, default=1.0)
    from efa_xray_tpu.utils.demo import add_platform_arg, apply_platform

    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)

    var = "Temperature_height_above_ground_ens"
    data = get_ensemble_point(variables=[var], seed=3)
    state = build_point_state(data, var)
    times = data["times"]

    # Observations at the first few lead times (the notebook used
    # obs = [275, 275, 275, 275, 276] at 3-hourly times, cell 8).
    rng = np.random.default_rng(0)
    truth_like = data[var].mean(axis=1)  # pseudo-truth for the demo
    obs = []
    for i in range(args.n_obs):
        obs.append(
            Observation(
                value=float(truth_like[i] - 1.5 + rng.normal(0, 0.3)),
                obtype=var,
                time=times[i],
                error=args.ob_error,
                lat=data["lat"],
                lon=data["lon"],
                assimilate_this=True,
                localize_radius=None,  # no localization, as in the notebook
            )
        )

    filt = EnSRF(state, obs, inflation=args.inflation or None, verbose=True,
                 loc=False)
    post, batch = filt.update()

    prior_arr = np.asarray(state[var])[:, 0, 0, :]  # [nt, nens]
    post_arr = np.asarray(post[var])[:, 0, 0, :]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(13, 8), sharex=True)
    for ax, arr, title in (
        (axes[0, 0], prior_arr, "Prior ensemble"),
        (axes[0, 1], post_arr, "Posterior ensemble"),
    ):
        ax.plot(times, arr, color="steelblue", alpha=0.35, lw=0.8)
        ax.plot(times, arr.mean(axis=1), color="k", lw=2, label="ens mean")
        ax.scatter([o.time for o in obs], [o.value for o in obs],
                   color="crimson", zorder=5, label="obs")
        ax.set_title(title)
        ax.legend(loc="upper left", fontsize=8)
        ax.set_ylabel("T2m [K]")
    axes[1, 0].plot(times, prior_arr.var(axis=1), label="prior")
    axes[1, 0].plot(times, post_arr.var(axis=1), label="posterior")
    axes[1, 0].set_title("Ensemble variance by lead time")
    axes[1, 0].legend()
    axes[1, 1].plot(times, prior_arr.mean(axis=1) - post_arr.mean(axis=1))
    axes[1, 1].set_title("Mean adjustment (prior - posterior)")
    fig.autofmt_xdate()
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved {args.out}")

    # The EFA payoff: variance shrinks at (and beyond) the assimilated times.
    assert post_arr.var(axis=1).mean() < prior_arr.var(axis=1).mean()
    print("prior var", prior_arr.var(axis=1)[: args.n_obs + 2].round(3))
    print("post  var", post_arr.var(axis=1)[: args.n_obs + 2].round(3))


if __name__ == "__main__":
    main()
