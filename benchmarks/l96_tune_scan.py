"""Tuning scan for BASELINE config 1 (half-observed Lorenz-96 cycling DA).

Grid-search the DA knobs (localization radius, Anderson adaptive-inflation
prior sd, RTPS) on CPU with the exact benchmark workload shape
(40 vars, 20 members, every-2nd-var obs, sigma_obs = 1, 4 RK4 steps per
cycle) but a LONGER window (10 warmup + 60 scored cycles, 3 seeds) so the
selected operating point is not a short-window fluke.  Prints one JSON
line per combo and a final "best" line; the winner goes into
``run_benchmarks.bench_config1``.
"""

import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from efa_xray_tpu.config import FilterConfig  # noqa: E402
from efa_xray_tpu.models import lorenz96 as l96  # noqa: E402
from efa_xray_tpu.models.cycling import CyclingHarness  # noqa: E402


def run_combo(radius, adaptive_sd, rtps, seed, ncycles=60, warmup=10):
    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=1 + seed)
    lats, lons = l96.fake_latlon(nvars)
    h = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=radius,
        config=FilterConfig(
            localization="GC", dtype="float32", block_size=8,
            rtps_alpha=rtps,
        ),
        obs_operator_rows=np.arange(0, nvars, 2),
        adaptive_inflation=True,
        adaptive_sd=adaptive_sd,
        # Scan under the same production cap the published benchmark runs
        # (uncapped, the scan's best point can diverge on some seeds —
        # see bench_config1's comment in run_benchmarks.py).
        adaptive_max=2.0,
    )
    h.run(ens, truth, ncycles=warmup, seed=100 + seed)
    stats = h.run(None, None, ncycles=ncycles, resume=True)
    rmse = [s.analysis_rmse for s in stats]
    spread = [s.mean_spread for s in stats]
    return float(np.mean(rmse)), float(np.mean(spread))


def main():
    radii = [2000.0, 3000.0, 4000.0, 6000.0]
    sds = [0.3, 0.6, 0.9]
    rtpss = [0.0, 0.5]
    results = []
    for radius, sd, rtps in itertools.product(radii, sds, rtpss):
        rmses, spreads = [], []
        try:
            for seed in range(3):
                r, s = run_combo(radius, sd, rtps, seed)
                rmses.append(r)
                spreads.append(s)
        except RuntimeError as e:  # forecast divergence = disqualified
            print(json.dumps({
                "radius": radius, "adaptive_sd": sd, "rtps": rtps,
                "error": str(e)[:80],
            }), flush=True)
            continue
        entry = {
            "radius": radius, "adaptive_sd": sd, "rtps": rtps,
            "mean_rmse": float(np.mean(rmses)),
            "rmse_per_seed": [round(v, 4) for v in rmses],
            "mean_spread": float(np.mean(spreads)),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
    best = min(results, key=lambda e: e["mean_rmse"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
