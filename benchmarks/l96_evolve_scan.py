"""Tuning scan for config 1 with the EVOLVED inflation std (Anderson §4).

Round-3 shipped config 1 with a hand-tuned fixed sd (0.3) plus a DART-style
hard cap (adaptive_max=2.0) because the fixed-sd Anderson update ran away
uncapped on some seeds, and the resulting filter was underdispersive
(spread/RMSE ~0.85).  This scan searches the evolved-sd operating point —
UNCAPPED (adaptive_max at its 1e6 default) — for:

  * stability on every seed (any divergence disqualifies the combo),
  * analysis RMSE <= 0.7 sustained (last-30 mean),
  * calibration: spread/RMSE in [0.9, 1.1],
  * insensitivity to the INITIAL sd (the whole point of evolving it).

Axes: localization radius, initial adaptive_sd, sd_min floor, per-cycle
damping, RTPS.  Prints one JSON line per combo and a final "best" line;
the winner goes into ``run_benchmarks.bench_config1``.
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


def run_combo(radius, sd0, sd_min, damp, rtps, seed, ncycles=60, warmup=10):
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
        adaptive_sd=sd0,
        adaptive_sd_evolve=True,
        adaptive_sd_min=sd_min,
        adaptive_damp=damp,
        # UNCAPPED: the evolved sd must provide the stability by itself.
    )
    h.run(ens, truth, ncycles=warmup, seed=100 + seed)
    stats = h.run(None, None, ncycles=ncycles, resume=True)
    rmse = np.array([s.analysis_rmse for s in stats])
    spread = np.array([s.mean_spread for s in stats])
    return (
        float(np.mean(rmse[-30:])),
        float(np.mean(spread[-30:])),
        float(np.max(np.asarray(h._lam))),
        float(np.mean(np.asarray(h._lam_sd))),
    )


def main():
    radii = [4000.0, 8000.0]
    sd0s = [0.3, 0.6, 0.9]
    sd_mins = [0.05, 0.15]
    damps = [1.0, 0.9]
    rtpss = [0.0, 0.3]
    results = []
    for radius, sd0, sd_min, damp, rtps in itertools.product(
        radii, sd0s, sd_mins, damps, rtpss
    ):
        rmses, spreads, lmaxes, sdms = [], [], [], []
        try:
            for seed in range(3):
                r, s, lmax, sdm = run_combo(radius, sd0, sd_min, damp, rtps,
                                            seed)
                rmses.append(r)
                spreads.append(s)
                lmaxes.append(lmax)
                sdms.append(sdm)
        except RuntimeError as e:  # forecast divergence = disqualified
            print(json.dumps({
                "radius": radius, "sd0": sd0, "sd_min": sd_min,
                "damp": damp, "rtps": rtps, "error": str(e)[:80],
            }), flush=True)
            continue
        ratio = float(np.mean(spreads) / np.mean(rmses))
        entry = {
            "radius": radius, "sd0": sd0, "sd_min": sd_min, "damp": damp,
            "rtps": rtps,
            "mean_rmse": float(np.mean(rmses)),
            "rmse_per_seed": [round(v, 4) for v in rmses],
            "mean_spread": float(np.mean(spreads)),
            "spread_over_rmse": round(ratio, 4),
            "lam_max": round(float(np.max(lmaxes)), 3),
            "lam_sd_mean": round(float(np.mean(sdms)), 4),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)

    if results:
        # Calibration-aware score: RMSE plus a penalty for leaving the
        # [0.9, 1.1] spread/skill band.
        def score(e):
            pen = max(0.0, 0.9 - e["spread_over_rmse"]) + max(
                0.0, e["spread_over_rmse"] - 1.1
            )
            return e["mean_rmse"] + pen
        best = min(results, key=score)
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
