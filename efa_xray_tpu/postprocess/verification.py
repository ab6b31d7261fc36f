"""Ensemble verification statistics beyond the reference's per-ob table.

The reference's only verification artifact is the per-ob DataFrame
(``efa_xray/postprocess/postprocess.py:8-39``).  Cycling/production DA
needs ensemble-quality diagnostics as well; this module adds the standard
ones:

* field RMSE / bias / spread against a truth field (spread-skill: a
  calibrated ensemble has RMSE ~ spread * sqrt((M+1)/M));
* observation-space rank histograms (flat for a reliable ensemble);
* innovation consistency: E[d^2] vs (prior_var + R), the statistic that
  drives adaptive inflation (Anderson 2009).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from efa_xray_tpu.observation import forward as _fwd
from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.state.ensemble import EnsembleState


def field_verification(state: EnsembleState, truth) -> pd.DataFrame:
    """Per-variable, per-validtime RMSE/bias/spread vs a truth field.

    ``truth``: array ``[nvars, ntimes, ny, nx]`` (or ``[ntimes, ny, nx,
    nvars]``, auto-transposed).
    """
    s = state.structure
    tr = np.asarray(truth)
    if tr.shape == (s.ntimes, s.ny, s.nx, s.nvars):
        tr = np.transpose(tr, (3, 0, 1, 2))
    if tr.shape != (s.nvars, s.ntimes, s.ny, s.nx):
        raise ValueError(f"truth shape {tr.shape} does not match state {s.shape[:-1]}")
    mean = np.asarray(state.ensemble_mean())
    spread = np.asarray(state.ensemble_spread())
    rows = []
    for vi, name in enumerate(s.var_names):
        for ti, t in enumerate(s.times64()):
            err = mean[vi, ti] - tr[vi, ti]
            rows.append(
                {
                    "variable": name,
                    "validtime": t,
                    "rmse": float(np.sqrt(np.mean(err**2))),
                    "bias": float(np.mean(err)),
                    "spread": float(np.mean(spread[vi, ti])),
                }
            )
    return pd.DataFrame(rows)


def rank_histogram(state: EnsembleState, obs, time_weighting: str = "linear"):
    """Observation-space rank histogram: for each ob, the rank of the
    observed value within the sorted ensemble estimates.  Returns
    ``counts`` of length ``nmems + 1`` (flat == statistically reliable)."""
    batch = ObservationBatch.coerce(obs)
    s = state.structure
    taps = _fwd.build_taps(
        s, batch.lats, batch.lons, batch.times_s, batch.var_indices(s),
        time_weighting=time_weighting,
    )
    ye = np.asarray(_fwd.apply_taps_obj(state.to_vect(), taps), dtype=np.float64)
    ok = np.asarray(taps.qc_ok)
    ranks = (ye[ok] < batch.values[ok, None]).sum(axis=1)
    return np.bincount(ranks, minlength=s.nmems + 1)


def innovation_consistency(batch: ObservationBatch) -> Dict[str, float]:
    """Innovation variance consistency after a filter run: for a
    well-tuned system ``mean(d^2) ~= mean(prior_var + R)``; a ratio > 1
    signals an under-dispersive prior (raise inflation)."""
    if batch.prior_mean is None:
        raise ValueError("Run the filter first (no prior_mean diagnostics)")
    ok = (
        np.ones(batch.nobs, dtype=bool)
        if batch.assimilated is None
        else np.asarray(batch.assimilated)
    )
    d2 = (batch.values[ok] - batch.prior_mean[ok]) ** 2
    expected = batch.prior_var[ok] + batch.errors[ok]
    return {
        "mean_innov_sq": float(np.mean(d2)),
        "mean_expected": float(np.mean(expected)),
        "consistency_ratio": float(np.mean(d2) / np.mean(expected)),
        "nobs": int(ok.sum()),
    }
