"""Per-obtype observation bias estimation and correction.

Systematic observation (or forward-operator) bias violates the
zero-mean-error assumption of the Kalman update: a constant offset in the
obs pulls the analysis toward it every cycle instead of averaging out.
Operational systems correct it adaptively from the innovation stream
(variational bias correction); this module implements the scalar-per-type
core of that idea for the point-ob setting this framework targets.

For each observation type the estimator accumulates the mean prior
innovation ``d = y - H(x̄b)`` over assimilable, QC-passing obs and smooths
it across cycles with an exponential moving average.  :meth:`correct`
subtracts the current estimate from the ob values *before* assimilation.
In an unbiased system innovations are zero-mean, so the estimate stays
near zero and the correction is a no-op; under a constant ob bias the EMA
converges to it at rate ``alpha`` per cycle.

The state (one scalar + count per obtype) is JSON round-trippable, the
cycling analog of the inflation fields the reference persists to netCDF
(``efa_xray/assimilation/adaptive_inflation.py:76-80``); the reference
itself has no bias handling at all — every ob is taken at face value
(``efa_xray/assimilation/ensrf.py:86``).

Everything here is host-side preprocessing on the struct-of-arrays batch:
it touches no solver path, so serial/blocked/sharded parity invariants are
untouched.  For twin experiments with a FIXED identity-pick network,
:class:`efa_xray_tpu.models.cycling.CyclingHarness` has the per-row
variant (``adaptive_bias``); this module is the per-obtype form for real
heterogeneous networks where stations come and go between cycles.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class BiasCorrection:
    """Cycle-persistent per-obtype innovation-bias estimator.

    Parameters
    ----------
    alpha:
        EMA learning rate per update in (0, 1].  ``alpha=1`` trusts the
        latest cycle's mean innovation outright; small values average over
        ~1/alpha cycles (operational practice: slow adaptation so weather
        signal does not alias into the bias estimate).
    min_count:
        Minimum number of usable obs of a type in one update before that
        cycle's sample moves the estimate (noisy one-ob "means" are
        skipped).
    biases / counts:
        Current estimates (mapping obtype -> bias in ob units) and total
        obs counts that produced them.  Usually left to default and filled
        by :meth:`update`.
    """

    alpha: float = 0.2
    min_count: int = 2
    biases: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if not 0.0 < self.alpha <= 1.0:
            raise ValueError("alpha must be in (0, 1]")
        if self.min_count < 1:
            raise ValueError("min_count must be >= 1")

    # ------------------------------------------------------------------
    # estimation
    def update(self, batch) -> Dict[str, float]:
        """Learn from one assimilation's prior diagnostics.

        ``batch`` must carry ``prior_mean`` (the filter records it for
        every ob, assimilated or not, matching the reference's per-ob
        slots ``efa_xray/assimilation/ensrf.py:66-70``).  Prefer the
        FORECAST-prior estimate (``Assimilation.compute_ob_priors`` before
        the update) — the operational O-B convention; the serial EnSRF's
        recorded diagnostics are *sequential* per-ob priors, whose later
        innovations are already shrunk by earlier (biased) obs and so
        underestimate a constant bias.  Obs that were not flagged for
        assimilation, were QC-rejected as innovation outliers, or have
        non-finite innovations are excluded.
        Returns the per-obtype mean innovations of THIS update (before
        smoothing) for diagnostics.
        """
        if batch.prior_mean is None:
            raise ValueError(
                "batch has no prior_mean diagnostics; run the filter (or "
                "compute_ob_priors) before BiasCorrection.update"
            )
        innov = np.asarray(batch.values, dtype=np.float64) - np.asarray(
            batch.prior_mean, dtype=np.float64
        )
        usable = np.asarray(batch.assimilate_flags, dtype=bool) & np.isfinite(innov)
        if batch.qc_outlier is not None:
            usable &= ~np.asarray(batch.qc_outlier, dtype=bool)

        sample_means: Dict[str, float] = {}
        obtypes = np.asarray(batch.obtypes, dtype=object)
        for obtype in dict.fromkeys(batch.obtypes):  # stable unique order
            sel = usable & (obtypes == obtype)
            n = int(sel.sum())
            if n < self.min_count:
                continue
            mean_d = float(innov[sel].mean())
            sample_means[obtype] = mean_d
            prev = self.biases.get(obtype, 0.0)
            # First sighting of a type starts at the sample mean rather
            # than EMA-ing from the arbitrary 0 prior.
            if obtype not in self.counts:
                self.biases[obtype] = mean_d
            else:
                self.biases[obtype] = (1.0 - self.alpha) * prev + self.alpha * mean_d
            self.counts[obtype] = self.counts.get(obtype, 0) + n
        return sample_means

    # ------------------------------------------------------------------
    # application
    def correct(self, batch):
        """Return a copy of ``batch`` with the current bias estimate
        subtracted from the values (types without an estimate unchanged).
        The input batch is not modified."""
        offsets = np.asarray(
            [self.biases.get(t, 0.0) for t in batch.obtypes], dtype=np.float64
        )
        return dataclasses.replace(
            batch, values=np.asarray(batch.values, dtype=np.float64) - offsets
        )

    def offset_for(self, obtype: str) -> float:
        """Current bias estimate for one type (0 when unknown)."""
        return float(self.biases.get(obtype, 0.0))

    # ------------------------------------------------------------------
    # persistence (cycling resume)
    def to_dict(self) -> dict:
        return {
            "alpha": self.alpha,
            "min_count": self.min_count,
            "biases": dict(self.biases),
            "counts": {k: int(v) for k, v in self.counts.items()},
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BiasCorrection":
        return cls(
            alpha=float(d.get("alpha", 0.2)),
            min_count=int(d.get("min_count", 2)),
            biases={str(k): float(v) for k, v in d.get("biases", {}).items()},
            counts={str(k): int(v) for k, v in d.get("counts", {}).items()},
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "BiasCorrection":
        with open(path) as f:
            return cls.from_dict(json.load(f))
