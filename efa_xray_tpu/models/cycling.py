"""Generic cycling data-assimilation harness.

The reference has no cycling driver — the demo notebook assimilates into a
static forecast once.  Production ensemble DA is cyclic (forecast ->
assimilate -> forecast), so this module provides the loop as a first-class
component: plug in a forecast model (any ``ensemble[M, ...] -> ensemble``
function, e.g. :mod:`efa_xray_tpu.models.lorenz96`), an observation
source, and a filter configuration; get per-cycle verification statistics
back.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.config import FilterConfig


def _crps_mean(ens: np.ndarray, truth: np.ndarray) -> float:
    """Mean exact ensemble CRPS of ``ens [M, nvars]`` against ``truth
    [nvars]`` (sorted-pair identity; same math as
    :func:`efa_xray_tpu.postprocess.verification.crps`)."""
    m = ens.shape[0]
    mae = np.mean(np.abs(ens - truth[None, :]))
    srt = np.sort(ens, axis=0)
    w = 2.0 * np.arange(m) + 1.0 - m
    pair = 2.0 * np.mean(w @ srt) / (m * m)
    return float(mae - 0.5 * pair)


@dataclasses.dataclass
class CycleStats:
    cycle: int
    analysis_rmse: float  # vs truth (when truth given)
    background_rmse: float
    mean_spread: float
    obs_prior_rmse: float
    obs_post_rmse: float
    # state-space mean ensemble CRPS of the analysis vs truth (exact
    # kernel form, same identity as postprocess.verification.crps);
    # lower is better, and unlike RMSE it also scores the spread.
    analysis_crps: float = float("nan")


@dataclasses.dataclass
class CyclingHarness:
    """Cycle a flat-state ensemble ``[nmems, nvars]`` through forecast and
    EnSRF analysis steps.

    ``forecast``: ensemble -> ensemble (vectorized over members).
    ``obs_operator_rows``: indices of the observed state components
    (identity-pick H; for general H pass ``obs_operator`` instead).
    """

    forecast: Callable
    state_lats: np.ndarray  # [nvars]
    state_lons: np.ndarray  # [nvars]
    ob_error: float = 1.0
    localize_radius: float = 2000.0
    # "ensrf" (the reference's serial filter, blocked execution), "letkf"
    # (all-at-once local transform filter; LETKF knobs ride on the config),
    # or "enkf" (stochastic perturbed-obs filter; ``enkf_seed`` draws the
    # perturbations, advanced per cycle so draws never repeat).
    solver: str = "ensrf"
    enkf_seed: int = 0
    config: FilterConfig = dataclasses.field(default_factory=FilterConfig)
    obs_operator: Optional[Callable] = None  # ensemble [M, nvars] -> ye [nobs, M]
    obs_operator_rows: Optional[np.ndarray] = None
    inflation: Optional[float] = None
    # Anderson-2009 adaptive inflation: a per-component variance-inflation
    # field lambda [nvars] is applied as sqrt(lambda) on the perturbations
    # before each analysis and Bayesian-updated from the innovations after
    # it (extends the reference's never-finished adaptive_inflation.py).
    adaptive_inflation: bool = False
    adaptive_sd: float = 0.6
    adaptive_min: float = 1.0
    # Evolve the inflation std per Anderson (2009) §4 instead of holding it
    # fixed: each observation refits sigma_lambda from the posterior density
    # ratio, so the inflation self-damps as it converges — the principled
    # replacement for hand-tuning adaptive_sd and capping with adaptive_max.
    # ``adaptive_sd`` becomes the INITIAL std; ``adaptive_sd_min`` keeps the
    # field adaptive forever (El Gharamti 2018 lower bound).
    adaptive_sd_evolve: bool = False
    adaptive_sd_min: float = 0.05
    # Per-cycle inflation damping toward 1 (DART's inf_damping): after each
    # analysis, lambda <- 1 + damp * (lambda - 1).  With the evolved sd this
    # is the principled stability mechanism — a transient burst of large
    # innovations decays geometrically instead of ratcheting the field up —
    # replacing the hard adaptive_max cap.  1.0 = off.
    adaptive_damp: float = 1.0
    # Upper clamp on the inflation field (DART runs with a cap, typically
    # 2-5): an unbounded field can run away on a burst of large innovations
    # and amplify the perturbations until the forecast model blows up.
    # Default keeps the historical unbounded behavior.
    adaptive_max: float = 1e6
    # Additive inflation (Mitchell & Houtekamer 2000; Whitaker et al. 2008
    # used it operationally for the NCEP GFS hybrid): before each analysis,
    # add zero-mean Gaussian noise of standard deviation ``additive_sigma``
    # to the perturbations (mean-preserving).  Multiplicative schemes scale
    # existing spread and therefore cannot restore it where it has
    # collapsed toward zero or points in the wrong subspace; additive noise
    # reintroduces variance everywhere, the standard counter to systematic
    # model error.  Draws come from the harness RNG, so checkpoint/resume
    # stays bit-exact.  0 = off — reference behavior (the reference has
    # only multiplicative inflation, efa_xray/assimilation/assimilation.py:52).
    additive_sigma: float = 0.0
    # Optional perturbation bank ``[nbank, nvars]`` for the additive draws:
    # instead of white noise, each member adds ``additive_sigma`` times a
    # randomly sampled bank row (the operational form — Whitaker et al.
    # 2008 sampled lagged-forecast differences — so the added variance
    # carries balanced, flow-like covariance structure instead of being
    # spatially white).  None = white Gaussian noise.
    additive_bank: Optional[np.ndarray] = None
    # Desroziers (2005) adaptive observation error: after each analysis the
    # consistency estimate R_est = E[d_a d_b] (analysis x background obs-space
    # departures) is blended into the working R with weight ``adaptive_r_rho``
    # per cycle.  Corrects a mis-specified ``ob_error`` online — an extension;
    # the reference takes each ob's error at face value
    # (efa_xray/assimilation/ensrf.py:62).
    adaptive_r: bool = False
    adaptive_r_rho: float = 0.2
    adaptive_r_floor: float = 1e-6
    # Incremental analysis update (Bloom et al. 1996, MWR 124:1256): with
    # ``iau_steps = N > 0``, ``run()`` treats ``forecast`` as ONE substep
    # and integrates N substeps per cycle; the per-member analysis
    # increment from each cycle is NOT inserted directly but applied as a
    # constant ``increment / N`` forcing after each substep of the NEXT
    # cycle's forecast window, suppressing the insertion shock that
    # excites spurious fast modes.  For a linear (e.g. identity) model the
    # fully-applied increment reproduces direct insertion exactly.
    # 0 (default) = classic direct insertion — reference behavior
    # (the reference has no cycling driver at all; SURVEY.md §1.5).
    iau_steps: int = 0
    # Online observation bias correction: estimate the per-row mean
    # innovation with an exponential running mean and subtract it from the
    # incoming observations before assimilation (the simplest form of the
    # bias correction every operational system runs for satellite
    # radiances, e.g. Dee 2005 variational BC's constant-predictor limit).
    # Assumes an unbiased background on average, so persistent innovation
    # bias is attributed to the obs.  The reference assimilates biased obs
    # at face value (efa_xray/assimilation/ensrf.py:86).
    adaptive_bias: bool = False
    adaptive_bias_rho: float = 0.1
    # Fixed-lag ensemble Kalman smoother (Evensen & van Leeuwen 2000): with
    # ``smoother_lag = L > 0`` the analyses of the previous L cycles ride
    # along as extra state rows in each update, so current observations
    # re-analyze them through CROSS-TIME ensemble covariances — the same
    # augmented-row mechanism the reference uses for obs-space priors
    # (efa_xray/assimilation/assimilation.py:146-150), extended backward in
    # time (EFA itself is within-trajectory smoothing; this smooths across
    # cycle boundaries).  A state ages out of the window after receiving L
    # future-obs updates; ``smoothed_rmse()`` reports its final accuracy.
    # Requires identity-pick ``obs_operator_rows``.  0 = off (filter only).
    smoother_lag: int = 0

    def inflation_field(self) -> Optional[np.ndarray]:
        """Current adaptive variance-inflation field (None before first use)."""
        lam = getattr(self, "_lam", None)
        return None if lam is None else np.asarray(lam)

    def estimated_r(self) -> Optional[float]:
        """Current working obs-error variance under ``adaptive_r`` (None
        before the first analysis)."""
        r = getattr(self, "_r_work", None)
        return None if r is None else float(r)

    def estimated_bias(self) -> Optional[np.ndarray]:
        """Current per-observation-row bias estimate under
        ``adaptive_bias`` (None before the first analysis)."""
        b = getattr(self, "_bias_work", None)
        return None if b is None else np.asarray(b)

    def smoothed_rmse(self) -> List[tuple]:
        """``(cycle, rmse)`` of each state that aged out of the smoother
        window, i.e. after receiving all ``smoother_lag`` future-obs
        updates (empty before the window first fills)."""
        return list(getattr(self, "_smoothed_rmse", []))

    def _apply_prior_inflation(self, ens):
        """Static + adaptive prior inflation on a flat ``[M, nvars]``
        ensemble; returns ``(ensemble, lambda_field_or_None)``."""
        lam = None
        if self.inflation is not None:
            mean = jnp.mean(ens, axis=0)
            ens = mean + self.inflation * (ens - mean)
        if self.adaptive_inflation:
            lam = getattr(self, "_lam", None)
            if lam is None:
                lam = jnp.ones(ens.shape[1], dtype=ens.dtype)
            mean = jnp.mean(ens, axis=0)
            ens = mean + jnp.sqrt(lam)[None, :] * (ens - mean)
        if self.additive_sigma > 0.0:
            rng = getattr(self, "_rng", None)
            if rng is None:
                rng = self._rng = np.random.default_rng(0)
            if self.additive_bank is not None:
                bank = np.asarray(self.additive_bank, dtype=np.float64)
                pick = rng.integers(0, bank.shape[0], ens.shape[0])
                noise = self.additive_sigma * bank[pick]
            else:
                noise = rng.normal(0.0, self.additive_sigma, ens.shape)
            noise -= noise.mean(axis=0, keepdims=True)  # mean-preserving
            ens = ens + jnp.asarray(noise, dtype=ens.dtype)
        return ens, lam

    def analysis_step(self, ensemble, values, ob_lats, ob_lons):
        """One analysis on a flat ensemble ``[nmems, nvars]``.

        With ``smoother_lag > 0`` and a non-empty lag window, the lagged
        ensembles are appended as extra state rows and re-analyzed by the
        same observations through cross-time covariances (fixed-lag EnKS);
        the returned ensemble is the current-time analysis only.
        """
        dtype = jnp.dtype(self.config.dtype)
        ens = jnp.asarray(ensemble, dtype=dtype)
        ens, lam = self._apply_prior_inflation(ens)
        lagged = (
            list(getattr(self, "_lag_buffer", []))
            if self.smoother_lag > 0
            else []
        )
        if lagged:
            if self.obs_operator is not None:
                raise ValueError(
                    "smoother_lag requires identity-pick obs_operator_rows "
                    "(a custom obs_operator sees only the current-time "
                    "ensemble)"
                )
            nv = int(ens.shape[1])
            ens_full = jnp.concatenate(
                [ens] + [jnp.asarray(l, dtype=dtype) for l in lagged], axis=1
            )
            lats = np.tile(np.asarray(self.state_lats), 1 + len(lagged))
            lons = np.tile(np.asarray(self.state_lons), 1 + len(lagged))
        else:
            ens_full, lats, lons = ens, self.state_lats, self.state_lons
        out, diags = self._analysis_core(
            ens_full, lam, values, ob_lats, ob_lons, lats, lons
        )
        if lagged:
            self._lag_buffer = [
                out[:, (i + 1) * nv : (i + 2) * nv] for i in range(len(lagged))
            ]
            out = out[:, :nv]
        return out, diags

    def _analysis_core(
        self, ens, lam, values, ob_lats, ob_lons, state_lats, state_lons
    ):
        """One solver pass on an (possibly lag-augmented) flat ensemble."""
        dtype = jnp.dtype(self.config.dtype)
        sv = ens.T  # [nvars, nmems]
        bm = jnp.mean(sv, axis=1)
        bp = sv - bm[:, None]
        if self.obs_operator is not None:
            ye = jnp.asarray(self.obs_operator(ens), dtype=dtype)
        else:
            ye = sv[jnp.asarray(self.obs_operator_rows)]
        tm = jnp.mean(ye, axis=1)
        tp = ye - tm[:, None]
        nobs = ye.shape[0]
        r_work = (
            getattr(self, "_r_work", self.ob_error)
            if self.adaptive_r
            else self.ob_error
        )
        obs = core.ObsArrays(
            values=jnp.asarray(values, dtype=dtype),
            errors=jnp.full(nobs, r_work, dtype=dtype),
            lats=jnp.asarray(ob_lats, dtype=dtype),
            lons=jnp.asarray(ob_lons, dtype=dtype),
            radii=jnp.full(nobs, self.localize_radius, dtype=dtype),
            assim=jnp.ones(nobs, dtype=bool),
        )
        if self.solver == "letkf":
            from efa_xray_tpu.assimilation import letkf_core

            bm2, bp2, tm2, tp2, diags = letkf_core.letkf_update(
                bm, bp, tm, tp,
                jnp.asarray(state_lats, dtype=dtype),
                jnp.asarray(state_lons, dtype=dtype),
                obs,
                ngrid=int(bm.shape[0]),
                patch_size=self.config.letkf_patch_size,
                k_obs=self.config.letkf_k_obs,
                localize=self.config.localize,
                sqrt_method=self.config.letkf_sqrt,
                ns_iters=self.config.letkf_ns_iters,
                chunk=self.config.letkf_chunk,
            )
        elif self.solver == "enkf":
            from efa_xray_tpu.assimilation.enkf import (
                draw_ob_perturbations,
                enkf_serial,
            )

            cycle_no = getattr(self, "_enkf_cycle", 0)
            self._enkf_cycle = cycle_no + 1
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.enkf_seed), cycle_no
            )
            eps = draw_ob_perturbations(key, obs.errors, sv.shape[1])
            bm2, bp2, tm2, tp2, diags = enkf_serial(
                bm, bp, tm, tp,
                jnp.asarray(state_lats, dtype=dtype),
                jnp.asarray(state_lons, dtype=dtype),
                obs,
                eps,
                localize=self.config.localize,
                unbiased=self.config.unbiased_variance,
            )
        else:
            bm2, bp2, tm2, tp2, diags = core.ensrf_blocked(
                bm, bp, tm, tp,
                jnp.asarray(state_lats, dtype=dtype),
                jnp.asarray(state_lons, dtype=dtype),
                obs,
                localize=self.config.localize,
                block_size=min(self.config.block_size, max(nobs, 1)),
                unbiased=self.config.unbiased_variance,
            )
        if self.config.rtps_alpha > 0.0:
            from efa_xray_tpu.assimilation.adaptive_inflation import (
                row_spread,
                rtps,
            )

            bp2 = rtps(row_spread(bp), bp2, self.config.rtps_alpha)
        if self.config.rtpp_alpha > 0.0:
            from efa_xray_tpu.assimilation.adaptive_inflation import rtpp

            bp2 = rtpp(bp, bp2, self.config.rtpp_alpha)
        if self.adaptive_inflation:
            from efa_xray_tpu.assimilation.adaptive_inflation import (
                update_inflation_rows,
            )

            lam_sd = (
                getattr(self, "_lam_sd", None)
                if self.adaptive_sd_evolve
                else None
            )
            if lam_sd is None:
                lam_sd = jnp.asarray(self.adaptive_sd, dtype=dtype)
            out = update_inflation_rows(
                lam,
                lam_sd,
                jnp.asarray(self.state_lats, dtype=dtype),
                jnp.asarray(self.state_lons, dtype=dtype),
                obs.lats,
                obs.lons,
                obs.radii,
                obs.values - diags.prior_mean.astype(dtype),
                diags.prior_var.astype(dtype),
                obs.errors,
                obs.assim,
                lambda_min=self.adaptive_min,
                lambda_max=self.adaptive_max,
                evolve_sd=self.adaptive_sd_evolve,
                sd_min=self.adaptive_sd_min,
            )
            if self.adaptive_sd_evolve:
                self._lam, self._lam_sd = out
            else:
                self._lam = out
            if self.adaptive_damp < 1.0:
                self._lam = 1.0 + self.adaptive_damp * (self._lam - 1.0)
        if self.adaptive_r:
            # Desroziers: E[d_a d_b] estimates R when B and R are correctly
            # specified; blend it in with a per-cycle relaxation so one
            # noisy batch cannot destabilize the filter.
            d_b = np.asarray(values, np.float64) - np.asarray(
                diags.prior_mean, np.float64
            )
            d_a = np.asarray(values, np.float64) - np.asarray(
                diags.post_mean, np.float64
            )
            r_est = float(np.mean(d_a * d_b))
            if np.isfinite(r_est) and r_est > 0:
                self._r_work = max(
                    (1.0 - self.adaptive_r_rho) * float(r_work)
                    + self.adaptive_r_rho * r_est,
                    self.adaptive_r_floor,
                )
        return (bm2[:, None] + bp2).T, diags

    # Transient per-run state, reset by a fresh ``run()`` and persisted by
    # ``save_checkpoint``/``load_checkpoint``.
    _TRANSIENT = (
        "_lam", "_lam_sd", "_r_work", "_bias_work", "_enkf_cycle",
        "_iau_increment",
        "_lag_buffer", "_truth_history", "_smoothed_rmse", "_cycle_offset",
        "_final_ensemble", "_final_truth",
    )

    def save_checkpoint(self, path) -> None:
        """Persist the complete cycling state after a ``run()`` segment —
        ensemble, truth, RNG state, adaptive fields (inflation, R, bias),
        IAU increment and the smoother window — so cycling resumes
        EXACTLY: ``run(None, None, ncycles, resume=True)`` after
        ``load_checkpoint`` reproduces an uninterrupted run bit-for-bit
        (tested).  The harness configuration itself is not stored;
        reconstruct the harness with the same arguments, then load.
        Extends the reference's checkpointing (state + inflation netCDF
        round-trips, SURVEY.md §5.4) to the whole cycling loop."""
        import pickle

        state = {"rng_state": self._rng.bit_generator.state}
        for k in self._TRANSIENT:
            if hasattr(self, k):
                state[k] = getattr(self, k)
        state["_final_ensemble"] = np.asarray(self._final_ensemble)
        state["_final_truth"] = np.asarray(self._final_truth)
        if "_lag_buffer" in state:
            state["_lag_buffer"] = [np.asarray(x) for x in state["_lag_buffer"]]
        if "_iau_increment" in state:
            state["_iau_increment"] = np.asarray(state["_iau_increment"])
        if "_lam" in state and state["_lam"] is not None:
            state["_lam"] = np.asarray(state["_lam"])
        if "_lam_sd" in state and state["_lam_sd"] is not None:
            state["_lam_sd"] = np.asarray(state["_lam_sd"])
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, path) -> None:
        """Restore the state written by :meth:`save_checkpoint` into this
        (identically configured) harness; continue with
        ``run(None, None, ncycles, resume=True)``."""
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        rng = np.random.default_rng()
        rng.bit_generator.state = state.pop("rng_state")
        self._rng = rng
        for k in self._TRANSIENT:
            if k in state:
                setattr(self, k, state[k])
            elif hasattr(self, k):
                delattr(self, k)

    def run(
        self,
        ensemble,
        truth,
        ncycles: int,
        obs_every: Optional[np.ndarray] = None,
        seed: int = 0,
        obs_noise_var: Optional[float] = None,
        obs_bias: float = 0.0,
        resume: bool = False,
    ) -> List[CycleStats]:
        """Cycle against a known truth trajectory: forecast both, observe
        the truth with noise, assimilate, record statistics.

        ``obs_noise_var`` sets the TRUE variance of the synthetic obs noise
        (default: ``ob_error``).  Passing a different value deliberately
        mis-specifies the filter's assigned R — the regime ``adaptive_r``
        is designed to correct.  ``obs_bias`` adds a constant systematic
        error to every synthetic observation — the regime
        ``adaptive_bias`` is designed to correct.

        ``resume=True`` continues a previous segment (either still in
        memory or restored via :meth:`load_checkpoint`): RNG, cycle
        numbering, adaptive fields and the smoother window carry over,
        and ``ensemble``/``truth`` may be ``None`` to pick up the saved
        ones.  A fresh run (``resume=False``) resets all of that.
        """
        if resume:
            if not hasattr(self, "_rng"):
                raise ValueError(
                    "resume=True needs a previous run() segment or "
                    "load_checkpoint()"
                )
            rng = self._rng
            if ensemble is None:
                ensemble = self._final_ensemble
            if truth is None:
                truth = self._final_truth
            offset = getattr(self, "_cycle_offset", 0)
        else:
            rng = np.random.default_rng(seed)
            offset = 0
            for k in self._TRANSIENT:
                if hasattr(self, k):
                    delattr(self, k)
        self._rng = rng
        if obs_every is None and self.obs_operator_rows is None:
            raise ValueError(
                "run() synthesizes observations by sampling the truth at "
                "identity-pick rows; provide obs_operator_rows (or "
                "obs_every).  A general obs_operator can be used for the "
                "ensemble side via analysis_step(), but truth sampling "
                "still needs row indices."
            )
        rows = (
            np.asarray(obs_every)
            if obs_every is not None
            else np.asarray(self.obs_operator_rows)
        )
        stats: List[CycleStats] = []
        for c in range(offset, offset + ncycles):
            if self.iau_steps > 0:
                # IAU: distribute the previous cycle's analysis increment
                # evenly over this window's substeps (truth is never forced).
                inc = getattr(self, "_iau_increment", None)
                frac = None if inc is None else inc / self.iau_steps
                for _ in range(self.iau_steps):
                    truth = self.forecast(truth)
                    ensemble = self.forecast(ensemble)
                    if frac is not None:
                        ensemble = ensemble + frac
            else:
                truth = self.forecast(truth)
                ensemble = self.forecast(ensemble)
            bg_rmse = float(
                jnp.sqrt(jnp.mean((jnp.mean(ensemble, axis=0) - truth) ** 2))
            )
            if not np.isfinite(bg_rmse):
                # Fail loudly instead of cycling NaNs: a non-finite
                # background means the forecast diverged (typically a
                # member thrown off the model attractor by too-aggressive
                # inflation), and every later cycle would silently report
                # NaN statistics (SURVEY.md §5.3 failure-detection stance).
                raise RuntimeError(
                    f"forecast diverged at cycle {c}: non-finite background "
                    "ensemble.  Reduce inflation (adaptive_sd / inflation / "
                    "additive_sigma) or the cycle length."
                )
            yobs = obs_bias + np.asarray(truth)[rows] + rng.normal(
                0,
                np.sqrt(
                    self.ob_error if obs_noise_var is None else obs_noise_var
                ),
                len(rows),
            )
            self.obs_operator_rows = rows
            y_in = yobs
            if self.adaptive_bias:
                bias = getattr(self, "_bias_work", np.zeros(len(rows)))
                y_in = yobs - bias
            analysis, diags = self.analysis_step(
                ensemble, y_in, self.state_lats[rows], self.state_lons[rows]
            )
            if self.adaptive_bias:
                # Running-mean innovation against the RAW obs: persistent
                # nonzero mean = obs bias (background assumed unbiased).
                innov = np.asarray(yobs, np.float64) - np.asarray(
                    diags.prior_mean, np.float64
                )
                self._bias_work = (
                    (1.0 - self.adaptive_bias_rho) * bias
                    + self.adaptive_bias_rho * innov
                )
            if self.iau_steps > 0:
                # Per-member increments; the carried state stays on the
                # background trajectory and absorbs them gradually next
                # window.  Stats report the analysis TARGET at this time.
                self._iau_increment = jnp.asarray(analysis) - jnp.asarray(
                    ensemble, dtype=jnp.asarray(analysis).dtype
                )
            else:
                ensemble = analysis
            if self.smoother_lag > 0:
                # Push this cycle's analysis into the lag window (the
                # analysis_step above already re-smoothed the existing
                # entries with this cycle's obs); a state leaving the
                # window is final — score it against its own-time truth.
                buf = [jnp.asarray(analysis)] + list(
                    getattr(self, "_lag_buffer", [])
                )
                hist = [np.asarray(truth).copy()] + list(
                    getattr(self, "_truth_history", [])
                )
                if len(buf) > self.smoother_lag:
                    done, truth_done = buf.pop(), hist.pop()
                    rmse = float(
                        np.sqrt(
                            np.mean(
                                (
                                    np.mean(np.asarray(done), axis=0)
                                    - truth_done
                                )
                                ** 2
                            )
                        )
                    )
                    self._smoothed_rmse = getattr(
                        self, "_smoothed_rmse", []
                    ) + [(c - self.smoother_lag, rmse)]
                self._lag_buffer = buf
                self._truth_history = hist
            an_rmse = float(
                jnp.sqrt(jnp.mean((jnp.mean(analysis, axis=0) - truth) ** 2))
            )
            an_crps = _crps_mean(np.asarray(analysis), np.asarray(truth))
            spread = float(jnp.mean(jnp.std(analysis, axis=0)))
            pm = np.asarray(diags.prior_mean)
            om = np.asarray(diags.post_mean)
            stats.append(
                CycleStats(
                    cycle=c,
                    analysis_rmse=an_rmse,
                    background_rmse=bg_rmse,
                    mean_spread=spread,
                    obs_prior_rmse=float(np.sqrt(np.mean((yobs - pm) ** 2))),
                    obs_post_rmse=float(np.sqrt(np.mean((yobs - om) ** 2))),
                    analysis_crps=an_crps,
                )
            )
        self._final_ensemble = ensemble
        self._final_truth = truth
        self._cycle_offset = offset + ncycles
        return stats
