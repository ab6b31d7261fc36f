"""Cycling-DA integration test on Lorenz-96 (BASELINE.md config 1).

The canonical EnKF sanity check: cycling assimilation of noisy obs of a
chaotic L96 truth must keep the analysis RMSE well below the observation
error, and far below the free-running (no DA) ensemble error.
"""

import numpy as np

import jax
import jax.numpy as jnp

from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.models import lorenz96 as l96


def _obs_arrays(values, errors, lats, lons, radii, assim):
    return core.ObsArrays(
        values=jnp.asarray(values),
        errors=jnp.asarray(errors),
        lats=jnp.asarray(lats),
        lons=jnp.asarray(lons),
        radii=jnp.asarray(radii),
        assim=jnp.asarray(assim),
    )


def test_l96_dynamics_conserve_shape_and_are_chaotic():
    truth, ens = l96.spinup_ensemble(nvars=40, nmems=20, seed=0)
    assert truth.shape == (40,)
    assert ens.shape == (20, 40)
    # Chaos: two nearby states diverge
    x2 = truth + 1e-4
    a = l96.integrate(truth, nsteps=200)
    b = l96.integrate(x2, nsteps=200)
    assert float(jnp.abs(a - b).max()) > 0.1


def test_l96_cycling_da_beats_free_run():
    nvars, nmems, ncycles = 40, 20, 30
    steps_per_cycle = 4  # 0.2 model-time units
    ob_err = 1.0
    rng = np.random.default_rng(42)

    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=1)
    free = ens
    lats, lons = l96.fake_latlon(nvars)
    # ~4000 km halfwidth on the L96 ring (40 points around the equator)
    radii_val = 4000.0

    obs_idx = np.arange(0, nvars, 2)  # observe every other variable
    nobs = len(obs_idx)

    analysis_rmse = []
    free_rmse = []
    for cycle in range(ncycles):
        truth = l96.integrate(truth, nsteps=steps_per_cycle)
        ens = l96.integrate(ens, nsteps=steps_per_cycle)
        free = l96.integrate(free, nsteps=steps_per_cycle)

        yobs = np.asarray(truth)[obs_idx] + rng.normal(0, np.sqrt(ob_err), nobs)

        # identity-pick H on the observed variables: tail = ens[:, obs_idx]
        state_vect = jnp.asarray(ens).T  # [nvars, nmems]
        body_mean = jnp.mean(state_vect, axis=1)
        body_perts = state_vect - body_mean[:, None]
        ye = state_vect[obs_idx]
        tail_mean = jnp.mean(ye, axis=1)
        tail_perts = ye - tail_mean[:, None]

        obs_arr = _obs_arrays(
            yobs,
            np.full(nobs, ob_err),
            lats[obs_idx],
            lons[obs_idx],
            np.full(nobs, radii_val),
            np.ones(nobs, dtype=bool),
        )
        bm, bp, _, _, diags = core.ensrf_blocked(
            body_mean,
            body_perts,
            tail_mean,
            tail_perts,
            jnp.asarray(lats),
            jnp.asarray(lons),
            obs_arr,
            localize=True,
            block_size=8,
        )
        ens = (bm[:, None] + bp).T  # back to [nmems, nvars]

        analysis_rmse.append(
            float(jnp.sqrt(jnp.mean((jnp.mean(ens, axis=0) - truth) ** 2)))
        )
        free_rmse.append(
            float(jnp.sqrt(jnp.mean((jnp.mean(free, axis=0) - truth) ** 2)))
        )

    tail_a = np.mean(analysis_rmse[-10:])
    tail_f = np.mean(free_rmse[-10:])
    # Converged analysis must beat observation error and crush the free run.
    assert tail_a < np.sqrt(ob_err), f"analysis RMSE {tail_a} too high"
    assert tail_a < 0.5 * tail_f, f"DA ({tail_a}) not beating free run ({tail_f})"
    assert np.isfinite(analysis_rmse).all()


def test_cycling_harness_api():
    """The generic CyclingHarness drives L96 to sub-obs-error analyses."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=2)
    lats, lons = l96.fake_latlon(nvars)
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05,
    )
    stats = harness.run(ens, truth, ncycles=25)
    tail = np.mean([s.analysis_rmse for s in stats[-8:]])
    assert tail < 1.0, f"analysis RMSE {tail}"
    # analysis must improve on the background every late cycle on average
    gain = np.mean(
        [s.background_rmse - s.analysis_rmse for s in stats[-8:]]
    )
    assert gain > 0
    # obs-space posterior closer to obs than prior
    assert stats[-1].obs_post_rmse < stats[-1].obs_prior_rmse
    # per-cycle CRPS: finite, positive, and bounded by the deterministic
    # limit |mean - truth| <= CRPS <= mean|member - truth| per row means
    # the MEAN CRPS of a converged system sits below the analysis RMSE
    crps_tail = np.mean([s.analysis_crps for s in stats[-8:]])
    assert 0 < crps_tail < tail
    # brute-force oracle on the final ensemble
    ens_f = np.asarray(harness._final_ensemble)
    tr_f = np.asarray(harness._final_truth)
    mae = np.mean(np.abs(ens_f - tr_f[None, :]))
    pair = np.mean(
        np.abs(ens_f[:, None, :] - ens_f[None, :, :])
    )
    from efa_xray_tpu.models.cycling import _crps_mean

    np.testing.assert_allclose(
        _crps_mean(ens_f, tr_f), mae - 0.5 * pair, rtol=1e-12
    )


def test_l96_cycling_with_letkf_solver():
    """The LETKF solver must hold the cycling analysis below observation
    error just like the EnSRF (same harness, solver='letkf')."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=3)
    lats, lons = l96.fake_latlon(nvars)
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        solver="letkf",
        config=FilterConfig(localization="GC", dtype="float64",
                            letkf_k_obs=20, letkf_chunk=40),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05,
    )
    stats = harness.run(ens, truth, ncycles=25)
    tail = np.mean([s.analysis_rmse for s in stats[-8:]])
    assert tail < 1.0, f"LETKF analysis RMSE {tail}"
    assert stats[-1].obs_post_rmse < stats[-1].obs_prior_rmse
    assert np.isfinite([s.analysis_rmse for s in stats]).all()


def test_adaptive_inflation_cycles_beat_fixed_inflation():
    """VERDICT r1 item 7: with a small (underdispersed) ensemble, cycling
    with Anderson-2009 adaptive inflation must beat both no inflation and
    an untuned fixed factor, and keep the spread from collapsing."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems, ncycles, seed = 40, 10, 50, 2
    lats, lons = l96.fake_latlon(nvars)

    def run(**kw):
        truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=seed)
        h = CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats, state_lons=lons, ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            **kw,
        )
        stats = h.run(ens, truth, ncycles=ncycles, seed=seed + 100)
        rmse = np.mean([s.analysis_rmse for s in stats[-15:]])
        spread = np.mean([s.mean_spread for s in stats[-15:]])
        return rmse, spread, h

    rmse_none, spread_none, _ = run()
    rmse_fixed, _, _ = run(inflation=1.05)
    rmse_adapt, spread_adapt, h = run(adaptive_inflation=True)

    # measured: none ~2.5, fixed(1.05) ~1.7, adaptive ~0.8
    assert rmse_adapt < 0.7 * rmse_none, (rmse_adapt, rmse_none)
    assert rmse_adapt < rmse_fixed, (rmse_adapt, rmse_fixed)
    # spread recovery: adaptive keeps the ensemble better dispersed
    assert spread_adapt > spread_none
    lam = h.inflation_field()
    assert lam is not None and lam.max() > 1.05 and lam.min() >= 1.0 - 1e-12


def test_adaptive_r_recovers_misspecified_ob_error():
    """Desroziers-feedback adaptive R: start the filter with a 16x
    UNDER-specified obs-error variance (0.25 assigned vs 4.0 true); the
    working R must climb toward the true value and the late-cycle analysis
    must beat the fixed mis-specified run.  Extension — the reference takes
    each ob's error at face value (efa_xray/assimilation/ensrf.py:62)."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems, ncycles, seed = 40, 20, 60, 4
    lats, lons = l96.fake_latlon(nvars)
    true_var, assigned = 4.0, 0.25

    def run(**kw):
        truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=seed)
        h = CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats, state_lons=lons, ob_error=assigned,
            localize_radius=4000.0, inflation=1.05,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            **kw,
        )
        stats = h.run(ens, truth, ncycles=ncycles, seed=seed + 7,
                      obs_noise_var=true_var)
        rmse = np.mean([s.analysis_rmse for s in stats[-20:]])
        return rmse, h

    rmse_fixed, _ = run()
    rmse_adapt, h = run(adaptive_r=True)

    r_learned = h.estimated_r()
    assert r_learned is not None
    # learned R moves most of the way from 0.25 to 4.0
    assert r_learned > 1.0, r_learned
    assert rmse_adapt < rmse_fixed, (rmse_adapt, rmse_fixed)


def test_iau_identity_model_matches_direct_insertion():
    """For a linear (identity) model the fully-applied IAU increment
    reproduces direct insertion exactly (Bloom et al. 1996 property)."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    _, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=5)
    truth = np.asarray(ens)[0] + 0.5
    lats, lons = l96.fake_latlon(nvars)

    def make(iau_steps):
        return CyclingHarness(
            forecast=lambda x: x,  # identity model: IAU must be exact
            state_lats=lats,
            state_lons=lons,
            ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(
                localization="GC", dtype="float64", block_size=8
            ),
            obs_operator_rows=np.arange(0, nvars, 2),
            iau_steps=iau_steps,
        )

    direct = make(0)
    iau = make(4)
    stats_d = direct.run(np.asarray(ens).copy(), truth.copy(), ncycles=6,
                         seed=3)
    stats_i = iau.run(np.asarray(ens).copy(), truth.copy(), ncycles=6,
                      seed=3)
    # identical obs sequence + identity model => identical analysis targets
    np.testing.assert_allclose(
        [s.analysis_rmse for s in stats_i],
        [s.analysis_rmse for s in stats_d],
        rtol=1e-10,
    )
    # and the carried background absorbs the increment exactly: next
    # cycle's background == previous cycle's analysis == direct run's
    np.testing.assert_allclose(
        [s.background_rmse for s in stats_i[1:]],
        [s.analysis_rmse for s in stats_d[:-1]],
        rtol=1e-10,
    )


def test_iau_cycles_remain_stable_on_l96():
    """IAU cycling on the real L96 dynamics stays on the attractor and
    tracks the truth (no insertion-shock divergence)."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=6)
    lats, lons = l96.fake_latlon(nvars)
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=1),  # one substep
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05,
        iau_steps=4,  # 4 substeps/cycle = same window as nsteps=4 direct
    )
    stats = harness.run(ens, truth, ncycles=25)
    tail = np.mean([s.analysis_rmse for s in stats[-8:]])
    # IAU trades a little accuracy for shock suppression (increments land
    # one window late): expect worse than direct insertion (~0.9 here) but
    # far below the free-run / climatological spread (~3.6 for L96 F=8).
    assert tail < 2.2, f"IAU analysis RMSE {tail}"
    assert np.isfinite(tail)


def test_fixed_lag_smoother_beats_filter_analysis():
    """Fixed-lag EnKS (smoother_lag > 0): a state re-analyzed by L cycles
    of FUTURE observations must beat the filter analysis it started as
    (the textbook smoother gain; Evensen & van Leeuwen 2000)."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=9)
    lats, lons = l96.fake_latlon(nvars)
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05,
        smoother_lag=2,
    )
    stats = harness.run(ens, truth, ncycles=40)
    smoothed = harness.smoothed_rmse()
    assert len(smoothed) == 40 - 2
    # skip the spin-up cycles; compare smoothed vs filter RMSE per cycle
    pairs = [(c, r) for (c, r) in smoothed if c >= 10]
    filt = {s.cycle: s.analysis_rmse for s in stats}
    sm_mean = np.mean([r for _, r in pairs])
    filt_mean = np.mean([filt[c] for c, _ in pairs])
    assert sm_mean < filt_mean, (
        f"smoother {sm_mean:.3f} should beat filter {filt_mean:.3f}"
    )


def test_smoother_with_iau_combination():
    """smoother_lag and iau_steps compose: the lag window holds analysis
    TARGETS while the carried state absorbs increments gradually."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=12)
    lats, lons = l96.fake_latlon(nvars)
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=1),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05,
        iau_steps=4,
        smoother_lag=2,
    )
    stats = harness.run(ens, truth, ncycles=20)
    assert np.isfinite([s.analysis_rmse for s in stats]).all()
    sm = harness.smoothed_rmse()
    assert len(sm) == 18
    assert np.isfinite([r for _, r in sm]).all()
    # smoothing still tracks (well below L96 climatological ~3.6)
    assert np.mean([r for c, r in sm if c >= 8]) < 2.5


def test_adaptive_bias_recovers_biased_obs():
    """Online bias correction: cycling against obs with a constant +2
    systematic error must learn the bias and approach unbiased-obs
    accuracy; without correction the analysis is dragged off the truth."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems, ncycles, seed = 40, 20, 50, 4
    lats, lons = l96.fake_latlon(nvars)

    def run(**kw):
        truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=seed)
        h = CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats, state_lons=lons, ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            inflation=1.05,
            **kw,
        )
        stats = h.run(ens, truth, ncycles=ncycles, seed=seed + 7,
                      obs_bias=2.0)
        return np.mean([s.analysis_rmse for s in stats[-15:]]), h

    rmse_off, _ = run()
    rmse_on, h = run(adaptive_bias=True)
    assert rmse_on < rmse_off, (rmse_on, rmse_off)
    assert rmse_on < 1.3, f"bias-corrected RMSE {rmse_on}"
    b = h.estimated_bias()
    assert b is not None
    # learned bias close to the injected +2 on average
    assert 1.3 < float(np.mean(b)) < 2.7, float(np.mean(b))


def test_checkpoint_resume_matches_uninterrupted_run(tmp_path):
    """save_checkpoint / load_checkpoint + run(resume=True) reproduces an
    uninterrupted run exactly — RNG, adaptive R, bias, and the smoother
    window all carry over."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=15)
    lats, lons = l96.fake_latlon(nvars)

    def make():
        return CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats,
            state_lons=lons,
            ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            inflation=1.05,
            smoother_lag=2,
            adaptive_r=True,
            adaptive_bias=True,
        )

    hf = make()
    full = hf.run(np.asarray(ens).copy(), truth.copy(), ncycles=16,
                  seed=5, obs_bias=1.0)

    h = make()
    first = h.run(np.asarray(ens).copy(), truth.copy(), ncycles=8, seed=5,
                  obs_bias=1.0)
    ckpt = tmp_path / "cycling.ckpt"
    h.save_checkpoint(str(ckpt))

    h2 = make()
    h2.load_checkpoint(str(ckpt))
    second = h2.run(None, None, ncycles=8, obs_bias=1.0, resume=True)

    assert [s.cycle for s in first + second] == [s.cycle for s in full]
    np.testing.assert_allclose(
        [s.analysis_rmse for s in first + second],
        [s.analysis_rmse for s in full], rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        [s.obs_post_rmse for s in first + second],
        [s.obs_post_rmse for s in full], rtol=0, atol=1e-12,
    )
    # smoother window carried over exactly: the resumed harness's full
    # smoothed-RMSE history (restored segment + continuation) equals the
    # uninterrupted harness's
    assert [c for c, _ in h2.smoothed_rmse()] == [
        c for c, _ in hf.smoothed_rmse()
    ]
    np.testing.assert_allclose(
        [r for _, r in h2.smoothed_rmse()],
        [r for _, r in hf.smoothed_rmse()], rtol=0, atol=1e-12,
    )
    # adaptive fields too
    np.testing.assert_allclose(h2.estimated_r(), hf.estimated_r(),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(h2.estimated_bias(), hf.estimated_bias(),
                               rtol=0, atol=1e-12)


def test_run_without_resume_resets_state():
    """A fresh run() must not inherit smoother/adaptive state from a
    previous segment on the same harness."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 20
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=16)
    lats, lons = l96.fake_latlon(nvars)
    h = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats, state_lons=lons, ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, nvars, 2),
        inflation=1.05, smoother_lag=2,
    )
    a = h.run(np.asarray(ens).copy(), truth.copy(), ncycles=6, seed=3)
    b = h.run(np.asarray(ens).copy(), truth.copy(), ncycles=6, seed=3)
    np.testing.assert_allclose(
        [s.analysis_rmse for s in a], [s.analysis_rmse for s in b],
        rtol=0, atol=0,
    )
    assert [s.cycle for s in b] == list(range(6))


def test_additive_inflation_recovers_collapsed_ensemble():
    """The capability multiplicative inflation cannot provide (and the
    reference lacks entirely — efa_xray/assimilation/assimilation.py:52
    only scales existing perturbations): once ensemble spread collapses
    to zero, the gain is zero and the filter is stuck forever no matter
    the multiplicative factor; additive inflation
    (``CyclingHarness.additive_sigma``, Mitchell & Houtekamer 2000)
    reintroduces variance and the filter re-converges."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 16
    truth, ens0 = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=3)
    lats, lons = l96.fake_latlon(nvars)
    # collapse: every member = the (offset) ensemble mean -> zero spread
    collapsed = np.repeat(
        np.asarray(ens0).mean(axis=0, keepdims=True) + 1.0, nmems, axis=0
    )

    def run(sig=0.0, infl=None, ncycles=40):
        h = CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats, state_lons=lons, ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            inflation=infl, additive_sigma=sig,
        )
        stats = h.run(collapsed.copy(), truth.copy(), ncycles, seed=7)
        return (np.mean([s.analysis_rmse for s in stats[-10:]]),
                np.mean([s.mean_spread for s in stats[-10:]]))

    rmse_none, spread_none = run()
    rmse_mult, spread_mult = run(infl=1.5)
    rmse_add, spread_add = run(sig=0.2)
    # multiplicative on (numerically) zero spread is a no-op
    # (measured: both runs stuck at RMSE 5.38, spread ~1e-16)
    assert spread_none < 1e-12 and spread_mult < 1e-12
    np.testing.assert_allclose(rmse_mult, rmse_none, rtol=1e-9)
    # additive restores spread and re-converges (measured: 0.62 vs 5.38)
    assert spread_add > 0.1
    assert rmse_add < 1.0 < 0.3 * rmse_none


def test_additive_inflation_checkpoint_resume_bit_exact(tmp_path):
    """Additive-noise draws ride the harness RNG, so a checkpointed +
    resumed segment reproduces the uninterrupted run exactly."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems = 40, 16
    truth, ens = l96.spinup_ensemble(nvars=nvars, nmems=nmems, seed=9)
    lats, lons = l96.fake_latlon(nvars)

    def make():
        return CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats, state_lons=lons, ob_error=1.0,
            localize_radius=4000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, nvars, 2),
            additive_sigma=0.2,
        )

    h_full = make()
    full = h_full.run(np.asarray(ens).copy(), truth.copy(), ncycles=8, seed=5)

    h_a = make()
    h_a.run(np.asarray(ens).copy(), truth.copy(), ncycles=4, seed=5)
    ckpt = tmp_path / "cyc.nc"
    h_a.save_checkpoint(ckpt)
    h_b = make()
    h_b.load_checkpoint(ckpt)
    resumed = h_b.run(None, None, ncycles=4, resume=True)

    np.testing.assert_allclose(
        [s.analysis_rmse for s in full[4:]],
        [s.analysis_rmse for s in resumed], rtol=0, atol=0,
    )


def test_additive_bank_draws_carry_bank_covariance_structure():
    """``additive_bank`` replaces white noise with sampled bank rows
    (Whitaker et al. 2008's operational form), so the added perturbations
    must live in the bank's span and carry its spatial covariance —
    here a bank of smooth ring waves, whose adjacent-variable correlation
    white noise cannot produce."""
    from efa_xray_tpu.models.cycling import CyclingHarness

    nvars, nmems, nbank = 40, 200, 64
    rng = np.random.default_rng(2)
    x = 2 * np.pi * np.arange(nvars) / nvars
    # bank of smooth low-wavenumber ring waves
    bank = np.stack([
        np.cos((k % 3 + 1) * x + rng.uniform(0, 2 * np.pi))
        for k in range(nbank)
    ])
    lats, lons = l96.fake_latlon(nvars)

    def added_noise(bank_arg):
        h = CyclingHarness(
            forecast=lambda e: e,
            state_lats=lats, state_lons=lons,
            obs_operator_rows=np.arange(nvars),
            additive_sigma=0.5, additive_bank=bank_arg,
        )
        h._rng = np.random.default_rng(11)
        ens0 = jnp.zeros((nmems, nvars))
        out, _ = h._apply_prior_inflation(ens0)
        return np.asarray(out)

    structured = added_noise(bank)
    white = added_noise(None)
    for n in (structured, white):  # mean-preserving either way
        np.testing.assert_allclose(n.mean(axis=0), 0.0, atol=1e-12)
        assert n.std() > 0.1
    # adjacent-variable correlation: smooth bank ~cos(dx*k) >= cos(3*2pi/40)
    # ~ 0.89; white noise ~ 0
    def adj_corr(n):
        c = np.corrcoef(n.T)
        return np.mean(np.diag(c, k=1))
    assert adj_corr(structured) > 0.7
    assert abs(adj_corr(white)) < 0.2
