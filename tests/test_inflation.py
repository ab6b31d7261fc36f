"""Inflation: static (float/dict/file) and adaptive (Anderson 2009)."""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation.adaptive_inflation import AdaptiveInflation
from efa_xray_tpu.assimilation.assimilation import inflate_state
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.utils import ncio


def _spread(state):
    return np.asarray(state.ensemble_spread())


def test_scalar_inflation_scales_spread_preserves_mean():
    state = make_demo_state(nmems=12)
    inflated = inflate_state(state, 1.5)
    np.testing.assert_allclose(
        np.asarray(inflated.ensemble_mean()),
        np.asarray(state.ensemble_mean()),
        rtol=1e-10,
    )
    np.testing.assert_allclose(_spread(inflated), 1.5 * _spread(state), rtol=1e-10)


def test_none_inflation_is_identity():
    state = make_demo_state()
    assert inflate_state(state, None) is state


def test_dict_per_variable_inflation():
    state = make_demo_state(nvars=2, nmems=10)
    v0, v1 = state.vars()
    inflated = inflate_state(state, {v1: 2.0})
    sp0, sp1 = _spread(state)[0], _spread(state)[1]
    np.testing.assert_allclose(_spread(inflated)[0], sp0, rtol=1e-10)
    np.testing.assert_allclose(_spread(inflated)[1], 2.0 * sp1, rtol=1e-10)


def test_dict_unknown_variable_is_skipped():
    state = make_demo_state()
    inflated = inflate_state(state, {"no_such_var": 2.0})
    np.testing.assert_allclose(np.asarray(inflated.data), np.asarray(state.data))


def test_dict_per_dimension_inflation():
    state = make_demo_state(ntimes=3, nmems=10)
    factors = np.array([1.0, 2.0, 3.0])
    inflated = inflate_state(state, {"validtime": factors})
    for t, f in enumerate(factors):
        np.testing.assert_allclose(
            _spread(inflated)[:, t], f * _spread(state)[:, t], rtol=1e-10
        )


def test_dict_dimension_length_mismatch_raises():
    from efa_xray_tpu.utils.validation import ValidationError

    state = make_demo_state(ntimes=3)
    with pytest.raises(ValidationError):
        inflate_state(state, {"validtime": np.ones(5)})


def test_file_inflation_roundtrip(tmp_path):
    state = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=8)
    s = state.structure
    path = str(tmp_path / "inflation.nc")
    fields = {
        name: (
            ("validtime", "y", "x"),
            np.full((s.ntimes, s.ny, s.nx), 1.0 + 0.5 * i),
        )
        for i, name in enumerate(s.var_names)
    }
    ncio.write_dataset(
        path,
        ncio.NcDataset(
            dims={"validtime": s.ntimes, "y": s.ny, "x": s.nx}, variables=fields
        ),
    )
    inflated = inflate_state(state, path)
    np.testing.assert_allclose(_spread(inflated)[0], _spread(state)[0], rtol=1e-10)
    np.testing.assert_allclose(
        _spread(inflated)[1], 1.5 * _spread(state)[1], rtol=1e-10
    )


def test_ensrf_with_inflation_runs_and_increases_prior_var():
    state = make_demo_state(nmems=15)
    obs = make_demo_obs(state, nobs=4, radius=1500.0)
    plain = EnSRF(state, list(obs), verbose=False, loc="GC")
    plain.update()
    inflated = EnSRF(state, list(obs), inflation=1.4, verbose=False, loc="GC")
    inflated.update()
    assert (inflated.obs.prior_var > plain.obs.prior_var).all()


# --- adaptive inflation ------------------------------------------------------


def test_adaptive_build_and_apply():
    state = make_demo_state(nmems=10)
    adapt = AdaptiveInflation(state, ("adaptive", "/nonexistent/file.nc", (1.2, 0.3)))
    assert set(adapt.mean) == set(state.vars())
    np.testing.assert_allclose(adapt.mean[state.vars()[0]], 1.2)
    # lambda is a VARIANCE multiplier (Anderson 2009), so the spread
    # scales by sqrt(lambda) — see AdaptiveInflation.inflate_state.
    inflated = adapt.inflate_state(state)
    np.testing.assert_allclose(
        _spread(inflated), np.sqrt(1.2) * _spread(state), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(inflated.ensemble_mean()),
        np.asarray(state.ensemble_mean()),
        rtol=1e-10,
    )


def test_adaptive_save_load_roundtrip(tmp_path):
    state = make_demo_state(nmems=8)
    adapt = AdaptiveInflation(state, ("adaptive", "/nonexistent.nc", (1.1, 0.2)))
    path = str(tmp_path / "prior_inflation.nc")
    adapt.mean[state.vars()[0]][0, 0, 0] = 1.7  # make it nonuniform
    adapt.save_to_disk(path)
    adapt2 = AdaptiveInflation(state, ("adaptive", path, (9.9, 9.9)))
    np.testing.assert_allclose(
        adapt2.mean[state.vars()[0]], adapt.mean[state.vars()[0]]
    )
    np.testing.assert_allclose(adapt2.std[state.vars()[0]], 0.2)


def test_anderson_update_raises_inflation_for_large_innovations():
    """A string of too-large innovations must raise inflation near the obs;
    consistent innovations must leave it ~unchanged (Anderson 2009)."""
    state = make_demo_state(ny=10, nx=10, nmems=10)
    adapt = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    v = state.vars()[0]
    nobs = 8
    lats = np.full(nobs, 46.0)
    lons = np.full(nobs, 237.0)
    radii = np.full(nobs, 200.0)  # support 400 km; far corner is ~700 km away
    prior_vars = np.full(nobs, 1.0)
    errs = np.full(nobs, 1.0)
    big = np.full(nobs, 4.0)  # innovations >> sqrt(varye + R) = sqrt(2)
    adapt.update_inflation(lats, lons, radii, big, prior_vars, errs)
    # nearest grid point to the obs
    d = np.asarray(state.distance_to_point(46.0, 237.0))
    iy, ix = np.unravel_index(d.argmin(), d.shape)
    assert adapt.mean[v][0, iy, ix] > 1.05
    # far corner (outside 2*radius) untouched
    far = np.unravel_index(d.argmax(), d.shape)
    assert adapt.mean[v][0, far[0], far[1]] == pytest.approx(1.0, abs=1e-9)

    # consistent innovations -> inflation shrinks back toward 1 (but stays >= 1)
    adapt2 = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.5, 0.6)))
    small = np.full(nobs, 0.1)
    pv = np.full(nobs, 1.0)
    adapt2.update_inflation(lats, lons, radii, small, pv, errs)
    assert adapt2.mean[v][0, iy, ix] < 1.5
    assert (adapt2.mean[v] >= 1.0 - 1e-12).all()


def test_anderson_update_lambda_max_caps_the_field():
    """``lambda_max`` clamps the learned inflation (DART runs capped;
    an unbounded field can run away on a burst of large innovations and
    blow up the forecast model)."""
    state = make_demo_state(ny=10, nx=10, nmems=10)
    nobs = 64
    lats = np.full(nobs, 46.0)
    lons = np.full(nobs, 237.0)
    radii = np.full(nobs, 200.0)
    prior_vars = np.full(nobs, 1.0)
    errs = np.full(nobs, 1.0)
    # Innovations large enough to drive inflation up each ob, but small
    # enough that the Gaussian likelihood does not underflow (which makes
    # the update a no-op through the safe-guard in _anderson_update).
    huge = np.full(nobs, 4.0)

    free = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.8)))
    free.update_inflation(lats, lons, radii, huge, prior_vars, errs)
    capped = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.8)))
    capped.update_inflation(
        lats, lons, radii, huge, prior_vars, errs, lambda_max=2.0
    )
    v = state.vars()[0]
    assert free.mean[v].max() > 2.0  # the burst really does exceed the cap
    assert capped.mean[v].max() <= 2.0 + 1e-9
    assert capped.mean[v].min() >= 1.0 - 1e-12


def test_cycling_adaptive_max_bounds_the_field():
    """The harness plumbs ``adaptive_max`` through to the Anderson update."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models import lorenz96 as l96
    from efa_xray_tpu.models.cycling import CyclingHarness

    truth, ens = l96.spinup_ensemble(nvars=40, nmems=10, seed=3)
    lats, lons = l96.fake_latlon(40)
    h = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=0.01,  # tiny R + model error -> inflation wants to grow
        localize_radius=8000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, 40, 2),
        adaptive_inflation=True,
        adaptive_sd=0.8,
        adaptive_max=1.5,
    )
    h.run(ens, truth, ncycles=10, seed=5)
    lam = np.asarray(h._lam)
    assert lam.max() <= 1.5 + 1e-9
    assert lam.min() >= 1.0 - 1e-12


def test_adaptive_inflation_instance_as_spec():
    """EnSRF(inflation=AdaptiveInflation(...)) applies the mean field
    (the reference class existed but was never wired into the filter)."""
    state = make_demo_state(nmems=12)
    adapt = AdaptiveInflation(state, ("adaptive", "/nonexistent.nc", (1.3, 0.2)))
    filt = EnSRF(state, make_demo_obs(state, nobs=3), inflation=adapt,
                 verbose=False, loc="GC")
    plain = EnSRF(state, make_demo_obs(state, nobs=3), verbose=False, loc="GC")
    filt.update()
    plain.update()
    assert (filt.obs.prior_var > plain.obs.prior_var).all()


def test_adaptive_cycle_inflation_then_update_then_learn():
    """Full adaptive loop: inflate -> assimilate -> update inflation from
    innovations (Anderson 2009)."""
    state = make_demo_state(nmems=12, seed=3)
    adapt = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    obs = make_demo_obs(state, nobs=6, radius=500.0)
    # Exaggerate the innovations so inflation must grow
    for ob in obs:
        ob.value += 6.0
    filt = EnSRF(state, obs, inflation=adapt, verbose=False, loc="GC")
    post, batch = filt.update()
    innov = batch.values - batch.prior_mean
    adapt.update_inflation(
        batch.lats, batch.lons, batch.localize_radius,
        innov, batch.prior_var, batch.errors, assimilated=batch.assimilated,
    )
    v = state.vars()[0]
    assert adapt.mean[v].max() > 1.02  # inflation grew where obs disagreed


def test_ensrf_update_learns_adaptive_inflation_in_the_loop():
    """EnSRF(inflation=AdaptiveInflation(...)).update() must Bayesian-update
    the inflation mean field from the innovations (config option
    adaptive_inflation_update, on by default) — the reference's class never
    closed this loop."""
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(nmems=12, seed=9)
    obs = make_demo_obs(state, nobs=6, radius=500.0)
    for ob in obs:
        ob.value += 6.0  # innovations >> expected -> inflation must grow
    v = state.vars()[0]

    adapt = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    EnSRF(state, obs, inflation=adapt, verbose=False, loc="GC").update()
    assert adapt.mean[v].max() > 1.02

    frozen = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    cfg = FilterConfig(localization="GC", adaptive_inflation_update=False)
    EnSRF(state, obs, inflation=frozen, verbose=False, config=cfg).update()
    np.testing.assert_allclose(frozen.mean[v], 1.0)


def test_every_solver_learns_adaptive_inflation_in_the_loop():
    """The FilterConfig.adaptive_inflation_update contract names no solver
    restriction, so EnKF and LETKF must Bayesian-update the inflation field
    after their analyses exactly like the EnSRF does (the learning step is
    hoisted into Assimilation.maybe_update_adaptive_inflation)."""
    from efa_xray_tpu.assimilation.enkf import EnKF
    from efa_xray_tpu.assimilation.letkf import LETKF

    state = make_demo_state(nmems=12, seed=9)
    obs = make_demo_obs(state, nobs=6, radius=500.0)
    for ob in obs:
        ob.value += 6.0  # innovations >> expected -> inflation must grow
    v = state.vars()[0]

    for cls in (EnKF, LETKF):
        adapt = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
        cls(state, obs, inflation=adapt, verbose=False, loc="GC").update()
        assert adapt.mean[v].max() > 1.02, cls.__name__


# ---------------------------------------------------------------------------
# Evolved inflation std (Anderson 2009 §4 posterior-density refit)
# ---------------------------------------------------------------------------


def test_evolve_sd_rows_shrinks_near_obs_and_floors():
    """update_inflation_rows(evolve_sd=True) returns (lam, sd); the std
    shrinks where observations constrain the inflation (gamma > 0), never
    grows, stays above sd_min, and is untouched outside the localization
    support."""
    import jax.numpy as jnp

    from efa_xray_tpu.assimilation.adaptive_inflation import (
        update_inflation_rows,
    )

    nrows, nobs = 50, 12
    row_lats = np.linspace(30.0, 60.0, nrows)
    row_lons = np.full(nrows, 237.0)
    lam0 = jnp.ones(nrows, dtype=jnp.float64)
    sd0 = 0.6
    out = update_inflation_rows(
        lam0,
        jnp.asarray(sd0, dtype=jnp.float64),
        jnp.asarray(row_lats),
        jnp.asarray(row_lons),
        jnp.full(nobs, 45.0),
        jnp.full(nobs, 237.0),
        jnp.full(nobs, 200.0),  # support 400 km
        jnp.full(nobs, 4.0),    # innovations >> sqrt(varye + R)
        jnp.ones(nobs),
        jnp.ones(nobs),
        jnp.ones(nobs, dtype=bool),
        evolve_sd=True,
        sd_min=0.05,
    )
    assert isinstance(out, tuple) and len(out) == 2
    lam, sd = np.asarray(out[0]), np.asarray(out[1])
    assert lam.shape == sd.shape == (nrows,)
    # never grows, floored
    assert (sd <= sd0 + 1e-12).all()
    assert (sd >= 0.05 - 1e-12).all()
    # shrinks at the row nearest the obs cluster
    near = np.abs(row_lats - 45.0).argmin()
    assert sd[near] < sd0 - 1e-3
    # untouched far outside the 400 km support (rows at 30N / 60N are
    # >1500 km from 45N)
    assert sd[0] == pytest.approx(sd0, abs=1e-12)
    assert sd[-1] == pytest.approx(sd0, abs=1e-12)
    # and the mean field still grew near the obs
    assert lam[near] > 1.05


def test_evolve_sd_self_damps_the_mean_update():
    """The evolved (shrinking) std is the principled damping: after many
    consistent observation batches the same discordant ob moves the
    inflation mean LESS than under the fixed-sd scheme."""
    import jax.numpy as jnp

    from efa_xray_tpu.assimilation.adaptive_inflation import (
        update_inflation_rows,
    )

    def batch(lam, sd, innov, evolve):
        kw = dict(evolve_sd=evolve)
        if evolve:
            kw["sd_min"] = 0.01
        return update_inflation_rows(
            lam,
            sd,
            jnp.asarray([45.0]),
            jnp.asarray([237.0]),
            jnp.asarray([45.0]),
            jnp.asarray([237.0]),
            jnp.asarray([200.0]),
            jnp.asarray([innov]),
            jnp.asarray([1.0]),
            jnp.asarray([1.0]),
            jnp.asarray([True]),
            **kw,
        )

    lam_e = jnp.asarray([1.0], dtype=jnp.float64)
    sd_e = jnp.asarray([0.6], dtype=jnp.float64)
    lam_f = jnp.asarray([1.0], dtype=jnp.float64)
    # 20 perfectly consistent batches: evolved sd sharpens the prior
    for _ in range(20):
        lam_e, sd_e = batch(lam_e, sd_e, 1.4, evolve=True)
        lam_f = batch(lam_f, jnp.asarray(0.6), 1.4, evolve=False)
    assert float(sd_e[0]) < 0.6
    # now one large shock: the sharpened prior must damp the jump
    lam_e2, _ = batch(lam_e, sd_e, 5.0, evolve=True)
    lam_f2 = batch(lam_f, jnp.asarray(0.6), 5.0, evolve=False)
    jump_e = float(lam_e2[0] - lam_e[0])
    jump_f = float(lam_f2[0] - lam_f[0])
    assert 0.0 <= jump_e < jump_f


def test_adaptive_inflation_evolve_sd_writes_back_std():
    """AdaptiveInflation.update_inflation(evolve_sd=True) refits the std
    fields in place; without the flag they stay at their initial value."""
    state = make_demo_state(ny=10, nx=10, nmems=10)
    v = state.vars()[0]
    nobs = 8
    args = (
        np.full(nobs, 46.0),
        np.full(nobs, 237.0),
        np.full(nobs, 200.0),
        np.full(nobs, 4.0),
        np.full(nobs, 1.0),
        np.full(nobs, 1.0),
    )

    fixed = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    fixed.update_inflation(*args)
    np.testing.assert_allclose(fixed.std[v], 0.6)

    evolved = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    evolved.update_inflation(*args, evolve_sd=True, sd_min=0.05)
    d = np.asarray(state.distance_to_point(46.0, 237.0))
    iy, ix = np.unravel_index(d.argmin(), d.shape)
    assert evolved.std[v][0, iy, ix] < 0.6 - 1e-3
    assert (evolved.std[v] <= 0.6 + 1e-12).all()
    assert (evolved.std[v] >= 0.05 - 1e-12).all()
    far = np.unravel_index(d.argmax(), d.shape)
    assert evolved.std[v][0, far[0], far[1]] == pytest.approx(0.6, abs=1e-12)
    # the mean update itself still happened
    assert evolved.mean[v][0, iy, ix] > 1.05


def test_adaptive_inflation_damping_bounds_the_ratchet():
    """damp < 1 (DART inflation damping) equilibrates the mean field under
    systematically large innovations (residual ob bias / model error),
    where the undamped field ratchets upward every call — the failure
    mode that diverged the production cycled benchmark."""
    state = make_demo_state(ny=10, nx=10, nmems=10)
    v = state.vars()[0]
    nobs = 8
    args = (
        np.full(nobs, 46.0),
        np.full(nobs, 237.0),
        np.full(nobs, 2000.0),
        np.full(nobs, 4.0),   # innovations >> expected, every cycle
        np.full(nobs, 1.0),
        np.full(nobs, 1.0),
    )

    undamped = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    damped = AdaptiveInflation(state, ("adaptive", "/none.nc", (1.0, 0.6)))
    peaks_u, peaks_d = [], []
    for _ in range(12):
        undamped.update_inflation(*args)
        damped.update_inflation(*args, damp=0.8)
        peaks_u.append(float(undamped.mean[v].max()))
        peaks_d.append(float(damped.mean[v].max()))
    # undamped keeps ratcheting; damped converges to a fixed point
    assert peaks_u[-1] > peaks_u[5] + 0.05
    assert abs(peaks_d[-1] - peaks_d[-2]) < 0.01
    assert peaks_d[-1] < peaks_u[-1]
    assert (damped.mean[v] >= 1.0 - 1e-12).all()
    # and the damped field still learned something
    assert peaks_d[-1] > 1.05


def test_cycling_evolve_sd_runs_uncapped_and_checkpoints(tmp_path):
    """The harness with adaptive_sd_evolve=True (a) stays bounded WITHOUT
    the adaptive_max cap, (b) carries the per-row _lam_sd field, and (c)
    checkpoint round-trips it bit-exactly."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models import lorenz96 as l96
    from efa_xray_tpu.models.cycling import CyclingHarness

    truth, ens = l96.spinup_ensemble(nvars=40, nmems=10, seed=3)
    lats, lons = l96.fake_latlon(40)

    def make():
        return CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats,
            state_lons=lons,
            ob_error=0.5,
            localize_radius=8000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, 40, 2),
            adaptive_inflation=True,
            adaptive_sd=0.8,
            adaptive_sd_evolve=True,
            adaptive_sd_min=0.1,
        )

    h = make()
    h.run(ens, truth, ncycles=10, seed=5)
    lam = np.asarray(h._lam)
    sd = np.asarray(h._lam_sd)
    assert lam.shape == sd.shape == (40,)
    assert np.isfinite(lam).all() and lam.min() >= 1.0 - 1e-12
    assert (sd <= 0.8 + 1e-12).all() and (sd >= 0.1 - 1e-12).all()
    assert sd.min() < 0.8 - 1e-3  # the refit actually engaged

    # checkpoint resume reproduces an uninterrupted run bit-for-bit,
    # including the evolved sd field
    path = str(tmp_path / "ck.pkl")
    h.save_checkpoint(path)
    h2 = make()
    h2.load_checkpoint(path)
    stats_a = h.run(None, None, 3, resume=True)
    stats_b = h2.run(None, None, 3, resume=True)
    np.testing.assert_array_equal(np.asarray(h._lam), np.asarray(h2._lam))
    np.testing.assert_array_equal(
        np.asarray(h._lam_sd), np.asarray(h2._lam_sd)
    )
    assert [s.analysis_rmse for s in stats_a] == [
        s.analysis_rmse for s in stats_b
    ]


def test_cycling_adaptive_damp_pulls_toward_one():
    """adaptive_damp < 1 geometrically relaxes the learned field toward 1
    after each analysis (DART's inf_damping)."""
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.models import lorenz96 as l96
    from efa_xray_tpu.models.cycling import CyclingHarness

    truth, ens = l96.spinup_ensemble(nvars=40, nmems=10, seed=3)
    lats, lons = l96.fake_latlon(40)

    def run(damp):
        h = CyclingHarness(
            forecast=lambda x: l96.integrate(x, nsteps=4),
            state_lats=lats,
            state_lons=lons,
            ob_error=0.5,
            localize_radius=8000.0,
            config=FilterConfig(localization="GC", dtype="float64",
                                block_size=8),
            obs_operator_rows=np.arange(0, 40, 2),
            adaptive_inflation=True,
            adaptive_sd=0.8,
            adaptive_damp=damp,
        )
        h.run(ens, truth, ncycles=8, seed=5)
        return np.asarray(h._lam)

    lam_free = run(1.0)
    lam_damped = run(0.6)
    assert (lam_damped >= 1.0 - 1e-12).all()
    assert lam_damped.mean() < lam_free.mean()


# ---------------------------------------------------------------------------
# RTPS posterior inflation (extension: Whitaker & Hamill 2012)
# ---------------------------------------------------------------------------


def test_rtps_endpoints():
    import jax.numpy as jnp

    from efa_xray_tpu.assimilation.adaptive_inflation import row_spread, rtps

    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.normal(0, 2, (50, 10)))
    pb = pb - pb.mean(axis=1, keepdims=True)
    pa = pb * 0.4
    sb = row_spread(pb)
    # alpha=1 restores the prior spread exactly; alpha=0 is a no-op
    np.testing.assert_allclose(
        np.asarray(row_spread(rtps(sb, pa, 1.0))), np.asarray(sb), atol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(rtps(sb, pa, 0.0)), np.asarray(pa))
    # intermediate alpha interpolates the spread linearly
    got = np.asarray(row_spread(rtps(sb, pa, 0.5)))
    want = 0.5 * np.asarray(row_spread(pa)) + 0.5 * np.asarray(sb)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # zero-spread rows untouched
    pa0 = pa.at[3].set(0.0)
    np.testing.assert_array_equal(np.asarray(rtps(sb, pa0, 0.8))[3], 0.0)


def test_rtpp_endpoints():
    import jax.numpy as jnp

    from efa_xray_tpu.assimilation.adaptive_inflation import rtpp

    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.normal(0, 2, (50, 10)))
    pb = pb - pb.mean(axis=1, keepdims=True)
    pa = pb * 0.4
    # alpha=1 restores the prior perturbations exactly; alpha=0 is a no-op
    np.testing.assert_allclose(
        np.asarray(rtpp(pb, pa, 1.0)), np.asarray(pb), atol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(rtpp(pb, pa, 0.0)), np.asarray(pa))
    # intermediate alpha blends member-wise
    got = np.asarray(rtpp(pb, pa, 0.25))
    np.testing.assert_allclose(
        got, 0.75 * np.asarray(pa) + 0.25 * np.asarray(pb), atol=1e-12
    )


def test_rtps_rtpp_mutually_exclusive():
    from efa_xray_tpu.config import FilterConfig

    with pytest.raises(ValueError, match="mutually exclusive"):
        FilterConfig(rtps_alpha=0.5, rtpp_alpha=0.5)
    with pytest.raises(ValueError, match="rtpp_alpha"):
        FilterConfig(rtpp_alpha=1.5)


@pytest.mark.parametrize("solver", ["ensrf", "letkf", "enkf"])
def test_rtpp_through_the_drivers(solver, demo_state):
    from conftest import make_demo_obs
    from efa_xray_tpu.assimilation.enkf import EnKF
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.assimilation.letkf import LETKF
    from efa_xray_tpu.config import FilterConfig

    obs = make_demo_obs(demo_state, nobs=6, radius=2000.0)
    cls = {"ensrf": EnSRF, "letkf": LETKF, "enkf": EnKF}[solver]
    cfg0 = FilterConfig(localization="GC", dtype="float64")
    cfg1 = FilterConfig(localization="GC", dtype="float64", rtpp_alpha=1.0)
    post0, _ = cls(demo_state, list(obs), config=cfg0).update()
    post1, _ = cls(demo_state, list(obs), config=cfg1).update()
    # with alpha=1 the posterior perturbations ARE the prior perturbations
    np.testing.assert_allclose(
        np.asarray(post1.ensemble_perts().to_vect()),
        np.asarray(demo_state.ensemble_perts().to_vect()),
        atol=1e-9,
    )
    # and the analysis mean is untouched by RTPP
    np.testing.assert_allclose(
        np.asarray(post1.ensemble_mean()), np.asarray(post0.ensemble_mean()),
        atol=1e-10,
    )


def test_rtpp_sharded_matches_single_device(demo_state):
    """RTPP over the donating mesh path (prior perts copied before the
    donation) must equal the single-device result."""
    from conftest import make_demo_obs
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.parallel import make_mesh

    obs = make_demo_obs(demo_state, nobs=6, radius=2000.0)
    cfg = FilterConfig(localization="GC", dtype="float64", rtpp_alpha=0.6)
    post_single, _ = EnSRF(demo_state, list(obs), config=cfg).update()
    post_mesh, _ = EnSRF(
        demo_state, list(obs), config=cfg, mesh=make_mesh()
    ).update()
    np.testing.assert_allclose(
        np.asarray(post_mesh.to_vect()),
        np.asarray(post_single.to_vect()),
        atol=1e-10,
    )


@pytest.mark.parametrize("solver", ["ensrf", "letkf"])
def test_rtps_through_the_drivers(solver, demo_state):
    from conftest import make_demo_obs
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.assimilation.letkf import LETKF
    from efa_xray_tpu.config import FilterConfig

    obs = make_demo_obs(demo_state, nobs=6, radius=2000.0)
    cls = LETKF if solver == "letkf" else EnSRF
    cfg0 = FilterConfig(localization="GC", dtype="float64")
    cfg1 = FilterConfig(localization="GC", dtype="float64", rtps_alpha=1.0)
    post0, _ = cls(demo_state, list(obs), config=cfg0).update()
    post1, _ = cls(demo_state, list(obs), config=cfg1).update()
    prior_spread = np.asarray(demo_state.ensemble_spread())
    s0 = np.asarray(post0.ensemble_spread())
    s1 = np.asarray(post1.ensemble_spread())
    # without RTPS the analysis contracts; with alpha=1 spread == prior
    assert s0.mean() < prior_spread.mean()
    np.testing.assert_allclose(s1, prior_spread, rtol=1e-8)
    # and the analysis mean is untouched by RTPS
    np.testing.assert_allclose(
        np.asarray(post1.ensemble_mean()), np.asarray(post0.ensemble_mean()),
        atol=1e-10,
    )
