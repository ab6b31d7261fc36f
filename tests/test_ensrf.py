"""EnSRF correctness: JAX kernels vs the independent NumPy oracle, blocked
vs serial equivalence, masking semantics, and filter sanity properties."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as oracle
from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.observation import forward as fwd
from efa_xray_tpu.observation.observation import ObservationBatch


def _setup(nobs=12, localized=True, seed=3, nvars=1, some_skipped=False):
    state = make_demo_state(nvars=nvars, ntimes=3, ny=6, nx=8, nmems=20, seed=seed)
    obs = make_demo_obs(
        state,
        nobs=nobs,
        seed=seed + 1,
        radius=800.0 if localized else None,
        all_assim=not some_skipped,
    )
    batch = ObservationBatch.coerce(obs)
    s = state.structure
    taps = fwd.build_taps(
        s, batch.lats, batch.lons, batch.times_s, batch.var_indices(s)
    )
    prior_vect = np.asarray(state.to_vect(), dtype=np.float64)
    ye = np.asarray(fwd.apply_taps_obj(jnp.asarray(prior_vect), taps))
    row_lat, row_lon = s.row_latlon()
    radii = batch.localize_radius
    assim = batch.assimilate_flags & taps.qc_ok
    return state, batch, prior_vect, ye, row_lat, row_lon, radii, assim


def _run_core(prior_vect, ye, row_lat, row_lon, batch, radii, assim, localize, method,
              block_size=5, unbiased=False):
    xbm = jnp.asarray(prior_vect.mean(axis=1))
    Xbp = jnp.asarray(prior_vect - prior_vect.mean(axis=1, keepdims=True))
    tm = jnp.asarray(ye.mean(axis=1))
    tp = jnp.asarray(ye - ye.mean(axis=1, keepdims=True))
    obs_arr = core.ObsArrays(
        values=jnp.asarray(batch.values),
        errors=jnp.asarray(batch.errors),
        lats=jnp.asarray(batch.lats),
        lons=jnp.asarray(batch.lons),
        radii=jnp.asarray(radii),
        assim=jnp.asarray(assim),
    )
    fn = core.ensrf_serial if method == "serial" else core.ensrf_blocked
    kw = {"unbiased": unbiased}
    if method != "serial":
        kw["block_size"] = block_size
    bm, bp, tm2, tp2, diags = fn(
        xbm,
        Xbp,
        tm,
        tp,
        jnp.asarray(row_lat),
        jnp.asarray(row_lon),
        obs_arr,
        localize=localize,
        **kw,
    )
    post = np.asarray(bm)[:, None] + np.asarray(bp)
    return post, diags


@pytest.mark.parametrize("localized", [True, False])
@pytest.mark.parametrize("method", ["serial", "blocked"])
def test_parity_vs_numpy_oracle(localized, method):
    """North-star requirement: analysis parity <= 1e-6 RMSE vs the
    reference algorithm on identical inputs (BASELINE.md)."""
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(
        nobs=15, localized=localized
    )
    want, want_diags = oracle.serial_ensrf(
        prior_vect, ye, batch.values, batch.errors, batch.lats, batch.lons,
        radii, row_lat, row_lon, assim, localize=localized,
    )
    got, diags = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, localized, method
    )
    rmse = np.sqrt(np.mean((got - want) ** 2))
    assert rmse < 1e-9, f"posterior RMSE {rmse}"
    np.testing.assert_allclose(
        np.asarray(diags.prior_mean), want_diags["prior_mean"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(diags.prior_var), want_diags["prior_var"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(diags.post_mean), want_diags["post_mean"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(diags.post_var), want_diags["post_var"], rtol=1e-8
    )
    np.testing.assert_array_equal(
        np.asarray(diags.assimilated), want_diags["assimilated"]
    )


@pytest.mark.parametrize("block_size", [1, 3, 7, 32])
def test_blocked_equals_serial_any_block_size(block_size):
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(nobs=13)
    got_s, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "serial"
    )
    got_b, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked",
        block_size=block_size,
    )
    np.testing.assert_allclose(got_b, got_s, rtol=1e-10, atol=1e-10)


def test_skipped_obs_record_priors_but_not_posteriors():
    """assimilate_this=False must skip the update but still record prior
    stats (reference ensrf.py:66-76)."""
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(
        nobs=8, some_skipped=True
    )
    want, want_diags = oracle.serial_ensrf(
        prior_vect, ye, batch.values, batch.errors, batch.lats, batch.lons,
        radii, row_lat, row_lon, assim, localize=True,
    )
    got, diags = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked"
    )
    np.testing.assert_allclose(got, want, atol=1e-10)
    skipped = ~np.asarray(assim)
    assert skipped.any() and (~skipped).any()
    assert np.isfinite(np.asarray(diags.prior_mean)).all()
    assert np.isnan(np.asarray(diags.post_mean)[skipped]).all()
    np.testing.assert_array_equal(np.asarray(diags.assimilated), ~skipped)


def test_no_obs_assimilated_is_identity():
    state, batch, prior_vect, ye, row_lat, row_lon, radii, _ = _setup(nobs=4)
    assim = np.zeros(4, dtype=bool)
    got, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked"
    )
    np.testing.assert_allclose(got, prior_vect, atol=1e-12)


def test_assimilation_reduces_obs_space_variance():
    """Physical sanity: posterior obs-space variance <= prior variance."""
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(nobs=10)
    _, diags = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked"
    )
    pv = np.asarray(diags.prior_var)
    qv = np.asarray(diags.post_var)
    ok = np.asarray(diags.assimilated)
    assert (qv[ok] <= pv[ok] + 1e-12).all()


def test_ob_order_invariance_of_analysis_mean_without_localization():
    """With consistent ddof (unbiased_variance=True) the unlocalized serial
    EnSRF analysis mean is ob-order independent in exact arithmetic (the
    demo notebook exploits this by shuffling ob order, efa_demo.ipynb
    cell 11).  NOTE: the reference's own ddof-0/ddof-1 mix (ensrf.py:69,95)
    breaks this at the ~1e-2 level — verified during development; the
    default mode reproduces that reference behavior."""
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(
        nobs=6, localized=False
    )
    got1, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, False, "serial",
        unbiased=True,
    )
    perm = np.array([3, 0, 5, 1, 4, 2])

    class B:  # permuted view of the batch fields used by _run_core
        values = batch.values[perm]
        errors = batch.errors[perm]
        lats = batch.lats[perm]
        lons = batch.lons[perm]

    got2, _ = _run_core(
        prior_vect, ye[perm], row_lat, row_lon, B, radii[perm], assim[perm],
        False, "serial", unbiased=True,
    )
    np.testing.assert_allclose(got1.mean(axis=1), got2.mean(axis=1), atol=1e-8)


def test_unbiased_mode_parity_vs_oracle():
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(nobs=10)
    want, _ = oracle.serial_ensrf(
        prior_vect, ye, batch.values, batch.errors, batch.lats, batch.lons,
        radii, row_lat, row_lon, assim, localize=True, unbiased=True,
    )
    got, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked",
        unbiased=True,
    )
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_end_to_end_class_api(demo_state=None):
    """EnSRF class: update() returns a posterior state + diagnostics, and
    the posterior pulls the obs-space estimate toward the ob values."""
    state = make_demo_state(nmems=20)
    obs = make_demo_obs(state, nobs=6, radius=1500.0)
    filt = EnSRF(state, obs, inflation=None, verbose=False, loc="GC")
    post, batch = filt.update()
    assert post.shape() == state.shape()
    assert batch.assimilated.all()
    # innovation shrinks on average
    prior_innov = np.abs(batch.values - batch.prior_mean)
    post_innov = np.abs(batch.values - batch.post_mean)
    assert post_innov.mean() < prior_innov.mean()
    # user Observation objects got the write-back (reference ensrf.py:66-70)
    assert obs[0].prior_mean is not None
    assert obs[0].assimilated
    assert obs[0].post_var <= obs[0].prior_var + 1e-12


def test_serial_and_blocked_class_methods_agree():
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(nmems=15, seed=9)
    obs = make_demo_obs(state, nobs=9, seed=10, radius=1000.0)
    posts = {}
    for method in ("serial", "blocked"):
        cfg = FilterConfig(localization="GC", method=method, dtype="float64")
        filt = EnSRF(state, list(obs), config=cfg)
        post, _ = filt.update()
        posts[method] = np.asarray(post.data)
    np.testing.assert_allclose(posts["serial"], posts["blocked"], atol=1e-9)


def test_empty_observation_batch_is_identity():
    """Zero obs must be a clean no-op (found by runtime probing: the scan
    core used to crash slicing a (0, M) tail)."""
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(nmems=8)
    for method in ("serial", "blocked"):
        cfg = FilterConfig(localization="GC", method=method, dtype="float64")
        post, batch = EnSRF(state, [], config=cfg).update()
        np.testing.assert_allclose(np.asarray(post.data), np.asarray(state.data))
        assert len(batch) == 0


def test_fast_geometry_close_to_exact():
    """fast_geometry=True must match the exact haversine path closely for
    all three execution strategies."""
    state, batch, prior_vect, ye, row_lat, row_lon, radii, assim = _setup(nobs=10)
    ref, _ = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, "blocked"
    )

    xbm = jnp.asarray(prior_vect.mean(axis=1))
    Xbp = jnp.asarray(prior_vect - prior_vect.mean(axis=1, keepdims=True))
    tm = jnp.asarray(ye.mean(axis=1))
    tp = jnp.asarray(ye - ye.mean(axis=1, keepdims=True))
    obs_arr = core.ObsArrays(
        values=jnp.asarray(batch.values),
        errors=jnp.asarray(batch.errors),
        lats=jnp.asarray(batch.lats),
        lons=jnp.asarray(batch.lons),
        radii=jnp.asarray(radii),
        assim=jnp.asarray(assim),
    )
    for fn, kw in [
        (core.ensrf_blocked, {"block_size": 4}),
        (core.ensrf_serial, {}),
    ]:
        bm, bp, _, _, _ = fn(
            xbm, Xbp, tm, tp, jnp.asarray(row_lat), jnp.asarray(row_lon),
            obs_arr, localize=True, fast_geometry=True, **kw,
        )
        got = np.asarray(bm)[:, None] + np.asarray(bp)
        np.testing.assert_allclose(got, ref, atol=5e-5)


def test_module_level_update_driver():
    """The working replacement for the reference's dead multiprocessing
    driver (assimilation.py:176-230)."""
    from efa_xray_tpu.assimilation.assimilation import update

    state = make_demo_state(nmems=12, seed=4)
    obs = make_demo_obs(state, nobs=5, seed=5, radius=1500.0)
    post, batch = update(state, obs, inflate=1.1, loc="GC", nproc=4)
    assert batch.assimilated.all()
    innov_prior = np.abs(batch.values - batch.prior_mean)
    innov_post = np.abs(batch.values - batch.post_mean)
    assert innov_post.mean() < innov_prior.mean()


def test_default_block_size_128_compiles_and_matches_serial():
    """The XLA fallback at FilterConfig's default block_size=128 must stay
    compile-time sane (the recurrence accumulates solved columns
    incrementally, not by re-stacking O(B^2) slices) and exactly match the
    serial scan."""
    import jax
    import jax.numpy as jnp
    from efa_xray_tpu.assimilation import ensrf_core as core

    rng = np.random.default_rng(7)
    ns, m, no = 300, 10, 130  # > one block, non-multiple of 128
    prior = rng.normal(0, 1, (ns, m))
    ye = prior[rng.integers(0, ns, no)]
    obs = core.ObsArrays(
        values=jnp.asarray(ye.mean(1) + 0.1),
        errors=jnp.ones(no),
        lats=jnp.asarray(rng.uniform(-60, 60, no)),
        lons=jnp.asarray(rng.uniform(0, 360, no)),
        radii=jnp.full(no, 2000.0),
        assim=jnp.ones(no, bool),
    )
    bm = jnp.asarray(prior.mean(1))
    bp = jnp.asarray(prior - prior.mean(1, keepdims=True))
    tm = jnp.asarray(ye.mean(1))
    tp = jnp.asarray(ye - ye.mean(1, keepdims=True))
    blat = jnp.asarray(rng.uniform(-60, 60, ns))
    blon = jnp.asarray(rng.uniform(0, 360, ns))

    blocked = core.ensrf_blocked(bm, bp, tm, tp, blat, blon, obs,
                                 localize=True, block_size=128)
    serial = core.ensrf_serial(bm, bp, tm, tp, blat, blon, obs, localize=True)
    np.testing.assert_allclose(np.asarray(blocked[0]), np.asarray(serial[0]),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(blocked[1]), np.asarray(serial[1]),
                               atol=1e-12)


def test_f32_drift_at_production_nobs_is_bounded():
    """SURVEY §7 'numerical parity while reordering reductions': the f32
    blocked path at thousands of sequential obs must stay within ~1e-5
    relative of the f64 oracle (measured ~1.5e-6 rel-max at 10k obs; see
    docs/design.md §5 for the full table)."""
    import jax.numpy as jnp
    from efa_xray_tpu.assimilation import ensrf_core as core
    from oracle_numpy import serial_ensrf

    rng = np.random.default_rng(0)
    ns, m, nobs = 1000, 20, 4000
    prior = rng.normal(280, 3, (ns, m))
    rows = rng.integers(0, ns, nobs)
    ye = prior[rows] + rng.normal(0, 0.1, (nobs, m))
    values = ye.mean(1) + rng.normal(0, 1, nobs)
    errors = np.ones(nobs)
    row_lat = rng.uniform(-70, 70, ns)
    row_lon = rng.uniform(0, 360, ns)
    radii = np.full(nobs, 2000.0)
    assim = np.ones(nobs, bool)

    post64, _ = serial_ensrf(prior, ye, values, errors, row_lat[rows],
                             row_lon[rows], radii, row_lat, row_lon, assim,
                             localize=True)

    d = jnp.float32
    bm = jnp.asarray(prior.mean(1), d)
    bp = jnp.asarray(prior - prior.mean(1, keepdims=True), d)
    tm = jnp.asarray(ye.mean(1), d)
    tp = jnp.asarray(ye - ye.mean(1, keepdims=True), d)
    obs = core.ObsArrays(
        values=jnp.asarray(values, d), errors=jnp.asarray(errors, d),
        lats=jnp.asarray(row_lat[rows], d), lons=jnp.asarray(row_lon[rows], d),
        radii=jnp.asarray(radii, d), assim=jnp.asarray(assim))
    out = core.ensrf_blocked(bm, bp, tm, tp, jnp.asarray(row_lat, d),
                             jnp.asarray(row_lon, d), obs, localize=True,
                             block_size=128)
    post32 = np.asarray(out[0])[:, None] + np.asarray(out[1])
    rel = np.abs(post32 - post64).max() / np.abs(post64).mean()
    assert rel < 1e-5, f"f32 blocked drift {rel:.3e} exceeds 1e-5"


def test_tail_scan_blocked_equals_tail_scan_any_panel():
    """The hierarchical phase-1 solve (panels of B obs + blocked tail
    application) must reproduce the per-ob tail scan exactly, for panel
    sizes that do and do not divide nobs, with masked obs, per-ob radii
    (incl. inf), vertical factors, and both geometries."""
    import jax.numpy as jnp

    from efa_xray_tpu.assimilation import ensrf_core as core

    rng = np.random.default_rng(12)
    nobs, nmems = 67, 9
    ye = rng.normal(280, 3, (nobs, nmems))
    tm = jnp.asarray(ye.mean(1))
    tp = jnp.asarray(ye - ye.mean(1, keepdims=True))
    obs = core.ObsArrays(
        values=jnp.asarray(ye.mean(1) + rng.normal(0, 1, nobs)),
        errors=jnp.asarray(rng.uniform(0.5, 2.0, nobs)),
        lats=jnp.asarray(rng.uniform(-70, 70, nobs)),
        lons=jnp.asarray(rng.uniform(0, 360, nobs)),
        radii=jnp.asarray(rng.choice([1500.0, 3000.0, np.inf], nobs)),
        assim=jnp.asarray(rng.random(nobs) > 0.2),
        verts=jnp.asarray(rng.uniform(100, 1000, nobs)),
        vert_radii=jnp.asarray(rng.choice([300.0, np.inf], nobs)),
    )
    for kw in (dict(localize=True), dict(localize=False),
               dict(localize=True, fast_geometry=True),
               dict(localize=True, vertical=True),
               dict(localize=True, unbiased=True)):
        a = core.tail_scan(tm, tp, obs, **kw)
        for panel in (16, 32, 67, 100):
            b = core.tail_scan_blocked(tm, tp, obs, panel=panel, **kw)
            for name in ("ye", "gain_coef", "sqrt_coef", "tail_mean",
                         "tail_perts"):
                np.testing.assert_allclose(
                    np.asarray(getattr(a, name)),
                    np.asarray(getattr(b, name)),
                    atol=1e-11, err_msg=f"{kw} panel={panel} {name}",
                )
            np.testing.assert_array_equal(
                np.asarray(a.diags.assimilated), np.asarray(b.diags.assimilated)
            )
            for f in ("prior_mean", "prior_var", "post_mean", "post_var"):
                x = np.asarray(getattr(a.diags, f))
                y = np.asarray(getattr(b.diags, f))
                np.testing.assert_allclose(
                    x[np.isfinite(x)], y[np.isfinite(y)], atol=1e-11
                )


def test_module_update_solver_dispatch(demo_state):
    """update(solver=...) drives all three solvers through one call."""
    import pytest as _pytest

    from conftest import make_demo_obs
    from efa_xray_tpu.assimilation.assimilation import update

    obs = make_demo_obs(demo_state, nobs=5, radius=2000.0)
    for solver in ("ensrf", "letkf", "enkf"):
        post, batch = update(
            demo_state, list(obs), inflate=1.05, loc="GC", solver=solver
        )
        assert batch.assimilated.sum() == 5
        assert not np.allclose(
            np.asarray(post.to_vect()), np.asarray(demo_state.to_vect())
        )
    with _pytest.raises(ValueError, match="unknown solver"):
        update(demo_state, list(obs), solver="4dvar")


@pytest.mark.parametrize("method", ["serial", "blocked"])
def test_parity_vs_oracle_large_randomized(method):
    """Stress parity at ~10x the demo scale with adversarial per-ob
    structure: mixed finite/inf localization radii, QC'd-out obs, exactly
    duplicated ob locations, and a zero-error (R = 0) ob — all compared
    against the independent float64 NumPy oracle to 1e-9 RMSE."""
    from types import SimpleNamespace

    rng = np.random.default_rng(42)
    ns, nm, no = 4000, 16, 250
    row_lat = rng.uniform(-80, 80, ns)
    row_lon = rng.uniform(0, 360, ns)
    prior_vect = (280 + 5 * rng.standard_normal((ns, nm))).astype(np.float64)
    rows = rng.integers(0, ns, no)
    rows[10] = rows[11] = rows[12]  # duplicated ob locations
    ye = prior_vect[rows] + 0.1 * rng.standard_normal((no, nm))
    values = ye.mean(1) + rng.normal(0, 1.0, no)
    errors = rng.uniform(0.25, 4.0, no)
    errors[7] = 0.0  # R = 0: kdenom = varye stays finite
    radii = rng.uniform(500.0, 4000.0, no)
    radii[::5] = np.inf  # every 5th ob unlocalized
    assim = rng.random(no) > 0.15
    batch = SimpleNamespace(values=values, errors=errors,
                            lats=row_lat[rows], lons=row_lon[rows])

    want, want_diags = oracle.serial_ensrf(
        prior_vect, ye, values, errors, batch.lats, batch.lons,
        radii, row_lat, row_lon, assim, localize=True,
    )
    got, diags = _run_core(
        prior_vect, ye, row_lat, row_lon, batch, radii, assim, True, method,
        block_size=32,
    )
    rmse = np.sqrt(np.mean((got - want) ** 2))
    assert rmse < 1e-9, f"posterior RMSE {rmse}"
    np.testing.assert_allclose(np.asarray(diags.post_mean)[assim],
                               want_diags["post_mean"][assim], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(diags.post_var)[assim],
                               want_diags["post_var"][assim], rtol=1e-7)


@pytest.mark.parametrize("chunk,method", [(3, "blocked"), (7, "blocked"),
                                          (5, "serial")])
def test_obs_chunked_update_matches_one_shot(chunk, method):
    """FilterConfig.obs_chunk processes the batch in sequential chunks;
    the augmented-state invariant (later chunks' obs rows ride as extra
    body rows) makes it EXACT up to fp reassociation — posterior and
    per-ob diagnostics must match the one-shot update, including
    QC-skipped obs and a ragged final chunk."""
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from conftest import make_demo_obs, make_demo_state

    state = make_demo_state(nmems=10, seed=5)
    obs = make_demo_obs(state, nobs=13, radius=2000.0)
    for ob in obs[::4]:
        ob.assimilate_this = False

    base = FilterConfig(localization="GC", dtype="float64", method=method)
    one, b_one = EnSRF(state, obs, config=base, verbose=False).update()
    chunked_cfg = FilterConfig(localization="GC", dtype="float64",
                               method=method, obs_chunk=chunk)
    many, b_many = EnSRF(state, obs, config=chunked_cfg,
                         verbose=False).update()

    np.testing.assert_allclose(
        np.asarray(many.data), np.asarray(one.data), rtol=1e-10, atol=1e-10
    )
    for f in ("prior_mean", "prior_var", "post_mean", "post_var"):
        np.testing.assert_allclose(
            np.asarray(getattr(b_many, f), dtype=np.float64),
            np.asarray(getattr(b_one, f), dtype=np.float64),
            rtol=1e-10, atol=1e-10,
        )
    np.testing.assert_array_equal(
        np.asarray(b_many.assimilated), np.asarray(b_one.assimilated)
    )


def test_obs_chunked_rejects_hybrid():
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from conftest import make_demo_obs, make_demo_state

    state = make_demo_state(nmems=8)
    obs = make_demo_obs(state, nobs=6)
    cfg = FilterConfig(localization="GC", dtype="float64", obs_chunk=2,
                       hybrid_alpha=0.5, static_b_sigma=1.0,
                       static_b_length=500.0)
    with pytest.raises(ValueError, match="obs_chunk"):
        EnSRF(state, obs, config=cfg, verbose=False).update()


def test_obs_order_hilbert_matches_presorted_and_returns_caller_order():
    """FilterConfig.obs_order='hilbert' assimilates in spatial-locality
    order but every caller-visible artifact (diagnostics, returned batch,
    Observation writeback) comes back in the CALLER's order."""
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.observation.observation import ObservationBatch
    from conftest import make_demo_obs, make_demo_state

    state = make_demo_state(nmems=10, seed=2)
    obs = make_demo_obs(state, nobs=17, radius=2000.0, seed=9)
    for ob in obs[::4]:
        ob.assimilate_this = False

    cfg = FilterConfig(localization="GC", dtype="float64")
    cfg_h = FilterConfig(localization="GC", dtype="float64",
                         obs_order="hilbert")

    # oracle: caller pre-sorts, runs in the default order, un-sorts
    batch = ObservationBatch.coerce(obs)
    srt, order = batch.spatial_sort()
    post_ref, b_ref = EnSRF(state, srt, config=cfg, verbose=False).update()
    b_ref = b_ref.take(np.argsort(order))

    post_h, b_h = EnSRF(state, obs, config=cfg_h, verbose=False).update()
    np.testing.assert_allclose(np.asarray(post_h.data),
                               np.asarray(post_ref.data),
                               rtol=1e-12, atol=1e-12)
    # diagnostics in the caller's order (match the original obs fields)
    np.testing.assert_array_equal(np.asarray(b_h.values), batch.values)
    assert b_h.obtypes == batch.obtypes
    for f in ("prior_mean", "prior_var", "post_mean", "post_var"):
        np.testing.assert_allclose(
            np.asarray(getattr(b_h, f), dtype=np.float64),
            np.asarray(getattr(b_ref, f), dtype=np.float64),
            rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(b_h.assimilated),
                                  np.asarray(b_ref.assimilated))
    # Observation-object writeback lands on the ORIGINAL objects in order
    assert obs[0].prior_mean == pytest.approx(float(b_h.prior_mean[0]))
    assert not obs[0].assimilated  # flagged off above
    assert obs[1].assimilated


def test_obs_order_composes_with_obs_chunk():
    """obs_order='hilbert' + obs_chunk: the chunked driver runs on the
    sorted batch and the diagnostics still come back in caller order,
    equal to the caller-sorted one-shot reference."""
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.observation.observation import ObservationBatch
    from conftest import make_demo_obs, make_demo_state

    state = make_demo_state(nmems=8, seed=6)
    obs = make_demo_obs(state, nobs=13, radius=2000.0, seed=7)
    batch = ObservationBatch.coerce(obs)
    srt, order = batch.spatial_sort()
    ref, bref = EnSRF(state, srt, config=FilterConfig(
        localization="GC", dtype="float64"), verbose=False).update()
    bref = bref.take(np.argsort(order))

    got, bgot = EnSRF(state, obs, config=FilterConfig(
        localization="GC", dtype="float64", obs_order="hilbert",
        obs_chunk=4), verbose=False).update()
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(ref.data),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(bgot.values), batch.values)
    for f in ("prior_mean", "post_mean", "post_var"):
        np.testing.assert_allclose(
            np.asarray(getattr(bgot, f), dtype=np.float64),
            np.asarray(getattr(bref, f), dtype=np.float64),
            rtol=1e-10, atol=1e-10)
