"""Postprocess verification statistics (reference parity:
efa_xray/postprocess/postprocess.py:8-39)."""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.postprocess import obs_assimilation_statistics


def test_statistics_dataframe_columns_and_consistency():
    state = make_demo_state(nmems=15)
    obs = make_demo_obs(state, nobs=6, radius=1500.0)
    filt = EnSRF(state, list(obs), verbose=False, loc="GC")
    post, batch = filt.update()

    df = obs_assimilation_statistics(state, post, obs)
    expected_cols = {
        "validtime", "flead", "lat", "lon", "obtype", "description",
        "ob error", "value", "assimilated", "prior mean", "post mean",
        "prior variance", "post variance",
    }
    assert expected_cols <= set(df.columns)
    assert len(df) == 6
    assert df["assimilated"].all()

    # The DataFrame recomputes obs-space stats against the ORIGINAL prior
    # (reference postprocess.py:30-35), whereas the filter's prior_mean
    # diagnostic is sequential (recorded after earlier obs updated the
    # tail, ensrf.py:66).  Only the FIRST ob sees the untouched prior in
    # both, so only it must agree exactly.
    np.testing.assert_allclose(df["prior mean"].iloc[0], batch.prior_mean[0], rtol=1e-8)
    # ...but they should be close for all obs (same prior, small updates)
    np.testing.assert_allclose(df["prior mean"].to_numpy(), batch.prior_mean, rtol=5e-3)
    # posterior pulls obs-space estimate toward the ob values
    prior_dist = np.abs(df["value"] - df["prior mean"])
    post_dist = np.abs(df["value"] - df["post mean"])
    assert post_dist.mean() < prior_dist.mean()
    # posterior variance shrinks
    assert (df["post variance"] <= df["prior variance"] + 1e-12).all()
    # lead hours within the forecast range
    assert (df["flead"] >= 0).all()


def test_statistics_accepts_batch_and_marks_unassimilated():
    state = make_demo_state(nmems=10)
    obs = make_demo_obs(state, nobs=4)
    for ob in obs[:2]:
        ob.assimilate_this = False
    filt = EnSRF(state, list(obs), verbose=False, loc="GC")
    post, batch = filt.update()
    df = obs_assimilation_statistics(state, post, batch)
    assert list(df["assimilated"]) == [False, False, True, True]


def test_field_verification_statistics():
    from efa_xray_tpu.postprocess.verification import field_verification
    from efa_xray_tpu.utils.demo_data import gefs_like_state

    state, truth = gefs_like_state(ny=10, nx=12, nmems=15, ntimes=3)
    df = field_verification(state, truth)
    assert len(df) == state.nvars() * state.ntimes()
    assert (df["rmse"] > 0).all()
    assert (df["spread"] > 0).all()
    # CRPS column: positive, below the per-row MAE bound ~ rmse, and
    # above the half-spread lower regime for a calibrated Gaussian
    assert (df["crps"] > 0).all()
    assert (df["crps"] < df["rmse"] * 1.5).all()
    # Calibrated generator: spread should track rmse within a factor ~2
    ratio = df["rmse"] / df["spread"]
    assert ratio.between(0.4, 2.5).all(), ratio


def test_rank_histogram_reliability():
    from efa_xray_tpu.postprocess.verification import rank_histogram
    from efa_xray_tpu.utils.demo_data import gefs_like_state, observations_from_truth

    state, truth = gefs_like_state(ny=12, nx=16, nmems=20, ntimes=3, seed=5)
    obs = observations_from_truth(state, truth, 400, ob_error=0.3, seed=6)
    counts = rank_histogram(state, obs)
    assert counts.sum() == 400
    assert len(counts) == state.nmems() + 1
    # Reliable ensemble: no rank bin wildly over-occupied
    expected = 400 / (state.nmems() + 1)
    assert counts.max() < 6 * expected


def test_crps_matches_bruteforce_and_calibration():
    from efa_xray_tpu.postprocess.verification import crps
    from efa_xray_tpu.utils.demo_data import gefs_like_state, observations_from_truth

    state, truth = gefs_like_state(ny=12, nx=16, nmems=20, ntimes=3, seed=5)
    obs = observations_from_truth(state, truth, 100, ob_error=0.3, seed=6)
    per_ob, mean = crps(state, obs)
    assert per_ob.shape == (100,)
    assert np.isfinite(mean) and mean > 0
    # brute-force pairwise oracle on the first few obs
    from efa_xray_tpu.observation import forward as _fwd
    from efa_xray_tpu.observation.observation import ObservationBatch

    batch = ObservationBatch.coerce(obs)
    s = state.structure
    taps = _fwd.build_taps(
        s, batch.lats, batch.lons, batch.times_s, batch.var_indices(s)
    )
    ye = np.asarray(_fwd.apply_taps_obj(state.to_vect(), taps), np.float64)
    for i in range(5):
        mae = np.mean(np.abs(ye[i] - batch.values[i]))
        pair = np.mean(np.abs(ye[i][:, None] - ye[i][None, :]))
        np.testing.assert_allclose(per_ob[i], mae - 0.5 * pair, rtol=1e-12)
    # fair variant: same formula with M/(M-1) on the spread term
    per_fair, mean_fair = crps(state, obs, fair=True)
    m = state.nmems()
    i = 3
    mae = np.mean(np.abs(ye[i] - batch.values[i]))
    pair = np.mean(np.abs(ye[i][:, None] - ye[i][None, :]))
    np.testing.assert_allclose(
        per_fair[i], mae - 0.5 * (m / (m - 1.0)) * pair, rtol=1e-12
    )
    assert mean_fair < mean  # fair score is strictly smaller for spread>0
    # spread-less ensemble: CRPS == MAE of the mean
    from efa_xray_tpu.state.ensemble import EnsembleState

    collapsed = EnsembleState.from_vect(
        np.repeat(np.asarray(state.to_vect())[:, :1], m, axis=1),
        state.structure,
    )
    per_c, mean_c = crps(collapsed, obs)
    ye_c = np.asarray(
        _fwd.apply_taps_obj(collapsed.to_vect(), taps), np.float64
    )
    np.testing.assert_allclose(
        per_c, np.abs(ye_c[:, 0] - batch.values), rtol=1e-10
    )


def test_innovation_consistency_after_update():
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.postprocess.verification import innovation_consistency

    state = make_demo_state(nmems=15)
    obs = make_demo_obs(state, nobs=12, radius=1500.0)
    filt = EnSRF(state, obs, verbose=False, loc="GC")
    _, batch = filt.update()
    stats = innovation_consistency(batch)
    assert stats["nobs"] == 12
    assert 0.05 < stats["consistency_ratio"] < 20.0


def test_interactive_viewer_headless_update():
    """The interactive viewer (reference efa_demo.ipynb cells 14-16) must
    work headless: slider-equivalent update() reruns the assimilation and
    the count knob only toggles flags (0 obs -> posterior == prior)."""
    import matplotlib

    matplotlib.use("Agg")
    from efa_xray_tpu.postprocess.viewer import AssimilationViewer

    v = AssimilationViewer(n_obs=5)
    post5 = v.result["post"].copy()
    assert post5.shape == v.result["prior"].shape
    v.update(n_obs=0)
    np.testing.assert_allclose(v.result["post"], v.result["prior"], atol=1e-10)
    assert np.abs(post5 - v.result["post"]).max() > 0.1
    v.update(n_obs=5, ob_error=0.2)
    tighter = v.result["post"].var(axis=1).mean()
    assert tighter < post5.var(axis=1).mean()  # smaller R pulls harder


def test_desroziers_recovers_assigned_r():
    """Desroziers (2005): with correct R and an ensemble B, the estimated
    obs-error variance E[d_a * d_b] matches the assigned R and the
    innovation consistency ratio is ~1.  Gaussian twin with many obs and
    members so sampling noise stays inside loose bounds."""
    import jax.numpy as jnp

    from conftest import make_demo_state
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig
    from efa_xray_tpu.observation.observation import Observation
    from efa_xray_tpu.postprocess import (
        desroziers_diagnostics,
        obs_assimilation_statistics,
    )
    from efa_xray_tpu.utils import timeutil

    rng = np.random.default_rng(42)
    state = make_demo_state(ntimes=1, ny=16, nx=16, nmems=128, seed=5)
    s = state.structure
    times = timeutil.to_datetime64(s.times_s)
    lat2 = np.asarray(s.lat)
    lon2 = np.asarray(s.lon)

    # Truth = one extra draw from the same climatology the demo state
    # samples; obs = truth at random grid points + N(0, R) noise.
    # nobs is kept small relative to nmems: without localization,
    # spurious sampled covariances add ~nobs * b^2 / (M * (b + R)) of
    # analysis noise (the effect localization exists to kill), which
    # biases the Desroziers estimate upward in over-observed regimes.
    r_true = 1.0
    nobs = 120
    iy = rng.integers(1, 15, nobs)
    ix = rng.integers(1, 15, nobs)
    field = np.asarray(state.data)[0, 0]  # [ny, nx, M]
    truth = field.mean(axis=-1) + rng.normal(
        0, field.std(axis=-1), field.shape[:2]
    )
    obs = [
        Observation(
            value=float(truth[iy[k], ix[k]]
                        + rng.normal(0, np.sqrt(r_true))),
            obtype=s.var_names[0],
            time=times[0],
            error=r_true,
            lat=float(lat2[iy[k], ix[k]]),
            lon=float(lon2[iy[k], ix[k]]),
            assimilate_this=True,
            localize_radius=None,  # no localization: clean Desroziers
        )
        for k in range(nobs)
    ]
    cfg = FilterConfig(localization=None, dtype="float64")
    filt = EnSRF(state, obs, config=cfg, verbose=False)
    post, batch = filt.update()

    df = obs_assimilation_statistics(state, post, batch)
    dd = desroziers_diagnostics(df)
    assert int(dd["nobs"].iloc[0]) == nobs
    # Estimated R within sampling noise of assigned R.
    assert 0.5 < float(dd["R_ratio"].iloc[0]) < 2.0
    # HBHT estimate positive and of the order of the ensemble prior var.
    assert float(dd["HBHT_estimated"].iloc[0]) > 0
    # grouping=None aggregates everything into one "all" row
    dd_all = desroziers_diagnostics(df, group_by=None)
    assert list(dd_all.index) == ["all"]


def test_desroziers_requires_assimilated_obs():
    import pandas as pd

    from efa_xray_tpu.postprocess import desroziers_diagnostics

    df = pd.DataFrame(
        {
            "assimilated": [False, False],
            "value": [1.0, 2.0],
            "prior mean": [1.0, 2.0],
            "post mean": [1.0, 2.0],
            "ob error": [1.0, 1.0],
            "prior variance": [1.0, 1.0],
            "obtype": ["T", "T"],
        }
    )
    with pytest.raises(ValueError):
        desroziers_diagnostics(df)
