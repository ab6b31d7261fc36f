"""Multivariate cycling-DA tests on the rotating shallow-water channel.

Every other model family here (lorenz96, l96_2d) is univariate, so none
of them exercises CROSS-VARIABLE ensemble covariances — the mechanism by
which a height observation corrects the wind field through flow-dependent
(near-geostrophic) balance.  That multivariate update is the central
behavior of ensemble filters in NWP and the reference's EFA use case
(trajectory + multi-variable states, reference
``efa_xray/state/ensemble.py:49-56`` where every non-coordinate variable
joins the state vector).  These tests pin it down with a positive test
(height obs must reduce wind error) and a causality null (destroying the
eta<->wind member correspondence must destroy the wind correction).
"""

import numpy as np

import jax.numpy as jnp
import pytest

from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.models import swe
from efa_xray_tpu.models.cycling import CyclingHarness

NY, NX, NM = 16, 32, 12
N = NY * NX


@pytest.fixture(scope="module")
def spun_up():
    """One shared spinup (the expensive part, ~30 s CPU): truth dict,
    ensemble dict, and their flat-packed forms."""
    truth, ens = swe.spinup_ensemble(
        ny=NY, nx=NX, nmems=NM, seed=0, spinup_steps=2500, member_steps=400
    )
    flat_ens = np.asarray(swe.pack(ens, NY, NX))
    flat_truth = np.asarray(swe.pack(truth, NY, NX))
    return truth, ens, flat_ens, flat_truth


def _height_obs_update(flat_ens, flat_truth, seed=7, ob_error=1e-4):
    """Assimilate noisy eta obs (every 2nd grid point, NO wind obs) with
    one EnSRF analysis step; return the posterior flat ensemble."""
    lat, lon = swe.grid_latlon(NY, NX)
    rows = swe.var_rows("eta", NY, NX, stride=2)
    rng = np.random.default_rng(seed)
    yvals = flat_truth[rows] + np.sqrt(ob_error) * rng.standard_normal(
        len(rows)
    )
    h = CyclingHarness(
        forecast=lambda x: x,
        state_lats=lat,
        state_lons=lon,
        ob_error=ob_error,
        localize_radius=4000.0,
        obs_operator_rows=rows,
        config=FilterConfig(),
    )
    post, _ = h.analysis_step(
        jnp.asarray(flat_ens), jnp.asarray(yvals), lat[rows], lon[rows]
    )
    return np.asarray(post)


def _mean_rmse(block, truth_block):
    return float(np.sqrt(np.mean((block.mean(0) - truth_block) ** 2)))


def _var_ratios(prior, post, flat_truth):
    """analysis/background ensemble-mean RMSE per variable."""
    out = {}
    for i, v in enumerate(swe.VAR_ORDER):
        sl = slice(i * N, (i + 1) * N)
        out[v] = _mean_rmse(post[:, sl], flat_truth[sl]) / _mean_rmse(
            prior[:, sl], flat_truth[sl]
        )
    return out


def test_swe_dynamics_stable_and_eddying(spun_up):
    truth, ens, flat_ens, _ = spun_up
    for k in swe.VAR_ORDER:
        assert bool(jnp.isfinite(truth[k]).all())
        assert bool(jnp.isfinite(ens[k]).all())
    # bounded amplitudes (hyperdiffusion + relaxation keep the channel on
    # a statistically steady attractor, not blowing up)
    assert float(jnp.abs(truth["eta"]).max()) < 10.0
    assert float(jnp.abs(truth["u"]).max()) < 10.0
    # eddying: truth departs from its zonal mean (the barotropically
    # unstable jet sheds eddies; measured ~0.067)
    eddy = float(
        jnp.std(truth["eta"] - truth["eta"].mean(axis=1, keepdims=True))
    )
    assert eddy > 0.02
    # ensemble keeps organized spread after 400 member steps
    spread = float(jnp.std(ens["eta"], axis=0).mean())
    assert spread > 5e-3


def test_swe_pack_unpack_roundtrip_and_grid(spun_up):
    _, ens, flat_ens, _ = spun_up
    assert flat_ens.shape == (NM, 3 * N)
    back = swe.unpack(jnp.asarray(flat_ens), NY, NX)
    for k in swe.VAR_ORDER:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(ens[k]))
    lat, lon = swe.grid_latlon(NY, NX)
    assert lat.shape == lon.shape == (3 * N,)
    # the three variable blocks of one grid point share a location
    np.testing.assert_array_equal(lat[:N], lat[N : 2 * N])
    np.testing.assert_array_equal(lon[:N], lon[2 * N :])
    rows = swe.var_rows("u", NY, NX, stride=4)
    assert rows[0] == N and rows.max() < 2 * N


def test_swe_height_obs_correct_winds(spun_up):
    """The multivariate payoff: assimilating ONLY height observations must
    reduce the wind-field error through cross-variable ensemble
    covariances (measured ratios: eta 0.19, u 0.78, v 0.83)."""
    _, _, flat_ens, flat_truth = spun_up
    post = _height_obs_update(flat_ens, flat_truth)
    r = _var_ratios(flat_ens, post, flat_truth)
    assert r["eta"] < 0.40  # directly observed: big reduction
    assert r["u"] < 0.92  # NEVER observed: improved via covariances
    assert r["v"] < 0.92
    # posterior stays finite and spread shrinks where observed
    assert np.isfinite(post).all()
    prior_spread = np.std(flat_ens[:, :N], axis=0).mean()
    post_spread = np.std(post[:, :N], axis=0).mean()
    assert post_spread < prior_spread


def test_swe_analysis_improves_forecast(spun_up):
    """The EFA payoff (Madaus & Hakim 2015): the analysis must improve
    not just the fit at analysis time but the subsequent FORECAST — the
    increment projects onto the attractor (near-balanced, via ensemble
    covariances), so it survives integration instead of radiating away
    as gravity waves."""
    truth, _, flat_ens, flat_truth = spun_up
    post = _height_obs_update(flat_ens, flat_truth)
    nfc = 200
    tr_fc = swe.integrate(truth, NY, nsteps=nfc)
    prior_fc = swe.integrate(swe.unpack(jnp.asarray(flat_ens), NY, NX),
                             NY, nsteps=nfc)
    post_fc = swe.integrate(swe.unpack(jnp.asarray(post), NY, NX),
                            NY, nsteps=nfc)

    def total_rmse(fc):
        sq = sum(
            float(jnp.mean((fc[k].mean(axis=0) - tr_fc[k]) ** 2))
            for k in swe.VAR_ORDER
        )
        return np.sqrt(sq / 3.0)

    r_prior, r_post = total_rmse(prior_fc), total_rmse(post_fc)
    assert np.isfinite(r_post)
    # measured per-variable ratios at 200 steps: eta 0.56, u 0.71, v 0.78
    assert r_post < 0.9 * r_prior


def _div_rms(flat):
    """RMS horizontal divergence du/dx + dv/dy — the gravity-wave proxy
    (balanced flow is quasi-nondivergent; insertion shock shows up as a
    divergence burst)."""
    s = swe.unpack(jnp.asarray(flat), NY, NX)
    d = swe._ddx(s["u"]) + swe._ddy(s["v"], -1)
    return float(jnp.sqrt(jnp.mean(d**2)))


def test_swe_iau_suppresses_insertion_shock(spun_up):
    """Physical validation of ``iau_steps`` (Bloom et al. 1996) on a
    model that actually supports gravity waves: direct insertion of the
    analysis increment bursts the ensemble's RMS divergence ~2.7x on the
    first post-analysis forecast step, while spreading the same
    increment over 4 IAU substeps leaves the first substep unshocked
    (~1.0x) and cuts the mean post-analysis divergence ~30%.  Windows
    are matched: direct runs one 8-step forecast per cycle, IAU four
    2-step substeps.  (The L96 IAU test checks linear exactness; this
    one checks the thing IAU exists for.)"""
    _, _, flat_ens, flat_truth = spun_up
    lat, lon = swe.grid_latlon(NY, NX)
    rows = swe.var_rows("eta", NY, NX, stride=2)

    def run(iau_steps, steps_per_call):
        ens_div = []
        base_fc = swe.make_flat_forecast(NY, NX, nsteps=steps_per_call)

        def probe_fc(x):
            a = np.asarray(x)
            if a.ndim == 2 and a.shape[0] == NM:  # ensemble calls only
                ens_div.append(_div_rms(a))
            return base_fc(x)

        h = CyclingHarness(
            forecast=probe_fc,
            state_lats=lat,
            state_lons=lon,
            ob_error=1e-5,
            localize_radius=4000.0,
            obs_operator_rows=rows,
            config=FilterConfig(rtps_alpha=0.5),
            iau_steps=iau_steps,
        )
        h.run(flat_ens.copy(), flat_truth.copy(), 3, seed=3)
        return ens_div

    d_direct = run(0, 8)
    d_iau = run(4, 2)
    prior_div = d_direct[0]  # forecast of the untouched prior ensemble
    assert abs(d_iau[0] - prior_div) < 1e-12  # same first input
    # direct insertion: immediate divergence burst (measured 2.7x)
    assert d_direct[1] > 2.0 * prior_div
    # IAU: the first post-analysis substep carries only inc/4 — no burst
    # (measured 1.004x)
    assert d_iau[1] < 1.25 * prior_div
    # and the shock integrated over the experiment is clearly smaller
    # (measured 0.72x)
    assert np.mean(d_iau[1:]) < 0.85 * np.mean(d_direct[1:])


def test_swe_scrambled_members_null(spun_up):
    """Causality check: permuting the MEMBER correspondence of the wind
    blocks relative to eta destroys the eta<->wind sample covariance, so
    the same height-only update must leave wind errors essentially
    unchanged — proving the correction in the positive test flows through
    cross-variable covariances, not through some incidental channel."""
    _, _, flat_ens, flat_truth = spun_up
    rng = np.random.default_rng(13)
    perm = rng.permutation(NM)
    # guard against a fixed point mostly preserving pairings
    assert (perm != np.arange(NM)).sum() >= NM - 2
    scrambled = flat_ens.copy()
    scrambled[:, N:] = flat_ens[perm, N:]
    post = _height_obs_update(scrambled, flat_truth)
    r = _var_ratios(scrambled, post, flat_truth)
    assert r["eta"] < 0.40  # eta update unaffected by the scramble
    # winds: NO genuine correction left — with 12 members the purely
    # spurious sampling covariances actually make the winds slightly
    # worse (measured u 1.01, v 1.15), in stark contrast to the 0.78/0.83
    # of the genuine ensemble above; assert "not improved, not exploding"
    assert 0.97 < r["u"] < 1.6
    assert 0.97 < r["v"] < 1.6
