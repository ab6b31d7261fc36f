"""Boundary validation: bad inputs fail fast with named errors."""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.utils.validation import ValidationError


def test_nonfinite_ob_value_rejected():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=3)
    obs[1].value = float("nan")
    with pytest.raises(ValidationError, match="values"):
        EnSRF(state, obs, verbose=False)


def test_nonpositive_error_variance_rejected():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=2)
    obs[0].error = 0.0
    with pytest.raises(ValidationError, match="error variances"):
        EnSRF(state, obs, verbose=False)


def test_bad_latitude_rejected():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=2)
    obs[0].lat = 123.0
    with pytest.raises(ValidationError, match="latitudes"):
        EnSRF(state, obs, verbose=False)


def test_unknown_variable_rejected_at_construction():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=2)
    obs[0].obtype = "NOPE"
    with pytest.raises(KeyError, match="NOPE"):
        EnSRF(state, obs, verbose=False)


def test_single_member_state_rejected():
    state = make_demo_state(nmems=1)
    obs = make_demo_obs(state, nobs=1)
    with pytest.raises(ValidationError, match="members"):
        EnSRF(state, obs, verbose=False)


def test_negative_radius_rejected():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=2)
    obs[1].localize_radius = -5.0
    with pytest.raises(ValidationError, match="localize_radius"):
        EnSRF(state, obs, verbose=False)


def test_good_inputs_pass():
    state = make_demo_state()
    obs = make_demo_obs(state, nobs=3)
    EnSRF(state, obs, verbose=False)  # no raise
