"""Optional xarray interop.

The reference's state IS an ``xarray.Dataset`` subclass; users migrating
from it will want to move Datasets in and out.  xarray is not installed in
every deployment (not in this build image), so these shims import it
lazily and raise a clear error when absent.  The core framework never
depends on xarray (the thin-shim requirement of BASELINE.json).
"""

from __future__ import annotations

import numpy as np

from efa_xray_tpu.state.ensemble import EnsembleState, _COORD_NAMES


def _require_xarray():
    try:
        import xarray  # noqa: F401

        return xarray
    except ImportError as e:  # pragma: no cover - xarray absent in CI image
        raise ImportError(
            "xarray is not installed; install it to use the xarray shims "
            "(the core framework does not need it)"
        ) from e


def from_xarray(ds, dtype=None) -> EnsembleState:
    """Build an EnsembleState from an xarray.Dataset shaped like the
    reference's (dims ``validtime, y, x, mem`` or ``validtime, location,
    mem``; coords ``lat``/``lon``)."""
    _require_xarray()
    var_names = [v for v in ds.data_vars if v not in _COORD_NAMES]
    vardict = {}
    for v in var_names:
        da = ds[v]
        dims = tuple(da.dims)
        if dims[-1] != "mem":
            da = da.transpose(..., "mem")
        vardict[v] = np.asarray(da.values)
    coorddict = {
        "validtime": np.asarray(ds["validtime"].values),
        "lat": np.asarray(ds["lat"].values),
        "lon": np.asarray(ds["lon"].values),
        "mem": np.asarray(ds["mem"].values),
    }
    return EnsembleState.from_vardict(vardict, coorddict, dtype=dtype)


def to_xarray(state: EnsembleState):
    """Convert an EnsembleState back to an xarray.Dataset with the
    reference's dimension conventions."""
    xr = _require_xarray()
    s = state.structure
    data = np.asarray(state.data)
    grid_dims = ("y", "x")
    coords = {
        "validtime": ("validtime", s.times64()),
        "lat": (grid_dims, np.asarray(s.lat)),
        "lon": (grid_dims, np.asarray(s.lon)),
        "mem": ("mem", np.arange(s.nmems)),
    }
    data_vars = {
        name: (("validtime", "y", "x", "mem"), data[vi])
        for vi, name in enumerate(s.var_names)
    }
    return xr.Dataset(data_vars, coords=coords)
