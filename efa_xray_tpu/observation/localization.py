"""Covariance localization and great-circle geometry, as pure JAX functions.

Capability parity targets in the reference:

* ``gaspari_cohn`` — ``efa_xray/observation/observation.py:117-130``
  (5th-order piecewise polynomial, compact support at ``2 * halfwidth``).
* ``haversine``   — ``efa_xray/observation/observation.py:135-146`` and
  ``efa_xray/state/ensemble.py:241-252`` (R = 6371 km).
* ``distance_to_point`` — vectorized haversine from one point to a grid,
  ``efa_xray/state/ensemble.py:254-267``.

Unlike the reference these are jit/vmap/grad-safe: no boolean fancy
indexing, no data-dependent branches.  A ``halfwidth`` of ``inf`` gives
weights identically 1 (the "no localization for this ob" case the reference
crashes on — ``efa_xray/observation/observation.py:76-83`` calls
``gaspari_cohn(d, None)``; here ``r = d / inf = 0`` falls out naturally).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EARTH_RADIUS_KM = 6371.0


def gaspari_cohn(distances, halfwidth):
    """Gaspari & Cohn (1999) eq. 4.10 compactly-supported correlation.

    ``distances`` and ``halfwidth`` are in the same units (km here);
    support vanishes beyond ``2 * |halfwidth|``.  Accepts array-valued
    ``halfwidth`` broadcastable against ``distances`` (per-observation
    localization radii), and ``inf`` for "no localization".
    """
    distances = jnp.asarray(distances)
    r = distances / jnp.abs(halfwidth)
    # Branch polynomials evaluated everywhere, then selected; this is the
    # jit-safe equivalent of the reference's masked assignments.
    inner = ((((-0.25 * r + 0.5) * r + 0.625) * r - 5.0 / 3.0) * r**2) + 1.0
    # Guard r == 0 in the outer branch's 2/(3r) term before selecting.
    r_safe = jnp.where(r > 0, r, 1.0)
    outer = (
        ((((r / 12.0 - 0.5) * r + 0.625) * r + 5.0 / 3.0) * r - 5.0) * r
        + 4.0
        - 2.0 / (3.0 * r_safe)
    )
    w = jnp.where(r <= 1.0, inner, jnp.where(r < 2.0, outer, 0.0))
    return w


def haversine(loc1, loc2):
    """Great-circle distance (km) between two (lat, lon) pairs in degrees.

    Broadcasts elementwise over array-valued coordinates.
    """
    lat1 = jnp.radians(jnp.asarray(loc1[0]))
    lat2 = jnp.radians(jnp.asarray(loc2[0]))
    dlat = lat2 - lat1
    dlon = jnp.radians(jnp.asarray(loc2[1]) - jnp.asarray(loc1[1]))
    a = jnp.sin(dlat / 2.0) ** 2 + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon / 2.0) ** 2
    c = 2.0 * jnp.arctan2(jnp.sqrt(a), jnp.sqrt(1.0 - a))
    return EARTH_RADIUS_KM * c


def distance_to_point(grid_lat, grid_lon, lat, lon):
    """Haversine distance (km) from point ``(lat, lon)`` to every grid point.

    ``grid_lat``/``grid_lon`` may be any shape; the result broadcasts.
    Also broadcasts over batched points if ``lat``/``lon`` carry leading
    dims that broadcast against the grid arrays.
    """
    return haversine((grid_lat, grid_lon), (lat, lon))


def pairwise_distance(lats1, lons1, lats2, lons2):
    """All-pairs haversine distances: result ``[len(1), len(2)]`` in km."""
    lats1 = jnp.asarray(lats1)[:, None]
    lons1 = jnp.asarray(lons1)[:, None]
    lats2 = jnp.asarray(lats2)[None, :]
    lons2 = jnp.asarray(lons2)[None, :]
    return haversine((lats1, lons1), (lats2, lons2))


def localization_weights(grid_lat, grid_lon, ob_lat, ob_lon, halfwidth):
    """Gaspari-Cohn weights from one observation to a field of points.

    Equivalent of ``Observation.localize`` against an ``EnsembleState``
    (``efa_xray/observation/observation.py:59-87``), with ``halfwidth=inf``
    meaning no localization (weights = 1).
    """
    d = distance_to_point(grid_lat, grid_lon, ob_lat, ob_lon)
    return gaspari_cohn(d, halfwidth)


def latlon_to_unit(lat, lon):
    """(lat, lon) degrees -> unit vectors on the sphere, shape [..., 3]."""
    phi = jnp.radians(jnp.asarray(lat))
    lam = jnp.radians(jnp.asarray(lon))
    cphi = jnp.cos(phi)
    return jnp.stack([cphi * jnp.cos(lam), cphi * jnp.sin(lam), jnp.sin(phi)], axis=-1)


def _arccos_as(t):
    """arccos for t in [0, 1] via Abramowitz & Stegun 4.4.46 (|err| <= 2e-8
    rad): sqrt(1-t) * p(t).  Extended to [-1, 0) by pi - arccos(-t)."""
    x = jnp.abs(t)
    p = jnp.asarray(-0.0012624911, dtype=t.dtype)
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * x + jnp.asarray(c, dtype=t.dtype)
    a = jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p
    return jnp.where(t >= 0, a, jnp.pi - a)


def chordal_gc_weights(row_xyz, ob_xyz, halfwidth):
    """Gaspari-Cohn weights from precomputed unit vectors — the fast
    geometry path.

    Per pair: a 3-FMA dot product + a polynomial arccos (one sqrt, no
    transcendentals) instead of the haversine's two sines + sqrt + atan2.
    Max angle error 2e-8 rad (~1.3e-4 km) from the polynomial; f32 rounding
    of the dot adds O(100 m) jitter at short range where the GC taper is
    flat, so weight errors stay < 1e-4.  Used when
    ``FilterConfig.fast_geometry`` is on; the default path keeps the exact
    reference-parity haversine.

    ``row_xyz``: [..., 3]; ``ob_xyz``: broadcastable [..., 3];
    ``halfwidth``: broadcastable km (inf -> weight 1).
    """
    dot = jnp.clip(jnp.sum(row_xyz * ob_xyz, axis=-1), -1.0, 1.0)
    dist = EARTH_RADIUS_KM * _arccos_as(dot)
    return gaspari_cohn(dist, halfwidth)


def morton3d_keys(xyz, bits: int = 10):
    """Morton (Z-order) keys for unit vectors: uint32, ``bits`` per axis.

    Sorting rows of a scattered state by these keys makes consecutive rows
    spatially adjacent on the sphere, so a contiguous row tile covers a
    compact cap — the property the fused kernel's localization culling
    (:mod:`efa_xray_tpu.ops.ensrf_pallas_fused`) needs to skip
    (row-tile, obs-block) pairs whose Gaspari-Cohn weights are all zero.
    """
    scale = jnp.uint32((1 << bits) - 1)
    q = jnp.clip((jnp.asarray(xyz) + 1.0) * 0.5 * float((1 << bits) - 1),
                 0.0, float((1 << bits) - 1)).astype(jnp.uint32)
    q = jnp.minimum(q, scale)

    def spread(v):
        v = v & jnp.uint32(0x3FF)
        v = (v | (v << 16)) & jnp.uint32(0xFF0000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0F00F00F)
        v = (v | (v << 4)) & jnp.uint32(0xC30C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x49249249)
        return v

    return (
        spread(q[..., 0])
        | (spread(q[..., 1]) << jnp.uint32(1))
        | (spread(q[..., 2]) << jnp.uint32(2))
    )


def hilbert3d_keys(xyz, bits: int = 10):
    """Hilbert-curve keys for unit vectors: uint32, ``bits`` per axis.

    Same role as :func:`morton3d_keys`, but the Hilbert curve has no
    Z-order jumps: every pair of consecutive cells is face-adjacent, so
    contiguous tiles cover more compact caps.  Measured on the
    1e7-row pod workload this tightens the fused kernel's cull bound from
    19.6% to 17.9% alive panels (Hilbert rows + obs vs Morton both).
    Vectorized Skilling AxesToTranspose (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004) + MSB-first interleave;
    3 * bits <= 30 bits fit a uint32 at the default precision.
    """
    n = float((1 << bits) - 1)
    q = jnp.clip((jnp.asarray(xyz) + 1.0) * 0.5 * n, 0.0, n).astype(
        jnp.uint32
    )
    X = [q[..., 0], q[..., 1], q[..., 2]]
    Q = 1 << (bits - 1)
    while Q > 1:
        P = jnp.uint32(Q - 1)
        for i in range(3):
            m = (X[i] & jnp.uint32(Q)) != 0
            X[0] = jnp.where(m, X[0] ^ P, X[0])
            t = jnp.where(m, jnp.uint32(0), (X[0] ^ X[i]) & P)
            X[0] = X[0] ^ t
            X[i] = X[i] ^ t
        Q >>= 1
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (bits - 1)
    while Q > 1:
        m = (X[2] & jnp.uint32(Q)) != 0
        t = jnp.where(m, t ^ jnp.uint32(Q - 1), t)
        Q >>= 1
    X = [x ^ t for x in X]
    key = jnp.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(3):
            key = (key << jnp.uint32(1)) | (
                (X[i] >> jnp.uint32(b)) & jnp.uint32(1)
            )
    return key


def spatial_sort_order(lat, lon, bits: int = 10):
    """Permutation that orders points by spherical Hilbert key.

    Returns an index array usable with ``np.take``/``jnp.take``.  Row order
    of a state is a free (exact) choice — per-row EnSRF updates are
    row-local — while OBSERVATION order is part of the serial algorithm's
    definition (the reference itself shuffles it, ``efa_demo.ipynb`` cell
    11); sorting obs spatially is therefore an explicit, documented choice
    that picks one valid assimilation order that maximizes localization
    sparsity.  Hilbert keys replaced Morton in round 3 (jump-free curve →
    more compact row tiles → measured 19.6% → 17.9% alive cull panels at
    the pod workload).
    """
    return jnp.argsort(hilbert3d_keys(latlon_to_unit(lat, lon), bits=bits))


def gaspari_cohn_np(distances, halfwidth):
    """NumPy twin of :func:`gaspari_cohn` for host-side/test use."""
    r = np.asarray(distances, dtype=np.float64) / abs(halfwidth)
    inner = ((((-0.25 * r + 0.5) * r + 0.625) * r - 5.0 / 3.0) * r**2) + 1.0
    r_safe = np.where(r > 0, r, 1.0)
    outer = (
        ((((r / 12.0 - 0.5) * r + 0.625) * r + 5.0 / 3.0) * r - 5.0) * r
        + 4.0
        - 2.0 / (3.0 * r_safe)
    )
    return np.where(r <= 1.0, inner, np.where(r < 2.0, outer, 0.0))
