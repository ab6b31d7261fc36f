"""Fused Pallas TPU kernel for the blocked EnSRF state update (phase 2).

Why this kernel exists: the XLA formulation of
:func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block` materializes
three ``[rows, B]`` intermediates in HBM (the inner-product matrix D0, the
localization weights W, and the recurrence accumulator U) and re-reads U
once per recurrence step — ``O(B^2 * rows)`` HBM traffic per block, which
caps the speedup from blocking.  This kernel processes one row *tile* at a
time with everything resident in VMEM:

  per grid step (one tile of TILE state rows):
    read   Xbp tile [TILE, M], mean tile, per-row lat/lon   (HBM -> VMEM)
    D0^T   = Y @ Xbp^T                      [B, TILE]   (MXU)
    W^T    = GaspariCohn(haversine(rows, obs), radii)    (VPU, VMEM only)
    B-step recurrence on U^T in VMEM scratch (one [1,B]x[B,TILE] matmul each)
    Xap    = Xbp - (g*U)^T Y                [TILE, M]   (MXU)
    xam    = xbm + gain @ U^T               [TILE]
    write  tile                             (VMEM -> HBM)

HBM traffic per obs-block = one read + one write of the state tile — the
theoretical minimum; localization weights never touch HBM (the reference
materializes a full state-length weight vector per observation,
``efa_xray/assimilation/ensrf.py:99-115``).

The transposed ``[B, TILE]`` layout keeps the recurrence's per-step writes
on the sublane axis (row stores) instead of strided lane-dim column stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efa_xray_tpu.assimilation.ensrf_core import TailSolution, ObsArrays
from efa_xray_tpu.observation.localization import EARTH_RADIUS_KM


def _arccos_poly(x):
    """arccos for x in [0, 1] via Abramowitz & Stegun 4.4.46 (|err| <= 2e-8
    rad).  Mosaic has no atan2/asin lowering, so the great-circle angle is
    computed from the haversine's asin form: c = pi - 2*arccos(sqrt(a))."""
    p = jnp.float32(-0.0012624911)
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * x + jnp.float32(c)
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p


def _gc_poly(r):
    """Gaspari-Cohn with branch select, VPU-friendly (no indexing)."""
    inner = ((((-0.25 * r + 0.5) * r + 0.625) * r - 5.0 / 3.0) * r**2) + 1.0
    r_safe = jnp.maximum(r, 1e-12)
    outer = (
        ((((r / 12.0 - 0.5) * r + 0.625) * r + 5.0 / 3.0) * r - 5.0) * r
        + 4.0
        - 2.0 / (3.0 * r_safe)
    )
    return jnp.where(r <= 1.0, inner, jnp.where(r < 2.0, outer, 0.0))


def _block_kernel(
    # inputs ([B,*] operands replicated across the grid)
    xbm_ref,  # [TILE, 1]
    xbp_ref,  # [TILE, M]
    lat_ref,  # [TILE, 1] radians
    lon_ref,  # [TILE, 1] radians
    y_ref,  # [B, M]
    ggt_ref,  # [B, B]  Gg^T: ggt[j, i] = (y_i . y_j) * sqrt_coef_i
    gain_ref,  # [1, B]
    sqrtc_ref,  # [1, B]
    oblat_ref,  # [1, B] radians
    oblon_ref,  # [1, B] radians
    invrad_ref,  # [1, B] 1/halfwidth (0 == no localization for that ob)
    # outputs
    xbm_out_ref,  # [TILE, 1]
    xbp_out_ref,  # [TILE, M]
    # scratch
    u_ref,  # [B, TILE]
    d0_ref,  # [B, TILE]
    w_ref,  # [B, TILE] localization weights (untouched when localize=False)
    *,
    bsz: int,
    localize: bool,
):
    f32 = xbp_ref.dtype
    xbp = xbp_ref[:]  # [T, M]
    y = y_ref[:]  # [B, M]

    # D0^T = Y @ Xbp^T  -> [B, TILE] on the MXU
    d0_ref[:] = jax.lax.dot_general(
        y, xbp, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )

    if localize:
        # Haversine + GC from each ob (rows) to each state row (lanes).
        lat_r = lat_ref[:].reshape(1, -1)  # [1, T]
        lon_r = lon_ref[:].reshape(1, -1)
        ob_lat = oblat_ref[0, :].reshape(-1, 1)  # [B, 1]
        ob_lon = oblon_ref[0, :].reshape(-1, 1)
        dlat = ob_lat - lat_r
        dlon = ob_lon - lon_r
        a = (
            jnp.sin(dlat * 0.5) ** 2
            + jnp.cos(lat_r) * jnp.cos(ob_lat) * jnp.sin(dlon * 0.5) ** 2
        )
        sqrt_a = jnp.sqrt(jnp.clip(a, 0.0, 1.0))
        c = jnp.float32(np.pi) - 2.0 * _arccos_poly(sqrt_a)  # = 2*asin(sqrt(a))
        dist = EARTH_RADIUS_KM * c
        invrad = invrad_ref[0, :].reshape(-1, 1)  # [B, 1]
        r = dist * invrad
        w_ref[:] = jnp.where(invrad > 0, _gc_poly(r), 1.0)  # [B, T]

    u_ref[:] = jnp.zeros_like(u_ref)

    def body(j, _):
        # d_j = D0^T[j] - (GgT[j] @ U^T): rows of U with i >= j are zero.
        ggt_row = ggt_ref[pl.ds(j, 1), :]  # [1, B]
        corr = jax.lax.dot_general(
            ggt_row, u_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [1, TILE]
        d_j = d0_ref[pl.ds(j, 1), :] - corr
        if localize:
            d_j = d_j * w_ref[pl.ds(j, 1), :]
        u_ref[pl.ds(j, 1), :] = d_j
        return 0

    jax.lax.fori_loop(0, bsz, body, 0, unroll=False)

    u_t = u_ref[:]  # [B, TILE]
    # mean update: xam = xbm + gain @ U^T
    mean_upd = jax.lax.dot_general(
        gain_ref[:], u_t, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # [1, TILE]
    xbm_out_ref[:] = xbm_ref[:] + mean_upd.reshape(-1, 1)
    # perturbation update: Xap = Xbp - (sqrt_coef * U)^T @ Y
    gu = u_t * sqrtc_ref[0, :].reshape(-1, 1)  # [B, TILE]
    upd = jax.lax.dot_general(
        gu, y, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # [TILE, M]
    xbp_out_ref[:] = xbp - upd


@functools.partial(
    jax.jit, static_argnames=("localize", "tile", "interpret")
)
def apply_obs_block_pallas(
    body_mean,  # [R]
    body_perts,  # [R, M]
    body_lat,  # [R] degrees
    body_lon,  # [R] degrees
    ye_block,  # [B, M]
    gain_coef,  # [B]
    sqrt_coef,  # [B]
    ob_lat,  # [B] degrees
    ob_lon,  # [B] degrees
    radii,  # [B] km (inf == no localization)
    localize: bool = True,
    tile: int = 1024,
    interpret: bool = False,
):
    """Apply one pre-solved obs block to the state body (fused kernel).

    Exact drop-in for
    :func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block` (with the
    localization weights computed inside).  Rows are padded to the tile
    size internally.
    """
    dtype = body_perts.dtype
    nrows, nmems = body_perts.shape
    bsz = ye_block.shape[0]

    grid = -(-nrows // tile)
    rpad = grid * tile - nrows
    if rpad:
        body_mean = jnp.pad(body_mean, (0, rpad))
        body_perts = jnp.pad(body_perts, ((0, rpad), (0, 0)))
        body_lat = jnp.pad(body_lat, (0, rpad))
        body_lon = jnp.pad(body_lon, (0, rpad))

    y = ye_block.astype(dtype)
    gram = jnp.dot(y, y.T, preferred_element_type=dtype)
    ggt = (gram * sqrt_coef[:, None].astype(dtype)).T  # [B, B], ggt[j, i]

    deg2rad = np.pi / 180.0
    inv_rad = jnp.where(
        jnp.isinf(radii), 0.0, 1.0 / jnp.abs(radii)
    ).astype(dtype)

    args = (
        body_mean.reshape(-1, 1),
        body_perts,
        (body_lat * deg2rad).astype(dtype).reshape(-1, 1),
        (body_lon * deg2rad).astype(dtype).reshape(-1, 1),
        y,
        ggt,
        gain_coef.astype(dtype).reshape(1, -1),
        sqrt_coef.astype(dtype).reshape(1, -1),
        (ob_lat * deg2rad).astype(dtype).reshape(1, -1),
        (ob_lon * deg2rad).astype(dtype).reshape(1, -1),
        inv_rad.reshape(1, -1),
    )

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tiled = lambda shape: pl.BlockSpec(
        shape, lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    out_mean, out_perts = pl.pallas_call(
        functools.partial(_block_kernel, bsz=bsz, localize=localize),
        grid=(grid,),
        in_specs=[
            tiled((tile, 1)),
            tiled((tile, nmems)),
            tiled((tile, 1)),
            tiled((tile, 1)),
            rep((bsz, nmems)),
            rep((bsz, bsz)),
            rep((1, bsz)),
            rep((1, bsz)),
            rep((1, bsz)),
            rep((1, bsz)),
            rep((1, bsz)),
        ],
        out_specs=[
            tiled((tile, 1)),
            tiled((tile, nmems)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid * tile, 1), dtype),
            jax.ShapeDtypeStruct((grid * tile, nmems), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, tile), dtype),
            pltpu.VMEM((bsz, tile), dtype),
            pltpu.VMEM((bsz, tile), dtype),
        ],
        # Mosaic stack-allocates every elementwise temp of the haversine/GC
        # chain ([B, TILE] each); the default 16 MB scoped-VMEM limit OOMs
        # at production tiles, so raise it (v5e/v5p have 128 MB VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)

    return out_mean[:nrows, 0], out_perts[:nrows]


def ensrf_blocked_body_pallas(
    body_mean,
    body_perts,
    body_lat,
    body_lon,
    tail: TailSolution,
    obs: ObsArrays,
    localize: bool = True,
    block_size: int = 64,
    tile: int = 1024,
    interpret: bool = False,
):
    """Phase 2 with the fused kernel: scan obs blocks, one pallas_call per
    block.  Same contract as
    :func:`efa_xray_tpu.assimilation.ensrf_core.ensrf_blocked_body`."""
    nobs = tail.ye.shape[0]
    if nobs == 0:
        return body_mean, body_perts
    dtype = body_perts.dtype
    nblocks = -(-nobs // block_size)
    pad = nblocks * block_size - nobs

    ye = jnp.pad(tail.ye.astype(dtype), ((0, pad), (0, 0)))
    gain = jnp.pad(tail.gain_coef.astype(dtype), (0, pad))
    sqrtc = jnp.pad(tail.sqrt_coef.astype(dtype), (0, pad))
    ob_lat = jnp.pad(obs.lats.astype(dtype), (0, pad))
    ob_lon = jnp.pad(obs.lons.astype(dtype), (0, pad))
    radii = jnp.pad(obs.radii.astype(dtype), (0, pad), constant_values=jnp.inf)

    shape = lambda a: a.reshape((nblocks, block_size) + a.shape[1:])

    def step(carry, xs):
        bm, bp = carry
        yb, gb, sb, latb, lonb, radb = xs
        bm, bp = apply_obs_block_pallas(
            bm, bp, body_lat, body_lon, yb, gb, sb, latb, lonb, radb,
            localize=localize, tile=tile, interpret=interpret,
        )
        return (bm, bp), None

    (bm, bp), _ = jax.lax.scan(
        step,
        (body_mean, body_perts),
        (shape(ye), shape(gain), shape(sqrtc), shape(ob_lat), shape(ob_lon), shape(radii)),
    )
    return bm, bp
