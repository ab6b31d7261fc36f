"""Fused Pallas TPU kernel for the blocked EnSRF state update (phase 2).

Why this kernel exists: the XLA formulation of
:func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block` keeps the
``[rows, B]`` recurrence accumulator U in HBM and re-reads it once per
recurrence step — ``O(B^2 * rows)`` HBM bytes per block, which caps the
speedup from blocking.  This kernel runs the whole block update one row
*tile* at a time with D0 and U resident in VMEM:

  per grid step (one tile of TILE state rows):
    read   Xbp tile [TILE, M], mean tile, weights tile [B, TILE]
    D0^T   = Y @ Xbp^T                                  (MXU)
    panel-blocked forward substitution on U^T in VMEM scratch:
      bulk cross-panel corrections as [P, done]x[done, TILE] MXU matmuls,
      P tiny in-panel steps (statically unrolled)
    Xap    = Xbp - (g*U)^T Y                            (MXU)
    xam    = xbm + gain @ U^T
    write  tile

Design notes (v2, informed by on-TPU measurement of v1):

* The localization weights are computed OUTSIDE the kernel by XLA (one
  fused streaming elementwise pass, written once to HBM and read once
  here).  v1 computed haversine+Gaspari-Cohn inside the kernel; Mosaic
  stack-allocates every elementwise temporary of that ~45-op chain at
  ``[B, TILE]``, which blew scoped VMEM at production tiles and forced
  tiles too small to amortize the recurrence loop.  The extra HBM traffic
  is one ``[rows, B]`` read per block — ~1/3 of the state read — a good
  trade for 8x larger tiles.
* The recurrence is panel-blocked (PANEL=8): corrections against already-
  solved panels are dense MXU matmuls; only the in-panel dependency chain
  runs as single-row steps, statically unrolled (B and PANEL are trace-time
  constants, so all slicing is static — no dynamic_slice in the kernel).
* Transposed ``[B, TILE]`` layout keeps single-row writes on the sublane
  axis instead of strided lane-dim column stores.

HBM traffic per obs-block = read + write of the state tile + one weights
read; the reference materializes a full state-length localization vector
per *observation* (``efa_xray/assimilation/ensrf.py:99-115``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efa_xray_tpu.assimilation.ensrf_core import TailSolution, ObsArrays
from efa_xray_tpu.observation.localization import (
    chordal_gc_weights,
    gaspari_cohn,
    haversine,
    latlon_to_unit,
)

PANEL = 8


def _make_block_kernel(bsz: int, localize: bool):
    def kernel(
        xbm_ref,  # [TILE, 1]
        xbp_ref,  # [TILE, M]
        w_ref,  # [B, TILE] GC weights (all-ones placeholder when !localize)
        y_ref,  # [B, M]
        ggt_ref,  # [B, B]  ggt[j, i] = (y_i . y_j) * sqrt_coef_i
        gain_ref,  # [1, B]
        sqrtc_ref,  # [1, B]
        xbm_out_ref,  # [TILE, 1]
        xbp_out_ref,  # [TILE, M]
        u_ref,  # [B, TILE] scratch
        d0_ref,  # [B, TILE] scratch
    ):
        f32 = xbp_ref.dtype
        xbp = xbp_ref[:]  # [T, M]
        y = y_ref[:]  # [B, M]

        # D0^T = Y @ Xbp^T on the MXU.
        d0_ref[:] = jax.lax.dot_general(
            y, xbp, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )

        # Panel-blocked forward substitution.  All indices static.
        npanels = -(-bsz // PANEL)
        for q in range(npanels):
            base = q * PANEL
            width = min(PANEL, bsz - base)
            if base > 0:
                # bulk correction against all solved panels: one MXU matmul
                corr = jax.lax.dot_general(
                    ggt_ref[base : base + width, 0:base],
                    u_ref[0:base, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                d_panel = d0_ref[base : base + width, :] - corr
            else:
                d_panel = d0_ref[0:width, :]
            for t in range(width):
                j = base + t
                if t > 0:
                    corr2 = jax.lax.dot_general(
                        ggt_ref[j : j + 1, base : base + t],
                        u_ref[base : base + t, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    d_j = d_panel[t : t + 1, :] - corr2
                else:
                    d_j = d_panel[0:1, :]
                if localize:
                    d_j = d_j * w_ref[j : j + 1, :]
                u_ref[j : j + 1, :] = d_j

        u_t = u_ref[:]  # [B, TILE]
        mean_upd = jax.lax.dot_general(
            gain_ref[:], u_t, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )  # [1, TILE]
        xbm_out_ref[:] = xbm_ref[:] + mean_upd.reshape(-1, 1)
        gu = u_t * sqrtc_ref[0, :].reshape(-1, 1)  # [B, TILE]
        xbp_out_ref[:] = xbp - jax.lax.dot_general(
            gu, y, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("localize", "tile", "interpret", "fast_geometry", "vertical"),
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
    tile: int = 16384,
    interpret: bool = False,
    fast_geometry: bool = False,
    body_vert=None,  # [R] vertical coordinate per row
    ob_vert=None,  # [B]
    ob_vrad=None,  # [B] vertical GC halfwidth (inf = off)
    vertical: bool = False,
):
    """Apply one pre-solved obs block to the state body (fused kernel).

    Exact drop-in for
    :func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block` with the
    localization weights computed here (streamed by XLA, consumed by the
    kernel).  Rows are padded to the tile size internally.
    """
    dtype = body_perts.dtype
    nrows, nmems = body_perts.shape
    bsz = ye_block.shape[0]

    grid = max(1, -(-nrows // tile))
    rpad = grid * tile - nrows
    if rpad:
        body_mean = jnp.pad(body_mean, (0, rpad))
        body_perts = jnp.pad(body_perts, ((0, rpad), (0, 0)))
        body_lat = jnp.pad(body_lat, (0, rpad))
        body_lon = jnp.pad(body_lon, (0, rpad))
        if vertical:
            body_vert = jnp.pad(body_vert, (0, rpad))

    y = ye_block.astype(dtype)
    gram = jnp.dot(y, y.T, preferred_element_type=dtype)
    ggt = (gram * sqrt_coef[:, None].astype(dtype)).T  # ggt[j, i]

    if localize and fast_geometry:
        # Chordal path: 3-FMA dots + polynomial arccos, no transcendentals.
        ob_xyz = latlon_to_unit(ob_lat, ob_lon).astype(dtype)
        body_xyz = latlon_to_unit(body_lat, body_lon).astype(dtype)
        w_t = chordal_gc_weights(
            ob_xyz[:, None, :], body_xyz[None, :, :], radii[:, None].astype(dtype)
        ).astype(dtype)  # [B, R]
    elif localize:
        # One fused streaming pass in XLA; the kernel reads it tile-wise.
        d = haversine(
            (ob_lat[:, None].astype(dtype), ob_lon[:, None].astype(dtype)),
            (body_lat[None, :].astype(dtype), body_lon[None, :].astype(dtype)),
        )
        w_t = gaspari_cohn(d, radii[:, None].astype(dtype)).astype(dtype)  # [B, R]
    else:
        w_t = jnp.ones((bsz, 1), dtype=dtype)  # placeholder, broadcast via spec
    if localize and vertical:
        w_t = w_t * gaspari_cohn(
            jnp.abs(ob_vert[:, None].astype(dtype) - body_vert[None, :].astype(dtype)),
            ob_vrad[:, None].astype(dtype),
        ).astype(dtype)

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tiled = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = (
        pl.BlockSpec((bsz, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        if localize
        else rep((bsz, 1))
    )

    out_mean, out_perts = pl.pallas_call(
        _make_block_kernel(bsz, localize),
        grid=(grid,),
        in_specs=[
            tiled((tile, 1)),
            tiled((tile, nmems)),
            w_spec,
            rep((bsz, nmems)),
            rep((bsz, bsz)),
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
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        body_mean.reshape(-1, 1),
        body_perts,
        w_t,
        y,
        ggt,
        gain_coef.astype(dtype).reshape(1, -1),
        sqrt_coef.astype(dtype).reshape(1, -1),
    )

    return out_mean[:nrows, 0], out_perts[:nrows]


def ensrf_blocked_body_pallas(
    body_mean,
    body_perts,
    body_lat,
    body_lon,
    tail: TailSolution,
    obs: ObsArrays,
    localize: bool = True,
    block_size: int = 128,
    tile: int = 16384,
    interpret: bool = False,
    fast_geometry: bool = False,
    body_vert=None,
    vertical: bool = False,
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
    obs = obs.with_default_verts()
    overt = jnp.pad(obs.verts.astype(dtype), (0, pad))
    ovrad = jnp.pad(obs.vert_radii.astype(dtype), (0, pad), constant_values=jnp.inf)

    shape = lambda a: a.reshape((nblocks, block_size) + a.shape[1:])

    def step(carry, xs):
        bm, bp = carry
        yb, gb, sb, latb, lonb, radb, vertb, vradb = xs
        bm, bp = apply_obs_block_pallas(
            bm, bp, body_lat, body_lon, yb, gb, sb, latb, lonb, radb,
            localize=localize, tile=tile, interpret=interpret,
            fast_geometry=fast_geometry,
            body_vert=body_vert, ob_vert=vertb, ob_vrad=vradb,
            vertical=vertical,
        )
        return (bm, bp), None

    (bm, bp), _ = jax.lax.scan(
        step,
        (body_mean, body_perts),
        (shape(ye), shape(gain), shape(sqrtc), shape(ob_lat), shape(ob_lon),
         shape(radii), shape(overt), shape(ovrad)),
    )
    return bm, bp
