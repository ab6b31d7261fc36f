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

Design notes (v2/v3, informed by on-TPU measurement):

* Localization weights are computed OUTSIDE the kernel by XLA (one fused
  streaming elementwise pass).  v1 computed haversine+GC inside the
  kernel; Mosaic stack-allocates every elementwise temporary of that
  ~45-op chain at ``[B, TILE]``, which blew scoped VMEM at production
  tiles and forced tiles too small to amortize the recurrence loop.
* The state is processed as ``[VT, G, M]`` — VT = nvars*ntimes groups
  sharing one spatial grid of G points (v3).  Horizontal weights are
  computed (and stored) per GRID POINT, not per state row: for a
  4-var x 20-level state that is an 80x cut in localization trig and
  weight HBM traffic.  Vertical localization enters as a tiny
  per-(group, ob) factor ``w_vt [VT, B]`` applied as a scalar inside the
  recurrence.  Flat/scattered states are simply VT=1.
* The recurrence is panel-blocked (PANEL=8): corrections against already-
  solved panels are dense MXU matmuls; only the in-panel dependency chain
  runs as single-row steps, statically unrolled (all slicing is static —
  Mosaic has no dynamic_slice on values).
* Transposed ``[B, TILE]`` layout keeps single-row writes on the sublane
  axis instead of strided lane-dim column stores.

HBM traffic per obs-block = read + write of the state + one grid-weights
read; the reference materializes a full state-length localization vector
per *observation* (``efa_xray/assimilation/ensrf.py:99-115``).
"""

from __future__ import annotations

import functools
from typing import Optional

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
        xbm_ref,  # [1, TILE, 1]
        xbp_ref,  # [1, TILE, M]
        w_ref,  # [B, TILE] horizontal GC weights (placeholder when !localize)
        wvt_ref,  # [1, 1, B] per-(vt-group, ob) vertical weights (ones when off)
        y_ref,  # [B, M]
        ggt_ref,  # [B, B]  ggt[j, i] = (y_i . y_j) * sqrt_coef_i
        gain_ref,  # [1, B]
        sqrtc_ref,  # [1, B]
        xbm_out_ref,  # [1, TILE, 1]
        xbp_out_ref,  # [1, TILE, M]
        u_ref,  # [B, TILE] scratch
        d0_ref,  # [B, TILE] scratch
    ):
        f32 = xbp_ref.dtype
        xbp = xbp_ref[0, :, :]  # [T, M]
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
                    d_j = d_j * (w_ref[j : j + 1, :] * wvt_ref[0, 0, j])
                u_ref[j : j + 1, :] = d_j

        u_t = u_ref[:]  # [B, TILE]
        mean_upd = jax.lax.dot_general(
            gain_ref[:], u_t, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )  # [1, TILE]
        xbm_out_ref[0, :, :] = xbm_ref[0, :, :] + mean_upd.reshape(-1, 1)
        gu = u_t * sqrtc_ref[0, :].reshape(-1, 1)  # [B, TILE]
        xbp_out_ref[0, :, :] = xbp - jax.lax.dot_general(
            gu, y, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "localize", "tile", "interpret", "fast_geometry", "vertical", "ngrid",
    ),
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
    ngrid: Optional[int] = None,  # spatial points per (var,time) group
):
    """Apply one pre-solved obs block to the state body (fused kernel).

    Exact drop-in for
    :func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block` with the
    localization weights computed here (streamed by XLA per grid point,
    consumed by the kernel per tile).  ``ngrid`` declares that the R rows
    are VT = R/ngrid groups over a shared spatial grid (weights computed
    once per grid point); omit it for scattered/flat states.
    """
    dtype = body_perts.dtype
    nrows, nmems = body_perts.shape
    bsz = ye_block.shape[0]

    if ngrid is None or ngrid <= 0 or nrows % ngrid != 0:
        g = nrows
        vt = 1
    else:
        g = ngrid
        vt = nrows // ngrid

    tile = max(8, min(tile, -(-g // 8) * 8))  # never larger than the padded grid
    gtiles = max(1, -(-g // tile))
    g_pad = gtiles * tile

    def to3(a):
        """[R, ...] -> [VT, G_pad, ...] with inert padding."""
        a = a.reshape((vt, g) + a.shape[1:])
        if g_pad != g:
            widths = [(0, 0), (0, g_pad - g)] + [(0, 0)] * (a.ndim - 2)
            a = jnp.pad(a, widths)
        return a

    bm3 = to3(body_mean)[..., None]  # [VT, G_pad, 1] (Mosaic: last two dims
    # of a block must divide (8, 128) or equal the array dims; VT must stay
    # a leading, unconstrained dimension)
    bp3 = to3(body_perts)

    y = ye_block.astype(dtype)
    gram = jnp.dot(y, y.T, preferred_element_type=dtype)
    ggt = (gram * sqrt_coef[:, None].astype(dtype)).T  # ggt[j, i]

    # Horizontal weights per GRID POINT (first group's coords = the grid).
    grid_lat = body_lat[:g].astype(dtype)
    grid_lon = body_lon[:g].astype(dtype)
    if localize and fast_geometry:
        ob_xyz = latlon_to_unit(ob_lat, ob_lon).astype(dtype)
        gxyz = latlon_to_unit(grid_lat, grid_lon).astype(dtype)
        w_t = chordal_gc_weights(
            ob_xyz[:, None, :], gxyz[None, :, :], radii[:, None].astype(dtype)
        ).astype(dtype)  # [B, G]
    elif localize:
        d = haversine(
            (ob_lat[:, None].astype(dtype), ob_lon[:, None].astype(dtype)),
            (grid_lat[None, :], grid_lon[None, :]),
        )
        w_t = gaspari_cohn(d, radii[:, None].astype(dtype)).astype(dtype)
    else:
        w_t = jnp.ones((bsz, 1), dtype=dtype)
    if localize and g_pad != g:
        w_t = jnp.pad(w_t, ((0, 0), (0, g_pad - g)))

    # Vertical weights.  Grid mode (vt > 1): rows within a group share one
    # level, so the factor is a tiny [VT, B] table applied as a scalar in
    # the kernel.  Flat mode (vt == 1): levels vary per row, so fold the
    # vertical factor directly into the per-row weights.
    if localize and vertical and vt > 1:
        group_vert = body_vert.reshape(vt, g)[:, 0].astype(dtype)  # [VT]
        w_vt = gaspari_cohn(
            jnp.abs(group_vert[:, None] - ob_vert[None, :].astype(dtype)),
            ob_vrad[None, :].astype(dtype),
        ).astype(dtype)  # [VT, B]
    else:
        if localize and vertical:  # vt == 1: per-row vertical factor
            bv = body_vert.astype(dtype)
            if g_pad != g:
                bv = jnp.pad(bv, (0, g_pad - g))
            w_t = w_t * gaspari_cohn(
                jnp.abs(ob_vert[:, None].astype(dtype) - bv[None, :]),
                ob_vrad[:, None].astype(dtype),
            ).astype(dtype)
        w_vt = jnp.ones((1, bsz), dtype=dtype)
    w_vt = w_vt[:, None, :]  # [VT(or 1), 1, B]: VT leading so Mosaic's
    # last-two-dims block constraints see (1, B)
    vt_ix = (
        (lambda v, i: (v, 0, 0)) if w_vt.shape[0] > 1 else (lambda v, i: (0, 0, 0))
    )

    rep = lambda shape: pl.BlockSpec(
        shape, lambda v, i: (0, 0), memory_space=pltpu.VMEM
    )
    w_spec = (
        pl.BlockSpec((bsz, tile), lambda v, i: (0, i), memory_space=pltpu.VMEM)
        if localize
        else rep((bsz, 1))
    )

    out_mean, out_perts = pl.pallas_call(
        _make_block_kernel(bsz, localize),
        grid=(vt, gtiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, 1), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile, nmems), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM
            ),
            w_spec,
            pl.BlockSpec((1, 1, bsz), vt_ix, memory_space=pltpu.VMEM),
            rep((bsz, nmems)),
            rep((bsz, bsz)),
            rep((1, bsz)),
            rep((1, bsz)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile, 1), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile, nmems), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vt, g_pad, 1), dtype),
            jax.ShapeDtypeStruct((vt, g_pad, nmems), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, tile), dtype),
            pltpu.VMEM((bsz, tile), dtype),
        ],
        # Mosaic stack-allocates elementwise temps; leave generous headroom
        # (v5e/v5p have 128 MB VMEM).  Both grid axes are independent, so
        # declare them parallel to let the pipeline overlap tiles freely.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        bm3,
        bp3,
        w_t,
        w_vt,
        y,
        ggt,
        gain_coef.astype(dtype).reshape(1, -1),
        sqrt_coef.astype(dtype).reshape(1, -1),
    )

    out_mean = out_mean[:, :g, 0].reshape(nrows)
    out_perts = out_perts[:, :g].reshape(nrows, nmems)
    return out_mean, out_perts


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
    ngrid: Optional[int] = None,
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

    obs = obs.with_default_verts()
    ye = jnp.pad(tail.ye.astype(dtype), ((0, pad), (0, 0)))
    gain = jnp.pad(tail.gain_coef.astype(dtype), (0, pad))
    sqrtc = jnp.pad(tail.sqrt_coef.astype(dtype), (0, pad))
    ob_lat = jnp.pad(obs.lats.astype(dtype), (0, pad))
    ob_lon = jnp.pad(obs.lons.astype(dtype), (0, pad))
    radii = jnp.pad(obs.radii.astype(dtype), (0, pad), constant_values=jnp.inf)
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
            vertical=vertical, ngrid=ngrid,
        )
        return (bm, bp), None

    (bm, bp), _ = jax.lax.scan(
        step,
        (body_mean, body_perts),
        (shape(ye), shape(gain), shape(sqrtc), shape(ob_lat), shape(ob_lon),
         shape(radii), shape(overt), shape(ovrad)),
    )
    return bm, bp
