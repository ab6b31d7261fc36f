"""Fully-fused EnSRF phase-2 kernel (v4): the state crosses HBM once.

v3 (:mod:`efa_xray_tpu.ops.ensrf_pallas`) launches one ``pallas_call`` per
obs block: per block the state is read from and written back to HBM, so a
2048-obs update at block 128 moves the state 16 times (~20 GB at the
headline size).  v4 inverts the loop nest: grid = ``(row_tiles, blocks)``
with blocks INNERMOST ("arbitrary" dimension) and output block index
independent of the block coordinate, so Pallas keeps each state tile
resident in VMEM while every obs block is applied to it and writes it back
once.  Total state HBM traffic: one read + one write for the whole update.

Localization weights are computed inside the kernel, panel-wise
(``[PANEL=8, TILE]`` chunks of the chordal unit-vector chain).  This is
what v1 got wrong: Mosaic stack-allocates every elementwise temporary, and
a full ``[B, TILE]`` trig chain blew scoped VMEM; at panel granularity the
same chain costs ~8 MB of temporaries.  The chordal form (3-FMA dot +
Abramowitz-Stegun arccos polynomial) avoids Mosaic's missing
atan2/asin lowerings.

Scope: flat states (vt = 1) — the headline/scattered case where per-row
weights genuinely differ row-by-row.  Multi-group gridded states keep v3,
whose per-grid-point weight sharing already removes the redundancy that
matters there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efa_xray_tpu.assimilation.ensrf_core import TailSolution, ObsArrays
from efa_xray_tpu.observation.localization import EARTH_RADIUS_KM, latlon_to_unit

PANEL = 8


def _asin2_poly_u(u, f32):
    """``2*asin(s)/s`` as a degree-6 Chebyshev-fitted polynomial in
    ``u = s^2``, minimax on s in [0, 0.71] (|angle err| <= 6e-7 rad,
    i.e. < 4 m on Earth — below the f32 noise of the chain).

    With ``s = sin(theta/2) = sqrt((1 - dot)/2)`` this gives the
    great-circle angle ``theta = s * poly(u)`` in ~half the VPU ops of
    the half-angle A&S-arccos form (one sqrt instead of two, 6 FMAs
    instead of 8 + extras): the weight chain measured 36% of the fused
    body at the pod workload (benchmarks/body_anatomy.py, round 5), so
    the op count is on the critical path.  Valid while the Gaspari-Cohn
    support stays inside s <= 0.71, i.e. localization radii <= 5000 km —
    the wrapper selects this form only when the caller certifies
    ``max_radius_km`` (per-ob radii are host-known in EnSRF), else the
    full-range arccos form below is used."""
    p = jnp.asarray(0.1920979908, dtype=f32)
    for c in (
        -0.0963332506,
        0.1146914397,
        0.0793335722,
        0.1508451291,
        0.3333070474,
        2.0000001309,
    ):
        p = p * u + jnp.asarray(c, dtype=f32)
    return p


def _arccos_poly(x, f32):
    """A&S 4.4.46 arccos for x in [0, 1]: sqrt(1-x) * p(x), |err| <= 2e-8."""
    p = jnp.asarray(-0.0012624911, dtype=f32)
    for c in (
        0.0066700901,
        -0.0170881256,
        0.0308918810,
        -0.0501743046,
        0.0889789874,
        -0.2145988016,
        1.5707963050,
    ):
        p = p * x + jnp.asarray(c, dtype=f32)
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * p


def _gc_poly(r, outer_form: str = "exact"):
    inner = ((((-0.25 * r + 0.5) * r + 0.625) * r - 5.0 / 3.0) * r**2) + 1.0
    if outer_form == "poly":
        # Degree-7 Chebyshev fit of the outer branch on r in [1, 2],
        # CENTERED at t = r - 1.5 so the coefficients stay O(0.4) and the
        # f32 Horner adds no cancellation noise (|err| <= 2.2e-6 in f32 —
        # the chordal-mode weight tolerance): drops the 2/(3r) reciprocal
        # from the per-pair chain.  Selected with the series angle form
        # (same accuracy budget).
        t = r - 1.5
        outer = jnp.asarray(0.0332721029, dtype=r.dtype)
        for c in (
            -0.0484752690,
            0.1405191778,
            0.0386425652,
            -0.3682243569,
            0.3440689601,
            -0.1255802356,
            0.0164935268,
        ):
            outer = outer * t + jnp.asarray(c, dtype=r.dtype)
    else:
        r_safe = jnp.maximum(r, 1e-12)
        outer = (
            ((((r / 12.0 - 0.5) * r + 0.625) * r + 5.0 / 3.0) * r - 5.0) * r
            + 4.0
            - 2.0 / (3.0 * r_safe)
        )
    return jnp.where(r <= 1.0, inner, jnp.where(r < 2.0, outer, 0.0))


def _make_fused_kernel(bsz: int, localize: bool, vertical: bool,
                       cull: bool, hybrid: bool = False,
                       panel: int = PANEL, ablate: tuple = (),
                       corr2_form: str = "dot", mxu_bf16: bool = False,
                       angle_form: str = "arccos"):
    # ``ablate`` is a TIMING-ONLY instrument (benchmarks/body_anatomy.py):
    # each named piece of the alive-panel work is skipped so its cost can
    # be measured by difference on the real chip.  Results are WRONG under
    # any ablation; production callers always pass ().
    #   "d0"        zero the y @ X^T priors matmul
    #   "weights"   skip the chordal-angle + Gaspari-Cohn weight chain
    #   "panelcorr" skip the panel-level correction matmul
    #   "corr2"     skip the per-ob left-looking correction matvecs
    #   "final"     skip the rank-B mean/perturbation application matmuls
    def kernel(
        bits_ref,  # scalar-prefetch [gtiles, nblocks] int32 (SMEM): bit q
        # set = panel q of this (row-tile, obs-block) pair may have a
        # nonzero localization weight; 0 = the whole pair is provably dead
        # and skipped (exact).  Ignored when ``cull`` is statically off.
        xbm_in_ref,  # [1, TILE]
        xbp_in_ref,  # [TILE, M]
        geom_ref,  # [5, TILE] rows: unit-vector x, y, z, vertical coord,
        # static-B sigma (hybrid mode; zeros otherwise).
        # Packed with rows on the SUBLANE axis: a [TILE, 1] column operand
        # would be lane-padded 128x by Mosaic's (8, 128) tiling — at 4M
        # state rows that is 2 GB of HBM padding PER coordinate (measured
        # OOM); [5, TILE] costs only the 5->8 sublane round-up.
        y_ref,  # [1, B, M] this block's ye rows
        ggt_ref,  # [1, B, B]; pure: gram pre-scaled by g rows; hybrid: RAW
        # gram (the corrections run against the stored V columns, which
        # already carry g and the static term)
        gain_ref,  # [1, 1, B]
        sqrtc_ref,  # [1, 1, B]
        ox_ref,  # [1, 1, B] ob unit vectors
        oy_ref,  # [1, 1, B]
        oz_ref,  # [1, 1, B]
        invrad_ref,  # [1, 1, B] 1/halfwidth (0 = no localization for the ob)
        overt_ref,  # [1, 1, B] ob vertical coordinate
        invvrad_ref,  # [1, 1, B] 1/vertical-halfwidth (0 = off for the ob)
        sgain_ref,  # [1, 1, B] hybrid static mean scalar sg_j (0 = skip)
        ssqrt_ref,  # [1, 1, B] hybrid static sqrt scalar ss_j
        invslen_ref,  # [1, 1, B] 1/static_length km (hybrid)
        xbm_out_ref,  # [1, TILE] revisited across blocks
        xbp_out_ref,  # [TILE, M] revisited across blocks
        u_ref,  # [B, TILE] scratch: pure = U columns; hybrid = V columns
        d0_ref,  # [B, TILE] scratch
        mean_ref,  # [1, TILE] scratch: hybrid mean accumulator (U is not
        # stored there, so the mean is accumulated as the columns solve)
    ):
        f32 = xbp_in_ref.dtype
        t = pl.program_id(0)
        b = pl.program_id(1)
        bits = bits_ref[t, b] if cull else jnp.int32(1)

        @pl.when(b == 0)
        def _():
            xbm_out_ref[:] = xbm_in_ref[:]
            xbp_out_ref[:] = xbp_in_ref[:]

        # Localization culling: when the tile/block bounding caps prove
        # w == 0 for every (ob, row) pair here, u would be identically zero
        # and the state update a no-op — skipping is exact, and with
        # spatially sorted rows + obs it removes most blocks (GC support
        # 2*halfwidth covers ~10% of the sphere at 2000 km).  In hybrid
        # mode the bound covers the static column too (cull_masks widens
        # the support to max(radius, static_length)).
        @pl.when(bits != 0)
        def _():
            xbp = xbp_out_ref[:]  # current tile state (resident across blocks)
            y = y_ref[0, :, :]  # [B, M]

            if "d0" in ablate:
                d0_ref[:] = jnp.zeros_like(d0_ref)
            else:
                # mxu_bf16: explicit bf16 input casts (f32 accumulation)
                # on the two LARGE matmuls (this one and the final rank-B
                # apply).  MEASURED NO-OP at default matmul precision on
                # v5e: the MXU already truncates f32 dot inputs to bf16
                # single-pass, bit-identically (benchmarks/bf16_ab.py,
                # precision_probe.py) — the casts only add VPU work.
                # Meaningful in interpret mode (true-f32 dots there) and
                # under jax.default_matmul_precision("highest"), where
                # they buy back single-pass speed on just these two dots.
                ly, lx = (
                    (y.astype(jnp.bfloat16), xbp.astype(jnp.bfloat16))
                    if mxu_bf16 else (y, xbp)
                )
                d0_ref[:] = jax.lax.dot_general(
                    ly, lx, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
            if hybrid:
                mean_ref[:] = jnp.zeros_like(mean_ref)

            need_geo = localize or hybrid
            if need_geo:
                bx = geom_ref[0:1, :]  # [1, T]
                by = geom_ref[1:2, :]
                bz = geom_ref[2:3, :]
                if vertical:
                    bv = geom_ref[3:4, :]  # [1, T]
                if hybrid:
                    bsig = geom_ref[4:5, :]  # [1, T]

            npanels = -(-bsz // panel)
            for q in range(npanels):
                base = q * panel
                width = min(panel, bsz - base)

                def _panel_body(base=base, width=width):
                    if base > 0 and "panelcorr" not in ablate:
                        corr = jax.lax.dot_general(
                            ggt_ref[0, base : base + width, 0:base],
                            u_ref[0:base, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=f32,
                        )
                        d_panel = d0_ref[base : base + width, :] - corr
                    else:
                        d_panel = d0_ref[base : base + width, :]
                    # The hybrid static column needs the chordal angles even
                    # when the "weights" ablation drops the localization
                    # taper (dist is consumed at the `if hybrid:` below).
                    if need_geo and ("weights" not in ablate or hybrid):
                        # Panel's chordal angles [width, TILE] from unit
                        # vectors (shared by the localization taper and
                        # the hybrid static correlation).
                        ox = ox_ref[0, 0, base : base + width].reshape(-1, 1)
                        oy = oy_ref[0, 0, base : base + width].reshape(-1, 1)
                        oz = oz_ref[0, 0, base : base + width].reshape(-1, 1)
                        dot = jnp.clip(ox * bx + oy * by + oz * bz, -1.0, 1.0)
                        if angle_form == "series":
                            # theta = s * poly(s^2), s = sin(theta/2):
                            # half the ops of the arccos form; wrapper
                            # certifies radii <= 5000 km (see
                            # _asin2_poly_u).
                            su = (1.0 - dot) * 0.5
                            ang = jnp.sqrt(su) * _asin2_poly_u(su, f32)
                        else:
                            # arccos(dot) via the half-angle form
                            # c = 2*arccos(cos(c/2)):
                            # cos(c/2) = sqrt((1+dot)/2) keeps precision
                            # near c = 0.
                            ang = 2.0 * _arccos_poly(
                                jnp.sqrt(
                                    jnp.clip((1.0 + dot) * 0.5, 0.0, 1.0)
                                ), f32
                            )
                        dist = EARTH_RADIUS_KM * ang
                    if localize and "weights" not in ablate:
                        r = dist * invrad_ref[
                            0, 0, base : base + width
                        ].reshape(-1, 1)
                        w_panel = jnp.where(
                            invrad_ref[0, 0, base : base + width].reshape(-1, 1)
                            > 0,
                            _gc_poly(r, "poly" if angle_form == "series"
                                     else "exact"),
                            1.0,
                        )
                        if vertical:
                            ov = overt_ref[0, 0, base : base + width].reshape(
                                -1, 1
                            )
                            ivr = invvrad_ref[
                                0, 0, base : base + width
                            ].reshape(-1, 1)
                            rv = jnp.abs(bv - ov) * ivr
                            w_panel = w_panel * jnp.where(
                                ivr > 0, _gc_poly(rv), 1.0
                            )
                    if hybrid:
                        # Static columns s_j = sigma_row * gc(d, L_B)
                        # scaled per ob by ss_j (perts) / sg_j (mean).
                        gc_s = _gc_poly(
                            dist
                            * invslen_ref[0, 0, base : base + width].reshape(
                                -1, 1
                            )
                        )
                        s_panel = bsig * gc_s  # [width, TILE]
                    # Within-panel recurrence, LEFT-looking (per-ob small
                    # dot against the already-solved columns).  A
                    # right-looking variant — subtract each solved
                    # column's rank-1 contribution from the remaining d0
                    # rows in one [rem, TILE] FMA, removing the per-ob
                    # matmuls — was measured SLOWER at the pod workload
                    # (0.913 s vs 0.818 s body; the in-place VMEM
                    # read-modify-writes cost more than the small dots),
                    # as were panel widths 4 and 16 (1.55 / 1.47 s) — see
                    # benchmarks/pod_tile_sweep.py --panels.  The
                    # corr2_form="fma" variant below (scalar-broadcast
                    # VPU chain on register-resident columns, no MXU)
                    # was ALSO measured slower — headline body 56 vs
                    # 24 ms — the [1, TILE] one-sublane rows waste 7/8
                    # of the VPU and the [1, 1] broadcasts don't
                    # pipeline; the one-sublane MXU dots win despite
                    # their ~1/128 array utilization ("corr2-form" entry
                    # in benchmarks/results_v5e_r3.json).
                    u_rows = []  # corr2_form="fma": panel's solved columns
                    # as live VALUES so the correction never re-reads VMEM
                    for t in range(width):
                        j = base + t
                        if t > 0 and "corr2" not in ablate:
                            if corr2_form == "fma":
                                # Scalar-broadcast VPU FMA chain instead
                                # of a [1, t] x [t, TILE] MXU dot: the dot
                                # writes ONE output sublane (<= 1/128 MXU
                                # utilization) and re-reads the solved
                                # columns from VMEM; the FMA form streams
                                # the ggt scalars against the
                                # register-resident columns.
                                d_j = d_panel[t : t + 1, :]
                                for i in range(t):
                                    d_j = (
                                        d_j
                                        - ggt_ref[
                                            0, j : j + 1, base + i : base + i + 1
                                        ]
                                        * u_rows[i]
                                    )
                            else:
                                corr2 = jax.lax.dot_general(
                                    ggt_ref[0, j : j + 1, base : base + t],
                                    u_ref[base : base + t, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32,
                                )
                                d_j = d_panel[t : t + 1, :] - corr2
                        else:
                            d_j = d_panel[t : t + 1, :]
                        if localize and "weights" not in ablate:
                            d_j = d_j * w_panel[t : t + 1, :]
                        if hybrid:
                            # d_j now holds u_j; accumulate its mean pull
                            # and store the full V column.
                            mean_ref[:] = (
                                mean_ref[:]
                                + gain_ref[0, 0, j] * d_j
                                + sgain_ref[0, 0, j] * s_panel[t : t + 1, :]
                            )
                            d_j = (
                                sqrtc_ref[0, 0, j] * d_j
                                + ssqrt_ref[0, 0, j] * s_panel[t : t + 1, :]
                            )
                        u_ref[j : j + 1, :] = d_j
                        if corr2_form == "fma":
                            # Stored column == u_ref row j (after the
                            # weight / hybrid transform), so the FMA chain
                            # corrects against exactly what the dot form
                            # would re-read.
                            u_rows.append(d_j)

                if localize and cull:
                    # Per-panel cull: a dead panel's weights are all zero,
                    # so its u rows are exactly zero — skip the weight
                    # chain, the correction matmul, and the per-ob
                    # recurrence steps (the dominant in-kernel costs).
                    alive = ((bits >> q) & 1) != 0

                    @pl.when(alive)
                    def _():
                        _panel_body()

                    @pl.when(jnp.logical_not(alive))
                    def _():
                        u_ref[base : base + width, :] = jnp.zeros(
                            (width, u_ref.shape[1]), dtype=f32
                        )
                else:
                    _panel_body()

            if "final" in ablate:
                return
            u_t = u_ref[:]
            yr = y.astype(jnp.bfloat16) if mxu_bf16 else y
            if hybrid:
                xbm_out_ref[:] = xbm_out_ref[:] + mean_ref[:]
                # u_ref holds V: X <- X - V @ Y directly.
                vl = u_t.astype(jnp.bfloat16) if mxu_bf16 else u_t
                xbp_out_ref[:] = xbp - jax.lax.dot_general(
                    vl, yr, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            else:
                # Mean update stays f32: [1, TILE] output is one MXU
                # sublane anyway, and mean precision matters most.
                mean_upd = jax.lax.dot_general(
                    gain_ref[0, :, :], u_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [1, TILE]
                xbm_out_ref[:] = xbm_out_ref[:] + mean_upd
                gu = u_t * sqrtc_ref[0, 0, :].reshape(-1, 1)
                gl = gu.astype(jnp.bfloat16) if mxu_bf16 else gu
                xbp_out_ref[:] = xbp - jax.lax.dot_general(
                    gl, yr, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )

    return kernel


# Culling-bound slack: covers f32 arccos conditioning in the mask bound vs
# the kernel's 2e-8-accurate polynomial angle (2e-3 rad ~ 13 km — far below
# any meteorological localization radius, so the sparsity loss is nil).
_CULL_MARGIN_RAD = 2e-3


def cull_masks(body_xyz, ob_xyz, radii, assim, tile, nblocks, block_size,
               panel: int = PANEL):
    """Localization cull masks for the fused kernel.

    Returns ``(mask, pmask)``: ``mask[gtiles, nblocks]`` int32 is 1 where a
    (row-tile, obs-block) pair may have a nonzero Gaspari-Cohn weight, and
    ``pmask[gtiles, nblocks, npanels]`` refines the same bound to the
    kernel's ``PANEL``-ob granularity.  Zeros are provably-dead pairs,
    skippable exactly.

    Bound: for tile cap center ``c`` with angular radius ``cap``, every row
    satisfies ``angle(ob, row) >= angle(ob, c) - cap``; GC support ends at
    ``2 * halfwidth``, so the pair is dead when
    ``angle(ob, c) - cap > 2 * halfwidth / R`` for every ob in the block
    (panel).  Obs with ``radii = inf`` (no localization) keep every pair
    alive; obs with ``assim = False`` contribute nothing (their tail gain
    and sqrt coefficients are zero — ``ensrf_core.tail_scan``) and never
    keep a pair alive.
    """
    nrows = body_xyz.shape[0]
    nobs = ob_xyz.shape[0]
    gtiles = max(1, -(-nrows // tile))
    rpad = gtiles * tile - nrows
    if rpad:
        body_xyz = jnp.concatenate(
            [body_xyz, jnp.broadcast_to(body_xyz[-1:], (rpad, 3))]
        )
    txyz = body_xyz.reshape(gtiles, tile, 3)
    csum = jnp.sum(txyz, axis=1)
    cnorm = jnp.sqrt(jnp.sum(csum * csum, axis=1, keepdims=True))
    # Degenerate (antipodally spread) tiles fall back to an arbitrary
    # center; the resulting cap covers the tile, so the bound stays valid.
    fallback = jnp.asarray([1.0, 0.0, 0.0], dtype=body_xyz.dtype)
    center = jnp.where(
        cnorm > 1e-6, csum / jnp.maximum(cnorm, 1e-6), fallback[None, :]
    )  # [gtiles, 3]
    cosmin = jnp.min(jnp.einsum("gtc,gc->gt", txyz, center), axis=1)
    cap = jnp.arccos(jnp.clip(cosmin, -1.0, 1.0))  # [gtiles]

    ang = jnp.arccos(jnp.clip(ob_xyz @ center.T, -1.0, 1.0))  # [nobs, gtiles]
    support = 2.0 * jnp.abs(radii) / EARTH_RADIUS_KM  # inf -> always alive
    alive = ang <= cap[None, :] + support[:, None] + _CULL_MARGIN_RAD
    alive = jnp.logical_and(alive, assim[:, None])
    pad = nblocks * block_size - nobs
    if pad:
        alive = jnp.pad(alive, ((0, pad), (0, 0)))
    npanels = -(-block_size // panel)
    ppad = nblocks * npanels * panel - nblocks * block_size
    a = alive
    if ppad:  # block_size not a panel multiple: pad to the panel grid
        a = jnp.pad(
            a.reshape(nblocks, block_size, gtiles),
            ((0, 0), (0, npanels * panel - block_size), (0, 0)),
        ).reshape(nblocks * npanels * panel, gtiles)
    pmask = (
        a.reshape(nblocks, npanels, panel, gtiles)
        .any(axis=2)
        .transpose(2, 0, 1)
        .astype(jnp.int32)
    )  # [gtiles, nblocks, npanels]
    mask = (
        alive.reshape(nblocks, block_size, gtiles)
        .any(axis=1)
        .T.astype(jnp.int32)
    )  # [gtiles, nblocks]
    return mask, pmask


def _fused_impl(
    body_mean,
    body_perts,
    body_lat,
    body_lon,
    tail: TailSolution,
    obs: ObsArrays,
    body_vert=None,
    localize: bool = True,
    block_size: int = 128,
    tile: int = 8192,
    interpret: bool = False,
    vertical: bool = False,
    cull: bool = True,
    spatial_sort: bool = False,
    row_order=None,
    inv_order=None,
    hybrid: bool = False,
    body_sigma=None,  # [N] static-B std per row (hybrid mode)
    static_length=None,  # km: GC halfwidth of the static covariance model
    panel: int = PANEL,  # culling/recurrence panel width (obs per panel)
    ablate: tuple = (),  # TIMING-ONLY kernel ablations (results are wrong);
    # see _make_fused_kernel.  Used by benchmarks/body_anatomy.py.
    corr2_form: str = "dot",  # within-panel correction form: "dot" (small
    # MXU matvecs against u_ref) or "fma" (scalar-broadcast VPU chain on
    # register-resident columns).  Algebraically identical.
    mxu_bf16: bool = False,  # explicit bf16 casts (f32 accumulation) on
    # the two large matmuls (priors d0 and the final rank-B apply).
    # Measured no-op at default matmul precision on TPU (the MXU already
    # ingests f32 dot inputs as bf16, bit-identically); see the kernel
    # comment and benchmarks/bf16_ab.py.
    max_radius_km=None,  # host-known bound on the FINITE per-ob
    # localization radii: when given and <= 5000 km, the weight chain
    # uses the cheaper sin-series angle form (see _asin2_poly_u —
    # measured weight chain = 36% of the pod body).  None = unknown ->
    # full-range arccos form.
):
    """v4 phase 2: ALL obs blocks applied while each state tile stays in
    VMEM.  Drop-in for
    :func:`efa_xray_tpu.ops.ensrf_pallas.ensrf_blocked_body_pallas`, for
    ANY row layout: weights are per row, which is exact for flat states
    and for gridded multi-group (vt > 1) states alike (rows of a gridded
    state tile the spatial grid, so per-row weights recompute the same
    grid weight vt times — pure VPU redundancy that the one-HBM-pass
    design still beats v3's per-block state traffic with).  Optional
    vertical localization multiplies in a per-row vertical Gaspari-Cohn
    factor (``vertical=True`` with ``body_vert`` + per-ob verts/radii).

    Exposed as two jitted entry points below: the plain one, and a
    buffer-donating one for callers that own ``body_mean``/``body_perts``
    and will not reuse them — donation halves peak HBM and is what lets
    multi-GB states (4M x 80 rows measured) run on a 16 GB chip.

    ``cull`` (default on, localized runs only) skips (row-tile, obs-block)
    pairs whose localization weights are provably all zero — exact, via
    :func:`tile_block_mask`.  ``spatial_sort`` additionally permutes state
    rows into spherical Morton order inside the jit (row order is a free
    exact choice; the inverse permutation is applied on the way out) so row
    tiles cover compact caps; culling then pays off whenever the OBS order
    is also spatially coherent (see
    :func:`efa_xray_tpu.observation.localization.spatial_sort_order`).

    ``hybrid=True`` applies the hybrid static-B column in-kernel (the
    blend the XLA body implements in
    :func:`efa_xray_tpu.assimilation.ensrf_core.apply_obs_block`): the
    static correlation reuses the chordal angles the localization taper
    already computes, ``sigma_row`` streams as a fifth geometry row, and
    the recurrence stores full V columns driven by the RAW Gram matrix.
    Requires a hybrid-mode ``tail`` (static_gain/static_sqrt scalars);
    static geometry is chordal here (vs exact haversine on the XLA body —
    ~2e-8 rad, far below the GC taper's scale)."""
    nobs = tail.ye.shape[0]
    if nobs == 0:
        return body_mean, body_perts
    if hybrid and (body_sigma is None or static_length is None
                   or tail.static_gain is None):
        raise ValueError(
            "hybrid fused kernel needs body_sigma, static_length and a "
            "hybrid-mode TailSolution (static_gain/static_sqrt)"
        )
    dtype = body_perts.dtype
    nrows, nmems = body_perts.shape
    nblocks = max(1, -(-nobs // block_size))
    pad = nblocks * block_size - nobs
    bsz = block_size

    obs = obs.with_default_verts()
    ye = jnp.pad(tail.ye.astype(dtype), ((0, pad), (0, 0)))
    gain = jnp.pad(tail.gain_coef.astype(dtype), (0, pad))
    sqrtc = jnp.pad(tail.sqrt_coef.astype(dtype), (0, pad))
    radii = jnp.pad(obs.radii.astype(dtype), (0, pad), constant_values=jnp.inf)
    ob_xyz = jnp.pad(
        latlon_to_unit(obs.lats, obs.lons).astype(dtype), ((0, pad), (0, 0))
    )
    overt = jnp.pad(obs.verts.astype(dtype), (0, pad))
    ovrad = jnp.pad(
        obs.vert_radii.astype(dtype), (0, pad), constant_values=jnp.inf
    )

    # Per-block operands, shaped so each block is one leading index.
    y_b = ye.reshape(nblocks, bsz, nmems)
    gram = jnp.einsum("abm,acm->abc", y_b, y_b)  # [nblocks, B, B]
    if hybrid:
        # Hybrid corrections run against stored V columns, which already
        # carry g_j and the static term: use the raw Gram matrix.
        ggt_b = jnp.swapaxes(gram, 1, 2)
        sgain_b = jnp.pad(tail.static_gain.astype(dtype), (0, pad)).reshape(
            nblocks, 1, bsz)
        ssqrt_b = jnp.pad(tail.static_sqrt.astype(dtype), (0, pad)).reshape(
            nblocks, 1, bsz)
        invslen_b = jnp.full(
            (nblocks, 1, bsz), 1.0 / float(static_length), dtype=dtype)
    else:
        ggt_b = jnp.swapaxes(
            gram * sqrtc.reshape(nblocks, bsz)[:, :, None], 1, 2
        )  # ggt[blk, j, i] = (y_i . y_j) g_i
        z3 = jnp.zeros((nblocks, 1, bsz), dtype=dtype)
        sgain_b = ssqrt_b = invslen_b = z3
    gain_b = gain.reshape(nblocks, 1, bsz)
    sqrt_b = sqrtc.reshape(nblocks, 1, bsz)
    ox_b = ob_xyz[:, 0].reshape(nblocks, 1, bsz)
    oy_b = ob_xyz[:, 1].reshape(nblocks, 1, bsz)
    oz_b = ob_xyz[:, 2].reshape(nblocks, 1, bsz)
    invrad_b = jnp.where(jnp.isinf(radii), 0.0, 1.0 / jnp.abs(radii)).reshape(
        nblocks, 1, bsz
    ).astype(dtype)
    overt_b = overt.reshape(nblocks, 1, bsz)
    invvrad_b = jnp.where(jnp.isinf(ovrad), 0.0, 1.0 / jnp.abs(ovrad)).reshape(
        nblocks, 1, bsz
    ).astype(dtype)

    # No row padding: Pallas masks partial edge tiles (out-of-bounds rows
    # read garbage, every computation here is row-local, and out-of-bounds
    # writes are dropped).  Keeping the in/out shapes exactly (nrows, M)
    # lets the donated state buffers alias the outputs for ANY row count —
    # padding inside the jit would force a larger output buffer and degrade
    # donation to early-free whenever nrows % tile != 0.
    tile = max(8, min(-(-tile // 8) * 8, -(-nrows // 8) * 8))
    gtiles = max(1, -(-nrows // tile))
    body_xyz = latlon_to_unit(body_lat, body_lon).astype(dtype)
    if body_vert is None:
        bvert = jnp.zeros_like(body_lat)
    else:
        bvert = body_vert
    if hybrid:
        bsig_row = jnp.broadcast_to(
            jnp.asarray(body_sigma, dtype), (nrows,)
        )
    else:
        bsig_row = jnp.zeros_like(body_lat)
    if spatial_sort:
        # Row order is free (every per-row quantity is row-local), so sort
        # rows into spherical Morton order: contiguous tiles become compact
        # caps and the cull mask goes sparse.  Two extra state passes
        # (gather in, scatter out) — ~1 ms each at 1M x 80 vs the multi-x
        # win from culling.  The permutation is pure geometry (independent
        # of the ensemble data), so callers that update repeatedly should
        # precompute it once (``localization.spatial_sort_order``) and pass
        # ``row_order``/``inv_order``; the in-jit argsort fallback costs
        # tens of ms at 1M rows.
        if row_order is None:
            from efa_xray_tpu.observation.localization import morton3d_keys

            row_order = jnp.argsort(morton3d_keys(body_xyz))
        order = row_order
        if inv_order is None:
            inv_order = jnp.zeros_like(order).at[order].set(
                jnp.arange(nrows, dtype=order.dtype)
            )
        body_mean = jnp.take(body_mean, order, axis=0)
        body_perts = jnp.take(body_perts, order, axis=0)
        body_xyz = jnp.take(body_xyz, order, axis=0)
        bvert = jnp.take(bvert, order, axis=0)
        bsig_row = jnp.take(bsig_row, order, axis=0)
    bm = body_mean.reshape(1, -1)  # [1, N]: rows on the lane axis (a
    # [N, 1] column would be lane-padded 128x by the (8, 128) tiling)
    bp = body_perts
    geom = jnp.stack(
        [body_xyz[:, 0], body_xyz[:, 1], body_xyz[:, 2],
         bvert.astype(dtype), bsig_row.astype(dtype)]
    )  # [5, N]

    npanels = -(-bsz // panel)
    # Panel alive-bits, one int32 per (row-tile, obs-block): scalar-prefetch
    # control for the kernel's culling.  An int32 holds up to 32 panels =
    # block_size 256; beyond that, culling is disabled rather than packed
    # wider (blocks that big defeat panel granularity anyway).
    cull = bool(cull and localize and npanels <= 32)
    if cull:
        cull_radii = obs.radii.astype(dtype)
        if hybrid:
            # The static column's GC support ends at 2*static_length, so
            # the exact-skip bound must cover max(radius, L_B).
            cull_radii = jnp.maximum(
                cull_radii, jnp.asarray(float(static_length), dtype)
            )
        _, pmask = cull_masks(
            body_xyz,
            latlon_to_unit(obs.lats, obs.lons).astype(dtype),
            cull_radii,
            obs.assim,
            tile,
            nblocks,
            bsz,
            panel=panel,
        )
        shifts = jnp.arange(npanels, dtype=jnp.int32)
        bits = jnp.sum(pmask << shifts[None, None, :], axis=-1).astype(
            jnp.int32
        )
    else:
        bits = jnp.zeros((1, 1), dtype=jnp.int32)  # unread placeholder

    # Index maps take (t, b, bits_ref): the trailing scalar-prefetch ref is
    # unused for data placement.
    tiled = lambda shape: pl.BlockSpec(
        shape, lambda t, b, *_: (t, 0), memory_space=pltpu.VMEM
    )
    row_vec = lambda shape: pl.BlockSpec(
        shape, lambda t, b, *_: (0, t), memory_space=pltpu.VMEM
    )
    per_block3 = lambda shape: pl.BlockSpec(
        shape, lambda t, b, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )

    angle_form = (
        "series"
        if (max_radius_km is not None
            and float(max_radius_km) <= 5000.0)
        else "arccos"
    )
    out_mean, out_perts = pl.pallas_call(
        _make_fused_kernel(bsz, localize, vertical, cull, hybrid, panel,
                           ablate, corr2_form, mxu_bf16, angle_form),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gtiles, nblocks),
            in_specs=[
                row_vec((1, tile)),
                tiled((tile, nmems)),
                row_vec((5, tile)),
                per_block3((1, bsz, nmems)),
                per_block3((1, bsz, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
                per_block3((1, 1, bsz)),
            ],
            out_specs=[
                row_vec((1, tile)),
                tiled((tile, nmems)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bsz, tile), dtype),
                pltpu.VMEM((bsz, tile), dtype),
                pltpu.VMEM((1, tile), dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, nrows), dtype),
            jax.ShapeDtypeStruct((nrows, nmems), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # Row tiles are independent (parallel); obs blocks within a
            # tile are sequential (the output block is revisited).
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        bits,
        bm, bp, geom,
        y_b, ggt_b, gain_b, sqrt_b, ox_b, oy_b, oz_b, invrad_b,
        overt_b, invvrad_b, sgain_b, ssqrt_b, invslen_b,
    )

    if spatial_sort:
        return (
            jnp.take(out_mean[0], inv_order, axis=0),
            jnp.take(out_perts, inv_order, axis=0),
        )
    return out_mean[0], out_perts


def _make_fused_grid_kernel(bsz: int, localize: bool, vertical: bool,
                            mxu_bf16: bool = False):
    """v4-grid: same loop nest as v4 (state tile resident across ALL obs
    blocks) but weights stream from a precomputed per-GRID-POINT array
    instead of per-row in-kernel trig.  For a VT = nvars*ntimes-group
    state this removes the VT-fold redundancy of recomputing the same
    grid weight for every group's copy of a row (measured ~36% of v4
    kernel time at VT=1 — multiplied by VT for gridded states)."""

    def kernel(
        xbm_in_ref,  # [1, 1, TILE_G]  (unit sublane axis: Mosaic requires
        # block[-2] divisible by 8 OR equal to the array dim — a [VT, G]
        # operand with block (1, tile) violates that whenever VT > 1)
        xbp_in_ref,  # [1, TILE_G, M]
        w_ref,  # [1, B, TILE_G] this block's grid weights
        wvt_ref,  # [1, 1, 1, B] this (group, block)'s vertical factors
        y_ref,  # [1, B, M]
        ggt_ref,  # [1, B, B]
        gain_ref,  # [1, 1, B]
        sqrtc_ref,  # [1, 1, B]
        xbm_out_ref,  # [1, 1, TILE_G] revisited across blocks
        xbp_out_ref,  # [1, TILE_G, M] revisited across blocks
        u_ref,  # [B, TILE_G] scratch
        d0_ref,  # [B, TILE_G] scratch
    ):
        f32 = xbp_in_ref.dtype
        b = pl.program_id(2)

        @pl.when(b == 0)
        def _():
            xbm_out_ref[:] = xbm_in_ref[:]
            xbp_out_ref[:] = xbp_in_ref[:]

        xbp = xbp_out_ref[0]  # [T, M] resident across blocks
        y = y_ref[0]  # [B, M]

        # Same flag as the flat kernel (and the same measured-no-op
        # caveat there): explicit bf16 casts on the two large matmuls.
        ly, lx = (
            (y.astype(jnp.bfloat16), xbp.astype(jnp.bfloat16))
            if mxu_bf16 else (y, xbp)
        )
        d0_ref[:] = jax.lax.dot_general(
            ly, lx, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )

        npanels = -(-bsz // PANEL)
        for q in range(npanels):
            base = q * PANEL
            width = min(PANEL, bsz - base)
            if base > 0:
                corr = jax.lax.dot_general(
                    ggt_ref[0, base : base + width, 0:base],
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
                        ggt_ref[0, j : j + 1, base : base + t],
                        u_ref[base : base + t, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
                    d_j = d_panel[t : t + 1, :] - corr2
                else:
                    d_j = d_panel[0:1, :]
                if localize:
                    d_j = d_j * w_ref[0, j : j + 1, :]
                    if vertical:
                        d_j = d_j * wvt_ref[0, 0, 0, j]
                u_ref[j : j + 1, :] = d_j

        u_t = u_ref[:]
        mean_upd = jax.lax.dot_general(
            gain_ref[0, :, :], u_t, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [1, TILE_G]
        xbm_out_ref[0] = xbm_out_ref[0] + mean_upd
        gu = u_t * sqrtc_ref[0, 0, :].reshape(-1, 1)
        gl = gu.astype(jnp.bfloat16) if mxu_bf16 else gu
        xbp_out_ref[0] = xbp - jax.lax.dot_general(
            gl, ly if mxu_bf16 else y, (((0,), (0,)), ((), ())),
            preferred_element_type=f32
        )

    return kernel


def _fused_grid_impl(
    body_mean,  # [N] flat, rows = (vt, grid) C-order
    body_perts,  # [N, M]
    body_lat,
    body_lon,
    tail: TailSolution,
    obs: ObsArrays,
    body_vert=None,  # [N]; rows within a vt group share one level
    localize: bool = True,
    block_size: int = 128,
    tile: int = 8192,
    interpret: bool = False,
    vertical: bool = False,
    ngrid: int = 0,
    mxu_bf16: bool = False,  # bf16 MXU inputs on the two large matmuls
    group_factor=None,  # [VT, No] extra per-(group, ob) gain factors
    # (cross-variable localization: factor = varloc[ob_var, var(group)]);
    # rides the SAME streamed scalar table as vertical localization, so
    # variable localization keeps the fused kernel on gridded states.
):
    """v4-grid phase 2 for states whose rows tile one spatial grid over
    VT = nrows/ngrid groups (``StateStructure.row_latlon`` ordering).

    Horizontal GC weights are computed ONCE per grid point by XLA (one
    fused streaming pass over ``[nobs, ngrid]``) and streamed into the
    kernel per (group, grid-tile, block); vertical localization — and the
    cross-variable localization factor, which has exactly the same
    per-(group, ob) scalar shape — is a tiny streamed table.  The state
    still crosses HBM exactly once (v4 loop nest).  Weight-array HBM
    cost: nobs x ngrid floats."""
    from efa_xray_tpu.observation.localization import chordal_gc_weights

    nobs = tail.ye.shape[0]
    if nobs == 0:
        return body_mean, body_perts
    dtype = body_perts.dtype
    nrows, nmems = body_perts.shape
    assert ngrid > 0 and nrows % ngrid == 0
    vt = nrows // ngrid
    nblocks = max(1, -(-nobs // block_size))
    pad = nblocks * block_size - nobs
    bsz = block_size

    obs = obs.with_default_verts()
    ye = jnp.pad(tail.ye.astype(dtype), ((0, pad), (0, 0)))
    gain = jnp.pad(tail.gain_coef.astype(dtype), (0, pad))
    sqrtc = jnp.pad(tail.sqrt_coef.astype(dtype), (0, pad))
    radii = jnp.pad(obs.radii.astype(dtype), (0, pad), constant_values=jnp.inf)

    y_b = ye.reshape(nblocks, bsz, nmems)
    gram = jnp.einsum("abm,acm->abc", y_b, y_b)
    ggt_b = jnp.swapaxes(
        gram * sqrtc.reshape(nblocks, bsz)[:, :, None], 1, 2
    )
    gain_b = gain.reshape(nblocks, 1, bsz)
    sqrt_b = sqrtc.reshape(nblocks, 1, bsz)

    # Per-grid-point horizontal weights, one XLA pass: [nblocks, B, G].
    grid_lat = body_lat[:ngrid].astype(dtype)
    grid_lon = body_lon[:ngrid].astype(dtype)
    if localize:
        ob_xyz = jnp.pad(
            latlon_to_unit(obs.lats, obs.lons).astype(dtype), ((0, pad), (0, 0))
        )
        gxyz = latlon_to_unit(grid_lat, grid_lon).astype(dtype)
        w = chordal_gc_weights(
            ob_xyz[:, None, :], gxyz[None, :, :], radii[:, None]
        ).astype(dtype).reshape(nblocks, bsz, ngrid)
    else:
        w = jnp.ones((1, bsz, 8), dtype=dtype)  # placeholder
    # Vertical factors per (group, ob): [VT, nblocks, B] (ones when off).
    if localize and vertical:
        group_vert = body_vert.reshape(vt, ngrid)[:, 0].astype(dtype)
        overt = jnp.pad(obs.verts.astype(dtype), (0, pad))
        ovrad = jnp.pad(obs.vert_radii.astype(dtype), (0, pad),
                        constant_values=jnp.inf)
        wvt = _gc_poly(
            jnp.abs(group_vert[:, None] - overt[None, :])
            * jnp.where(jnp.isinf(ovrad), 0.0, 1.0 / jnp.abs(ovrad))[None, :]
        )
        wvt = jnp.where(
            jnp.isinf(ovrad)[None, :], 1.0, wvt
        ).reshape(vt, nblocks, 1, bsz).astype(dtype)
    else:
        wvt = jnp.ones((vt, nblocks, 1, bsz), dtype=dtype)
    use_gf = group_factor is not None
    if use_gf:
        if not localize:
            raise ValueError("group_factor needs localize=True (the "
                             "kernel applies the scalar table inside the "
                             "localization branch)")
        gf = jnp.pad(
            jnp.asarray(group_factor, dtype), ((0, 0), (0, pad)),
            constant_values=1.0,
        ).reshape(vt, nblocks, 1, bsz)
        wvt = wvt * gf

    g8 = -(-ngrid // 8) * 8
    if tile >= ngrid:
        tile = g8  # whole grid: block == array dim, any 8-multiple legal
    else:
        # Partial tiles are a Mosaic block last-dimension: must be
        # divisible by 128 (see ops/tiling.auto_grid_tile).
        tile = max(128, (tile // 128) * 128)
        if tile >= ngrid:
            tile = g8
    gtiles = max(1, -(-ngrid // tile))
    # Unit sublane axis on the mean: Mosaic requires block[-2] % 8 == 0 or
    # block[-2] == array.shape[-2]; (1, 1, tile) on [VT, 1, G] satisfies it
    # for any VT (a [VT, G] operand with block (1, tile) does not).
    bm = body_mean.reshape(vt, 1, ngrid)
    bp = body_perts.reshape(vt, ngrid, nmems)

    w_spec = (
        pl.BlockSpec((1, bsz, tile), lambda v, t, b: (b, 0, t),
                     memory_space=pltpu.VMEM)
        if localize
        else pl.BlockSpec((1, bsz, 8), lambda v, t, b: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    per_block3 = lambda shape: pl.BlockSpec(
        shape, lambda v, t, b: (b, 0, 0), memory_space=pltpu.VMEM
    )

    out_mean, out_perts = pl.pallas_call(
        _make_fused_grid_kernel(bsz, localize, vertical or use_gf,
                                mxu_bf16),
        grid=(vt, gtiles, nblocks),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda v, t, b: (v, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, nmems), lambda v, t, b: (v, t, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, 1, 1, bsz), lambda v, t, b: (v, b, 0, 0),
                         memory_space=pltpu.VMEM),
            per_block3((1, bsz, nmems)),
            per_block3((1, bsz, bsz)),
            per_block3((1, 1, bsz)),
            per_block3((1, 1, bsz)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda v, t, b: (v, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, nmems), lambda v, t, b: (v, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((vt, 1, ngrid), dtype),
            jax.ShapeDtypeStruct((vt, ngrid, nmems), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, tile), dtype),
            pltpu.VMEM((bsz, tile), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # Groups and grid tiles are independent; obs blocks within a
            # tile are sequential (output revisited).
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        bm, bp, w, wvt, y_b, ggt_b, gain_b, sqrt_b,
    )

    return out_mean.reshape(nrows), out_perts.reshape(nrows, nmems)


_STATIC = ("localize", "block_size", "tile", "interpret", "vertical")
_STATIC_FLAT = _STATIC + ("cull", "spatial_sort", "hybrid", "static_length",
                          "panel", "ablate", "corr2_form", "mxu_bf16",
                          "max_radius_km")
_STATIC_GRID = _STATIC + ("ngrid", "mxu_bf16")

ensrf_blocked_body_pallas_fused_grid = jax.jit(
    _fused_grid_impl, static_argnames=_STATIC_GRID
)

# Donating variant (see the flat-state twin below): posterior reuses the
# prior's HBM; exact aliasing through the [N, M] <-> [VT, G, M] reshape.
ensrf_blocked_body_pallas_fused_grid_donating = jax.jit(
    _fused_grid_impl, static_argnames=_STATIC_GRID, donate_argnums=(0, 1)
)

ensrf_blocked_body_pallas_fused = jax.jit(
    _fused_impl, static_argnames=_STATIC_FLAT
)

# Donates the state buffers (args 0 and 1): the caller's arrays become
# invalid after the call.  EnSRF uses this (it owns the formatted prior).
ensrf_blocked_body_pallas_fused_donating = jax.jit(
    _fused_impl, static_argnames=_STATIC_FLAT, donate_argnums=(0, 1)
)
