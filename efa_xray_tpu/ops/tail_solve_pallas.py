"""In-kernel serial solve of one observation-space tail panel.

Phase 1 of the hierarchical tail (`ensrf_core.tail_scan_blocked`) runs the
exact serial square-root recurrence on each panel's own ``[P, M]`` rows.
As a ``lax.scan`` it costs a fixed ~13-15 us per observation on a v5e —
XLA per-step overhead on tiny slabs, not compute (measured:
``benchmarks/breakdown.py``; the reference's per-ob Python loop this
replaces is ``/root/reference/efa_xray/assimilation/ensrf.py:50-149``).
This kernel runs the whole panel solve in ONE Pallas dispatch with the
slab resident in VMEM; the per-ob dependence survives as a ``fori_loop``
whose body is a handful of MXU matvecs, so the per-ob cost drops to the
arithmetic itself.

Shapes and tricks:

* Every per-ob vector lives in BOTH orientations — ``[1, P]`` (lane axis)
  for the mean row and scalar extraction, ``[P, 1]`` (sublane axis) for
  the rank-1 perturbation update — computed independently from the same
  operands (two tiny matvecs) rather than transposed (a Mosaic relayout).
* Row/column extraction at a dynamic ob index is a one-hot matvec on the
  MXU (``onehot @ tp``), not a dynamic slice on values (unsupported) —
  see the no-dynamic-slice rule in the module docstring of
  :mod:`efa_xray_tpu.ops.ensrf_pallas_fused`.
* Per-ob scalars (value, error variance, assimilate flag) are read from
  SMEM, which allows dynamic scalar indexing.
* The ob-ob localization weight matrix (chordal GC x optional vertical
  GC; ``O(P^2)`` and elementwise-heavy) is precomputed by XLA and
  streamed in — big elementwise chains stay OUT of the kernel.

Exactness: same update algebra as ``ensrf_core.tail_scan`` (fast-geometry
weights), with the post-update diagnostics in closed form — row ``i`` of
the slab right after ob ``i`` is ``(1 - beta * kmat_i) * ye``, so
``post_var = (1 - beta * kmat_i)^2 * varye`` without re-extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_tail_solve_kernel(p: int, m: int, localize: bool, unbiased: bool):
    vden = (m - 1) if unbiased else m

    def kernel(
        vals_ref,  # [1, P] SMEM: ob values
        errs_ref,  # [1, P] SMEM: ob error variances R
        assim_ref,  # [1, P] SMEM int32: assimilate flags
        tm_in_ref,  # [1, P] VMEM: tail mean row
        tp_in_ref,  # [P, M] VMEM: tail perturbation slab
        wrows_ref,  # [P, P] VMEM: wrows[i, j] = weight of ob i at row j
        wcols_ref,  # [P, P] VMEM: wrows transposed (wcols[j, i])
        tm_out_ref,  # [1, P]
        tp_out_ref,  # [P, M]
        ye_out_ref,  # [P, M]: prior ye row sequence
        gain_ref,  # [1, P] gain_coef
        sqrt_ref,  # [1, P] sqrt_coef
        pm_ref,  # [1, P] prior ye mean
        pv_ref,  # [1, P] prior ye variance
        om_ref,  # [1, P] posterior ye mean (NaN when skipped)
        ov_ref,  # [1, P] posterior ye variance (NaN when skipped)
    ):
        f32 = tp_in_ref.dtype
        tm_out_ref[:] = tm_in_ref[:]
        tp_out_ref[:] = tp_in_ref[:]
        zrow = jnp.zeros((1, p), dtype=f32)
        ye_out_ref[:] = jnp.zeros((p, m), dtype=f32)
        gain_ref[:] = zrow
        sqrt_ref[:] = zrow
        pm_ref[:] = zrow
        pv_ref[:] = zrow
        om_ref[:] = zrow
        ov_ref[:] = zrow

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (p, m), 0)

        def body(i, _):
            ohr = jnp.where(lane == i, jnp.asarray(1.0, f32),
                            jnp.asarray(0.0, f32))  # [1, P]
            ohc = jnp.where(subl == i, jnp.asarray(1.0, f32),
                            jnp.asarray(0.0, f32))  # [P, 1]

            tp = tp_out_ref[:]
            tmr = tm_out_ref[:]
            ye = jax.lax.dot_general(
                ohr, tp, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # [1, M]
            ye_out_ref[:] = jnp.where(sub2 == i,
                                      jnp.broadcast_to(ye, (p, m)),
                                      ye_out_ref[:])

            y_i = vals_ref[0, i]
            r_i = errs_ref[0, i]
            a_b = assim_ref[0, i] != 0
            f = jnp.where(a_b, jnp.asarray(1.0, f32), jnp.asarray(0.0, f32))

            mye = jnp.sum(tmr * ohr)
            mu = jnp.sum(ye) / m
            varye = jnp.sum((ye - mu) ** 2) / vden
            innov = y_i - mye
            kdenom = varye + r_i
            scale = 1.0 / (kdenom * (m - 1))
            beta = 1.0 / (1.0 + jnp.sqrt(r_i / kdenom))

            kcov_r = jax.lax.dot_general(
                ye, tp, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # [1, P]
            kcov_c = jax.lax.dot_general(
                tp, ye, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # [P, 1]
            if localize:
                w_r = jax.lax.dot_general(
                    ohr, wrows_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [1, P]
                w_c = jax.lax.dot_general(
                    wcols_ref[:], ohc, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [P, 1]
                kmat_r = kcov_r * w_r * scale
                kmat_c = kcov_c * w_c * scale
            else:
                kmat_r = kcov_r * scale
                kmat_c = kcov_c * scale

            tm_out_ref[:] = tmr + (f * innov) * kmat_r
            tp_out_ref[:] = tp - ((f * beta) * kmat_c) * ye

            k_i = jnp.sum(kmat_r * ohr)
            nanv = jnp.asarray(jnp.nan, f32)
            post_m = jnp.where(a_b, mye + k_i * innov, nanv)
            shrink = 1.0 - beta * k_i
            post_v = jnp.where(a_b, shrink * shrink * varye, nanv)

            sel = lane == i
            gain_ref[:] = jnp.where(sel, f * innov * scale, gain_ref[:])
            sqrt_ref[:] = jnp.where(sel, f * beta * scale, sqrt_ref[:])
            pm_ref[:] = jnp.where(sel, mye, pm_ref[:])
            pv_ref[:] = jnp.where(sel, varye, pv_ref[:])
            om_ref[:] = jnp.where(sel, post_m, om_ref[:])
            ov_ref[:] = jnp.where(sel, post_v, ov_ref[:])
            return 0

        jax.lax.fori_loop(0, p, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("localize", "unbiased", "interpret")
)
def tail_panel_solve_pallas(
    tail_mean,  # [P]
    tail_perts,  # [P, M]
    values,  # [P]
    errors,  # [P]
    assim,  # [P] bool
    weights,  # [P, P] with weights[i, j] = w of ob i at obs row j, or None
    localize: bool = True,
    unbiased: bool = False,
    interpret: bool = False,
):
    """Serial EnSRF solve of one tail panel in a single Pallas dispatch.

    Returns ``(tm, tp, ye, gain_coef, sqrt_coef, pm, pv, om, ov)`` with the
    exact meanings of :func:`ensrf_core.tail_scan`'s outputs restricted to
    the panel (fast-geometry weights, no hybrid).
    """
    p, m = tail_perts.shape
    dtype = tail_perts.dtype
    if p > 1024:
        # wrows + wcols alone are 2 * p^2 * 4 bytes of VMEM (8 MB at
        # p = 1024); beyond that the kernel over-commits VMEM, and the
        # axon remote worker was observed to CRASH (not error) on such
        # panels.  Tail panels this large also buy nothing — the measured
        # optimum is 512.
        raise ValueError(
            f"tail_panel_solve_pallas: panel {p} > 1024 over-commits VMEM "
            "(use tail_panel <= 1024)"
        )
    if weights is None:
        weights = jnp.ones((p, p), dtype=dtype)
        localize = False
    wrows = weights.astype(dtype)
    wcols = wrows.T

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_tail_solve_kernel(p, m, localize, bool(unbiased)),
        in_specs=[smem, smem, smem, vmem, vmem, vmem, vmem],
        out_specs=[vmem] * 9,
        out_shape=[
            jax.ShapeDtypeStruct((1, p), dtype),  # tm
            jax.ShapeDtypeStruct((p, m), dtype),  # tp
            jax.ShapeDtypeStruct((p, m), dtype),  # ye
            jax.ShapeDtypeStruct((1, p), dtype),  # gain
            jax.ShapeDtypeStruct((1, p), dtype),  # sqrt
            jax.ShapeDtypeStruct((1, p), dtype),  # pm
            jax.ShapeDtypeStruct((1, p), dtype),  # pv
            jax.ShapeDtypeStruct((1, p), dtype),  # om
            jax.ShapeDtypeStruct((1, p), dtype),  # ov
        ],
        interpret=interpret,
    )(
        values.astype(dtype).reshape(1, p),
        errors.astype(dtype).reshape(1, p),
        assim.astype(jnp.int32).reshape(1, p),
        tail_mean.astype(dtype).reshape(1, p),
        tail_perts,
        wrows,
        wcols,
    )
    tm, tp, ye, gain, sqrtc, pm, pv, om, ov = outs
    flat = lambda x: x.reshape(p)
    return (flat(tm), tp, ye, flat(gain), flat(sqrtc), flat(pm), flat(pv),
            flat(om), flat(ov))
