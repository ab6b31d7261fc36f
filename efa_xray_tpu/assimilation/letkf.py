"""LETKF: the user-facing local ensemble transform Kalman filter.

Same construction/update contract as :class:`~efa_xray_tpu.assimilation.ensrf.EnSRF`
(the reference's only filter, ``efa_xray/assimilation/ensrf.py:8-151``):
build with a prior :class:`EnsembleState`, observations, inflation and
localization options; call :meth:`update` for ``(posterior, observations)``
with per-ob diagnostics recorded.

This solver is an extension beyond the reference.  Where the EnSRF
assimilates observations strictly serially (each ob updates the state the
next ob sees — SURVEY.md §7 lists this as the fundamental scaling limit),
the LETKF analyzes **all observations at once** with an independent
ensemble-space solve per local patch: batched MXU matmuls end to end, no
sequential scan over observations (see
:mod:`efa_xray_tpu.assimilation.letkf_core` for the math and references).

When to prefer which:

* ``EnSRF`` — exact reference parity (gain-space Gaspari-Cohn
  localization, reproduces the reference analysis to 1e-6).
* ``LETKF`` — production throughput at large ``nobs`` (cost is flat in
  nobs once footprints saturate ``letkf_k_obs``), R-space localization,
  all-at-once analysis.  Matches the EnSRF analysis mean/covariance
  exactly when localization is off.

Localization modes: horizontal-only (rows of a column share one solve —
exact in that regime) or horizontal x vertical (when the state declares
``var_verts`` and obs carry finite ``vert``/``vert_radius``; solves run
per (level-group, patch) since vertical weights differ by level).  There
are no per-ob diagnostics of a *serial* update sequence since there is
none.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from efa_xray_tpu.assimilation import letkf_core
from efa_xray_tpu.assimilation.assimilation import Assimilation
from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.state.ensemble import EnsembleState

# Host-certified selection cache (letkf_topk="host"): like the
# forward-operator taps cache (observation/forward.py:_TAPS_CACHE), a
# cycling workload re-observing the same network skips the host kd-tree
# build AND the candidate upload on cycle 2+.
import collections as _collections
import hashlib as _hashlib
import weakref as _weakref

_SEL_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
SEL_CACHE_MAX_PER_STRUCTURE = 8
# Diagnostic counter of actual host kd-tree builds (cache misses).
sel_build_count = 0


def _host_selection_cached(structure, obs_lats, obs_lons, k: int,
                           patch_size: int, chunk: int, ndev: int = 0):
    """(cand, mask, group) for this (grid, obs network, selection
    geometry), built host-side on first use.

    ``ndev = 0``: the single-device layout.  ``ndev > 0``: the sharded
    layout — `letkf_update_sharded` pads the grid to ``ndev * patch_size``
    and each shard runs its own local patch/chunk partition, so
    candidates are built per shard (with one unified S) and stacked along
    the group axis, which then shards like the grid.  Host candidate
    arrays are returned (the sharded path device_puts with its specs).
    """
    global sel_build_count
    h = _hashlib.sha256()
    for a in (obs_lats, obs_lons):
        h.update(np.ascontiguousarray(np.asarray(a, np.float64)).tobytes())
    h.update(repr((k, patch_size, chunk, ndev)).encode())
    key = h.hexdigest()
    per = _SEL_CACHE.get(structure)
    if per is not None and key in per:
        per.move_to_end(key)
        return per[key]

    glat = np.asarray(structure.lat.ravel(), np.float64)
    glon = np.asarray(structure.lon.ravel(), np.float64)
    ngrid = structure.ngrid
    if ndev == 0:
        cand, mask, geff = letkf_core.host_select_candidates(
            glat, glon, ngrid, patch_size, obs_lats, obs_lons, k,
            chunk=chunk,
        )
        entry = (jnp.asarray(cand), jnp.asarray(mask), geff)
    else:
        from efa_xray_tpu.parallel.mesh import pad_to_multiple

        g_pad = pad_to_multiple(ngrid, ndev * patch_size)
        if g_pad > ngrid:
            glat = np.concatenate([glat, np.repeat(glat[-1:], g_pad - ngrid)])
            glon = np.concatenate([glon, np.repeat(glon[-1:], g_pad - ngrid)])
        g_local = g_pad // ndev
        chunk_local = min(chunk, max(1, -(-g_local // patch_size)))
        parts = []
        for s in range(ndev):
            sl = slice(s * g_local, (s + 1) * g_local)
            parts.append(letkf_core.host_select_candidates(
                glat[sl], glon[sl], g_local, patch_size,
                obs_lats, obs_lons, k, chunk=chunk_local,
            ))
        geff = parts[0][2]
        assert all(p[2] == geff for p in parts)  # uniform local geometry
        s_max = max(p[0].shape[1] for p in parts)
        cand = np.concatenate([
            np.pad(p[0], ((0, 0), (0, s_max - p[0].shape[1]))) for p in parts
        ])
        mask = np.concatenate([
            np.pad(p[1], ((0, 0), (0, s_max - p[1].shape[1]))) for p in parts
        ])
        entry = (cand, mask, geff)
    sel_build_count += 1
    if per is None:
        per = _collections.OrderedDict()
        _SEL_CACHE[structure] = per
    per[key] = entry
    while len(per) > SEL_CACHE_MAX_PER_STRUCTURE:
        per.popitem(last=False)
    return entry


class LETKF(Assimilation):
    def __init__(
        self,
        state: EnsembleState,
        obs,
        inflation=None,
        verbose: bool = False,
        loc="GC",
        config: Optional[FilterConfig] = None,
        mesh=None,
    ):
        if config is None:
            config = FilterConfig(
                localization="GC" if loc not in (None, False) else None,
                verbose=verbose,
            )
        super().__init__(
            state,
            obs,
            inflation=inflation,
            verbose=verbose,
            config=config,
            mesh=mesh,
        )

    @Assimilation.with_matmul_precision
    def update(self) -> Tuple[EnsembleState, ObservationBatch]:
        """Assimilate all observations simultaneously; return
        ``(posterior, observations)``.

        Tiny workloads route to the host CPU backend
        (:meth:`Assimilation._host_fastpath`), same as the EnSRF."""
        if self._host_fastpath():
            with self._host_fastpath_ctx():
                return self._update_impl()
        return self._update_impl()

    def _update_impl(self) -> Tuple[EnsembleState, ObservationBatch]:
        cfg = self.config
        if cfg.hybrid_alpha < 1.0:
            raise ValueError(
                "hybrid covariance (hybrid_alpha < 1) is implemented for "
                "the EnSRF solver only; the LETKF would silently ignore "
                "the static-B blend"
            )
        if cfg.variable_localization and cfg.letkf_topk == "host":
            raise ValueError(
                "variable_localization forces the per-(group, patch) "
                "solve layout, which letkf_topk='host' does not support; "
                "use letkf_topk='exact' or 'approx'"
            )
        if self.verbose:
            self.log.info("Beginning LETKF update (all obs at once)")
        body_mean, body_perts, tail_mean, tail_perts = self.format_prior_state()
        obs = self.obs_arrays()
        obs = self.apply_outlier_check(obs, tail_mean, tail_perts)

        st = self.prior.structure
        dtype = jnp.dtype(cfg.dtype)
        grid_lat, grid_lon = st.grid_latlon_device(dtype)
        vertical = cfg.localize and self._vertical_active()
        body_vert = (
            jnp.asarray(st.row_vert(), dtype=dtype) if vertical else None
        )
        letkf_vl = {}
        if cfg.variable_localization:
            # R-localization analog of the EnSRF factor: multiplies rho
            # per (analyzed variable, observed variable).  Costs VT-fold
            # solves (the vertical-mode unit layout) since a
            # variable-dependent rho breaks the shared-solve-per-column
            # trick.
            base_vl = self.varloc_kwargs(dtype)
            group_var = np.repeat(
                np.arange(st.nvars, dtype=np.int32), st.ntimes
            )
            letkf_vl = dict(
                varloc=base_vl["varloc"],
                ob_var=base_vl["ob_var"],
                group_var=jnp.asarray(group_var),
            )

        sel_kwargs = {}
        if cfg.letkf_topk == "host" and cfg.localize:
            if vertical:
                raise ValueError(
                    "letkf_topk='host' supports horizontal-only "
                    "localization; use 'exact' or 'approx' with vertical "
                    "localization"
                )
            from efa_xray_tpu.parallel.mesh import STATE_AXIS

            ndev = 0 if self.mesh is None else self.mesh.shape[STATE_AXIS]
            cand, mask, geff = _host_selection_cached(
                st, self.obs.lats, self.obs.lons, cfg.letkf_k_obs,
                cfg.letkf_patch_size, cfg.letkf_chunk, ndev=ndev,
            )
            sel_kwargs = dict(sel_cand=cand, sel_mask=mask, sel_group=geff)

        prior_spread = None
        if cfg.rtps_alpha > 0.0:
            from efa_xray_tpu.assimilation.adaptive_inflation import row_spread

            prior_spread = row_spread(body_perts)
        # RTPP needs the prior perturbations after the update; the LETKF
        # path does not donate them, so a reference suffices.
        prior_perts_saved = body_perts if cfg.rtpp_alpha > 0.0 else None

        if self.mesh is not None:
            from efa_xray_tpu.parallel.sharded import letkf_update_sharded

            bm, bp, tm, tp, diags = letkf_update_sharded(
                body_mean,
                body_perts,
                tail_mean,
                tail_perts,
                grid_lat,
                grid_lon,
                obs,
                mesh=self.mesh,
                ngrid=st.ngrid,
                patch_size=cfg.letkf_patch_size,
                k_obs=cfg.letkf_k_obs,
                localize=cfg.localize,
                sqrt_method=cfg.letkf_sqrt,
                ns_iters=cfg.letkf_ns_iters,
                chunk=cfg.letkf_chunk,
                vertical=vertical,
                body_vert=body_vert,
                unbiased=cfg.unbiased_variance,
                topk_method=cfg.letkf_topk,
                solve_precision=cfg.letkf_solve_precision,
                **sel_kwargs,
                **letkf_vl,
            )
        else:
            bm, bp, tm, tp, diags = letkf_core.letkf_update(
                body_mean,
                body_perts,
                tail_mean,
                tail_perts,
                grid_lat,
                grid_lon,
                obs,
                ngrid=st.ngrid,
                patch_size=cfg.letkf_patch_size,
                k_obs=cfg.letkf_k_obs,
                localize=cfg.localize,
                sqrt_method=cfg.letkf_sqrt,
                ns_iters=cfg.letkf_ns_iters,
                chunk=cfg.letkf_chunk,
                topk_method=cfg.letkf_topk,
                vertical=vertical,
                body_vert=body_vert,
                unbiased=cfg.unbiased_variance,
                solve_precision=cfg.letkf_solve_precision,
                **sel_kwargs,
                **letkf_vl,
            )

        if prior_spread is not None:
            from efa_xray_tpu.assimilation.adaptive_inflation import rtps

            bp = rtps(prior_spread, bp, cfg.rtps_alpha)
        if prior_perts_saved is not None:
            from efa_xray_tpu.assimilation.adaptive_inflation import rtpp

            bp = rtpp(prior_perts_saved, bp, cfg.rtpp_alpha)

        self.record_diagnostics(diags)
        self.maybe_update_adaptive_inflation()
        self.post, _ = self.format_posterior_state(bm, bp)
        return self.post, self.obs
