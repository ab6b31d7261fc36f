"""EnSRF: the user-facing serial ensemble square-root filter.

Drop-in capability match for the reference class
(``efa_xray/assimilation/ensrf.py:8-151``): construct with a prior
EnsembleState, observations, inflation and localization options; call
``.update()`` to get ``(posterior_state, observations)`` with per-ob
diagnostics recorded.

Execution is TPU-native: the per-observation Python loop becomes either a
``lax.scan`` (``method="serial"``) or the exact blocked two-phase algorithm
(``method="blocked"``, default — see
:mod:`efa_xray_tpu.assimilation.ensrf_core`), optionally sharded over a
``jax.sharding.Mesh`` along the state dimension
(:mod:`efa_xray_tpu.parallel.sharded`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.assimilation.assimilation import Assimilation
from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.state.ensemble import EnsembleState


class EnSRF(Assimilation):
    def __init__(
        self,
        state: EnsembleState,
        obs,
        nproc: int = 1,
        inflation=None,
        verbose: bool = True,
        loc=False,
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
            nproc=nproc,
            inflation=inflation,
            verbose=verbose,
            config=config,
            mesh=mesh,
        )
        self.loc = loc if loc not in (None, False) else (config.localization or False)

    def _grid_kernel_ok(self) -> bool:
        """Eligibility of the v4-GRID kernel (rows tile one spatial grid
        over vt > 1 groups, chordal localization, no hybrid)."""
        cfg = self.config
        st = self.prior.structure
        vt = st.nvars * st.ntimes
        return (
            cfg.localize
            and cfg.fast_geometry
            and vt > 1
            and st.ngrid > 0
            and st.nstate == vt * st.ngrid
            and cfg.hybrid_alpha >= 1.0
        )

    def _use_pallas(self) -> bool:
        """Auto-select the fused Pallas kernel: TPU backend + blocked method
        + float32 (the kernel is written for the MXU's f32 path).  Hybrid
        covariance is implemented in the FLAT v4 kernel (the static column
        rides the in-kernel recurrence; chordal geometry required), so a
        hybrid run keeps the fused path whenever geometry is chordal;
        exact-haversine hybrid runs use the blocked XLA body."""
        import jax

        cfg = self.config
        if self._fastpath:
            return False  # host CPU: Mosaic kernels unavailable
        if cfg.use_pallas is not None:
            ok = bool(cfg.use_pallas)
        else:
            ok = (
                jax.default_backend() == "tpu"
                and cfg.method == "blocked"
                and jnp.dtype(cfg.dtype) == jnp.float32
            )
        if cfg.hybrid_alpha < 1.0:
            ok = ok and (cfg.fast_geometry or not cfg.localize)
        if cfg.variable_localization:
            # The flat kernels have no cross-variable factor input, but
            # the v4-GRID kernel streams the factor through the same
            # per-(group, ob) scalar table as vertical localization —
            # gridded states keep the fused path.
            ok = ok and self._grid_kernel_ok()
        return ok

    def _tile(self, grid: bool = False, nrows: int = 0, nmems: int = 0) -> int:
        """Resolved Pallas row-tile: explicit config wins; otherwise the
        workload-aware defaults in :mod:`efa_xray_tpu.ops.tiling` (8192
        for the flat v4 kernel, raised for >16.7M-row states; VMEM-capped
        whole-grid for the grid-mode kernels)."""
        from efa_xray_tpu.ops import tiling

        cfg = self.config
        if cfg.pallas_tile is not None:
            return int(cfg.pallas_tile)
        if grid:
            return tiling.auto_grid_tile(cfg.block_size, nmems)
        return tiling.auto_flat_tile(nrows)

    def _tail_pallas(self, interpret: bool) -> bool:
        """Pallas tail selection: explicit config wins; auto is on for all
        real-TPU chordal-geometry runs at ANY batch size (v5e, panel 512:
        2048 obs ~0 vs 14 ms XLA; 5k obs 13.9 vs 51 ms; 10k obs 11.4 vs
        154 ms; 50k obs 0.14 vs 1.79 s) — the old >=8k-obs crossover
        belonged to the apply-only Pallas tail whose solve was still the
        XLA scan.  ``tail_panel`` does not gate this: panels over the
        in-kernel solver's 1024 bound automatically keep the XLA panel
        solve and the Pallas apply (see ``tail_scan_blocked``)."""
        cfg = self.config
        if self._fastpath:
            return False  # host CPU: Mosaic kernels unavailable
        if cfg.tail_pallas is not None:
            return bool(cfg.tail_pallas)
        return (
            not interpret
            and cfg.hybrid_alpha >= 1.0
            and not cfg.variable_localization
            and (cfg.fast_geometry or not cfg.localize)
        )

    def _hybrid_kwargs(self, body_mean, dtype):
        """Static-B inputs for ``hybrid_alpha < 1``: per-row sigma and its
        interpolation to ob locations with the same forward-operator taps
        as the state (generalizes the reference's pure-ensemble gain,
        ``efa_xray/assimilation/ensrf.py:95,119``)."""
        cfg = self.config
        if cfg.hybrid_alpha >= 1.0:
            return {}
        from efa_xray_tpu.observation import forward as _fwd

        bsig = jnp.broadcast_to(
            jnp.asarray(cfg.static_b_sigma, dtype), body_mean.shape
        )
        taps = self.build_taps()
        tsig = _fwd.apply_taps_obj(bsig[:, None], taps)[:, 0]
        return dict(
            hybrid_alpha=float(cfg.hybrid_alpha),
            body_sigma=bsig,
            tail_sigma=tsig,
            static_length=float(cfg.static_b_length),
        )

    @Assimilation.with_matmul_precision
    def update(self) -> Tuple[EnsembleState, ObservationBatch]:
        """Assimilate all observations; return (posterior, observations).

        Reference flow parity: ``efa_xray/assimilation/ensrf.py:33-151``.
        Tiny workloads route to the host CPU backend
        (:meth:`Assimilation._host_fastpath`): same algorithm, same
        results up to backend fp differences, none of the remote-dispatch
        floor.
        """
        if self._host_fastpath():
            with self._host_fastpath_ctx():
                return self._update_impl()
        return self._update_impl()

    def _update_impl(self) -> Tuple[EnsembleState, ObservationBatch]:
        cfg = self.config
        if self.verbose:
            self.log.info("Beginning update sequence")
        body_mean, body_perts, tail_mean, tail_perts = self.format_prior_state()
        obs = self.obs_arrays()
        obs = self.apply_outlier_check(obs, tail_mean, tail_perts)

        dtype = jnp.dtype(cfg.dtype)
        # Structure-cached device coordinates: no per-update host tile +
        # re-upload of 2 x nstate floats (see row_latlon_device).
        body_lat, body_lon = self.prior.structure.row_latlon_device(dtype)
        vertical = cfg.localize and self._vertical_active()
        if vertical:
            body_vert = jnp.asarray(self.prior.structure.row_vert(), dtype=dtype)
        else:
            body_vert = jnp.zeros_like(body_lat)

        if self.verbose:
            self.log.info("Beginning observation loop (%s)", cfg.method)

        # Background spread per row, captured BEFORE the update so RTPS
        # survives buffer donation of the prior perturbations.
        prior_spread = None
        if cfg.rtps_alpha > 0.0:
            from efa_xray_tpu.assimilation.adaptive_inflation import row_spread

            prior_spread = row_spread(body_perts)
        prior_perts_saved = None
        if cfg.rtpp_alpha > 0.0:
            # RTPP blends member-wise with the prior perturbations, so they
            # must survive the update; the mesh and fused-Pallas paths
            # donate the prior buffers, so keep an explicit copy there.
            donating = self.mesh is not None or self._use_pallas()
            prior_perts_saved = (
                jnp.array(body_perts, copy=True) if donating else body_perts
            )

        hybrid_kwargs = self._hybrid_kwargs(body_mean, dtype)
        vl_kwargs = self.varloc_kwargs(dtype)
        obs_chunk = cfg.obs_chunk
        if obs_chunk is None:
            # Auto: chunk huge batches on TPU (see FilterConfig.obs_chunk)
            # unless an incompatible option forces one-shot.
            obs_chunk = (
                65536
                if (
                    jax.default_backend() == "tpu"
                    and int(obs.values.shape[0]) > 131072
                    and not hybrid_kwargs
                    and not vl_kwargs
                )
                else 0
            )
        if (
            self.mesh is None
            and obs_chunk
            and int(obs.values.shape[0]) > int(obs_chunk)
        ):
            if hybrid_kwargs or vl_kwargs:
                raise ValueError(
                    "obs_chunk does not combine with hybrid covariance or "
                    "variable localization (the chunked driver appends obs "
                    "rows to the state body, and those options carry "
                    "per-row inputs it does not extend)"
                )
            bm, bp, tm, tp, diags = self._solve_obs_chunked(
                body_mean, body_perts, tail_mean, tail_perts,
                body_lat, body_lon, obs, body_vert, vertical, dtype,
                int(obs_chunk),
            )
        elif self.mesh is not None:
            from efa_xray_tpu.parallel import sharded

            bm, bp, tm, tp, diags = sharded.ensrf_update_sharded(
                body_mean,
                body_perts,
                tail_mean,
                tail_perts,
                body_lat,
                body_lon,
                obs,
                mesh=self.mesh,
                localize=cfg.localize,
                method=cfg.method,
                block_size=cfg.block_size,
                # Per-shard rows are what the flat kernel's Mosaic grid sees.
                tile=self._tile(
                    nrows=-(-int(body_mean.shape[0])
                            // max(1, int(self.mesh.devices.size))),
                    nmems=int(body_perts.shape[1]),
                ),
                unbiased=cfg.unbiased_variance,
                fast_geometry=cfg.fast_geometry,
                body_vert=body_vert,
                vertical=vertical,
                use_pallas=self._use_pallas(),
                interpret=__import__("jax").default_backend() != "tpu",
                tail_panel=cfg.tail_panel,
                cull=cfg.cull,
                spatial_sort=cfg.spatial_sort,
                mxu_bf16=cfg.mxu_bf16,
                # EnSRF owns the formatted prior: let the posterior shards
                # reuse its HBM.
                donate=True,
                **hybrid_kwargs,
                **vl_kwargs,
            )
        else:
            bm, bp, tm, tp, diags = self._solve_once(
                body_mean, body_perts, tail_mean, tail_perts,
                body_lat, body_lon, obs, body_vert, vertical, dtype,
                hybrid_kwargs, vl_kwargs,
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

    def _solve_once(
        self,
        body_mean,
        body_perts,
        tail_mean,
        tail_perts,
        body_lat,
        body_lon,
        obs,
        body_vert,
        vertical: bool,
        dtype,
        hybrid_kwargs: dict,
        vl_kwargs: dict,
        augmented: bool = False,
    ):
        """One full single-device update (tail + body) through the
        configured solver path; returns ``(bm, bp, tm, tp, diags)``.

        ``augmented=True`` marks a state body with obs rows appended
        (:meth:`_solve_obs_chunked`): the grid-mode kernels and the
        structure-derived spatial sort assume ``nrows == vt * ngrid``,
        so augmented calls use the flat fused kernel (chordal geometry)
        or the XLA blocked body instead."""
        cfg = self.config
        if cfg.method == "serial":
            return core.ensrf_serial(
                body_mean,
                body_perts,
                tail_mean,
                tail_perts,
                body_lat,
                body_lon,
                obs,
                localize=cfg.localize,
                unbiased=cfg.unbiased_variance,
                fast_geometry=cfg.fast_geometry,
                body_vert=body_vert,
                vertical=vertical,
                **hybrid_kwargs,
                **vl_kwargs,
            )
        if self._use_pallas() and not (
            augmented and cfg.localize and not cfg.fast_geometry
        ):
            from efa_xray_tpu.ops.ensrf_pallas import ensrf_blocked_body_pallas
            from efa_xray_tpu.ops.ensrf_pallas_fused import (
                ensrf_blocked_body_pallas_fused_donating,
                ensrf_blocked_body_pallas_fused_grid_donating,
            )
            import jax

            interpret = jax.default_backend() != "tpu"
            tail_hkw = {
                k: v for k, v in hybrid_kwargs.items() if k != "body_sigma"
            }
            tail_vkw = (
                {"varloc": vl_kwargs["varloc"], "ob_var": vl_kwargs["ob_var"]}
                if vl_kwargs else {}
            )
            tail = core.tail_scan_blocked(
                tail_mean,
                tail_perts,
                obs,
                localize=cfg.localize,
                unbiased=cfg.unbiased_variance,
                fast_geometry=cfg.fast_geometry,
                vertical=vertical,
                panel=cfg.tail_panel,
                pallas_apply=self._tail_pallas(interpret),
                interpret=interpret,
                pallas_tile=self._tile(),
                **tail_hkw,
                **tail_vkw,
            )
            st = self.prior.structure
            vt = st.nvars * st.ntimes
            nrows = int(body_mean.shape[0])
            if (not augmented and self._grid_kernel_ok()
                    and nrows == vt * st.ngrid):
                # Gridded state: v4-grid — same one-HBM-pass loop nest,
                # horizontal weights computed ONCE per grid point by XLA
                # and streamed in (removes the vt-fold trig redundancy;
                # measured 0.29 s -> see PARITY.md config 3), vertical
                # localization — and the cross-variable localization
                # factor — as a per-(group, ob) scalar table.
                group_factor = None
                if vl_kwargs:
                    varg = jnp.arange(vt, dtype=jnp.int32) // st.ntimes
                    group_factor = (
                        vl_kwargs["varloc"][vl_kwargs["ob_var"]][:, varg].T
                    )
                bm, bp = ensrf_blocked_body_pallas_fused_grid_donating(
                    body_mean,
                    body_perts,
                    body_lat,
                    body_lon,
                    tail,
                    obs,
                    body_vert=body_vert if vertical else None,
                    localize=cfg.localize,
                    block_size=cfg.block_size,
                    tile=self._tile(grid=True, nmems=int(body_perts.shape[1])),
                    interpret=interpret,
                    vertical=vertical,
                    ngrid=st.ngrid,
                    mxu_bf16=cfg.mxu_bf16,
                    group_factor=group_factor,
                )
            elif cfg.fast_geometry or not cfg.localize:
                # varloc reaches the Pallas branch only via the grid
                # kernel (_use_pallas); the flat kernels have no factor
                # input and must never be selected with it.
                assert not vl_kwargs
                # Geometry-only row permutation for the kernel's cull:
                # computed once per structure, two gathers per update.
                row_order = inv_order = None
                if cfg.spatial_sort and not augmented:
                    # (augmented bodies carry appended obs rows the
                    # structure's permutation does not cover)
                    row_order, inv_order = st.spatial_order_device()
                # The fully-fused v4 kernel (state crosses HBM once;
                # per-row chordal weights — and, when active, vertical GC
                # factors — computed in-kernel).  Per-row weights are exact
                # for flat AND gridded (vt > 1) states; v4's geometry is
                # inherently chordal, so it is only selected when
                # cfg.fast_geometry allows it (exact-haversine runs fall
                # through to the grid-mode v3 below).  The donating variant
                # halves peak HBM — EnSRF owns these buffers and never
                # touches them again (validated at 4M x 80 rows x 10k obs
                # on a 16 GB v5e; the non-donating form OOMs there).
                bm, bp = ensrf_blocked_body_pallas_fused_donating(
                    body_mean,
                    body_perts,
                    body_lat,
                    body_lon,
                    tail,
                    obs,
                    body_vert=body_vert if vertical else None,
                    localize=cfg.localize,
                    block_size=cfg.block_size,
                    tile=self._tile(nrows=nrows,
                                    nmems=int(body_perts.shape[1])),
                    interpret=interpret,
                    vertical=vertical,
                    cull=cfg.cull,
                    spatial_sort=cfg.spatial_sort and not augmented,
                    row_order=row_order,
                    inv_order=inv_order,
                    hybrid=bool(hybrid_kwargs),
                    body_sigma=hybrid_kwargs.get("body_sigma"),
                    static_length=hybrid_kwargs.get("static_length"),
                    mxu_bf16=cfg.mxu_bf16,
                )
            else:
                assert not vl_kwargs  # see the flat-kernel guard above
                bm, bp = ensrf_blocked_body_pallas(
                    body_mean,
                    body_perts,
                    body_lat,
                    body_lon,
                    tail,
                    obs,
                    localize=cfg.localize,
                    block_size=cfg.block_size,
                    tile=self._tile(grid=True, nmems=int(body_perts.shape[1])),
                    fast_geometry=cfg.fast_geometry,
                    body_vert=body_vert,
                    vertical=vertical,
                    # Grid-mode weights: rows tile one spatial grid over
                    # nvars*ntimes groups (row_latlon ordering), so
                    # horizontal GC weights are computed once per grid point.
                    ngrid=st.ngrid,
                    interpret=interpret,
                )
            return bm, bp, tail.tail_mean, tail.tail_perts, tail.diags
        return core.ensrf_blocked(
            body_mean,
            body_perts,
            tail_mean,
            tail_perts,
            body_lat,
            body_lon,
            obs,
            localize=cfg.localize,
            block_size=cfg.block_size,
            unbiased=cfg.unbiased_variance,
            fast_geometry=cfg.fast_geometry,
            body_vert=body_vert,
            vertical=vertical,
            **hybrid_kwargs,
            **vl_kwargs,
        )

    def _solve_obs_chunked(
        self,
        body_mean,
        body_perts,
        tail_mean,
        tail_perts,
        body_lat,
        body_lon,
        obs,
        body_vert,
        vertical: bool,
        dtype,
        chunk: int,
    ):
        """Process the observation batch in sequential chunks of
        ``chunk`` obs, exactly (up to fp reassociation).

        The serial filter assimilates obs in order, so splitting the
        batch changes nothing algebraically PROVIDED later chunks'
        obs-space rows keep receiving every earlier chunk's updates —
        the augmented-state invariant
        (``efa_xray/assimilation/assimilation.py:146-150``).  Here ALL
        obs-space rows ride as extra state-body rows (their lat/lon make
        the body solvers localize them exactly like the tail does), and
        after each chunk its own rows are overwritten with the chunk's
        exact tail solution — the same move ``tail_scan_blocked`` makes
        per panel.  Every chunk call has identical shapes, so the whole
        sweep compiles ONCE; per-chunk peak memory is bounded by the
        chunk's kernel shapes instead of the full batch (the fused
        EnSRF measurably crashed the TPU worker at 200k obs in one
        shot — BENCH config 12)."""
        nobs = int(obs.values.shape[0])
        ns = int(body_mean.shape[0])
        nchunks = -(-nobs // chunk)
        pad = nchunks * chunk - nobs
        obs = obs.with_default_verts()

        def pad1(x, fill=0.0):
            if x.dtype == jnp.bool_:
                return jnp.pad(x, (0, pad))
            return jnp.pad(x.astype(dtype), (0, pad), constant_values=fill)

        values = pad1(obs.values)
        errors = pad1(obs.errors, 1.0)
        olat = pad1(obs.lats)
        olon = pad1(obs.lons)
        radii = pad1(obs.radii, jnp.inf)
        assim = jnp.pad(obs.assim, (0, pad))  # padded obs are no-ops
        overt = pad1(obs.verts)
        ovrad = pad1(obs.vert_radii, jnp.inf)

        tm_all = jnp.pad(tail_mean.astype(dtype), (0, pad))
        tp_all = jnp.pad(tail_perts.astype(dtype), ((0, pad), (0, 0)))
        lat_aug = jnp.concatenate([body_lat.astype(dtype), olat])
        lon_aug = jnp.concatenate([body_lon.astype(dtype), olon])
        vert_aug = None
        if body_vert is not None:
            vert_aug = jnp.concatenate([body_vert.astype(dtype), overt])

        bm, bp = body_mean, body_perts
        diags_parts = []
        for i in range(nchunks):
            sl = slice(i * chunk, (i + 1) * chunk)
            obs_i = core.ObsArrays(
                values=values[sl], errors=errors[sl], lats=olat[sl],
                lons=olon[sl], radii=radii[sl], assim=assim[sl],
                verts=overt[sl], vert_radii=ovrad[sl],
            )
            bm_aug = jnp.concatenate([bm, tm_all])
            bp_aug = jnp.concatenate([bp, tp_all], axis=0)
            bm2, bp2, tm_i, tp_i, d = self._solve_once(
                bm_aug, bp_aug, tm_all[sl], tp_all[sl],
                lat_aug, lon_aug, obs_i, vert_aug, vertical, dtype,
                {}, {}, augmented=True,
            )
            bm, bp = bm2[:ns], bp2[:ns]
            # Extra rows carry the passive body-apply result; the chunk's
            # own rows take the exact tail solution (same fp-parity move
            # as tail_scan_blocked's in-panel overwrite).
            tm_all = jax.lax.dynamic_update_slice_in_dim(
                bm2[ns:], tm_i, i * chunk, axis=0)
            tp_all = jax.lax.dynamic_update_slice_in_dim(
                bp2[ns:], tp_i, i * chunk, axis=0)
            diags_parts.append(d)

        diags = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)[:nobs], *diags_parts
        )
        return bm, bp, tm_all[:nobs], tp_all[:nobs], diags
