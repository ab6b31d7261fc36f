"""Auto row-tile selection for the Pallas EnSRF kernels.

One source of truth for the workload-aware tile defaults used by
:meth:`efa_xray_tpu.assimilation.ensrf.EnSRF._tile`, the benchmark suite,
and tests.  Two independent hardware limits shape the choice:

- the grid-mode kernels (v4-grid, grid-mode v3) stream ``[tile, nmems]``
  state blocks plus ``[block_size, tile]`` weight and scratch panels,
  double-buffered across grid steps, against a 100 MB
  ``vmem_limit_bytes`` — whole-grid tiles are fastest (fewest grid
  iterations, measured on the 16.2k-point GEFS grid) but must be capped
  for large grids (a 0.5-deg 260k-point grid's weight panel alone is
  133 MB);
- Mosaic bounds each kernel grid dimension near 2048 (measured: the flat
  v4 kernel at tile 4096 x 1e7 rows fails remote compile with
  gtiles = 2442 while 1221 compiles), so the flat tile must rise for
  states beyond ~16.7M rows.
"""

GRID_VMEM_BUDGET = 64 * 1024 * 1024
"""Working-set budget for grid-mode tiles: well inside the kernels'
100 MB ``vmem_limit_bytes``, leaving headroom for the small per-block
operands ([B, M], [B, B]) and Mosaic's stack-allocated temps."""

MOSAIC_MAX_GRID_DIM = 2040
"""Conservative bound on a Mosaic grid dimension (observed failure at
2442, success at 1221; project-measured limit is "just under 2048")."""

FLAT_TILE_DEFAULT = 8192
"""Measured-best flat v4 tile at the 1e7-row pod workload (1.36x vs
16384: smaller tiles tighten the localization cull's tile caps)."""


def auto_grid_tile(block_size: int, nmems: int) -> int:
    """VMEM-capped tile for the grid-mode kernels.

    Per tile row the kernels hold ``2 + 2*nmems + block_size`` f32 in
    double-buffered input/output blocks plus ``2*block_size`` f32 of
    scratch; the cap keeps that under :data:`GRID_VMEM_BUDGET`.  Callers
    still clamp to the actual (padded) grid size, so small grids run
    whole-grid.  Quantized to 128: a PARTIAL grid tile is a Mosaic block
    last-dimension, which must be divisible by 128 (whole-grid tiles are
    exempt — block == array dim; surfaced at ngrid = 260k where the
    8-quantized cap 24816 failed to lower).
    """
    b = int(block_size)
    m = int(nmems) if nmems else 80
    per_row = 8 * (2 + 2 * m + b) + 8 * b  # dbl-buffered io + scratch
    cap = max(128, (GRID_VMEM_BUDGET // per_row) // 128 * 128)
    return int(min(1 << 22, cap))


def auto_flat_tile(nrows: int = 0) -> int:
    """Flat v4 tile: 8192, raised for huge states so
    ``ceil(nrows / tile)`` stays under :data:`MOSAIC_MAX_GRID_DIM`
    (multiple of 8)."""
    tile = FLAT_TILE_DEFAULT
    if nrows:
        min_tile = -(-int(nrows) // MOSAIC_MAX_GRID_DIM)
        tile = max(tile, -(-min_tile // 8) * 8)
    return tile
