"""On-device radar point -> image-plane rasterization.

Replaces the reference's OFFLINE notebook preprocessing
(radar_feature_map_generate.ipynb cells 5-8), which reads each radar CSV and
splats (range, doppler, rcs) into a 320x320 .npz that the dataloader then
loads from disk (utils/dataloader.py:157-158).  Here the splat is a jittable
function of the raw points, so no preprocessing artifacts exist and the
rasterization fuses into the same XLA program as normalization + the model.

Exact reference semantics (order-dependent!):
  row = int(u / 6), col = int(v / 3.375)          # 1920x1080 -> 320x320
  if cell occupied and row >= 1: row -= 1          # collision bump
  map[c, row, col] = value                         # overwrite, last wins
  out-of-range points are skipped (the notebook's try/except)
  final transpose(0, 2, 1) -> the stored map is [c, v-axis, u-axis]

The sequential collision-bump is reproduced with a lax.scan over points
(N = 512 fixed).  `splat_radar_fast` is the order-independent variant
(last-write-wins without bump) for throughput-critical training where exact
npz parity is not required.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _indices(points: jnp.ndarray, resolution: int, image_w: float,
             image_h: float):
    """points [N, 5] = (range, doppler, rcs, u, v) -> (row, col, valid)."""
    u = points[:, 3]
    v = points[:, 4]
    row = jnp.floor(u / (image_w / resolution)).astype(jnp.int32)
    col = jnp.floor(v / (image_h / resolution)).astype(jnp.int32)
    valid = ((row >= 0) & (row < resolution) & (col >= 0) & (col < resolution)
             & jnp.isfinite(u) & jnp.isfinite(v))
    return row, col, valid


def splat_radar_points(points: jnp.ndarray, valid: jnp.ndarray | None = None,
                       resolution: int = 320, image_w: float = 1920.0,
                       image_h: float = 1080.0, cf: bool = False
                       ) -> jnp.ndarray:
    """Exact notebook-parity splat -> [resolution, resolution, 3] (HWC, where
    H is the v-axis after the notebook's transpose), or [3, H, W] with
    `cf=True` — the reference's own stored layout ([c, v, u], notebook
    transpose(0, 2, 1)), emitted by scatter indexing rather than a transpose
    so the CF-chained RCNet (models/rcnet.py in_cf) gets its input with no
    relayout op at all.

    points: [N, 5] = (range, doppler, rcs, u, v); `valid` masks padding rows.
    """
    r = resolution
    row, col, ok = _indices(points, r, image_w, image_h)
    if valid is not None:
        ok = ok & valid
    feats = points[:, :3].astype(jnp.float32)

    def step(carry, inp):
        grid, occupied = carry    # cf: [3, r(v), r(u)] else [r(v), r(u), 3]
        rw, cl, o, f = inp
        # collision bump: occupied cell and rw >= 1 -> rw - 1
        # (notebook checks channel 0's cell; all channels share cells);
        # `occupied` is indexed [row(u), col(v)] in both layouts
        bump = occupied[rw, cl] & (rw >= 1)
        rw = jnp.where(bump, rw - 1, rw)
        # the notebook's final transpose(0, 2, 1) = store at [*, col, row]
        newg = grid.at[:, cl, rw].set(f) if cf else grid.at[cl, rw].set(f)
        newo = occupied.at[rw, cl].set(True)
        grid = jnp.where(o, newg, grid)
        occupied = jnp.where(o, newo, occupied)
        return (grid, occupied), None

    grid0 = jnp.zeros((3, r, r) if cf else (r, r, 3), jnp.float32)
    occ0 = jnp.zeros((r, r), bool)
    (grid, _), _ = jax.lax.scan(step, (grid0, occ0), (row, col, ok, feats))
    return grid


def splat_radar_fast(points: jnp.ndarray, valid: jnp.ndarray | None = None,
                     resolution: int = 320, image_w: float = 1920.0,
                     image_h: float = 1080.0, cf: bool = False) -> jnp.ndarray:
    """Vectorized last-write-wins splat (no collision bump): one scatter,
    fully parallel.  Cells hit by multiple points keep the highest-index
    point, matching the notebook's overwrite for the no-bump case.
    `cf=True` emits [3, H, W] (the reference's stored [c, v, u] layout) by
    gathering channel-major — no transpose op in either layout."""
    r = resolution
    row, col, ok = _indices(points, r, image_w, image_h)
    if valid is not None:
        ok = ok & valid
    feats = points[:, :3].astype(jnp.float32)
    n = points.shape[0]
    # flatten as (col-major v, row-major u): position (v, u) — the
    # notebook's transposed layout — so no output transpose is needed
    flat_idx = jnp.where(ok, col * r + row, r * r)   # invalid -> dropped slot
    # deterministic last-write-wins: scatter-max the point ORDER per cell
    # (scatter-set with duplicate indices has undefined order), then gather.
    order = jnp.arange(n, dtype=jnp.int32)
    winner = jnp.full((r * r + 1,), -1, jnp.int32).at[flat_idx].max(order)
    winner = winner[:-1]
    if cf:
        vals = jnp.where((winner >= 0)[None, :],
                         feats.T[:, jnp.maximum(winner, 0)], 0.0)
        return vals.reshape(3, r, r)
    vals = jnp.where((winner >= 0)[:, None],
                     feats[jnp.maximum(winner, 0)], 0.0)
    return vals.reshape(r, r, 3)


def minmax_normalize(radar_map: jnp.ndarray) -> jnp.ndarray:
    """Global min-max (reference utils/utils.py:51-54 — applied only on the
    predict path, achelous.py:212; the train path feeds the raw map)."""
    lo = jnp.min(radar_map)
    hi = jnp.max(radar_map)
    return (radar_map - lo) / jnp.maximum(hi - lo, 1e-12)
