"""Device-side chip math: mask decode, chip extraction, seg-map stamping.

The reference does this work per-chip in xarray/numpy on Dask workers
(``instageo/data/data_pipeline.py:66-267``, ``hls_utils.py:500-556``); here
the whole tile's worth of chips is processed in ONE jitted call on TPU:

* gather all chips from the HBM-resident tile with a vmapped dynamic slice;
* decode QA masks bitwise (HLS Fmask) or by class (S2 SCL) on the VPU;
* apply the ``each``/``any`` masking strategy and no-data fill;
* stamp point labels (with ``(2w+1)²`` windows) into segmentation maps via
  scatter-add — static shapes, pad-and-mask for the variable point count;
* compute chip/seg-map validity reductions.

Numeric behavior matches the reference invariants in SURVEY.md §2.1.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Fmask bit positions (reference data_pipeline.py:44-47).
MASK_DECODING_POS = {
    "HLS": {"cloud": 1, "near_cloud_or_shadow": 2, "cloud_shadow": 3, "water": 5},
    "S2": {"cloud": [8, 9], "water": [6]},
}

SEG_MAP_NO_DATA = -1


def decode_fmask_value(mask: jnp.ndarray, position: int) -> jnp.ndarray:
    """Extract one QA bit: ``value // 2^pos mod 2`` (reference hls_utils.py:77-86)."""
    return (mask.astype(jnp.int32) // (2 ** position)) % 2


def decode_scl_mask(mask: jnp.ndarray, classes: Sequence[int]) -> jnp.ndarray:
    """S2 SCL class membership (reference s2_utils.py ``create_mask_from_scl``)."""
    out = jnp.zeros_like(mask, dtype=jnp.int32)
    for c in classes:
        out = out | (mask.astype(jnp.int32) == c).astype(jnp.int32)
    return out


def decode_mask(mask: jnp.ndarray, pos) -> jnp.ndarray:
    """Dispatch on position spec: int -> bit decode, list -> class decode."""
    if isinstance(pos, (list, tuple)):
        return decode_scl_mask(mask, pos)
    return decode_fmask_value(mask, int(pos))


@functools.partial(jax.jit, static_argnames=("chip_size",))
def extract_chips(tile: jnp.ndarray, coords: jnp.ndarray, chip_size: int) -> jnp.ndarray:
    """Gather chips from a tile: (B, H, W) + (N, 2) xy chip indices -> (N, B, cs, cs).

    xy are chip-grid indices (col, row) as produced by ``get_chip_coords``.
    """

    def one(xy):
        start = (0, xy[1] * chip_size, xy[0] * chip_size)
        return jax.lax.dynamic_slice(
            tile, start, (tile.shape[0], chip_size, chip_size))

    return jax.vmap(one)(coords.astype(jnp.int32))


def extract_chips_px(tile: jnp.ndarray, offsets_px: jnp.ndarray,
                     chip_size: int) -> jnp.ndarray:
    """Gather chips at PIXEL offsets: (B, H, W) + (N, 2) xy pixel starts ->
    (N, B, cs, cs). Unlike :func:`extract_chips`, starts need not lie on the
    chip grid — used by overlapped granule inference."""

    def one(xy):
        return jax.lax.dynamic_slice(
            tile, (0, xy[1], xy[0]), (tile.shape[0], chip_size, chip_size))

    return jax.vmap(one)(offsets_px.astype(jnp.int32))


def apply_mask(
    chips: jnp.ndarray,
    masks: jnp.ndarray,
    no_data_value: float,
    data_source: str = "HLS",
    mask_types: Sequence[str] = ("cloud",),
    masking_strategy: str = "each",
) -> jnp.ndarray:
    """Mask chips with decoded QA bits (reference data_pipeline.py:229-267).

    chips: (N, T·C, cs, cs); masks: (N, T, cs, cs) raw QA values.
    ``each`` repeats each timestep's mask over its bands; ``any`` collapses
    over time and masks every band.
    """
    n, tc, h, w = chips.shape
    t = masks.shape[1]
    out = chips
    for mask_type in mask_types:
        pos = MASK_DECODING_POS[data_source].get(mask_type)
        if pos is None:  # unknown type skipped (reference dp.py:255); a
            continue     # falsy check would wrongly skip bit position 0
        decoded = decode_mask(masks, pos)  # (N, T, h, w)
        if masking_strategy == "each":
            m = jnp.repeat(decoded, tc // t, axis=1)
        elif masking_strategy == "any":
            m = jnp.broadcast_to(decoded.any(axis=1, keepdims=True), (n, tc, h, w))
        else:
            raise ValueError(f"Invalid masking strategy: {masking_strategy}")
        out = jnp.where(m == 0, out, no_data_value)
    return out


@functools.partial(
    jax.jit, static_argnames=("chip_size", "window_size", "is_reg")
)
def stamp_segmentation(
    coords_rc: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    chip_size: int,
    window_size: int = 0,
    is_reg: bool = False,
) -> jnp.ndarray:
    """Stamp labels at pixel (row, col) with a (2w+1)² window -> (cs, cs).

    Matches reference ``create_segmentation_map`` (data_pipeline.py:385-421):
    window offsets are clipped to the chip bounds; later points overwrite
    earlier ones. Invalid (padded) points write nothing.
    """
    dtype = jnp.float32 if is_reg else jnp.int16
    seg = jnp.full((chip_size, chip_size), SEG_MAP_NO_DATA, dtype)
    offsets = jnp.arange(-window_size, window_size + 1)
    orow, ocol = jnp.meshgrid(offsets, offsets, indexing="ij")
    rows = jnp.clip(coords_rc[:, 0, None, None] + orow, 0, chip_size - 1)
    cols = jnp.clip(coords_rc[:, 1, None, None] + ocol, 0, chip_size - 1)
    vals = jnp.broadcast_to(
        labels[:, None, None].astype(dtype), rows.shape)
    big = chip_size  # out-of-bounds row: scattered with mode="drop"
    # "Later points overwrite earlier" must be DETERMINISTIC, but JAX
    # leaves the order of conflicting scatter updates implementation-
    # defined. Two passes make it explicit: scatter-max each point's
    # sequence priority, then only the winning point writes its label
    # (a point's own clipped window cells carry one value, so residual
    # duplicates are identical and conflict-free).
    n_pts = coords_rc.shape[0]
    prio = jnp.broadcast_to(
        (jnp.arange(n_pts, dtype=jnp.int32) + 1)[:, None, None], rows.shape)
    prio = jnp.where(valid[:, None, None], prio, 0)
    rows_v = jnp.where(valid[:, None, None], rows, big)
    winner = jnp.zeros((chip_size, chip_size), jnp.int32)
    winner = winner.at[rows_v.reshape(-1), cols.reshape(-1)].max(
        prio.reshape(-1), mode="drop")
    mine = (prio > 0) & (prio == winner[rows, cols])
    rows_f = jnp.where(mine, rows, big)
    seg = seg.at[rows_f.reshape(-1), cols.reshape(-1)].set(
        vals.reshape(-1), mode="drop")
    return seg


def mask_segmentation_map(
    chip: jnp.ndarray,
    seg_map: jnp.ndarray,
    chip_no_data_value: float,
    masking_strategy: str = "any",
) -> jnp.ndarray:
    """Invalidate seg-map pixels without chip data (reference dp.py:66-98).

    ``each``: pixel valid if ANY band has data; ``any``: valid only if ALL
    bands have data.
    """
    if masking_strategy == "each":
        valid = (chip != chip_no_data_value).any(axis=0)
    elif masking_strategy == "any":
        valid = (chip != chip_no_data_value).all(axis=0)
    else:
        raise ValueError(f"Invalid masking strategy: {masking_strategy}")
    return jnp.where(valid, seg_map, SEG_MAP_NO_DATA)


def chip_has_data(chips: jnp.ndarray, no_data_value: float) -> jnp.ndarray:
    """Per-chip: any pixel has data (reference dp.py:212-213)."""
    return (chips != no_data_value).any(axis=(1, 2, 3))


def seg_has_labels(seg_maps: jnp.ndarray) -> jnp.ndarray:
    """Per-chip: any labeled pixel (reference dp.py:217-219)."""
    return (seg_maps != SEG_MAP_NO_DATA).any(axis=(1, 2))


def process_tile_chips(
    tile: np.ndarray,
    mask_tile: Optional[np.ndarray],
    chip_coords: np.ndarray,
    point_rc: np.ndarray,
    point_labels: np.ndarray,
    point_chip_idx: np.ndarray,
    chip_size: int,
    no_data_value: float,
    data_source: str = "HLS",
    mask_types: Sequence[str] = (),
    masking_strategy: str = "each",
    window_size: int = 0,
    is_reg: bool = False,
    max_points_per_chip: int = 512,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full tile -> (chips, seg_maps, chip_valid, seg_valid), one device pass.

    Host assembles static-shape inputs (points padded per chip); everything
    else runs jitted on the accelerator.

    Args:
        tile: (T·C, H, W) imagery; mask_tile: (T, H, W) QA or None.
        chip_coords: (N, 2) chip-grid xy indices.
        point_rc: (P, 2) tile-pixel (row, col) per observation.
        point_labels: (P,) labels; point_chip_idx: (P,) owning chip index.
    """
    n = len(chip_coords)
    coords = jnp.asarray(chip_coords, jnp.int32)
    chips = extract_chips(jnp.asarray(tile), coords, chip_size)
    if mask_tile is not None and mask_types:
        masks = extract_chips(jnp.asarray(mask_tile), coords, chip_size)
        chips = apply_mask(chips, masks, no_data_value, data_source,
                           mask_types, masking_strategy)

    # Per-chip padded point tensors, assembled without a per-chip Python
    # loop: one stable argsort groups points by owning chip while keeping
    # the original observation order WITHIN each chip (the reference's
    # "later points overwrite earlier" stamping semantics depend on it,
    # data_pipeline.py:385-421). O(P log P) host work.
    point_chip_idx = np.asarray(point_chip_idx)
    in_range = (point_chip_idx >= 0) & (point_chip_idx < n)
    sel = np.argsort(point_chip_idx[in_range], kind="stable")
    sorted_idx = np.nonzero(in_range)[0][sel]
    ci_sorted = point_chip_idx[sorted_idx]
    counts = np.bincount(ci_sorted, minlength=n)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(sorted_idx.size, dtype=np.int64) - starts[ci_sorted]

    # NEVER drop observations (the reference stamps every point) — but one
    # dense chip (e.g. a label raster, 50k points) must not inflate every
    # chip's padding: the pads are (n_bucket, cap, ·) host arrays that
    # cross the host->device link. Chips are bucketed by the pow2 of their
    # OWN point count: sparse chips share the base-cap bucket (the common
    # case — one compile, same memory as a hard cap), denser chips get a
    # pow2 cap sized to themselves, so total pad memory stays O(P).
    caps = np.full(n, max_points_per_chip, np.int64)
    dense = counts > max_points_per_chip
    if dense.any():
        caps[dense] = [1 << (int(c) - 1).bit_length() for c in counts[dense]]

    stamp = jax.vmap(
        lambda rc, lab, v: stamp_segmentation(
            rc, lab, v, chip_size, window_size, is_reg))

    def stamp_bucket(ids: np.ndarray, cap: int) -> jnp.ndarray:
        row_of = np.full(n, -1, np.int64)
        row_of[ids] = np.arange(len(ids))
        p_rc = np.zeros((len(ids), cap, 2), np.int32)
        p_lab = np.zeros((len(ids), cap), np.float32)
        p_valid = np.zeros((len(ids), cap), bool)
        m = row_of[ci_sorted] >= 0
        if m.any():
            bi, rk = row_of[ci_sorted[m]], rank[m]
            src = sorted_idx[m]
            x0 = chip_coords[ci_sorted[m], 0].astype(np.int64) * chip_size
            y0 = chip_coords[ci_sorted[m], 1].astype(np.int64) * chip_size
            p_rc[bi, rk, 0] = point_rc[src, 0] - y0
            p_rc[bi, rk, 1] = point_rc[src, 1] - x0
            p_lab[bi, rk] = point_labels[src]
            p_valid[bi, rk] = True
        return stamp(jnp.asarray(p_rc), jnp.asarray(p_lab),
                     jnp.asarray(p_valid))

    unique_caps = np.unique(caps)
    if len(unique_caps) == 1:
        seg_maps = stamp_bucket(np.arange(n), int(unique_caps[0]))
    else:
        parts = np.full((n, chip_size, chip_size), SEG_MAP_NO_DATA,
                        np.float32 if is_reg else np.int16)
        for cap in unique_caps:
            ids = np.nonzero(caps == cap)[0]
            parts[ids] = np.asarray(stamp_bucket(ids, int(cap)))
        seg_maps = jnp.asarray(parts)
    seg_maps = jax.vmap(
        lambda c, s: mask_segmentation_map(c, s, no_data_value,
                                           masking_strategy))(chips, seg_maps)

    chip_valid = chip_has_data(chips, no_data_value)
    seg_valid = seg_has_labels(seg_maps)
    return (np.asarray(chips), np.asarray(seg_maps),
            np.asarray(chip_valid), np.asarray(seg_valid))
