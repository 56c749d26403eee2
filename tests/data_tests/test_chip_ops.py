"""Device chip-math tests: mask decode, extraction, seg-map stamping."""

import numpy as np
import pytest

import jax.numpy as jnp

from instageo_tpu.data.geotiff import Affine
from instageo_tpu.data.pipeline import get_chip_coords, point_rowcol
from instageo_tpu.ops.chip_ops import (
    apply_mask,
    chip_has_data,
    decode_fmask_value,
    decode_scl_mask,
    extract_chips,
    mask_segmentation_map,
    process_tile_chips,
    seg_has_labels,
    stamp_segmentation,
)


def test_decode_fmask_bits():
    # value with bits: cloud(1)=1, shadow(3)=1 -> 0b1010 = 10
    m = jnp.asarray([[10, 0, 2]])
    np.testing.assert_array_equal(np.asarray(decode_fmask_value(m, 1)), [[1, 0, 1]])
    np.testing.assert_array_equal(np.asarray(decode_fmask_value(m, 3)), [[1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(decode_fmask_value(m, 5)), [[0, 0, 0]])


def test_decode_scl_classes():
    m = jnp.asarray([[8, 9, 6, 4]])
    np.testing.assert_array_equal(
        np.asarray(decode_scl_mask(m, [8, 9])), [[1, 1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(decode_scl_mask(m, [6])), [[0, 0, 1, 0]])


def test_extract_chips():
    tile = jnp.arange(2 * 8 * 8).reshape(2, 8, 8)
    coords = jnp.asarray([[0, 0], [1, 1]])
    chips = extract_chips(tile, coords, 4)
    assert chips.shape == (2, 2, 4, 4)
    np.testing.assert_array_equal(np.asarray(chips[0, 0]),
                                  np.asarray(tile[0, :4, :4]))
    np.testing.assert_array_equal(np.asarray(chips[1, 0]),
                                  np.asarray(tile[0, 4:, 4:]))


def test_apply_mask_each_vs_any():
    # 2 timesteps x 2 bands, 2x2 chips; cloud bit set in t0 only.
    chips = jnp.ones((1, 4, 2, 2)) * 7
    masks = jnp.zeros((1, 2, 2, 2), jnp.int32)
    masks = masks.at[0, 0, 0, 0].set(2)  # cloud bit (pos 1) at t0 pixel (0,0)
    out_each = np.asarray(apply_mask(chips, masks, -9, "HLS", ["cloud"], "each"))
    # bands of t0 masked at (0,0), t1 untouched
    assert out_each[0, 0, 0, 0] == -9 and out_each[0, 1, 0, 0] == -9
    assert out_each[0, 2, 0, 0] == 7 and out_each[0, 3, 0, 0] == 7
    out_any = np.asarray(apply_mask(chips, masks, -9, "HLS", ["cloud"], "any"))
    assert (out_any[0, :, 0, 0] == -9).all()


def test_stamp_segmentation_window_and_clip():
    rc = jnp.asarray([[0, 0], [3, 3]])
    labels = jnp.asarray([1.0, 2.0])
    valid = jnp.asarray([True, True])
    seg = np.asarray(stamp_segmentation(rc, labels, valid, 8, window_size=1))
    assert seg[0, 0] == 1 and seg[1, 1] == 1  # window around (0,0) clipped
    assert seg[3, 3] == 2 and seg[2, 2] == 2 and seg[4, 4] == 2
    assert seg[6, 6] == -1  # untouched

    # Invalid points write nothing.
    seg2 = np.asarray(stamp_segmentation(
        rc, labels, jnp.asarray([True, False]), 8, window_size=0))
    assert seg2[3, 3] == -1 and seg2[0, 0] == 1


def test_mask_segmentation_map_strategies():
    chip = jnp.asarray([[[1.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]])
    seg = jnp.asarray([[5, 5], [5, 5]], jnp.int16)
    out_any = np.asarray(mask_segmentation_map(chip, seg, 0.0, "any"))
    np.testing.assert_array_equal(out_any, [[-1, -1], [5, 5]])
    out_each = np.asarray(mask_segmentation_map(chip, seg, 0.0, "each"))
    np.testing.assert_array_equal(out_each, [[5, -1], [5, 5]])


def test_validity_reductions():
    chips = jnp.stack([jnp.zeros((2, 2, 2)), jnp.ones((2, 2, 2))])
    np.testing.assert_array_equal(np.asarray(chip_has_data(chips, 0.0)),
                                  [False, True])
    segs = jnp.stack([jnp.full((2, 2), -1), jnp.asarray([[-1, 3], [-1, -1]])])
    np.testing.assert_array_equal(np.asarray(seg_has_labels(segs)), [False, True])


def test_chip_coords_and_rowcol():
    tr = Affine.from_origin(1000.0, 2000.0, 10.0, 10.0)
    xs = np.asarray([1005.0, 1325.0])
    ys = np.asarray([1995.0, 1675.0])
    coords = get_chip_coords(xs, ys, tr, chip_size=16)
    # point 1 -> pixel (0,0) -> chip (0,0); point 2 -> col 32, row 32 -> chip (2,2)
    np.testing.assert_array_equal(coords, [[0, 0], [2, 2]])
    rc = point_rowcol(xs, ys, tr)
    np.testing.assert_array_equal(rc, [[0, 0], [32, 32]])


def test_process_tile_chips_end_to_end():
    rng = np.random.default_rng(0)
    tile = rng.integers(1, 100, size=(6, 16, 16)).astype(np.float32)
    masks = np.zeros((1, 16, 16), np.int32)
    masks[0, 0, 0] = 2  # cloud at pixel (0,0)
    chip_coords = np.asarray([[0, 0], [1, 1]], np.int32)
    point_rc = np.asarray([[2, 3], [10, 12]], np.int64)  # (row, col)
    labels = np.asarray([1.0, 2.0], np.float32)
    owner = np.asarray([0, 1])

    chips, segs, cv, sv = process_tile_chips(
        tile, masks, chip_coords, point_rc, labels, owner,
        chip_size=8, no_data_value=0.0, data_source="HLS",
        mask_types=["cloud"], masking_strategy="any", window_size=0,
    )
    assert chips.shape == (2, 6, 8, 8)
    assert segs.shape == (2, 8, 8)
    assert cv.all() and sv.all()
    # cloud-masked pixel zeroed in chip 0
    assert (chips[0, :, 0, 0] == 0).all()
    # labels stamped relative to chip origin
    assert segs[0][2, 3] == 1
    assert segs[1][10 - 8, 12 - 8] == 2
    # seg pixel under cloud is invalidated
    assert segs[0][0, 0] == -1


def test_seg_invalidation_follows_masking_strategy():
    """'each' (pixel valid if ANY band has data) must flow through
    process_tile_chips to mask_segmentation_map (review fix)."""
    from instageo_tpu.ops.chip_ops import process_tile_chips

    tile = np.full((2, 32, 32), 100, np.float32)
    tile[0, 4, 4] = 0  # band 0 nodata at the labeled pixel; band 1 has data
    coords = np.array([[0, 0]], np.int32)
    rc = np.array([[4, 4]], np.int32)
    labels = np.array([1.0], np.float32)
    owner = np.array([0], np.int64)

    for strategy, expect in (("each", 1), ("any", -1)):
        _, segs, _, _ = process_tile_chips(
            tile, None, coords, rc, labels, owner, chip_size=32,
            no_data_value=0, mask_types=(), masking_strategy=strategy,
            window_size=0)
        assert segs[0, 4, 4] == expect, (strategy, segs[0, 4, 4])


def test_stamp_segmentation_later_point_wins_deterministically():
    """Overlapping windows: the LAST point's label wins (reference numpy
    assignment order), regardless of JAX scatter ordering."""
    from instageo_tpu.ops.chip_ops import stamp_segmentation

    rc = jnp.array([[5, 5], [6, 6]], jnp.int32)   # windows overlap at (5..7)
    labels = jnp.array([1.0, 2.0])
    valid = jnp.array([True, True])
    seg = np.asarray(stamp_segmentation(rc, labels, valid, 32, window_size=1))
    # overlap cells (5,5)..(7,7) ∩: rows/cols 5-6 — point 2 stamped later
    assert seg[6, 6] == 2 and seg[5, 5] == 2 and seg[6, 5] == 2
    assert seg[4, 4] == 1  # only point 1's window
    assert seg[7, 7] == 2  # only point 2's window
    # reversed order flips the overlap winner
    seg2 = np.asarray(stamp_segmentation(rc[::-1], labels[::-1], valid, 32,
                                         window_size=1))
    assert seg2[6, 6] == 1 and seg2[5, 5] == 1


def test_apply_mask_bit_position_zero():
    """A mask decode position of 0 (a real Fmask bit) must not be skipped
    by a falsy check."""
    from unittest.mock import patch

    from instageo_tpu.ops import chip_ops

    chips = jnp.full((1, 2, 4, 4), 9.0)
    masks = jnp.zeros((1, 1, 4, 4), jnp.int32).at[0, 0, 1, 1].set(1)  # bit 0
    with patch.dict(chip_ops.MASK_DECODING_POS["HLS"], {"cirrus": 0}):
        out = chip_ops.apply_mask(chips, masks, 0.0, "HLS", ("cirrus",),
                                  "any")
    assert np.asarray(out)[0, :, 1, 1].tolist() == [0.0, 0.0]
    assert np.asarray(out)[0, 0, 0, 0] == 9.0


def test_process_tile_chips_dense_raster_never_drops():
    """A dense label raster (every pixel labeled: 1024 points in a 32² chip)
    exceeds the default 512-point cap; the cap must auto-grow so NO
    observation is lost (reference stamps every point, dp.py:385-421)."""
    cs = 32
    tile = np.full((1, cs, cs), 50.0, np.float32)
    coords = np.array([[0, 0]], np.int32)
    rr, cc = np.meshgrid(np.arange(cs), np.arange(cs), indexing="ij")
    rc = np.stack([rr.ravel(), cc.ravel()], axis=1).astype(np.int64)
    labels = (rc[:, 0] * cs + rc[:, 1]).astype(np.float32) % 7
    owner = np.zeros(len(rc), np.int64)

    _, segs, _, sv = process_tile_chips(
        tile, None, coords, rc, labels, owner, chip_size=cs,
        no_data_value=0, mask_types=(), masking_strategy="each",
        window_size=0, max_points_per_chip=512)
    assert sv.all()
    np.testing.assert_array_equal(
        segs[0], labels.reshape(cs, cs).astype(np.int16))


def test_process_tile_chips_vectorized_matches_loop_semantics():
    """Property test: 10k random points across chips (heavily exceeding the
    cap) reproduce the reference's sequential numpy stamping exactly,
    including within-chip overwrite order."""
    rng = np.random.default_rng(7)
    cs, n_chips_side, n_pts = 16, 2, 10_000
    h = w = cs * n_chips_side
    tile = np.full((1, h, w), 3.0, np.float32)
    coords = np.array([[x, y] for y in range(n_chips_side)
                       for x in range(n_chips_side)], np.int32)
    rc = np.stack([rng.integers(0, h, n_pts), rng.integers(0, w, n_pts)],
                  axis=1).astype(np.int64)
    labels = rng.integers(0, 9, n_pts).astype(np.float32)
    owner = np.array([np.nonzero((coords[:, 0] == c // cs)
                                 & (coords[:, 1] == r // cs))[0][0]
                      for r, c in rc], np.int64)

    _, segs, _, _ = process_tile_chips(
        tile, None, coords, rc, labels, owner, chip_size=cs,
        no_data_value=0, mask_types=(), masking_strategy="each",
        window_size=0, max_points_per_chip=64)

    # Reference semantics: stamp sequentially, later points overwrite.
    expected = np.full((len(coords), cs, cs), -1, np.int16)
    for (r, c), lab, ci in zip(rc, labels, owner):
        expected[ci, r - coords[ci, 1] * cs, c - coords[ci, 0] * cs] = lab
    np.testing.assert_array_equal(segs, expected)


def test_process_tile_chips_mixed_density_buckets():
    """One dense chip must not inflate every chip's padding: chips are
    bucketed by the pow2 of their OWN count (multi-bucket path), and the
    stitched result still matches the sequential reference stamping."""
    rng = np.random.default_rng(11)
    cs, n_side = 16, 2
    h = w = cs * n_side
    tile = np.full((1, h, w), 3.0, np.float32)
    coords = np.array([[x, y] for y in range(n_side)
                       for x in range(n_side)], np.int32)
    # Chip 0 dense (every pixel), the rest sparse (3 points each).
    rr, cc = np.meshgrid(np.arange(cs), np.arange(cs), indexing="ij")
    pts = [np.stack([rr.ravel(), cc.ravel()], axis=1)]
    owners = [np.zeros(cs * cs, np.int64)]
    for ci in range(1, len(coords)):
        r0 = coords[ci, 1] * cs
        c0 = coords[ci, 0] * cs
        pr = rng.integers(0, cs, 3) + r0
        pc = rng.integers(0, cs, 3) + c0
        pts.append(np.stack([pr, pc], axis=1))
        owners.append(np.full(3, ci, np.int64))
    rc = np.concatenate(pts).astype(np.int64)
    owner = np.concatenate(owners)
    labels = rng.integers(0, 9, len(rc)).astype(np.float32)

    _, segs, _, _ = process_tile_chips(
        tile, None, coords, rc, labels, owner, chip_size=cs,
        no_data_value=0, mask_types=(), masking_strategy="each",
        window_size=0, max_points_per_chip=8)

    expected = np.full((len(coords), cs, cs), -1, np.int16)
    for (r, c), lab, ci in zip(rc, labels, owner):
        expected[ci, r - coords[ci, 1] * cs, c - coords[ci, 0] * cs] = lab
    np.testing.assert_array_equal(segs, expected)


def test_preprocess_chips_center_crops_to_img_size():
    from instageo_tpu.ops.preprocess import preprocess_chips

    raw = jnp.arange(1 * 6 * 32 * 32, dtype=jnp.uint16).reshape(1, 6, 32, 32)
    out = preprocess_chips(raw, jnp.zeros(6), jnp.ones(6), img_size=16)
    assert out.shape == (1, 6, 1, 16, 16)
    # center crop: offset (32-16)//2 = 8
    expected = raw[:, 0, 8:24, 8:24].astype(np.float32)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], np.asarray(expected)[0])
