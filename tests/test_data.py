import numpy as np
import pytest
from PIL import Image

from seedx_tpu.data.anyres import (divide_to_patches,
                                   grid_pinpoints_from_strings,
                                   pick_resolution, process_anyres_image,
                                   resize_and_pad_image,
                                   select_best_resolution,
                                   select_best_resolution_v2)
from seedx_tpu.data.transforms import CLIP_MEAN, CLIP_STD, get_transform

GRIDS = ["1x1", "1x2", "1x3", "2x1", "3x1", "1x4", "4x1", "2x2"]


def test_grid_pinpoints():
    pts = grid_pinpoints_from_strings(["1x1", "2x1"], 448)
    assert pts == [[448, 448], [896, 448]]


def test_select_best_resolution_wide_image():
    pts = grid_pinpoints_from_strings(GRIDS, 448)
    # A wide 2:1 image should pick a wide grid under both criteria
    r1 = select_best_resolution((1000, 500), pts)
    r2 = select_best_resolution_v2((1000, 500), pts)
    assert r1[0] > r1[1]
    assert r2 == (896, 448)
    chosen = pick_resolution((1000, 500), pts)
    assert chosen[0] // 448 >= 2


def test_square_image_single_tile():
    pts = grid_pinpoints_from_strings(GRIDS, 448)
    assert pick_resolution((300, 300), pts) == (448, 448)


def test_resize_and_pad_keep_ratio():
    img = Image.new("RGB", (100, 50), (255, 0, 0))
    out = resize_and_pad_image(img, (64, 64), keep_ratio=True)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    assert (arr[0] == 0).all()          # top padding black
    assert (arr[32, 32] == [255, 0, 0]).all()  # center red


def test_divide_to_patches_row_major():
    img = Image.new("RGB", (4, 2))
    px = img.load()
    for x in range(4):
        for y in range(2):
            px[x, y] = (x, y, 0)
    patches = divide_to_patches(img, 2)
    assert len(patches) == 2
    assert np.asarray(patches[0])[0, 0, 0] == 0
    assert np.asarray(patches[1])[0, 0, 0] == 2


def test_process_anyres_image():
    transform = get_transform("clip", keep_ratio=False, image_size=448)
    pts = grid_pinpoints_from_strings(GRIDS, 448)
    img = Image.new("RGB", (900, 440), (128, 128, 128))
    tiles, pos = process_anyres_image(img, transform, pts, 448)
    # 2x1 grid -> 2 tiles + thumbnail
    assert tiles.shape == (3, 448, 448, 3)
    assert pos.shape == (3, 2)
    np.testing.assert_allclose(pos[-1], [0.5, 0.5])
    np.testing.assert_allclose(pos[0], [0.25, 0.5])
    np.testing.assert_allclose(pos[1], [0.75, 0.5])


def test_clip_transform_normalization():
    img = Image.new("RGB", (10, 10), (255, 255, 255))
    out = get_transform("clip", keep_ratio=False, image_size=8)(img)
    assert out.shape == (8, 8, 3)
    expected = (1.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_sd_transform_range():
    img = Image.new("RGB", (10, 10), (0, 0, 0))
    out = get_transform("sd", keep_ratio=False, image_size=8)(img)
    np.testing.assert_allclose(out, -1.0)


def test_clipb_square_pad():
    img = Image.new("RGB", (100, 50), (0, 0, 0))
    out = get_transform("clipb", keep_ratio=True, image_size=8)(img)
    assert out.shape == (8, 8, 3)
    # corners are CLIP-mean padding -> normalize to ~0
    np.testing.assert_allclose(out[0, 0], 0.0, atol=0.05)


def test_resumable_iterator_skip():
    from seedx_tpu.data.pipeline import ResumableIterator

    it = ResumableIterator(iter(range(10)))
    assert next(it) == 0 and next(it) == 1
    assert it.skip(3) == 3
    assert next(it) == 5
    assert it.position == 6
    assert it.skip(100) == 4          # stream ends gracefully
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        next(it)
