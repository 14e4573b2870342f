"""Tests for the native C++ batch assembler + raw image cache."""

import numpy as np
import pytest

from latex_ocr_tpu.data.native_batcher import assemble_batch, native_available
from latex_ocr_tpu.data.cache import RawImageCache


def _make_blob(shapes, seed=0):
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 255, s).astype(np.uint8) for s in shapes]
    blob = np.concatenate([i.ravel() for i in imgs])
    offsets = np.zeros(len(imgs), np.int64)
    pos = 0
    for i, img in enumerate(imgs):
        offsets[i] = pos
        pos += img.size
    heights = np.asarray([s[0] for s in shapes], np.int32)
    widths = np.asarray([s[1] for s in shapes], np.int32)
    return imgs, blob, offsets, heights, widths


def test_native_library_compiles():
    assert native_available(), "g++ toolchain present; native build must succeed"


@pytest.mark.parametrize("n_threads", [1, 4])
def test_assemble_batch_matches_manual(n_threads):
    imgs, blob, offsets, heights, widths = _make_blob([(5, 7), (9, 3), (2, 11)])
    out = assemble_batch(blob, offsets, heights, widths,
                         np.array([2, 0, 1], np.int32), 4, 10, 12,
                         n_threads=n_threads)
    assert out.shape == (4, 10, 12, 1)
    np.testing.assert_array_equal(out[0, :2, :11, 0], imgs[2])
    np.testing.assert_array_equal(out[1, :5, :7, 0], imgs[0])
    np.testing.assert_array_equal(out[2, :9, :3, 0], imgs[1])
    assert (out[3] == 255).all()  # unused capacity is white
    assert (out[0, 2:, :, 0] == 255).all()  # padding is white
    assert (out[0, :2, 11:, 0] == 255).all()


def test_assemble_batch_clips_oversize():
    imgs, blob, offsets, heights, widths = _make_blob([(8, 8)])
    out = assemble_batch(blob, offsets, heights, widths,
                         np.array([0], np.int32), 1, 4, 5)
    np.testing.assert_array_equal(out[0, :, :, 0], imgs[0][:4, :5])


def test_raw_image_cache_roundtrip(tmp_path, small_dataset):
    import os

    img_dir = small_dataset["dir_images_train"]
    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir) if f.endswith(".png")
    )[:6]
    cache = RawImageCache.build(paths, str(tmp_path / "cache"))
    assert len(cache) == 6

    from latex_ocr_tpu.data.images import greyscale, read_img

    expected = greyscale(read_img(paths[3]))[:, :, 0]
    np.testing.assert_array_equal(cache.image(3), expected)

    h = max(cache.shape(i)[0] for i in range(3))
    w = max(cache.shape(i)[1] for i in range(3))
    batch = cache.batch([0, 1, 2], 4, h, w)
    np.testing.assert_array_equal(
        batch[1, : cache.shape(1)[0], : cache.shape(1)[1], 0], cache.image(1)
    )
    # reload from disk reuses the cache
    cache2 = RawImageCache.build(paths, str(tmp_path / "cache"))
    np.testing.assert_array_equal(cache2.image(3), expected)
