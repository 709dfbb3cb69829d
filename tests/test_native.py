"""Native C++ image-prep kernels: build, correctness vs cv2, batch parallel."""

import numpy as np
import pytest

from ctrlora_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available(build=True):
        pytest.skip("native library could not be built")
    return True


def test_resize_norm_matches_cv2_downscale(lib_ok, rng):
    import cv2

    img = rng.integers(0, 255, (97, 133, 3), dtype=np.uint8).astype(np.uint8)
    out = native.resize_norm(img, (10, 20, 64, 64), (32, 32), 1 / 255.0, 0.0)
    ref = cv2.resize(
        img[10:74, 20:84], (32, 32), interpolation=cv2.INTER_AREA
    ).astype(np.float32) / 255.0
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(out, ref, atol=2e-2)  # area-box vs cv2 area


def test_resize_norm_upscale(lib_ok, rng):
    import cv2

    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8).astype(np.uint8)
    out = native.resize_norm(img, (0, 0, 40, 40), (80, 80), 1 / 127.5, -1.0)
    ref = cv2.resize(img, (80, 80), interpolation=cv2.INTER_LINEAR).astype(
        np.float32
    ) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=3e-2)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_batch_parallel_consistency(lib_ok, rng):
    imgs = [
        rng.integers(0, 255, (64 + i, 80 + i, 3), dtype=np.uint8).astype(np.uint8)
        for i in range(16)
    ]
    crops = [(0, 0, 64, 64)] * 16
    batch = native.batch_resize_norm(imgs, crops, (32, 32), 1 / 255.0, 0.0)
    assert batch.shape == (16, 32, 32, 3)
    for i in range(16):
        single = native.resize_norm(imgs[i], crops[i], (32, 32), 1 / 255.0, 0.0)
        np.testing.assert_array_equal(batch[i], single)
