"""OpenPose tests: model forward parity vs reference torch nets, decode
behavior on synthetic heatmaps/PAFs, detector contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)

from ctrlora_tpu.annotators.openpose import models  # noqa: E402
from ctrlora_tpu.annotators.openpose import decode  # noqa: E402


def _torch_flat_sd(ref):
    return {k: v.numpy() for k, v in ref.state_dict().items()}


def test_body_model_parity():
    install_shims()
    import torch
    from annotator.openpose.model import bodypose_model

    torch.manual_seed(0)
    ref = bodypose_model().eval()
    # torch keys are model0.conv1_1.weight — strip the sequential prefix like
    # util.transfer does in reverse
    sd = {".".join(k.split(".")[1:]): v.numpy() for k, v in ref.state_dict().items()}
    params = models.convert_flat(sd)
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        paf_ref, hm_ref = ref(torch.from_numpy(x))
    paf, hm = models.body_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        paf_ref.numpy().transpose(0, 2, 3, 1), np.asarray(paf), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        hm_ref.numpy().transpose(0, 2, 3, 1), np.asarray(hm), atol=1e-4, rtol=1e-3
    )


def test_hand_model_parity():
    install_shims()
    import torch
    from annotator.openpose.model import handpose_model

    torch.manual_seed(1)
    ref = handpose_model().eval()
    sd = {".".join(k.split(".")[1:]): v.numpy() for k, v in ref.state_dict().items()}
    params = models.convert_flat(sd)
    x = np.random.default_rng(1).standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out = models.hand_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        out_ref.transpose(0, 2, 3, 1), np.asarray(out), atol=1e-4, rtol=1e-3
    )


def test_face_model_parity():
    install_shims()
    import torch
    from annotator.openpose.face import FaceNet

    torch.manual_seed(2)
    ref = FaceNet().eval()
    params = models.convert_flat(_torch_flat_sd(ref))
    x = np.random.default_rng(2).standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))[-1].numpy()
    out = models.face_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        out_ref.transpose(0, 2, 3, 1), np.asarray(out), atol=1e-4, rtol=1e-3
    )


def _gauss(h, w, cy, cx, sigma=3.0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))


def test_body_decode_synthetic_two_keypoints():
    """A neck at (20,20) and right shoulder at (20,44) joined by a PAF along
    +x must produce one connection and one person subset containing both."""
    H = W = 64
    heatmap = np.zeros((H, W, 19), np.float32)
    heatmap[:, :, 1] = _gauss(H, W, 20, 20)  # part 2 (neck) zero-indexed 1
    heatmap[:, :, 2] = _gauss(H, W, 20, 44)  # part 3 (r-shoulder) idx 2
    paf = np.zeros((H, W, 38), np.float32)
    # limb [2,3] uses mapIdx [31,32] -> paf channels 12,13; unit x-direction
    paf[18:23, 20:45, 12] = 1.0
    candidate, subset = decode.body_decode(heatmap, paf)
    assert len(candidate) == 2
    kept = [s for s in subset] if len(subset) else []
    # below the >=4-part threshold, subsets are pruned; verify the raw
    # connection instead
    peaks = decode.find_peaks(heatmap)
    conns, special = decode.match_limbs(peaks, paf, H)
    assert 0 not in special
    assert len(conns[0]) == 1  # exactly one neck->shoulder link


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_detector_contract_random_weights(rng):
    from ctrlora_tpu.annotators import registry

    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8).astype(np.uint8)
    det = registry.get("openpose")
    out = det(img)
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8
    pose = det(img, return_is_index=True)
    assert set(pose) == {"bodies", "hands", "faces"}
