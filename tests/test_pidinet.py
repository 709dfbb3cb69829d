"""PiDiNet parity vs the reference torch model (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_shim import install_shims, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree or torch unavailable"
)


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_pidinet_parity():
    install_shims()
    import torch
    from annotator.pidinet.model import pidinet

    from ctrlora_tpu.annotators.pidinet import convert_pidinet, pidinet_forward

    torch.manual_seed(0)
    ref = pidinet().eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_pidinet(sd))

    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(torch.from_numpy(x))]
    got = pidinet_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want) == 5
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            w.transpose(0, 2, 3, 1), np.asarray(g), atol=2e-4, rtol=1e-3
        )


def test_pidinet_detector_contract(rng):
    from ctrlora_tpu.annotators import registry

    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8).astype(np.uint8)
    out = registry.get("pidinet")(img)
    assert out.shape == (64, 80) and out.dtype == np.uint8
    out_safe = registry.get("pidinet")(img, safe=True)
    assert out_safe.shape == (64, 80)
