"""Annotator checkpoint auto-download (reference: annotator/util.py:8 +
per-detector load_file_from_url) — mock-URL tests, no network."""

import hashlib
import os

import pytest

from ctrlora_tpu.annotators import download as dl


@pytest.fixture
def mock_source(tmp_path, monkeypatch):
    src = tmp_path / "mirror"
    src.mkdir()
    (src / "ControlNetHED.pth").write_bytes(b"fake hed weights")
    dst = tmp_path / "ckpts"
    dst.mkdir()
    monkeypatch.setenv("CTRLORA_ANNOTATOR_CKPTS", str(dst))
    monkeypatch.setenv(dl.BASE_URL_ENV, f"file://{src}")
    return src, dst


def test_no_download_without_optin(mock_source, monkeypatch):
    """Zero-egress default: a missing file stays missing (loaders keep
    their skip/error behavior), no fetch is attempted."""
    src, dst = mock_source
    monkeypatch.delenv(dl.ALLOW_ENV, raising=False)
    path = dl.ensure_ckpt("ControlNetHED.pth")
    assert path == os.path.join(str(dst), "ControlNetHED.pth")
    assert not os.path.exists(path)


def test_download_fetches_and_records_sha(mock_source, monkeypatch):
    src, dst = mock_source
    monkeypatch.setenv(dl.ALLOW_ENV, "1")
    path = dl.ensure_ckpt("ControlNetHED.pth")
    assert os.path.exists(path)
    assert open(path, "rb").read() == b"fake hed weights"
    sums = (dst / "SHA256SUMS").read_text()
    digest = hashlib.sha256(b"fake hed weights").hexdigest()
    assert f"{digest} ControlNetHED.pth" in sums
    # second call: no re-download, digest verifies
    assert dl.ensure_ckpt("ControlNetHED.pth") == path


def test_corrupted_file_raises(mock_source, monkeypatch):
    src, dst = mock_source
    monkeypatch.setenv(dl.ALLOW_ENV, "1")
    path = dl.ensure_ckpt("ControlNetHED.pth")
    with open(path, "wb") as f:
        f.write(b"tampered")
    with pytest.raises(RuntimeError, match="corrupted"):
        dl.ensure_ckpt("ControlNetHED.pth")


def test_known_sha_mismatch_rejects_download(mock_source, monkeypatch):
    src, dst = mock_source
    monkeypatch.setenv(dl.ALLOW_ENV, "1")
    monkeypatch.setitem(dl.KNOWN_SHA256, "ControlNetHED.pth", "0" * 64)
    with pytest.raises(RuntimeError, match="expected"):
        dl.ensure_ckpt("ControlNetHED.pth")
    assert not os.path.exists(dst / "ControlNetHED.pth")


def test_unknown_name_passthrough(tmp_path, monkeypatch):
    monkeypatch.setenv("CTRLORA_ANNOTATOR_CKPTS", str(tmp_path))
    monkeypatch.setenv(dl.ALLOW_ENV, "1")
    p = dl.ensure_ckpt("not_in_registry.bin")
    assert not os.path.exists(p)


def test_every_loader_filename_is_registered():
    """Every filename the loaders request must have a pinned URL (else the
    auto-download silently never triggers for that detector)."""
    import re
    import pathlib

    root = pathlib.Path(dl.__file__).parent
    wanted = set()
    for f in root.rglob("*.py"):
        if f.name == "download.py":
            continue
        for m in re.finditer(r'ensure_ckpt\(\s*"([^"]+)"', f.read_text()):
            wanted.add(m.group(1))
    # lineart fetches via a variable loop over these two names
    wanted |= {"sk_model.pth", "sk_model2.pth"}
    missing = wanted - set(dl.WEIGHT_URLS)
    assert not missing, f"no pinned URL for: {sorted(missing)}"
