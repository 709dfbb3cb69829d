"""Data layer tests: datasets, deterministic multi-task scheduler, loader."""

import json
import os

import numpy as np
import pytest

from ctrlora_tpu.data.datasets import CustomDataset, MultiGen20M
from ctrlora_tpu.data.loader import Loader
from ctrlora_tpu.data.scheduler import MultiTaskSchedule, SingleTaskSchedule


def _write_img(path, arr):
    import cv2

    cv2.imwrite(path, arr[..., ::-1])  # RGB -> BGR


@pytest.fixture
def custom_root(tmp_path):
    root = tmp_path / "ds"
    (root / "source").mkdir(parents=True)
    (root / "target").mkdir()
    rng = np.random.default_rng(0)
    with open(root / "prompt.json", "w") as f:
        for i in range(6):
            _write_img(
                str(root / "source" / f"{i}.png"),
                rng.integers(0, 255, (64, 64, 3), np.uint8),
            )
            _write_img(
                str(root / "target" / f"{i}.png"),
                rng.integers(0, 255, (64, 64, 3), np.uint8),
            )
            f.write(
                json.dumps(
                    {"source": f"source/{i}.png", "target": f"target/{i}.png",
                     "prompt": f"prompt {i}"}
                )
                + "\n"
            )
    return str(root)


def test_custom_dataset(custom_root):
    ds = CustomDataset(custom_root)
    assert len(ds) == 6
    item = ds.get(0, np.random.default_rng(0))
    assert item["jpg"].shape == (64, 64, 3)
    assert -1.0 <= item["jpg"].min() and item["jpg"].max() <= 1.0
    assert 0.0 <= item["hint"].min() and item["hint"].max() <= 1.0
    assert item["txt"] == "prompt 0"
    # prompt dropout is rng-driven
    ds2 = CustomDataset(custom_root, drop_rate=1.0)
    assert ds2.get(0, np.random.default_rng(0))["txt"] == ""


@pytest.fixture
def multigen_root(tmp_path):
    root = tmp_path / "mg"
    (root / "conditions").mkdir(parents=True)
    (root / "images").mkdir()
    rng = np.random.default_rng(1)
    items = []
    for i in range(4):
        _write_img(
            str(root / "conditions" / f"c{i}.png"),
            rng.integers(0, 255, (48, 80, 3), np.uint8),  # wide
        )
        _write_img(
            str(root / "images" / f"t{i}.png"),
            rng.integers(0, 255, (96, 160, 3), np.uint8),  # 2x wide
        )
        items.append(
            {"prompt": f"p{i}", "source": f"./t{i}.png", "control_canny": f"c{i}.png"}
        )
    jsonl = root / "canny.json"
    with open(jsonl, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    return str(jsonl), str(root)


def test_multigen_paired_crop(multigen_root):
    jsonl, meta = multigen_root
    ds = MultiGen20M(jsonl, meta, task="canny", drop_rate=0.0, resolution=32)
    item = ds.get(0, np.random.default_rng(3))
    assert item["jpg"].shape == (32, 32, 3)
    assert item["hint"].shape == (32, 32, 3)
    assert item["task"] == "control_canny"
    # determinism given the same rng
    a = ds.get(1, np.random.default_rng(7))
    b = ds.get(1, np.random.default_rng(7))
    np.testing.assert_array_equal(a["jpg"], b["jpg"])
    # corrupt-sample skip: entry with missing file falls through to next
    ds.data.insert(0, {"prompt": "x", "source": "./missing.png", "control_canny": "nope.png"})
    item = ds.get(0, np.random.default_rng(0))
    assert item["jpg"].shape == (32, 32, 3)


def test_multitask_schedule_determinism_and_coverage():
    sched = MultiTaskSchedule(sizes=(10, 3, 7), batch_size=4, seed=5)
    # pure function of step: recompute == same
    for step in range(12):
        t1, idx1 = sched.batch_for_step(step)
        t2, idx2 = sched.batch_for_step(step)
        assert t1 == t2
        np.testing.assert_array_equal(idx1, idx2)
        assert idx1.shape == (4,)
        assert idx1.max() < sched.sizes[t1]
    # each round visits every task exactly once
    for rnd in range(4):
        tasks = {sched.task_for_step(rnd * 3 + i) for i in range(3)}
        assert tasks == {0, 1, 2}
    # per-task stream covers the task before recycling
    seen = []
    for step in range(30):
        t, idx = sched.batch_for_step(step)
        if t == 0:
            seen.extend(idx.tolist())
    assert set(seen[:10]) == set(range(10))  # first epoch of task0 is a permutation


def test_single_task_schedule():
    sched = SingleTaskSchedule(size=5, batch_size=2, seed=1)
    got = []
    for s in range(5):
        _, idx = sched.batch_for_step(s)
        got.extend(idx.tolist())
    assert set(got[:5]) == set(range(5))


def test_loader_host_sharding(custom_root):
    ds = CustomDataset(custom_root)
    sched = SingleTaskSchedule(size=len(ds), batch_size=4, seed=2)
    full = Loader([ds], sched, num_workers=2, prefetch=1, host_id=0, host_count=1,
                  max_length=77)
    h0 = Loader([ds], sched, num_workers=2, prefetch=1, host_id=0, host_count=2,
                max_length=77)
    h1 = Loader([ds], sched, num_workers=2, prefetch=1, host_id=1, host_count=2,
                max_length=77)
    b_full = full._load_batch(0)
    b0 = h0._load_batch(0)
    b1 = h1._load_batch(0)
    assert b_full["jpg"].shape == (4, 64, 64, 3)
    assert b_full["token_ids"].shape == (4, 77)
    assert b0["jpg"].shape == (2, 64, 64, 3)
    # host shards tile the global batch exactly
    np.testing.assert_array_equal(
        np.concatenate([b0["jpg"], b1["jpg"]]), b_full["jpg"]
    )
    np.testing.assert_array_equal(
        np.concatenate([b0["token_ids"], b1["token_ids"]]), b_full["token_ids"]
    )


def test_loader_iteration(custom_root):
    ds = CustomDataset(custom_root)
    sched = SingleTaskSchedule(size=len(ds), batch_size=2, seed=3)
    loader = Loader([ds], sched, num_workers=2, prefetch=2, max_length=77)
    it = loader.iterate(0)
    batches = [next(it) for _ in range(3)]
    for b in batches:
        assert b["jpg"].shape == (2, 64, 64, 3)
        assert b["task_idx"].shape == (2,)
    # resume from step 1 reproduces batch 1
    it2 = loader.iterate(1)
    b1_again = next(it2)
    np.testing.assert_array_equal(batches[1]["jpg"], b1_again["jpg"])
