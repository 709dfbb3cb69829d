"""FID InceptionV3 parity vs a torch oracle of the pt_inception network
(torchvision inception_v3 layout + the three FID quirks: no-count-pad avg
pools in A/C/E1 blocks, max branch-pool in Mixed_7c, BN eps 1e-3)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from ctrlora_tpu.models.inception import (
    convert_inception, inception_features, inception_score,
)


class Basic(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class IncA(nn.Module):
    def __init__(self, cin, pf):
        super().__init__()
        self.branch1x1 = Basic(cin, 64, kernel_size=1)
        self.branch5x5_1 = Basic(cin, 48, kernel_size=1)
        self.branch5x5_2 = Basic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = Basic(cin, pf, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x)),
        ], 1)


class IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = Basic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = Basic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = Basic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = Basic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class IncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = Basic(cin, 192, kernel_size=1)
        self.branch7x7_1 = Basic(cin, c7, kernel_size=1)
        self.branch7x7_2 = Basic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = Basic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = Basic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = Basic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = Basic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = Basic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = Basic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avg(x))
        ], 1)


class IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = Basic(cin, 192, kernel_size=1)
        self.branch3x3_2 = Basic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = Basic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = Basic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = Basic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = Basic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class IncE(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = Basic(cin, 320, kernel_size=1)
        self.branch3x3_1 = Basic(cin, 384, kernel_size=1)
        self.branch3x3_2a = Basic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = Basic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = Basic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = Basic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = Basic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = Basic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = Basic(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = (
            F.max_pool2d(x, 3, stride=1, padding=1) if self.pool == "max" else _avg(x)
        )
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(pooled)
        ], 1)


class TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = Basic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = Basic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = Basic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = Basic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = Basic(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg")
        self.Mixed_7c = IncE(2048, "max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        feats = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return feats, self.fc(feats)


@pytest.mark.slow  # mid-weight parity: fast-lane budget (VERDICT r4 #7)
def test_inception_fid_parity(rng):
    torch.manual_seed(0)
    model = TorchFIDInception()
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.normal_(0, 0.02)
        for name, b in model.named_buffers():
            if "running_mean" in name:
                b.normal_(0, 0.1)
            elif "running_var" in name:
                b.uniform_(0.5, 1.5)
    model.eval()
    params = convert_inception({k: v.numpy() for k, v in model.state_dict().items()})

    # small input keeps the 1-core run fast; 75px survives the stem (/8)
    x = rng.uniform(-1, 1, (2, 75, 75, 3)).astype(np.float32)
    with torch.no_grad():
        want_f, want_l = model(torch.as_tensor(x).permute(0, 3, 1, 2))
    got_f, got_l = inception_features(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l.numpy(), rtol=1e-3, atol=1e-4)


def test_inception_score_known_distribution():
    # uniform predictions -> IS == 1; one-hot diverse predictions -> IS == K
    # n chosen so every split covers each class exactly once
    n, k = 32, 8
    logits = np.zeros((n, k), np.float32)
    m, s = inception_score(logits, splits=4)
    assert abs(m - 1.0) < 1e-5 and s < 1e-5
    sharp = np.full((n, k), -50.0, np.float32)
    for i in range(n):
        sharp[i, i % k] = 50.0
    m, _ = inception_score(sharp, splits=4)
    np.testing.assert_allclose(m, k, rtol=1e-3)
