"""Baseline weight-converter oracles: hand-built torch replicas with the
REFERENCE'S exact module naming (mvdepthnet/encoder.py, decoder.py,
dpsnet/dpsnet.py), random-initialized, exported via state_dict(), converted
with utils/baseline_convert.py, and diffed against our Flax modules — the
same pattern that proved the main network's converter
(tests/test_mnasnet_parity.py). With the released weight files absent in
this sandbox (zero egress), structural 1:1-ness of the mapping IS the
testable property."""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

pytestmark = pytest.mark.heavy

from dvmvs_tpu.baselines.dpsnet import ContextNet, Hourglass3D, SPPFeatures
from dvmvs_tpu.baselines.mvdepth_backbone import (
    MVDepthDecoder,
    MVDepthEncoder,
)
from dvmvs_tpu.utils.baseline_convert import (
    convert_dpsnet,
    convert_gpmvs,
    convert_mvdepth_decoder,
    convert_mvdepth_encoder,
)


def _randomize_bn(module, rs):
    """Random running stats + affine so eval-mode BN actually tests the
    stats mapping."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.running_mean.copy_(torch.tensor(
                rs.randn(m.num_features), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                0.5 + rs.rand(m.num_features), dtype=torch.float32))
            m.weight.copy_(torch.tensor(
                rs.randn(m.num_features), dtype=torch.float32))
            m.bias.copy_(torch.tensor(
                rs.randn(m.num_features), dtype=torch.float32))


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ------------------------------------------------- torch replica: MVDepth
def t_down_conv(cin, cout, k):
    p = (k - 1) // 2
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=p, stride=1, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(),
        nn.Conv2d(cout, cout, k, padding=p, stride=2, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU())


def t_conv(cin, cout, k):
    p = (k - 1) // 2
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=p, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU())


def t_up_conv(cin, cout, k):
    p = (k - 1) // 2
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
        nn.Conv2d(cin, cout, k, padding=p, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU())


def t_depth(cin):
    return nn.Sequential(nn.Conv2d(cin, 1, 3, padding=1), nn.Sigmoid())


class TorchMVDEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = t_down_conv(67, 128, 7)
        self.conv2 = t_down_conv(128, 256, 5)
        self.conv3 = t_down_conv(256, 512, 3)
        self.conv4 = t_down_conv(512, 512, 3)
        self.conv5 = t_down_conv(512, 512, 3)

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c5 = self.conv5(c4)
        return c5, c4, c3, c2, c1


class TorchMVDDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.upconv5 = t_up_conv(512, 512, 3)
        self.iconv5 = t_conv(1024, 512, 3)
        self.upconv4 = t_up_conv(512, 512, 3)
        self.iconv4 = t_conv(1024, 512, 3)
        self.disp4 = t_depth(512)
        self.upconv3 = t_up_conv(512, 256, 3)
        self.iconv3 = t_conv(256 + 256 + 1, 256, 3)
        self.disp3 = t_depth(256)
        self.upconv2 = t_up_conv(256, 128, 3)
        self.iconv2 = t_conv(128 + 128 + 1, 128, 3)
        self.disp2 = t_depth(128)
        self.upconv1 = t_up_conv(128, 64, 3)
        self.iconv1 = t_conv(65, 64, 3)
        self.disp1 = t_depth(64)

    def forward(self, c5, c4, c3, c2, c1):
        import torch.nn.functional as F
        u5 = self.upconv5(c5)
        i5 = self.iconv5(torch.cat((u5, c4), 1))
        u4 = self.upconv4(i5)
        i4 = self.iconv4(torch.cat((u4, c3), 1))
        d4 = 2.0 * self.disp4(i4)
        u3 = self.upconv3(i4)
        i3 = self.iconv3(torch.cat((u3, c2, F.interpolate(d4, scale_factor=2)), 1))
        d3 = 2.0 * self.disp3(i3)
        u2 = self.upconv2(i3)
        i2 = self.iconv2(torch.cat((u2, c1, F.interpolate(d3, scale_factor=2)), 1))
        d2 = 2.0 * self.disp2(i2)
        u1 = self.upconv1(i2)
        i1 = self.iconv1(torch.cat((u1, F.interpolate(d2, scale_factor=2)), 1))
        d1 = 2.0 * self.disp1(i1)
        return d1, d2, d3, d4


@torch.no_grad()
def test_mvdepthnet_converter_oracle(rng):
    H, W = 64, 96
    enc_t = TorchMVDEncoder().eval()
    dec_t = TorchMVDDecoder().eval()
    _randomize_bn(enc_t, rng)
    _randomize_bn(dec_t, rng)

    img = rng.randn(1, 3, H, W).astype(np.float32)
    cv = rng.rand(1, 64, H, W).astype(np.float32)
    x = np.concatenate([img, cv], 1)
    feats_t = enc_t(torch.tensor(x))
    disps_t = dec_t(*feats_t)

    enc_vars = convert_mvdepth_encoder(_sd(enc_t))
    dec_vars = convert_mvdepth_decoder(_sd(dec_t))
    feats_j = MVDepthEncoder().apply(
        enc_vars,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(cv.transpose(0, 2, 3, 1)))
    disps_j = MVDepthDecoder().apply(dec_vars, *feats_j)

    for t, j in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j).transpose(0, 3, 1, 2), atol=2e-4)
    for t, j in zip(disps_t, disps_j):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j).transpose(0, 3, 1, 2), atol=2e-4)


def test_gpmvs_converter_maps_log_hyperparameters(rng):
    enc_t = TorchMVDEncoder()
    dec_t = TorchMVDDecoder()
    gp_sd = {"gamma2": np.array([0.3], np.float32),
             "ell": np.array([-0.2], np.float32),
             "sigma2": np.array([-2.0], np.float32)}
    out = convert_gpmvs(_sd(enc_t), gp_sd, _sd(dec_t))
    assert np.isclose(out["gamma2"], np.exp(0.3))
    assert np.isclose(out["ell"], np.exp(-0.2))
    assert np.isclose(out["sigma2"], np.exp(-2.0))
    assert "params" in out["encoder"] and "batch_stats" in out["decoder"]


# -------------------------------------------------- torch replica: DPSNet
def t_convbn(cin, cout, k, stride, pad, dilation):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride=stride,
                  padding=dilation if dilation > 1 else pad,
                  dilation=dilation, bias=False),
        nn.BatchNorm2d(cout))


def t_convbn3d(cin, cout):
    return nn.Sequential(nn.Conv3d(cin, cout, 3, padding=1, bias=False),
                         nn.BatchNorm3d(cout))


class TBasicBlock(nn.Module):
    def __init__(self, cin, planes, stride, dilation, downsample):
        super().__init__()
        self.conv1 = nn.Sequential(
            t_convbn(cin, planes, 3, stride, 1, dilation), nn.ReLU())
        self.conv2 = t_convbn(planes, planes, 3, 1, 1, dilation)
        self.downsample = downsample

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        if self.downsample is not None:
            x = self.downsample(x)
        return out + x


class TorchSPP(nn.Module):
    def __init__(self):
        super().__init__()
        self.firstconv = nn.Sequential(
            t_convbn(3, 32, 3, 2, 1, 1), nn.ReLU(),
            t_convbn(32, 32, 3, 1, 1, 1), nn.ReLU(),
            t_convbn(32, 32, 3, 1, 1, 1), nn.ReLU())

        def make_layer(cin, planes, blocks, stride, dilation):
            down = None
            if stride != 1 or cin != planes:
                down = nn.Sequential(
                    nn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes))
            layers = [TBasicBlock(cin, planes, stride, dilation, down)]
            layers += [TBasicBlock(planes, planes, 1, dilation, None)
                       for _ in range(blocks - 1)]
            return nn.Sequential(*layers)

        self.layer1 = make_layer(32, 32, 3, 1, 1)
        self.layer2 = make_layer(32, 64, 16, 2, 1)
        self.layer3 = make_layer(64, 128, 3, 1, 1)
        self.layer4 = make_layer(128, 128, 3, 1, 2)
        for i, pool in enumerate((32, 16, 8, 4)):
            setattr(self, f"branch{i + 1}", nn.Sequential(
                nn.AvgPool2d((pool, pool), stride=(pool, pool)),
                t_convbn(128, 32, 1, 1, 0, 1), nn.ReLU()))
        self.lastconv = nn.Sequential(
            t_convbn(320, 128, 3, 1, 1, 1), nn.ReLU(),
            nn.Conv2d(128, 32, 1, bias=False))

    def forward(self, x):
        import torch.nn.functional as F
        x = self.firstconv(x)
        x = self.layer1(x)
        raw = self.layer2(x)
        x = self.layer3(raw)
        skip = self.layer4(x)
        size = skip.shape[2:]
        bs = []
        for i in range(4):
            b = getattr(self, f"branch{i + 1}")(skip)
            bs.append(F.interpolate(
                b, size, mode="bilinear", align_corners=False))
        out = torch.cat([raw, skip] + bs[::-1], 1)
        return self.lastconv(out)


class TorchPSNetTail(nn.Module):
    """dres/classify/convs with the reference naming (whole-model state
    dict keys are unprefixed for these — dpsnet.py:275-308)."""

    def __init__(self):
        super().__init__()
        self.feature_extraction = TorchSPP()
        self.dres0 = nn.Sequential(t_convbn3d(64, 32), nn.ReLU(),
                                   t_convbn3d(32, 32), nn.ReLU())
        for i in range(1, 5):
            setattr(self, f"dres{i}", nn.Sequential(
                t_convbn3d(32, 32), nn.ReLU(), t_convbn3d(32, 32)))
        self.classify = nn.Sequential(
            t_convbn3d(32, 32), nn.ReLU(),
            nn.Conv3d(32, 1, 3, padding=1, bias=False))
        specs = [(33, 128, 1), (128, 128, 2), (128, 128, 4), (128, 96, 8),
                 (96, 64, 16), (64, 32, 1), (32, 1, 1)]
        self.convs = nn.Sequential(*[
            nn.Sequential(
                nn.Conv2d(ci, co, 3, dilation=d, padding=d, bias=False),
                nn.LeakyReLU(0.1))
            for ci, co, d in specs])

    def hourglass(self, cost):
        c0 = self.dres0(cost)
        for i in range(1, 5):
            c0 = getattr(self, f"dres{i}")(c0) + c0
        return self.classify(c0)


@torch.no_grad()
def test_dpsnet_converter_oracle(rng):
    model_t = TorchPSNetTail().eval()
    _randomize_bn(model_t, rng)
    sd = _sd(model_t)
    variables = convert_dpsnet(sd)

    # SPP features (input must reach 32x32 at 1/4 res for the largest
    # pooling branch)
    img = rng.randn(1, 3, 128, 128).astype(np.float32)
    feat_t = model_t.feature_extraction(torch.tensor(img)).numpy()
    feat_j = SPPFeatures(name="feature_extraction").apply(
        {"params": variables["params"]["feature_extraction"],
         "batch_stats": variables["batch_stats"]["feature_extraction"]},
        jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        feat_t, np.asarray(feat_j).transpose(0, 3, 1, 2), atol=3e-4)

    # hourglass (3D convs): torch NCDHW vs ours NDHWC
    cost = rng.randn(1, 64, 8, 16, 24).astype(np.float32)
    hg_t = model_t.hourglass(torch.tensor(cost)).numpy()
    hg_j = Hourglass3D(name="hourglass").apply(
        {"params": variables["params"]["hourglass"],
         "batch_stats": variables["batch_stats"]["hourglass"]},
        jnp.asarray(cost.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        hg_t, np.asarray(hg_j).transpose(0, 4, 1, 2, 3), atol=3e-4)

    # context net
    ctx_in = rng.randn(1, 33, 16, 24).astype(np.float32)
    ctx_t = model_t.convs(torch.tensor(ctx_in)).numpy()
    ctx_j = ContextNet(name="context").apply(
        {"params": variables["params"]["context"]},
        jnp.asarray(ctx_in.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        ctx_t, np.asarray(ctx_j).transpose(0, 3, 1, 2), atol=3e-4)


REF_GPLAYER = ("/root/reference/dvmvs/baselines/gpmvs/finetuned-weights/"
               "finetuned_gpmvs_gplayer")


@pytest.mark.skipif(not os.path.exists(REF_GPLAYER),
                    reason="reference gplayer weights not present")
def test_gpmvs_shipped_finetuned_gplayer_imports():
    """The only baseline weight artifact the reference actually ships is
    the finetuned GPlayer (gpmvs/run-testing.py:34-39 loads it alongside
    the gitignored encoder/decoder). Import the REAL file: log-space
    scalars -> exp() hyperparameters consumed by the Kalman state-space
    filter."""
    gp_sd = {k: v.numpy() for k, v in torch.load(
        REF_GPLAYER, map_location="cpu", weights_only=True).items()}
    assert set(gp_sd) == {"gamma2", "ell", "sigma2"}

    # converter applies exp() exactly once (reference gplayer.py:29-31)
    enc_t, dec_t = TorchMVDEncoder(), TorchMVDDecoder()
    out = convert_gpmvs(_sd(enc_t), gp_sd, _sd(dec_t))
    for name in ("gamma2", "ell", "sigma2"):
        assert np.isclose(out[name], np.exp(float(gp_sd[name][0]))), name
        assert out[name] > 0

    # the finetuned hyperparameters drive a usable Kalman filter: Pinf is
    # positive-definite and a measurement update stays finite
    from dvmvs_tpu.baselines.gpmvs import KalmanLatentState
    kal = KalmanLatentState(
        8, gamma2=out["gamma2"], ell=out["ell"], sigma2=out["sigma2"])
    assert np.all(np.linalg.eigvalsh(kal.Pinf) > 0)
    z = kal.step(np.ones(8, np.float32), dt=0.1)
    assert np.isfinite(z).all()
