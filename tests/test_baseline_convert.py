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


# ---------------------------------------------------- torch replica: DELTAS
# Hand-built modules with the reference's exact attribute names
# (deltas/superpoint.py:72-120, densedepth.py:220-268, resnet_s2d.py) so a
# state dict from these replicas exercises the same key space as the
# released checkpoint (one file: state_dict / state_dict_tri /
# state_dict_depth, deltas/run-testing.py:103-109).
class TBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TTrunk(nn.Module):
    """conv1..layer4 of the (optionally narrow) ResNet-50
    (resnet_s2d.py:104-158 with width=16; torchvision layout with 64)."""

    def __init__(self, in_ch=3, width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = width
        self.layer1 = self._make(width, 3, 1)
        self.layer2 = self._make(2 * width, 4, 2)
        self.layer3 = self._make(4 * width, 6, 2)
        self.layer4 = self._make(8 * width, 3, 2)

    def _make(self, planes, blocks, stride):
        down = None
        if stride != 1 or self.inplanes != planes * 4:
            down = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [TBottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        layers += [TBottleneck(self.inplanes, planes)
                   for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        half = x
        x = self.maxpool(x)
        x = self.layer1(x)
        quarter = x
        x = self.layer2(x)
        eighth = x
        x = self.layer3(x)
        sixteenth = x
        x = self.layer4(x)
        return half, quarter, eighth, sixteenth, x


class TSuperpointDense(nn.Module):
    """Dense part of the reference Superpoint forward (superpoint.py:123-180;
    keypoint extraction is downstream of these outputs). Input is assumed
    pre-normalized (the internal ImageNet affine carries no parameters)."""

    def __init__(self, h, w, descriptor_dim=128):
        super().__init__()
        self.h, self.w = h, w
        t = TTrunk(3, 64)
        self.conv1, self.bn1, self.maxpool = t.conv1, t.bn1, t.maxpool
        self.layer1, self.layer2 = t.layer1, t.layer2
        self.layer3, self.layer4 = t.layer3, t.layer4
        self.relu = nn.ReLU(inplace=True)
        self.convPa = nn.Conv2d(2048, 256, 3, 1, 1)
        self.bnPa = nn.BatchNorm2d(256)
        self.convPb = nn.Conv2d(256, 128, 3, 1, 1)
        self.bnPb = nn.BatchNorm2d(128)
        self.convPc = nn.Conv2d(128, 65, 1)
        self.convDa = nn.Conv2d(2048, 128, 3, 1, 1)
        self.bnDa = nn.BatchNorm2d(128)
        self.convDb = nn.Conv2d(128 + 512, 256, 1)
        self.bnDb = nn.BatchNorm2d(256)
        self.convDc = nn.Conv2d(256, 256, 3, 1, 1)
        self.bnDc = nn.BatchNorm2d(256)
        self.convDd = nn.Conv2d(256 + 64 + 256, descriptor_dim, 1)

    def forward(self, img):
        import torch.nn.functional as F

        x = self.relu(self.bn1(self.conv1(img)))
        skip_half = x
        x = self.maxpool(x)
        x = self.layer1(x)
        skip_quarter = x
        x = self.layer2(x)
        skip_eight = x
        x = self.layer3(x)
        skip_sixteenth = x
        x = self.layer4(x)

        h8, w8 = self.h // 8, self.w // 8
        cPa = self.relu(self.bnPa(self.convPa(x)))
        cPa = F.interpolate(cPa, size=(h8, w8), mode="bilinear",
                            align_corners=False)
        cPa = self.relu(self.bnPb(self.convPb(cPa)))
        scores = self.convPc(cPa)
        scores = torch.nn.functional.softmax(scores, 1)[:, :-1]
        b, c, hh, ww = scores.shape
        scores = scores.permute(0, 2, 3, 1).reshape(b, hh, ww, 8, 8)
        scores = scores.permute(0, 1, 3, 2, 4).reshape(b, hh * 8, ww * 8)

        cDa = self.relu(self.bnDa(self.convDa(x)))
        cDa = F.interpolate(cDa, size=(h8, w8), mode="bilinear",
                            align_corners=False)
        cDa = torch.cat((cDa, skip_eight), 1)
        cDa = self.relu(self.bnDb(self.convDb(cDa)))
        cDa = self.relu(self.bnDc(self.convDc(cDa)))
        skip_4 = F.interpolate(skip_quarter, scale_factor=0.5,
                               mode="bilinear", align_corners=False)
        skip_2 = F.interpolate(skip_half, scale_factor=0.25,
                               mode="bilinear", align_corners=False)
        cDa = torch.cat((cDa, skip_4, skip_2), 1)
        desc = self.convDd(cDa)
        desc = torch.nn.functional.normalize(desc, p=2, dim=1)
        return scores, desc, (skip_half, skip_quarter, skip_eight,
                              skip_sixteenth, x)


def _t_unpool(x, out_h, out_w):
    b, c, h, w = x.shape
    up = torch.zeros((b, c, 2 * h, 2 * w), dtype=x.dtype)
    up[:, :, ::2, ::2] = x
    return up[:, :, :out_h, :out_w]


class TGudiCat(nn.Module):
    def __init__(self, in_ch, out_ch, side):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 5, 1, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv1_1 = nn.Conv2d(out_ch + side, out_ch, 3, 1, 1, bias=False)
        self.bn1_1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.sc_conv1 = nn.Conv2d(in_ch, out_ch, 5, 1, 2, bias=False)
        self.sc_bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x, side):
        import torch.nn.functional as F

        if side.shape[2] % x.shape[2] == 0:
            x = _t_unpool(x, side.shape[2], side.shape[3])
        else:
            x = F.interpolate(x, size=(side.shape[2], side.shape[3]),
                              mode="nearest")
        out = self.relu(self.bn1(self.conv1(x)))
        out = torch.cat((out, side), 1)
        out = self.relu(self.bn1_1(self.conv1_1(out)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + self.sc_bn1(self.sc_conv1(x)))


class TGudiSimple(nn.Module):
    def __init__(self, in_ch, out_ch, oh, ow):
        super().__init__()
        self.oh, self.ow = oh, ow
        self.conv1 = nn.Conv2d(in_ch, out_ch, 5, 1, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.sc_conv1 = nn.Conv2d(in_ch, out_ch, 5, 1, 2, bias=False)
        self.sc_bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        x = _t_unpool(x, self.oh, self.ow)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + self.sc_bn1(self.sc_conv1(x)))


class TDilated(nn.Module):
    def __init__(self, in_ch, out_ch, rate):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=rate,
                               dilation=rate, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu(self.bn2(self.conv2(
            self.relu(self.bn1(self.conv1(x))))))


class TASPP(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.daspp_1 = TDilated(ch, ch // 2, 3)
        self.daspp_2 = TDilated(int(1.5 * ch), ch // 2, 6)
        self.daspp_3 = TDilated(2 * ch, ch // 2, 12)
        self.daspp_4 = TDilated(int(2.5 * ch), ch // 2, 18)
        self.daspp_5 = TDilated(3 * ch, ch // 2, 24)
        self.convf = nn.Conv2d(int(3.5 * ch), ch, 3, 1, 1, bias=False)
        self.bnf = nn.BatchNorm2d(ch)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        x_inp = x
        outs = []
        for blk in (self.daspp_1, self.daspp_2, self.daspp_3,
                    self.daspp_4, self.daspp_5):
            y = blk(x)
            outs.append(y)
            x = torch.cat((x, y), 1)
        x = torch.cat([x_inp] + outs, 1)
        return self.relu(self.bnf(self.convf(x)))


class TSparseToDense(nn.Module):
    """SparsetoDenseNet decoder path (densedepth.py:220-352): narrow
    1-channel trunk, sparse-first skip concat (image-first at bottleneck),
    Gudi decoder, ASPP at 1/8, multiscale heads, RAW conv_final."""

    def __init__(self, h, w):
        super().__init__()
        t = TTrunk(1, 16)
        self.conv1, self.bn1, self.maxpool = t.conv1, t.bn1, t.maxpool
        self.layer1, self.layer2 = t.layer1, t.layer2
        self.layer3, self.layer4 = t.layer3, t.layer4
        self.relu = nn.ReLU(inplace=True)
        c_out = [2560, 1280, 640, 320, 80]
        self.gud_up_proj_layer1 = TGudiCat(c_out[0], 512, c_out[1])
        self.gud_up_proj_layer2 = TGudiCat(512, 256, c_out[2])
        self.ASPP = TASPP(256)
        self.gud_up_proj_layer3 = TGudiCat(256, 128, c_out[3])
        self.gud_up_proj_layer4 = TGudiCat(128, 64, c_out[4])
        self.gud_up_proj_layer5 = TGudiSimple(64, 32, h, w)
        self.conv_final = nn.Conv2d(32, 1, 3, 1, 1, bias=True)
        self.conv_scale8 = nn.Conv2d(256, 1, 1, bias=True)
        self.conv_scale4 = nn.Conv2d(128, 1, 1, bias=True)
        self.conv_scale2 = nn.Conv2d(64, 1, 1, bias=True)

    def forward(self, sparse, skips):
        skip_half, skip_quarter, skip_eight, skip_sixteenth, features = skips
        x = self.relu(self.bn1(self.conv1(sparse)))
        skip_half = torch.cat((x, skip_half), 1)
        x = self.maxpool(x)
        x = self.layer1(x)
        skip_quarter = torch.cat((x, skip_quarter), 1)
        x = self.layer2(x)
        skip_eight = torch.cat((x, skip_eight), 1)
        x = self.layer3(x)
        skip_sixteenth = torch.cat((x, skip_sixteenth), 1)
        x = self.layer4(x)
        x = torch.cat((features, x), 1)
        x = self.gud_up_proj_layer1(x, skip_sixteenth)
        x = self.gud_up_proj_layer2(x, skip_eight)
        x = self.ASPP(x)
        x_8 = self.conv_scale8(x)
        x = self.gud_up_proj_layer3(x, skip_quarter)
        x_4 = self.conv_scale4(x)
        x = self.gud_up_proj_layer4(x, skip_half)
        x_2 = self.conv_scale2(x)
        x = self.gud_up_proj_layer5(x)
        return self.conv_final(x), (x_2, x_4, x_8)


def _randomize_bn(module, rng):
    """Non-trivial BN affine + running stats so the eval-mode numerics are
    actually exercised."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.weight.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32))
            m.bias.data = torch.tensor(
                rng.uniform(-0.2, 0.2, m.bias.shape).astype(np.float32))
            m.running_mean.data = torch.tensor(
                rng.uniform(-0.5, 0.5, m.running_mean.shape).astype(np.float32))
            m.running_var.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32))


DH, DW = 64, 96  # divisible by 32; every decoder stage takes the unpool path


def _deltas_weights(rng, h=DH, w=DW):
    sp = TSuperpointDense(h, w)
    dd = TSparseToDense(h, w)
    _randomize_bn(sp, rng)
    _randomize_bn(dd, rng)
    sp.eval(), dd.eval()
    tri_sd = {
        "bn_match_convD.weight": np.float32([1.3]),
        "bn_match_convD.bias": np.float32([0.1]),
        "bn_match_convD.running_mean": np.float32([0.2]),
        "bn_match_convD.running_var": np.float32([0.8]),
        # declared but never applied at inference (triangulation.py:485-497)
        "convD_confa.weight": rng.randn(1, 1, 3, 3).astype(np.float32),
        "convD_confa.bias": np.float32([0.0]),
        "bnconvD_confa.weight": np.float32([1.0]),
        "bnconvD_confa.bias": np.float32([0.0]),
        "bnconvD_confa.running_mean": np.float32([0.0]),
        "bnconvD_confa.running_var": np.float32([1.0]),
    }
    weights = {"state_dict": _sd(sp), "state_dict_tri": tri_sd,
               "state_dict_depth": _sd(dd)}
    return sp, dd, weights


def test_deltas_unpool_and_nearest_match_torch(rng):
    from dvmvs_tpu.baselines.deltas import _nearest_resize_torch, _unpool_zero
    import torch.nn.functional as F

    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    t = torch.tensor(x.transpose(0, 3, 1, 2))
    got = np.asarray(_unpool_zero(jnp.asarray(x), 10, 13))
    np.testing.assert_array_equal(
        got, _t_unpool(t, 10, 13).numpy().transpose(0, 2, 3, 1))
    got = np.asarray(_nearest_resize_torch(jnp.asarray(x), 8, 11))
    want = F.interpolate(t, size=(8, 11), mode="nearest").numpy()
    np.testing.assert_array_equal(got, want.transpose(0, 2, 3, 1))


def test_deltas_converter_tree_matches_model(rng):
    """convert_deltas must produce EXACTLY the DeltasModel variable tree
    (same paths, same shapes) — catches silently dropped or misrouted
    parameters without running the model (jax.eval_shape init)."""
    import jax
    from dvmvs_tpu.baselines.deltas import DeltasModel
    from dvmvs_tpu.utils.baseline_convert import convert_deltas

    _, _, weights = _deltas_weights(rng)
    conv = convert_deltas(weights)

    model = DeltasModel()
    dummy = (
        jnp.zeros((1, DH, DW, 3), jnp.float32),
        jnp.zeros((1, 1, DH, DW, 3), jnp.float32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None], (1, 1, 1, 1)),
        jnp.asarray(np.array([[80.0, 0, DW / 2], [0, 80.0, DH / 2],
                              [0, 0, 1]], np.float32))[None],
    )
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *dummy))

    t_paths = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_flatten_with_path(template)[0]}
    c_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
               jax.tree_util.tree_flatten_with_path(conv)[0]}
    assert set(t_paths) == set(c_paths), (
        sorted(set(t_paths) ^ set(c_paths)))
    for k in t_paths:
        assert tuple(t_paths[k]) == tuple(c_paths[k]), (
            k, t_paths[k], c_paths[k])


def test_deltas_superpoint_parity(rng):
    """Converted weights reproduce the reference Superpoint dense outputs
    (scores after softmax + depth-to-space, L2-normalized descriptors,
    all five skips)."""
    from dvmvs_tpu.baselines.deltas import SuperPoint
    from dvmvs_tpu.utils.baseline_convert import convert_deltas

    sp, _, weights = _deltas_weights(rng)
    conv = convert_deltas(weights)
    variables = {"params": conv["params"]["superpoint"],
                 "batch_stats": conv["batch_stats"]["superpoint"]}

    x = rng.randn(1, DH, DW, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        t_scores, t_desc, t_skips = sp(torch.tensor(x.transpose(0, 3, 1, 2)))
    j_scores, j_desc, j_skips = SuperPoint().apply(
        variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(j_scores), t_scores.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(j_desc), t_desc.numpy().transpose(0, 2, 3, 1), atol=2e-3)
    for name, t in zip(("half", "quarter", "eighth", "sixteenth", "features"),
                       t_skips):
        np.testing.assert_allclose(
            np.asarray(j_skips[name]), t.numpy().transpose(0, 2, 3, 1),
            atol=2e-3, err_msg=name)


def test_deltas_sparse_to_dense_parity(rng):
    """Converted weights reproduce the reference SparsetoDenseNet RAW dense
    depth and the three multiscale heads, given identical sparse depth and
    image-trunk skips."""
    from dvmvs_tpu.baselines.deltas import SparseToDenseNet
    from dvmvs_tpu.utils.baseline_convert import convert_deltas

    _, dd, weights = _deltas_weights(rng)
    conv = convert_deltas(weights)
    variables = {"params": conv["params"]["sparse_to_dense"],
                 "batch_stats": conv["batch_stats"]["sparse_to_dense"]}

    sparse = np.zeros((1, DH, DW), np.float32)
    ys = rng.randint(0, DH, 60)
    xs = rng.randint(0, DW, 60)
    sparse[0, ys, xs] = rng.uniform(0.5, 9.5, 60).astype(np.float32)
    chans = {"half": 64, "quarter": 256, "eighth": 512,
             "sixteenth": 1024, "features": 2048}
    strides = {"half": 2, "quarter": 4, "eighth": 8,
               "sixteenth": 16, "features": 32}
    skips = {k: rng.randn(1, DH // strides[k], DW // strides[k],
                          c).astype(np.float32) * 0.3
             for k, c in chans.items()}

    with torch.no_grad():
        t_out, t_ms = dd(
            torch.tensor(sparse[:, None]),
            tuple(torch.tensor(skips[k].transpose(0, 3, 1, 2))
                  for k in ("half", "quarter", "eighth", "sixteenth",
                            "features")))
    j_out, j_ms = SparseToDenseNet().apply(
        variables, jnp.asarray(sparse), jnp.asarray(sparse > 0),
        {k: jnp.asarray(v) for k, v in skips.items()}, train=False)

    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy()[:, 0], atol=5e-3, rtol=1e-3)
    for j, t in zip(j_ms, t_ms):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy()[:, 0], atol=5e-3, rtol=1e-3)


def test_deltas_bn_match_conversion(rng):
    """bn_match_convD maps onto triangulation/bn_match with identical
    eval-mode numerics."""
    import flax.linen as fnn
    from dvmvs_tpu.utils.baseline_convert import convert_deltas

    _, _, weights = _deltas_weights(rng)
    conv = convert_deltas(weights)
    p = conv["params"]["triangulation"]["bn_match"]
    s = conv["batch_stats"]["triangulation"]["bn_match"]

    x = rng.randn(4, 3, 10, 1).astype(np.float32)
    bn = fnn.BatchNorm(use_running_average=True, momentum=0.9)
    got = bn.apply({"params": p, "batch_stats": s}, jnp.asarray(x))
    tb = nn.BatchNorm2d(1)
    tb.weight.data = torch.tensor([1.3])
    tb.bias.data = torch.tensor([0.1])
    tb.running_mean.data = torch.tensor([0.2])
    tb.running_var.data = torch.tensor([0.8])
    tb.eval()
    with torch.no_grad():
        want = tb(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_deltas_converted_checkpoint_drives_estimator(rng, tmp_path):
    """Full user path: one-file checkpoint -> convert_deltas -> msgpack ->
    load_checkpoint -> Deltas estimator predict. The variable tree is
    size-independent (conv params), so a small input exercises the same
    parameters the 320x240 driver would load."""
    from dvmvs_tpu.baselines.deltas import Deltas
    from dvmvs_tpu.utils.baseline_convert import convert_deltas
    from dvmvs_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    _, _, weights = _deltas_weights(rng)
    conv = convert_deltas(weights)
    path = str(tmp_path / "deltas.msgpack")
    save_checkpoint(path, conv)
    variables = load_checkpoint(path, None)

    class SmallDeltas(Deltas):
        image_width = 64
        image_height = 48

    est = SmallDeltas(n_measurement_frames=1, variables=variables)
    H, W = 48, 64
    ref = rng.randn(H, W, 3).astype(np.float32) * 0.3
    meas = [rng.randn(H, W, 3).astype(np.float32) * 0.3]
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    pose2 = np.eye(4, dtype=np.float32)
    pose2[0, 3] = 0.1
    depth = est.predict(ref, meas, np.eye(4, dtype=np.float32), [pose2], K)
    assert depth.shape == (H, W)
    assert np.isfinite(depth).all() and (depth > 0).all()
