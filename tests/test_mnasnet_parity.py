"""MnasNet trunk converter oracle + WHOLE-NETWORK parity.

The reference's accuracy story starts from torchvision's ImageNet-pretrained
mnasnet1_0 sliced into 5 stages (reference: dvmvs/fusionnet/model.py:122-140).
torchvision is absent in this sandbox, so we hand-build a torch module with
torchvision's exact layer plan and the reference FeatureExtractor's exact
state_dict naming (layer1.{0,1,3,4,6,7}, layer{2,3}.0.<b>.layers.<i>,
layer4.{0,1}.<b>.layers.<i>, layer5.{0,1}.<b>.layers.<i>), randomize weights
AND BatchNorm running stats, convert via `convert_feature_extractor`, and
assert activation parity at all 5 taps. The day a real checkpoint appears,
the converter mapping is already proven.

The whole-network test composes torch feature-extractor -> FPN -> reference
cost-volume math (dvmvs/utils.py:45-107) -> encoder -> hidden-state warp +
ConvLSTM (dvmvs/convlstm.py:26-59) -> decoder, with every module's weights
converted into ONE Flax FusionNet variables tree, and diffs the final depth
maps of `FusionNet.__call__` against the torch pipeline — catching error
compounding (BN eps, resize conventions, warp masking) that module-level
tests miss.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.heavy

from dvmvs_tpu.models.fusionnet import FusionNet, LSTMCarry
from dvmvs_tpu.models.mnasnet import MnasFeatureExtractor
from dvmvs_tpu.models.pairnet import scale_intrinsics
from dvmvs_tpu.utils.torch_convert import (
    convert_cost_volume_decoder,
    convert_cost_volume_encoder,
    convert_feature_extractor,
    convert_feature_shrinker,
    convert_lstm_fusion,
)
from tests.conftest import random_pose
from tests.test_module_parity import (
    TorchDecoder,
    TorchEncoder,
    _randomize_bn_stats,
)
from tests.test_warp import torch_warp_oracle


# --- torch mnasnet1_0 trunk with the reference FeatureExtractor naming ----
class TorchInvertedResidual(nn.Module):
    """torchvision.models.mnasnet._InvertedResidual layer plan/naming."""

    def __init__(self, cin, cout, k, stride, expansion):
        super().__init__()
        mid = cin * expansion
        self.layers = nn.Sequential(
            nn.Conv2d(cin, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, k, padding=k // 2, stride=stride,
                      groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True),
            nn.Conv2d(mid, cout, 1, bias=False),
            nn.BatchNorm2d(cout),
        )
        self.apply_residual = cin == cout and stride == 1

    def forward(self, x):
        y = self.layers(x)
        return y + x if self.apply_residual else y


def _stack(cin, cout, k, stride, expansion, repeats):
    blocks = [TorchInvertedResidual(cin, cout, k, stride, expansion)]
    blocks += [TorchInvertedResidual(cout, cout, k, 1, expansion)
               for _ in range(repeats - 1)]
    return nn.Sequential(*blocks)


class TorchFeatureExtractor(nn.Module):
    """reference FeatureExtractor (fusionnet/model.py:122-140): mnasnet1_0
    .layers children sliced [0:8], [8:9], [9:10], [10:12], [12:14]."""

    def __init__(self):
        super().__init__()
        self.layer1 = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(inplace=True),
            nn.Conv2d(32, 32, 3, padding=1, groups=32, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(inplace=True),
            nn.Conv2d(32, 16, 1, bias=False), nn.BatchNorm2d(16),
        )
        self.layer2 = nn.Sequential(_stack(16, 24, 3, 2, 3, 3))
        self.layer3 = nn.Sequential(_stack(24, 40, 5, 2, 3, 3))
        self.layer4 = nn.Sequential(_stack(40, 80, 5, 2, 6, 3),
                                    _stack(80, 96, 3, 1, 6, 2))
        self.layer5 = nn.Sequential(_stack(96, 192, 5, 2, 6, 4),
                                    _stack(192, 320, 3, 1, 6, 1))

    def forward(self, image):
        l1 = self.layer1(image)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        l5 = self.layer5(l4)
        return l1, l2, l3, l4, l5


def _randomize_convs(module, rng):
    """Break the kaiming-init symmetry scale so parity is non-trivial."""
    for m in module.modules():
        if isinstance(m, nn.Conv2d):
            m.weight.data.copy_(torch.from_numpy(
                rng.randn(*m.weight.shape).astype(np.float32) * 0.1))
            if m.bias is not None:
                m.bias.data.copy_(torch.from_numpy(
                    rng.randn(*m.bias.shape).astype(np.float32) * 0.1))


def test_feature_extractor_parity_via_converter(rng):
    tmod = TorchFeatureExtractor().eval()
    with torch.no_grad():
        _randomize_convs(tmod, rng)
        _randomize_bn_stats(tmod, rng)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    params, stats = {}, {}
    convert_feature_extractor(sd, params, stats)

    H, W = 64, 96
    image = rng.randn(1, 3, H, W).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(image))

    fmod = MnasFeatureExtractor()
    got = fmod.apply(
        {"params": params["feature_extractor"],
         "batch_stats": stats["feature_extractor"]},
        jnp.asarray(image.transpose(0, 2, 3, 1)), False)

    assert len(got) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=5e-4,
            err_msg=f"trunk tap l{i + 1}")


# ------------------------- whole-network parity ---------------------------
class TorchFPN(nn.Module):
    """FeatureShrinker's torchvision FeaturePyramidNetwork
    (fusionnet/model.py:143-164), plain-conv block naming as in the
    reference's shipped checkpoint."""

    def __init__(self, chans=(16, 24, 40, 96, 320), out=32):
        super().__init__()
        self.fpn = nn.Module()
        self.fpn.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in chans])
        self.fpn.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in chans])

    def forward(self, levels):
        inners = [blk(x) for blk, x in zip(self.fpn.inner_blocks, levels)]
        outs = [None] * 5
        last = inners[4]
        outs[4] = self.fpn.layer_blocks[4](last)
        for i in range(3, -1, -1):
            top_down = F.interpolate(last, size=inners[i].shape[-2:], mode="nearest")
            last = inners[i] + top_down
            outs[i] = self.fpn.layer_blocks[i](last)
        return outs[:4]  # half, quarter, one_eight, one_sixteen


def torch_cost_volume_fused(f1, f2s, pose1, pose2s, K, min_d, max_d, n_levels):
    """Reference plane-sweep + multi-view mean (dvmvs/utils.py:45-107)."""
    B, C, H, W = f1.shape
    x = torch.linspace(0, W - 1, W)
    y = torch.linspace(0, H - 1, H)
    xg, yg = torch.meshgrid(x, y, indexing="xy")
    grid = torch.stack([xg, yg, torch.ones(H, W)], -1).view(-1, 3).t()[None]  # (1,3,HW)

    inv_base = 1.0 / max_d
    inv_step = (1.0 / min_d - 1.0 / max_d) / (n_levels - 1)
    fused = torch.zeros(B, n_levels, H, W)
    for pose2, f2 in zip(pose2s, f2s):
        extr = torch.inverse(pose2) @ pose1
        R, t = extr[:, :3, :3], extr[:, :3, 3:4]
        Kt = K @ t
        KRKinv_uv = (K @ R @ torch.inverse(K)) @ grid
        for d_i in range(n_levels):
            depth = 1.0 / (inv_base + d_i * inv_step)
            w3 = (KRKinv_uv + Kt / depth).transpose(1, 2)
            w2 = w3[:, :, :2] / (w3[:, :, 2:3] + 1e-8)
            w2 = w2.view(B, H, W, 2)
            gx = (w2[..., 0] - W / 2.0) / (W / 2.0)
            gy = (w2[..., 1] - H / 2.0) / (H / 2.0)
            warped = F.grid_sample(f2, torch.stack([gx, gy], -1),
                                   mode="bilinear", padding_mode="zeros",
                                   align_corners=True)
            fused[:, d_i] += torch.sum(f1 * warped, dim=1) / C
    return fused / len(pose2s)


def test_whole_network_parity_via_converter(rng):
    """torch (extractor->FPN->cost volume->encoder->LSTM->decoder) vs the
    JAX FusionNet.__call__ with converted weights: final depth atol<=1e-3."""
    B, V, H, W = 1, 2, 64, 96
    hc, hidden = 32, 512

    # ---- torch oracles with reference naming, randomized ----
    tfe = TorchFeatureExtractor().eval()
    tfpn = TorchFPN().eval()
    tenc = TorchEncoder().eval()
    tdec = TorchDecoder().eval()
    lstm_conv = nn.Conv2d(2 * hidden, 4 * hidden, 3, padding=1, bias=False).eval()
    with torch.no_grad():
        for m in (tfe, tfpn, tenc, tdec, lstm_conv):
            _randomize_convs(m, rng)
            _randomize_bn_stats(m, rng)

    params, stats = {}, {}
    as_np = lambda mod: {k: v.detach().numpy() for k, v in mod.state_dict().items()}
    convert_feature_extractor(as_np(tfe), params, stats)
    convert_feature_shrinker(as_np(tfpn), params, stats)
    convert_cost_volume_encoder(as_np(tenc), params, stats)
    convert_lstm_fusion({"lstm_cell.conv.weight": lstm_conv.weight.detach().numpy()},
                        params, stats)
    convert_cost_volume_decoder(as_np(tdec), params, stats)
    variables = {"params": params, "batch_stats": stats}

    # ---- shared inputs ----
    images = rng.randn(1 + V, B, 3, H, W).astype(np.float32) * 0.5
    ref_pose = np.stack([random_pose(rng, 0.05)] * B).astype(np.float32)
    meas_poses = np.stack(
        [[random_pose(rng, 0.05) for _ in range(B)] for _ in range(V)]
    ).astype(np.float32)  # (V, B, 4, 4)
    prev_pose = np.stack([random_pose(rng, 0.05)] * B).astype(np.float32)
    K = np.array([[48.0, 0, W / 2], [0, 48.0, H / 2], [0, 0, 1]],
                 np.float32)[None].repeat(B, 0)
    half_K = np.asarray(scale_intrinsics(jnp.asarray(K), 0.5))
    lstm_K = np.asarray(scale_intrinsics(jnp.asarray(K), 1.0 / 32.0))
    hh, hw = H // 32, W // 32
    h0 = rng.randn(B, hidden, hh, hw).astype(np.float32) * 0.1
    c0 = rng.randn(B, hidden, hh, hw).astype(np.float32) * 0.1
    hyp = rng.uniform(1.0, 5.0, (B, hh, hw)).astype(np.float32)
    hyp[0, 0, 0] = 0.0  # exercise the <=0.01m invalidation mask

    min_d, max_d, n_levels = 0.25, 20.0, 64

    # ---- torch full pipeline (reference composition,
    #      fusionnet/run-testing-online.py:158-207) ----
    with torch.no_grad():
        taps = [tfe(torch.from_numpy(img)) for img in images]
        feats = [tfpn(list(t)) for t in taps]  # per image: [half,quarter,eighth,sixteenth]
        cv = torch_cost_volume_fused(
            feats[0][0], [feats[1][0], feats[2][0]],
            torch.from_numpy(ref_pose),
            [torch.from_numpy(p) for p in meas_poses],
            torch.from_numpy(half_K), min_d, max_d, n_levels)
        inp0, inp1, inp2, inp3, bottom = tenc(*feats[0], cv)

        trans = torch.inverse(torch.from_numpy(prev_pose)) @ torch.from_numpy(ref_pose)
        h_w = torch_warp_oracle(torch.from_numpy(h0),
                                torch.from_numpy(hyp[:, None]),
                                trans, torch.from_numpy(lstm_K))
        h_w = h_w * (torch.from_numpy(hyp[:, None]) > 0.01)
        gates = lstm_conv(torch.cat([bottom, h_w], 1))
        gi, gf, go, gg = torch.split(gates, hidden, dim=1)
        gi, gf, go = torch.sigmoid(gi), torch.sigmoid(gf), torch.sigmoid(go)
        gg = torch.celu(torch.layer_norm(gg, [hh, hw]))
        c_next = torch.layer_norm(gf * torch.from_numpy(c0) + gi * gg, [hh, hw])
        h_next = go * torch.celu(c_next)
        want = tdec(torch.from_numpy(images[0]), inp0, inp1, inp2, inp3, h_next)

    # ---- JAX FusionNet with the converted tree ----
    model = FusionNet(min_depth=min_d, max_depth=max_d, n_depth_levels=n_levels)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got, carry2 = model.apply(
        variables,
        nhwc(images[0]),
        jnp.stack([nhwc(img) for img in images[1:]], axis=1),
        jnp.asarray(ref_pose),
        jnp.asarray(meas_poses.transpose(1, 0, 2, 3)),
        jnp.asarray(K),
        LSTMCarry(nhwc(h0), nhwc(c0)),
        jnp.asarray(prev_pose),
        jnp.asarray(hyp),
    )

    np.testing.assert_allclose(
        np.asarray(carry2.h).transpose(0, 3, 1, 2), h_next.numpy(), atol=1e-4,
        err_msg="LSTM hidden state")
    names = ["full", "half", "quarter", "one_eight", "one_sixteen"]
    for name, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), atol=1e-3,
            err_msg=f"final depth map @ {name}")
