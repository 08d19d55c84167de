"""Module-level parity: torch oracles built with the reference's exact
module naming -> state_dict -> our converter -> Flax forward must match the
torch forward (eval mode, running BN stats). This validates both the
converter's key mapping and the numerical semantics of whole submodules
(conv+BN stacks, upsample conventions, gate math) in one shot.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.heavy

from dvmvs_tpu.models.convlstm import MVSLayernormConvLSTMCell
from dvmvs_tpu.models.decoder import CostVolumeDecoder
from dvmvs_tpu.models.encoder import CostVolumeEncoder
from dvmvs_tpu.utils.torch_convert import (
    convert_cost_volume_decoder,
    convert_cost_volume_encoder,
    convert_lstm_fusion,
)

H, W = 32, 64  # half-res feature size; multiples of 16 for 4 down-steps


# --- torch building blocks with the reference's layer layout/naming ------
def conv_layer(cin, cout, k, stride, bn_relu=True):
    if bn_relu:
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, padding=(k - 1) // 2, stride=stride, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=(k - 1) // 2, stride=stride, bias=False))


def depth_head(cin):
    return nn.Sequential(nn.Conv2d(cin, 1, 3, padding=1), nn.Sigmoid())


class TorchEncoderBlock(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.down_convolution = nn.Module()
        self.down_convolution.down_conv = conv_layer(cin, cout, k, 2)
        self.standard_convolution = nn.Module()
        self.standard_convolution.conv1 = conv_layer(cout, cout, k, 1)
        self.standard_convolution.conv2 = conv_layer(cout, cout, k, 1)

    def forward(self, x):
        x = self.down_convolution.down_conv(x)
        x = self.standard_convolution.conv1(x)
        return self.standard_convolution.conv2(x)


class TorchEncoder(nn.Module):
    def __init__(self, hc=32, fpn=32, planes=64):
        super().__init__()
        self.aggregator0 = conv_layer(planes + fpn, hc, 5, 1)
        self.encoder_block0 = TorchEncoderBlock(hc, hc * 2, 5)
        self.aggregator1 = conv_layer(hc * 2 + fpn, hc * 2, 3, 1)
        self.encoder_block1 = TorchEncoderBlock(hc * 2, hc * 4, 3)
        self.aggregator2 = conv_layer(hc * 4 + fpn, hc * 4, 3, 1)
        self.encoder_block2 = TorchEncoderBlock(hc * 4, hc * 8, 3)
        self.aggregator3 = conv_layer(hc * 8 + fpn, hc * 8, 3, 1)
        self.encoder_block3 = TorchEncoderBlock(hc * 8, hc * 16, 3)

    def forward(self, fh, fq, fe, fs, cv):
        inp0 = self.aggregator0(torch.cat([fh, cv], 1))
        out0 = self.encoder_block0(inp0)
        inp1 = self.aggregator1(torch.cat([fq, out0], 1))
        out1 = self.encoder_block1(inp1)
        inp2 = self.aggregator2(torch.cat([fe, out1], 1))
        out2 = self.encoder_block2(inp2)
        inp3 = self.aggregator3(torch.cat([fs, out2], 1))
        out3 = self.encoder_block3(inp3)
        return inp0, inp1, inp2, inp3, out3


class TorchDecoderBlock(nn.Module):
    def __init__(self, cin, cout, k, plus_one):
        super().__init__()
        self.up_convolution = nn.Module()
        self.up_convolution.conv = conv_layer(cin, cout, k, 1)
        extra = cin + 1 if plus_one else cin
        self.convolution1 = conv_layer(extra, cout, k, 1)
        self.convolution2 = conv_layer(cout, cout, k, 1)

    def forward(self, x, skip, depth):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        x = self.up_convolution.conv(x)
        if depth is None:
            x = torch.cat([x, skip], 1)
        else:
            depth = F.interpolate(depth, scale_factor=2, mode="bilinear", align_corners=True)
            x = torch.cat([x, skip, depth], 1)
        return self.convolution2(self.convolution1(x))


class TorchDecoder(nn.Module):
    def __init__(self, hc=32, min_d=0.25, max_d=20.0):
        super().__init__()
        self.inv_base = 1 / max_d
        self.inv_mult = 1 / min_d - 1 / max_d
        self.decoder_block1 = TorchDecoderBlock(hc * 16, hc * 8, 3, False)
        self.decoder_block2 = TorchDecoderBlock(hc * 8, hc * 4, 3, True)
        self.decoder_block3 = TorchDecoderBlock(hc * 4, hc * 2, 3, True)
        self.decoder_block4 = TorchDecoderBlock(hc * 2, hc, 5, True)
        self.refine = nn.Sequential(conv_layer(hc + 4, hc, 5, 1),
                                    conv_layer(hc, hc, 5, 1))
        self.depth_layer_one_sixteen = depth_head(hc * 8)
        self.depth_layer_one_eight = depth_head(hc * 4)
        self.depth_layer_quarter = depth_head(hc * 2)
        self.depth_layer_half = depth_head(hc)
        self.depth_layer_full = depth_head(hc)

    def forward(self, image, s0, s1, s2, s3, bottom):
        d1 = self.decoder_block1(bottom, s3, None)
        sig16 = self.depth_layer_one_sixteen(d1)
        d2 = self.decoder_block2(d1, s2, sig16)
        sig8 = self.depth_layer_one_eight(d2)
        d3 = self.decoder_block3(d2, s1, sig8)
        sig4 = self.depth_layer_quarter(d3)
        d4 = self.decoder_block4(d3, s0, sig4)
        sig2 = self.depth_layer_half(d4)
        sd = F.interpolate(sig2, scale_factor=2, mode="bilinear", align_corners=True)
        sdec = F.interpolate(d4, scale_factor=2, mode="bilinear", align_corners=True)
        comb = self.refine(torch.cat([sdec, sd, image], 1))
        invs = [self.inv_mult * s + self.inv_base for s in
                (self.depth_layer_full(comb), sig2, sig4, sig8, sig16)]
        return [1.0 / i.squeeze(1) for i in invs]


def _randomize_bn_stats(module, rng):
    """Non-trivial running stats so the test actually checks BN wiring."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
            m.weight.data.copy_(torch.from_numpy(rng.rand(m.num_features).astype(np.float32) + 0.5))
            m.bias.data.copy_(torch.from_numpy(rng.randn(m.num_features).astype(np.float32) * 0.1))


def test_encoder_parity_via_converter(rng):
    tmod = TorchEncoder().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmod, rng)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    params, stats = {}, {}
    convert_cost_volume_encoder(sd, params, stats)
    fmod = CostVolumeEncoder()

    feats = [rng.randn(1, 32, H // s, W // s).astype(np.float32) for s in (1, 2, 4, 8)]
    cv = rng.randn(1, 64, H, W).astype(np.float32)
    with torch.no_grad():
        want = tmod(*[torch.from_numpy(f) for f in feats], torch.from_numpy(cv))

    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got = fmod.apply(
        {"params": params["cost_volume_encoder"],
         "batch_stats": stats["cost_volume_encoder"]},
        *[nhwc(f) for f in feats], nhwc(cv), False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=2e-4)


def test_decoder_parity_via_converter(rng):
    tmod = TorchDecoder().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmod, rng)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    params, stats = {}, {}
    convert_cost_volume_decoder(sd, params, stats)
    fmod = CostVolumeDecoder()

    hc = 32
    image = rng.randn(1, 3, H * 2, W * 2).astype(np.float32)
    skips = [rng.randn(1, hc * 2 ** i, H // 2 ** i, W // 2 ** i).astype(np.float32)
             for i in range(4)]
    bottom = rng.randn(1, hc * 16, H // 16, W // 16).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(image), *[torch.from_numpy(s) for s in skips],
                    torch.from_numpy(bottom))

    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got = fmod.apply(
        {"params": params["cost_volume_decoder"],
         "batch_stats": stats["cost_volume_decoder"]},
        nhwc(image), *[nhwc(s) for s in skips], nhwc(bottom), False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=5e-4)


def test_lstm_cell_parity_via_converter(rng):
    """Gate conv + spatial layer norms + celu against a torch oracle."""
    hidden = 16
    conv = nn.Conv2d(2 * hidden, 4 * hidden, 3, padding=1, bias=False).eval()
    sd = {"lstm_cell.conv.weight": conv.weight.detach().numpy()}
    params, stats = {}, {}
    convert_lstm_fusion(sd, params, stats)

    x = rng.randn(1, hidden, 8, 10).astype(np.float32)
    h = rng.randn(1, hidden, 8, 10).astype(np.float32)
    c = rng.randn(1, hidden, 8, 10).astype(np.float32)

    with torch.no_grad():
        gates = conv(torch.cat([torch.from_numpy(x), torch.from_numpy(h)], 1))
        i, f, o, g = torch.split(gates, hidden, dim=1)
        i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
        g = torch.celu(torch.layer_norm(g, [8, 10]))
        c_next = torch.layer_norm(f * torch.from_numpy(c) + i * g, [8, 10])
        h_next = o * torch.celu(c_next)

    cell = MVSLayernormConvLSTMCell(hidden)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got_h, got_c = cell.apply(
        {"params": params["lstm_fusion"]["lstm_cell"]},
        nhwc(x), nhwc(h), nhwc(c))
    np.testing.assert_allclose(
        np.asarray(got_h).transpose(0, 3, 1, 2), h_next.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_c).transpose(0, 3, 1, 2), c_next.numpy(), atol=2e-5)
