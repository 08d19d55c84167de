"""Weight-converter parity: load the reference's shipped FPN checkpoint
(the one released module in this mount), convert to Flax, and compare the
FeatureShrinker output against a torch functional oracle using the same
weights."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dvmvs_tpu.models.fpn import FeatureShrinker
from dvmvs_tpu.utils.torch_convert import (
    convert_feature_shrinker,
    load_torch_state_dict,
)

FPN_WEIGHTS = "/root/reference/dvmvs/fusionnet/weights/1_feature_pyramid"

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(
        not os.path.isfile(FPN_WEIGHTS),
        reason="shipped FPN weights not mounted"),
]


def torch_fpn_oracle(sd, levels):
    """torchvision FeaturePyramidNetwork forward, functional."""
    inners = [
        F.conv2d(x, sd[f"fpn.inner_blocks.{i}.weight"], sd[f"fpn.inner_blocks.{i}.bias"])
        for i, x in enumerate(levels)
    ]
    outs = [None] * 5
    last = inners[4]
    outs[4] = F.conv2d(last, sd["fpn.layer_blocks.4.weight"], sd["fpn.layer_blocks.4.bias"], padding=1)
    for i in range(3, -1, -1):
        top_down = F.interpolate(last, size=inners[i].shape[-2:], mode="nearest")
        last = inners[i] + top_down
        outs[i] = F.conv2d(last, sd[f"fpn.layer_blocks.{i}.weight"], sd[f"fpn.layer_blocks.{i}.bias"], padding=1)
    return outs[:4]


def test_fpn_parity_with_shipped_weights(rng):
    sd_np = load_torch_state_dict(FPN_WEIGHTS)
    sd_t = {k: torch.from_numpy(v) for k, v in sd_np.items()}

    H, W = 32, 48
    chans = [16, 24, 40, 96, 320]
    levels_np = [
        rng.randn(1, c, H // 2 ** i, W // 2 ** i).astype(np.float32)
        for i, c in enumerate(chans)
    ]
    want = [o.numpy() for o in torch_fpn_oracle(sd_t, [torch.from_numpy(x) for x in levels_np])]

    params, stats = {}, {}
    convert_feature_shrinker(sd_np, params, stats)
    model = FeatureShrinker()
    got = model.apply(
        {"params": params["feature_shrinker"]},
        *[jnp.asarray(x.transpose(0, 2, 3, 1)) for x in levels_np],
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, atol=1e-4
        )
