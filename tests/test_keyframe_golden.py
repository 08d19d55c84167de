"""Golden tests: keyframe selection must reproduce the reference's shipped
index files byte-for-byte on the hololens sample scene."""

import os

import pytest

from dvmvs_tpu.apps.simulate_keyframe_buffer import simulate_keyframe_buffer_for_scene

SCENE = "/root/reference/sample-data/hololens-dataset/000"
INDICES = "/root/reference/sample-data/indices"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCENE), reason="reference sample data not mounted"
)


@pytest.mark.parametrize("nmeas", [1, 2, 3])
def test_reproduces_shipped_index_file(nmeas):
    lines = simulate_keyframe_buffer_for_scene(SCENE, nmeas)
    with open(os.path.join(INDICES, f"keyframe+hololens-dataset+000+nmeas+{nmeas}")) as f:
        want = f.read().splitlines()
    assert lines == want
