"""Driver entry-point gates must never silently rot.

`dryrun_multichip` is the driver's multi-chip correctness gate (it runs it
with N virtual CPU devices); this invokes the EXACT same function in-process.
The conftest already pins the cpu platform and forces 8 host devices.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_single_chip():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    depth = out[0][0]
    assert depth.shape[-2:] == (256, 320)
