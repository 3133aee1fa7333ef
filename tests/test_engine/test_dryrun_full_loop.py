"""Full multi-chip dryrun loop: train step -> sharded val predict ->
metric gather -> orbax save/restore equality, on the virtual 8-device mesh.

Mirrors ``__graft_entry__.dryrun_multichip`` (the driver's multi-chip
validation), so a regression in any stage of that loop fails here first.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


@pytest.mark.slow
def test_dryrun_full_loop_8dev(capsys, monkeypatch):
    import __graft_entry__ as g

    # tiny arch keeps this mirror test in wall-clock budget; the driver runs
    # the same loop at flagship geometry (DRYRUN_TINY unset)
    monkeypatch.setenv("DRYRUN_TINY", "1")
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "ok" in out
    # sharded val must flow through the real CocoMetric (an actual AP) and
    # the GT-as-predictions oracle must score 1.0 through the same path
    assert "val_AP=" in out
    assert "GT-oracle AP=1.0000" in out
    assert "ckpt_restore=equal" in out
