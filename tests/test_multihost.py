"""Multi-host (DCN) dryrun: two jax.distributed processes, channels on
the 'host' mesh axis, scanlines on 'sp' within each host, and the
channel ROUTE as a cross-process collective-permute — the host<->host
transport leg of SURVEY §5.8 (reference analogue: phaneron->phaneron
clustering, ffmpegConsumer.ts:71-79 -> ffmpegProducer.ts:100).

This spawns real subprocesses around a local coordinator (Gloo over
loopback stands in for DCN), so it is the one suite entry that takes
~30-90 s of wall clock; mark-filter it out with `-m "not multihost"`
for quick iteration.  The driver-recorded artifact of the same run is
MULTIHOST_r05.json.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parents[1]))


@pytest.mark.multihost
def test_dryrun_multihost_bit_equality(capsys):
    import __graft_entry__ as g

    g.dryrun_multihost()
    out = capsys.readouterr().out
    # the worker only prints this line after asserting every addressable
    # output shard bit-equal (<=1 ulp) to the locally recomputed frame
    assert "dryrun multihost ok" in out
    assert "cross-process ROUTE collective" in out
