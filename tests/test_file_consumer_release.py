"""FileConsumer shutdown/drain contract.

Regression tests for the release() race found while driving the server
end-to-end: release() used to join the fetch thread for a fixed 30 s and
then close+null the staging ring regardless — a first-time compile of
the batched device-stack program (minutes on the remote compile
service) left the live fetch thread crashing on the nulled ring and the
recording came out EMPTY.  The writer's old exit gate
(`_stop and _q.empty()`) could also fire while the fetch thread's last
frame was still in flight, silently dropping the recording tail.
Reference contract: the FFmpegConsumer drains its unload queue on close
(consumer/ffmpegConsumer.ts; SURVEY.md §2.4).
"""

import numpy as np

from phaneron_tpu.config import VideoFormat
from phaneron_tpu.consumer.consumer import ChannelFrame
from phaneron_tpu.consumer.file_consumer import FileConsumer
from phaneron_tpu.ops.formats import get_format

from conftest import run_async as run

TINY = VideoFormat("tiny", 1, 96, 64, 96, 50, 1, 48000, 2)


def _frame(ts: int) -> ChannelFrame:
    v210 = get_format("v210")
    planes = [np.asarray(p) + np.uint32(ts % 7) for p in v210.fill_buf(96, 64)]
    return ChannelFrame(
        timestamp=ts,
        packed=planes,
        rgba=None,
        audio=np.zeros((2, 960), np.float32),
        width=96,
        height=64,
    )


def test_release_drains_every_delivered_frame(tmp_path):
    """All delivered frames must be on disk after release — including
    the last in-flight frame between queue and ring (the old writer
    exit-gate race)."""

    async def main():
        out = tmp_path / "out.v210"
        cons = FileConsumer({"path": str(out), "format": "v210"})
        await cons.initialise(TINY)
        n = 24  # > queue batch size (16) so batching paths run
        for i in range(n):
            await cons.deliver(_frame(i))
        cons.release()
        assert cons.leaked_threads == 0
        fbytes = get_format("v210").num_bytes(96, 64)[0]
        assert out.stat().st_size == n * fbytes

    run(main())


def test_release_rescues_spinning_fetch_via_stop_event(tmp_path):
    """A fetch thread spinning on a full ring is RESCUED by release's
    stop event inside the grace join — clean close, nothing leaked."""

    async def main():
        out = tmp_path / "out.v210"
        cons = FileConsumer(
            {"path": str(out), "format": "v210", "join_fetch_s": 0.3}
        )
        await cons.initialise(TINY)
        # ring permanently "full": the fetch thread spins in its
        # try_write loop, which polls the stop event each iteration
        cons._ring.try_write = lambda data: False
        await cons.deliver(_frame(0))
        cons.release()  # must return promptly, no exception
        assert cons.leaked_threads == 0
        assert cons._fh is None
        assert cons._ring is None  # clean close ran
        cons.release()  # idempotent

    run(main())


def test_release_abandons_wedged_fetch_without_corruption(tmp_path):
    """A fetch thread BLOCKED past its join budget (e.g. inside a
    device fetch that cannot observe the stop event) must be abandoned
    — ring and file handles leaked to it, consumer marked closed — not
    have the ring closed/nulled underneath it (the old use-after-free:
    empty recording + in-thread crash)."""
    import threading

    async def main():
        out = tmp_path / "out.v210"
        cons = FileConsumer(
            {"path": str(out), "format": "v210", "join_fetch_s": 0.3}
        )
        await cons.initialise(TINY)
        # wedge: blocks like a stalled device sync — does NOT poll the
        # stop event; only the test's wedge event releases it
        wedge = threading.Event()

        def blocked_write(data):
            wedge.wait(60)
            return False  # then the loop observes _stop and exits

        cons._ring.try_write = blocked_write
        await cons.deliver(_frame(0))
        fetch = cons._threads[0]
        cons.release()  # must return promptly, no exception
        assert cons.leaked_threads >= 1
        assert cons._fh is None  # marked closed: channel stops delivering
        assert cons._ring is not None  # NOT nulled under the live thread
        # idempotent: a second release is a no-op
        cons.release()
        # un-wedge: the abandoned thread exits via the stop event
        wedge.set()
        fetch.join(timeout=5)
        assert not fetch.is_alive()

    run(main())
