"""Interlaced ingest end-to-end at broadcast geometry: a 1080i50 v210
raw file -> raw_file producer -> yadif ring field-rate doubling ->
1080i channel -> interlaced v210 file output (+ WAV audio).

This runs the reference's signature path as ONE live pipeline
(macadamProducer.ts:66-264 ingest -> yadif send_field ->
macadamConsumer.ts:224-244 two-field output).  Because yadif preserves
the primary field's lines exactly and the interlaced pack takes each
output line from the field frame where that line IS primary, the output
frames must be BIT-EQUAL to the source frames — the whole chain
(unpack -> colour -> yadif -> composite -> colour -> interlaced pack)
is transparent for primary field lines.
"""

import asyncio
import wave

import jax.numpy as jnp
import numpy as np

from phaneron_tpu.config import get_video_format
from phaneron_tpu.consumer.file_consumer import FileConsumer
from phaneron_tpu.ops.formats import get_format
from phaneron_tpu.producer.producer import LoadParams, ProducerRegistry
from phaneron_tpu.producer.raw_file import create_raw_file_producer
from phaneron_tpu.runtime.channel import Channel

W, H = 1920, 1080
N_FRAMES = 6


def test_1080i_ingest_yadif_to_interlaced_output(tmp_path):
    from phaneron_tpu.utils.fixtures import write_interlaced_v210

    path, src_frames = write_interlaced_v210(tmp_path, W, H, N_FRAMES)
    fmt = get_video_format("1080i5000")
    out_path = tmp_path / "out.v210"
    wav_path = tmp_path / "out.wav"

    async def run():
        reg = ProducerRegistry([create_raw_file_producer])
        ch = Channel(1, fmt, reg)
        cons = FileConsumer({"path": str(out_path), "audio_path": str(wav_path)})
        await ch.add_consumer(cons)
        assert await ch.load_source(1, LoadParams(str(path)))
        ch.play(1)
        # drive ticks manually (deterministic; the pacing contract is
        # exercised on TPU by tools/serve_bench.py's interlaced config)
        for _ in range(2 * N_FRAMES + 6):
            frame = await ch.render_frame()
            await cons.deliver(frame)
        await asyncio.sleep(0.2)  # let fetch/write threads drain
        cons.release()
        await ch.shutdown()

    asyncio.run(run())

    v210 = get_format("v210")
    frame_bytes = sum(v210.num_bytes(W, H))
    data = out_path.read_bytes()
    assert len(data) >= 3 * frame_bytes, "too few output frames"
    n_out = len(data) // frame_bytes

    # locate the first content frame (startup ticks render black while
    # the yadif ring fills), then assert consecutive bit-equality
    words_dtype = np.dtype("<u4")
    out_frames = [
        np.frombuffer(data, words_dtype, count=frame_bytes // 4, offset=i * frame_bytes)
        for i in range(n_out)
    ]
    src_flat = [f.reshape(-1) for f in src_frames]

    def match_index(out):
        for k, s in enumerate(src_flat):
            if np.array_equal(out, s):
                return k
        return -1

    first_content = -1
    for j, out in enumerate(out_frames):
        k = match_index(out)
        if k >= 0:
            first_content = j
            first_src = k
            break
    assert first_content >= 0, "no output frame matches any source frame bit-exactly"

    # every subsequent content frame advances through the source in
    # order — field pairing never slips a field (A/V and field sync)
    n_chain = 0
    for j in range(first_content, n_out):
        k = first_src + (j - first_content)
        if k >= N_FRAMES - 1:  # the ring's final frame needs a 'next'
            break
        assert np.array_equal(out_frames[j], src_flat[k]), (
            f"output frame {j} != source frame {k}: field pairing slipped"
        )
        n_chain += 1
    assert n_chain >= 3

    # field-line provenance within one matched frame: even lines carry
    # the top-field marker, odd the bottom-field marker
    y, u, v = (
        np.asarray(x)
        for x in v210.unpack_codes([jnp.asarray(out_frames[first_content].reshape(src_frames[0].shape))], W, H)
    )
    assert (y[0::2] == 120 + 16 * first_src).all()
    assert (y[1::2] == 560 + 16 * first_src).all()
    assert (u == 512).all() and (v == 512).all()

    # A/V sync: the WAV carries exactly two fields of audio per written
    # video frame (dropped video would drop its audio with it)
    with wave.open(str(wav_path), "rb") as wf:
        assert wf.getnchannels() == fmt.audio_channels
        assert wf.getnframes() == n_out * 2 * fmt.samples_per_frame
        pcm = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    # tone present (0.25 full scale) once content flows
    assert np.abs(pcm).max() > 6000
