"""Control plane: AMCP protocol behavior over a real TCP socket, OSC
codec, heads rundown automation."""

import asyncio
import json

import numpy as np
import pytest

from phaneron_tpu.config import ServerConfig, VIDEO_FORMATS, ConsumerConfig, VideoFormat
from phaneron_tpu.control.chan_layer import chan_layer_from_string
from phaneron_tpu.control.osc import decode_message, encode_message

# a tiny format registered for fast control tests
VIDEO_FORMATS["tiny5000"] = VideoFormat("tiny5000", 1, 96, 64, 96, 50, 1, 48000, 2)


from conftest import run_async as run


def test_chan_layer_parse():
    cl = chan_layer_from_string("1-2")
    assert (cl.valid, cl.channel, cl.layer) == (True, 1, 2)
    cl = chan_layer_from_string("3")
    assert (cl.valid, cl.channel, cl.layer) == (True, 3, 0)
    assert not chan_layer_from_string(None).valid
    assert not chan_layer_from_string("x").valid


def test_osc_codec_roundtrip():
    msg = encode_message("/heads/take", 1, 2.5, "go")
    addr, args = decode_message(msg)
    assert addr == "/heads/take"
    assert args[0] == 1
    assert abs(args[1] - 2.5) < 1e-6
    assert args[2] == "go"


@pytest.fixture
def server_cfg():
    return ServerConfig(
        channels=[ConsumerConfig("tiny5000", {})],
        amcp_port=15250,
        osc_listen_port=19876,
        osc_remote_port=19877,
    )


def amcp_session(cfg, script):
    """Start a real server, drive AMCP over TCP, return responses."""

    async def main():
        from phaneron_tpu.server import PhaneronServer

        server = PhaneronServer(cfg)
        await server.start()
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", cfg.amcp_port)
            out = []

            async def read_line():
                return (await asyncio.wait_for(reader.readline(), 30)).decode().rstrip("\r\n")

            for cmd in script:
                writer.write((cmd + "\r\n").encode())
                await writer.drain()
                resp = await read_line()
                code = resp.split(" ", 1)[0]
                if code.endswith("201") or resp.startswith("RES") and " 201 " in resp:
                    await read_line()  # 201: exactly one data line
                elif code == "200":
                    while await read_line():  # 200: data until empty line
                        pass
                elif resp == "400 ERROR" or resp.endswith(" 400 ERROR"):
                    await read_line()  # echo line follows the 400 header
                out.append(resp)
            writer.close()
            return out, server
        finally:
            await server.shutdown()

    return run(main())


def test_amcp_play_and_mixer(server_cfg):
    responses, server = amcp_session(
        server_cfg,
        [
            "VERSION",
            "PLAY 1-1 BARS",
            "MIXER 1-1 FILL 0.1 0.1 0.5 0.5",
            "MIXER 1-1 ROTATION 45",
            "PAUSE 1-1",
            "RESUME 1-1",
            "STOP 1-1",
            "CLEAR 1",
            "PLAY 9-1 BARS",  # bad channel
            "NOSUCH 1-1",
            "SWITCH 207",
            "SWITCH 999",
            "REQ tok1 PLAY 1-1 RAMP",
            "PING",
        ],
    )
    assert responses[0].startswith("201 VERSION OK")
    assert responses[1] == "202 PLAY OK"
    assert responses[2] == "202 MIXER OK"
    assert responses[3] == "202 MIXER OK"
    assert responses[4] == "202 PAUSE OK"
    assert responses[5] == "202 RESUME OK"
    assert responses[6] == "202 STOP OK"
    assert responses[7] == "202 CLEAR OK"
    assert responses[8].startswith("400 ERROR")
    assert responses[9].startswith("400 ERROR")
    assert responses[10] == "202 SWITCH 207 OK"
    assert responses[11] == "400 SWITCH ERROR"
    assert responses[12] == "RES tok1 202 PLAY OK"
    assert responses[13].startswith("PONG")


def test_amcp_loadbg_transition_tokens(server_cfg):
    responses, server = amcp_session(
        server_cfg,
        [
            "PLAY 1-1 BARS",
            "LOADBG 1-1 BLACK MIX 10",
            "PLAY 1-1",
        ],
    )
    assert responses[1] == "202 LOADBG OK"
    assert responses[2] == "202 PLAY OK"


def test_heads_rundown(tmp_path):
    from phaneron_tpu.control.heads import Heads
    from phaneron_tpu.control.osc import Osc
    from phaneron_tpu.producer.producer import ProducerRegistry
    from phaneron_tpu.producer.test_pattern import create_test_pattern_producer
    from phaneron_tpu.runtime.channel import Channel

    spec = {
        "tickLayer": 1,
        "events": [
            {"duration": 3, "layers": [{"layerNum": 1, "url": "BARS"}]},
            {"duration": 3, "layers": [{"layerNum": 1, "url": "RAMP",
                                        "transition": {"type": "dissolve", "length": 2}}]},
        ],
    }
    path = tmp_path / "heads.json"
    path.write_text(json.dumps(spec))

    async def main():
        fmt = VIDEO_FORMATS["tiny5000"]
        ch = Channel(1, fmt, ProducerRegistry([create_test_pattern_producer]))
        osc = Osc(19878, "127.0.0.1", 19879)
        heads = Heads(osc, ch, {})
        assert await heads.load_spec(str(path))
        await heads.run()
        assert ch.layer(1).visible
        for _ in range(4):
            await ch.render_frame()
        await heads.next()
        lay = ch.layer(1)
        assert lay.transition is not None or lay.next is None  # dissolve armed or done
        for _ in range(4):
            await ch.render_frame()

    run(main())


def test_swap_layers(server_cfg):
    responses, _ = amcp_session(
        server_cfg,
        [
            "PLAY 1-1 BARS",
            "PLAY 1-2 RAMP",
            "SWAP 1-1 1-2",
            "SWAP 1-1 9-1",  # bad target channel
        ],
    )
    assert responses[2] == "202 SWAP OK"
    assert responses[3].startswith("400 ERROR")


def test_cls_lists_real_media(tmp_path, server_cfg):
    (tmp_path / "media").mkdir()
    (tmp_path / "media" / "clip.1920x1080.v210").write_bytes(b"x" * 64)
    server_cfg_media = server_cfg
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        responses, _ = amcp_session(server_cfg_media, ["CLS"])
        assert responses[0] == "200 CLS OK"
    finally:
        os.chdir(cwd)


def test_call_seek_on_raw_file(tmp_path, server_cfg):
    import numpy as np

    from phaneron_tpu.ops.formats import get_format

    # 4-frame clip with distinct frames
    fmt = get_format("v210")
    frames = []
    for k in range(4):
        planes = fmt.fill_buf(96, 64)
        arr = np.asarray(planes[0]).copy()
        arr[0, 0] = k  # tag frame number in the first word
        frames.append(arr.tobytes())
    clip = tmp_path / "clip.96x64.v210"
    clip.write_bytes(b"".join(frames))

    responses, _ = amcp_session(
        server_cfg,
        [
            f'PLAY 1-1 "{clip}" LOOP',
            "CALL 1-1 SEEK 2",
            "CALL 1-1 LOOP 0",
            "CALL 1-1 NOSUCH 1",
        ],
    )
    assert responses[0] == "202 PLAY OK"
    assert responses[1] == "202 CALL OK"
    assert responses[2] == "202 CALL OK"
    assert responses[3].startswith("400 ERROR")


def test_decklink_url_falls_back_to_bars(server_cfg):
    responses, _ = amcp_session(server_cfg, ["PLAY 1-1 DECKLINK 1"])
    assert responses[0] == "202 PLAY OK"


def test_config_chip_pins_channels():
    """Config 'chip' indices place channels on their own devices
    (channel-per-chip placement, SURVEY §2.7 P2)."""
    import asyncio

    import jax

    from conftest import run_async as run
    from phaneron_tpu.config import ConsumerConfig, ServerConfig
    from phaneron_tpu.server import PhaneronServer

    async def main():
        cfg = ServerConfig(
            channels=[
                ConsumerConfig("720p5000", {}, chip=0),
                ConsumerConfig("720p5000", {}, chip=1),
            ],
            amcp_port=15397,
            osc_listen_port=19981,
            osc_remote_port=19982,
        )
        server = PhaneronServer(cfg)
        await server.start()
        try:
            devs = jax.devices()
            assert server.channels[1].device == devs[0]
            assert server.channels[2].device == devs[1]
        finally:
            await server.shutdown()

    run(main())
