"""Server composition root (reference src/index.ts:36-189).

Builds the whole server: config, producer/consumer registries, channels
(each with its fused TPU frame program), AMCP TCP server, OSC, heads
automation and a stdin REPL.  Run with:

    python -m phaneron_tpu.server [config.json]
"""

from __future__ import annotations

import asyncio
import sys
from typing import Optional

from .config import ServerConfig, get_video_format
from .consumer.consumer import ConsumerRegistry
from .consumer.file_consumer import FileConsumer
from .consumer.mjpeg_consumer import MJPEGConsumer
from .consumer.preview_consumer import PreviewConsumer
from .consumer.sdi_consumer import SDIConsumer
from .control.amcp import AMCPServer
from .control.basic_cmds import BasicCmds
from .control.commands import Commands
from .control.heads import Heads
from .control.mixer_cmds import MixerCmds
from .control.osc import Osc
from .producer.avi_file import create_avi_producer
from .producer.wav_file import create_wav_producer
from .producer.ffmpeg import create_ffmpeg_producer
from .producer.image_seq import create_image_seq_producer
from .producer.mjpeg import create_mjpeg_producer
from .producer.producer import ProducerRegistry
from .producer.sdi_capture import create_sdi_capture_producer
from .producer.raw_file import create_raw_file_producer
from .producer.route import make_route_factory
from .producer.test_pattern import create_test_pattern_producer
from .runtime.channel import Channel

__all__ = ["PhaneronServer"]


def _ffmpeg_or_file(p: dict):
    """FFmpeg encode consumer when a binary exists, else raw file
    (the 'ffmpeg'/'file' alias pair, basicCmds.ts:195)."""
    try:
        from .consumer.ffmpeg_consumer import FFmpegConsumer

        return FFmpegConsumer(p)
    except RuntimeError:
        return FileConsumer(p)


def default_consumer_registry() -> ConsumerRegistry:
    reg = ConsumerRegistry()
    reg.register("file", lambda p: FileConsumer(p))
    reg.register("ffmpeg", _ffmpeg_or_file)
    reg.register("mjpeg", lambda p: MJPEGConsumer(p))
    reg.register("stream", lambda p: MJPEGConsumer(p))
    reg.register("screen", lambda p: PreviewConsumer(p))
    reg.register("decklink", lambda p: SDIConsumer(p))
    return reg


class PhaneronServer:
    def __init__(self, config: Optional[ServerConfig] = None):
        self.config = config or ServerConfig()
        self.channels: dict[int, Channel] = {}
        self.consumer_registry = default_consumer_registry()
        self.producer_registry = ProducerRegistry(
            [
                make_route_factory(lambda n: self.channels.get(n)),
                create_sdi_capture_producer,
                create_test_pattern_producer,
                create_mjpeg_producer,
                create_avi_producer,
                create_wav_producer,
                create_image_seq_producer,
                create_raw_file_producer,
                create_ffmpeg_producer,
            ]
        )
        self.commands = Commands()
        self.commands.add(BasicCmds(self.channels, self.consumer_registry).list())
        self.commands.add(MixerCmds(self.channels).list())
        self.amcp = AMCPServer(self.commands, self.config.amcp_port, server=self)
        self.osc = Osc(
            self.config.osc_listen_port,
            self.config.osc_remote_address,
            self.config.osc_remote_port,
        )
        self.heads: Optional[Heads] = None
        self._stop_event = asyncio.Event()
        self.amcp.on_kill = self._stop_event.set

    async def start(self) -> None:
        # channels, one per configured consumer (index.ts:156-168);
        # a failing consumer must not kill the server
        for i, cc in enumerate(self.config.channels, start=1):
            fmt = get_video_format(cc.format)
            chip_device = None
            sp_devices = None
            if cc.chip is not None or cc.sp > 1 or cc.chips:
                import jax

                devices = jax.devices()
                if cc.sp > 1 or cc.chips:
                    # scanline-sharded channel over a chip group
                    idxs = cc.chips or list(
                        range(cc.chip or 0, (cc.chip or 0) + cc.sp)
                    )
                    sp_devices = [devices[j % len(devices)] for j in idxs]
                elif cc.chip is not None:
                    # channel-per-chip placement (SURVEY §2.7 P2)
                    chip_device = devices[cc.chip % len(devices)]
            channel = Channel(
                i,
                fmt,
                self.producer_registry,
                col_spec=self.config.col_spec,
                gamma_mode=self.config.gamma_mode,
                device=chip_device,
                sp_devices=sp_devices,
            )
            device = dict(cc.device)
            name = device.pop("name", None)
            if name:
                try:
                    consumer = self.consumer_registry.create(name, device)
                    await channel.add_consumer(consumer)
                except Exception as err:
                    print(f"Channel {i}: consumer '{name}' failed: {err}")
            self.channels[i] = channel
            channel.start()

        await self.osc.start()
        if self.config.heads_url and 1 in self.channels:
            self.heads = Heads(
                self.osc,
                self.channels[1],
                {"load": "/heads/load", "take": "/heads/take"},
            )
            await self.heads.load_spec(self.config.heads_url)
        print(await self.amcp.start())

    async def shutdown(self) -> None:
        await self.amcp.stop()
        self.osc.close()
        for ch in self.channels.values():
            await ch.shutdown()
        self.channels.clear()

    async def repl(self) -> None:
        """stdin AMCP REPL (index.ts:110-128); 'q' quits."""
        loop = asyncio.get_running_loop()
        import re

        token_re = re.compile(r'"[^"]+"|""|\S+')
        while not self._stop_event.is_set():
            try:
                line = await loop.run_in_executor(None, sys.stdin.readline)
            except Exception:
                break
            if not line:
                break
            line = line.strip()
            if line.lower() == "q":
                self._stop_event.set()
                break
            if line:
                print(await self.amcp.process_command(token_re.findall(line)))

    async def run_forever(self) -> None:
        await self.start()
        repl_task = asyncio.create_task(self.repl())
        await self._stop_event.wait()
        repl_task.cancel()
        await self.shutdown()


def main() -> None:
    cfg = ServerConfig.load(sys.argv[1]) if len(sys.argv) > 1 else ServerConfig()
    asyncio.run(PhaneronServer(cfg).run_forever())


if __name__ == "__main__":
    main()
