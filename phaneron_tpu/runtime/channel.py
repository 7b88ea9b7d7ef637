"""Channel: the per-output frame engine.

Parity with the reference Channel + Combiner pair (src/channel.ts,
src/combiner.ts): owns a sorted map of layers, assembles the bottom-to-
top composite each tick, assigns monotonic channel timestamps
(combiner.ts:211), pads empty channels with black/silence
(blackSilence.ts), fans output out to consumers and ROUTE taps
(combiner.ts:339-359), and routes AMCP load/play/mixer commands.

The combiner's generated combine_N kernel + job-queue submission is
replaced by the fused channel program: every tick builds the structural
ChannelSpec from live layer state and dispatches ONE jitted TPU program
(compiled once per structure, cached)."""

from __future__ import annotations

import asyncio
import time
from typing import Any, Optional

import numpy as np

from ..audio.engine import amix, silence
from ..config import VideoFormat
from ..consumer.consumer import ChannelFrame, Consumer
from ..graph.pipeline import ChannelSpec, make_channel_program
from ..producer.producer import LoadParams, ProducerRegistry
from ..runtime.clock import FrameClock
from ..runtime.frame import RGBA_F32, AudioFrame, VideoFrame
from ..runtime.layer import Layer
from ..runtime.mixer import Mixer
from ..runtime.stream import END, Stream, from_generator
from ..runtime.types import TransitionSpec

__all__ = ["Channel"]


class _Tap:
    """A ROUTE subscriber: bounded queues, latest-wins on overflow so a
    slow route can never stall the channel."""

    def __init__(self, maxsize: int = 4):
        self.video: asyncio.Queue = asyncio.Queue(maxsize=maxsize)
        self.audio: asyncio.Queue = asyncio.Queue(maxsize=maxsize)
        self.active = True

    def push(self, vframe, aframe) -> None:
        for q, item in ((self.video, vframe), (self.audio, aframe)):
            if q.full():
                try:
                    q.get_nowait()  # drop oldest
                except asyncio.QueueEmpty:
                    pass
            q.put_nowait(item)

    def streams(self) -> tuple[Stream, Stream]:
        def make(q):
            async def gen():
                while self.active:
                    item = await q.get()
                    yield item
                    if item is END:
                        return

            return from_generator(gen)

        return make(self.video), make(self.audio)


class Channel:
    def __init__(
        self,
        chan_id: int,
        fmt: VideoFormat,
        producer_registry: ProducerRegistry,
        out_format: str = "v210",
        col_spec: str = "709",
        gamma_mode: str = "analytic",
        use_pallas: Optional[bool] = None,
        device=None,
        sp_devices=None,
    ):
        self.chan_id = chan_id
        self.fmt = fmt
        self.producer_registry = producer_registry
        self.out_format = out_format
        self.col_spec = col_spec
        self.gamma_mode = gamma_mode
        # channel-per-chip placement (SURVEY.md §2.7 P2): all frame
        # programs run on this device; ROUTE frames arriving from a
        # channel pinned elsewhere transfer over ICI via device_put
        self.device = device
        # scanline (sp) sharding (SURVEY §2.7 P5): with N devices the
        # channel's fused program runs row-sharded across all of them —
        # one compiled program, GSPMD halo collectives over ICI.  This
        # is the live form of the multichip dryrun's sp axis: UHD/8K
        # latency divides ~linearly by len(sp_devices).
        self._sp_mesh = None
        if sp_devices is not None and len(sp_devices) > 1:
            if fmt.height % len(sp_devices):
                raise ValueError(
                    f"channel height {fmt.height} not divisible by sp={len(sp_devices)}"
                )
            from ..parallel.mesh import make_sp_mesh

            self._sp_mesh = make_sp_mesh(list(sp_devices))
        if use_pallas is None:
            import jax

            # compiled Pallas on TPU; the CPU interpreter is far slower
            # than the XLA path, so tests exercise it explicitly instead
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.layers: dict[int, Layer] = {}
        self.consumers: list[Consumer] = []
        self.clock = FrameClock(fmt.timescale, fmt.duration)
        self.taps: list[_Tap] = []
        self.layer_taps: dict[int, list[_Tap]] = {}
        self.running = False
        self.timestamp = 0
        self._task: Optional[asyncio.Task] = None
        # structural specs that have dispatched at least once: warm specs
        # dispatch inline; only first-seen structures hop to a thread
        self._warm_specs: set = set()
        # per-frame latency stats (SURVEY.md §5.1 first-class metric)
        self.frame_times: list[float] = []
        self._last_layer_specs: dict[int, Any] = {}
        from ..utils.metrics import StageTimings

        self.timings = StageTimings()

    # ----------------------------------------------------------- layers

    # producer crash -> bounded reload attempts (SURVEY.md §5.3 asks the
    # build to ADD restart on top of the reference's degrade-to-black)
    MAX_SOURCE_RESTARTS = 3

    def layer(self, num: int) -> Layer:
        if num not in self.layers:
            lay = Layer(
                self.fmt, self.col_spec, self.gamma_mode,
                # slot-side pair deinterlace (one launch serves both
                # field ticks) on single-device Pallas channels;
                # sp-sharded channels keep the in-program ring so GSPMD
                # shards the yadif across chips
                pair_deint=self.use_pallas and self._sp_mesh is None,
            )
            lay.on_end(lambda _l, n=num: self._maybe_restart(n))
            self.layers[num] = lay
        return self.layers[num]

    def _maybe_restart(self, num: int) -> None:
        """On source END caused by a producer failure (not natural end),
        schedule a reload of the same LoadParams with backoff."""
        lay = self.layers.get(num)
        slot = lay.cur if lay else None
        if slot is None or not getattr(slot, "failed", False):
            return
        params = getattr(lay, "_restart_params", None)
        count = getattr(lay, "_restart_count", 0)
        if params is None or count >= self.MAX_SOURCE_RESTARTS:
            return
        try:
            loop = asyncio.get_running_loop()
        except RuntimeError:
            return
        loop.create_task(self._restart_layer(num, params, count))

    async def _restart_layer(self, num: int, params, count: int) -> None:
        await asyncio.sleep(0.2 * (count + 1))
        lay = self.layers.get(num)
        if lay is None or getattr(lay, "_restart_params", None) is not params:
            # the operator loaded something else while we backed off:
            # this retry chain is stale — never stomp the new source
            return
        print(
            f"channel {self.chan_id}: restarting failed source on layer {num} "
            f"(attempt {count + 1}/{self.MAX_SOURCE_RESTARTS})"
        )
        try:
            ok = await self.load_source(num, params)
        except Exception as err:
            print(f"channel {self.chan_id}: restart load failed: {err}")
            ok = False
        lay._restart_count = count + 1  # load_source reset it; keep the tally
        if ok:
            self.play(num)
        elif count + 1 < self.MAX_SOURCE_RESTARTS:
            # the source is still down (load itself failed): keep the
            # retry chain going — a failed load never produces the END
            # event that normally triggers the next attempt
            asyncio.get_running_loop().create_task(
                self._restart_layer(num, params, count + 1)
            )

    async def load_source(
        self,
        layer_num: int,
        params: LoadParams,
        preview: bool = False,
        auto_play: bool = False,
        transition: Optional[TransitionSpec] = None,
    ) -> bool:
        """LOADBG/LOAD (channel.ts:128-209): create producer + mixer
        (+ wipe-mask producer) and bind to the layer."""
        source_id = f"{self.chan_id}-{layer_num}"
        producer = await self.producer_registry.create_source(
            source_id, params, self.fmt
        )
        if producer is None:
            return False
        mixer = Mixer(self.fmt.width, self.fmt.height)

        mask_producer = None
        mask_mixer = None
        if transition is not None and transition.type == "wipe" and transition.mask_url:
            mask_producer = await self.producer_registry.create_source(
                f"{source_id}-mask", LoadParams(transition.mask_url, loop=True), self.fmt
            )
            if mask_producer is not None:
                mask_mixer = Mixer(self.fmt.width, self.fmt.height)

        self.layer(layer_num).load(
            producer,
            mixer,
            preview=preview,
            auto_play=auto_play,
            transition=transition,
            mask_producer=mask_producer,
            mask_mixer=mask_mixer,
        )
        lay = self.layer(layer_num)
        lay._restart_params = params
        lay._restart_count = 0
        self._prewarm_for(layer_num, producer, transition)
        return True

    def _prewarm_for(self, layer_num: int, producer, transition) -> None:
        """AOT-compile the frame programs PLAY will need (the reference
        compiles kernels during loadSource, SURVEY.md §3.2)."""
        from ..graph.pipeline import LayerSpec
        from ..graph.warmup import prewarm

        deint = producer.fmt.interlaced and producer.pix_format != "rgba_f32"
        opaque = False
        if deint:
            # layer.layer_spec_fields sets src_opaque from the WIRE
            # format — the prediction must match or PLAY recompiles
            from ..ops.formats import get_format

            try:
                opaque = not get_format(producer.pix_format).INFO.is_rgb
            except KeyError:
                opaque = False
        pair = False
        if deint and self.use_pallas and self._sp_mesh is None:
            # slot-side pair deinterlace: the layer will contribute
            # plain progressive RGBA fields (layer.SourceSlot._use_pair)
            from ..ops.pallas_yadif import yadif_pair_fits

            pair = yadif_pair_fits(
                producer.fmt.height, producer.fmt.width, 3 if opaque else 4
            )
        base = LayerSpec(
            src_format="rgba_f32" if deint else producer.pix_format,
            deinterlace=deint and not pair,
            src_opaque=opaque,
        )
        if pair:
            # warm the pair kernel itself (a Pallas compile PLAY would
            # otherwise stall on) alongside the channel programs
            from ..graph.pipeline import make_yadif_pair_field_program
            from ..graph.warmup import prewarm_jit

            import jax

            nc = 3 if opaque else 4
            struct = jax.ShapeDtypeStruct(
                (nc, producer.fmt.height, producer.fmt.width), "float32"
            )
            prewarm_jit(
                make_yadif_pair_field_program(
                    producer.fmt.height, producer.fmt.width, True, channels=nc
                ),
                struct, struct, struct,
            )
        predicted = [base, base._replace(has_transform=True)]
        warp_ok = (
            self.use_pallas and self.fmt.width % 128 == 0 and self.fmt.height % 8 == 0
        )
        if warp_ok:
            # MIXER FILL engages the Pallas warp: precompile the common
            # scale buckets so live DVE doesn't hit a first-compile stall
            predicted += [
                base._replace(has_transform=True, warp_bucket=b) for b in (0, 1)
            ]
        if transition is not None and transition.type in ("dissolve", "wipe"):
            trans = base._replace(
                transition=transition.type,
                src_b_format=(
                    "rgba_f32"
                    if pair
                    else (None if deint else producer.pix_format)
                ),
                mask_format="v210" if transition.type == "wipe" else None,
            )
            predicted.append(trans)
            if warp_ok:
                # a dissolve/wipe on a layer with live DVE runs the
                # fused pair kernel — prewarm its common buckets too
                predicted += [
                    trans._replace(has_transform=True, warp_bucket=b)
                    for b in (0, 1)
                ]
        others = tuple(
            s for num, s in (self._last_layer_specs or {}).items() if num != layer_num
        )
        for lspec in predicted:
            spec = ChannelSpec(
                self.fmt.width,
                self.fmt.height,
                self.out_format,
                others + (lspec,),
                self.col_spec,
                self.col_spec,
                self.gamma_mode,
                emit_rgba=self._needs_rgba(),
                pallas_stages=self.use_pallas,
            )
            try:
                asyncio.get_running_loop().create_task(prewarm(spec))
            except RuntimeError:
                pass  # no loop (synchronous tests): lazy compile instead

    def play(self, layer_num: int) -> bool:
        if layer_num not in self.layers:
            return False
        self.layers[layer_num].play()
        return True

    def pause(self, layer_num: int) -> bool:
        if layer_num not in self.layers:
            return False
        self.layers[layer_num].pause()
        return True

    def resume(self, layer_num: int) -> bool:
        if layer_num not in self.layers:
            return False
        self.layers[layer_num].resume()
        return True

    def stop(self, layer_num: int) -> bool:
        if layer_num not in self.layers:
            return False
        self.layers[layer_num].stop()
        return True

    def clear(self, layer_num: Optional[int] = None) -> bool:
        """CLEAR layer or whole channel (channel.ts:242-264)."""
        if layer_num is None:
            for l in self.layers.values():
                l.clear()
            self.layers.clear()
            return True
        if layer_num not in self.layers:
            return False
        self.layers.pop(layer_num).clear()
        return True

    # -------------------------------------------------------- consumers

    async def add_consumer(self, consumer: Consumer) -> None:
        await consumer.initialise(self.fmt)
        self.consumers.append(consumer)

    def remove_consumer(self, index: int) -> bool:
        for i, c in enumerate(self.consumers):
            if c.index == index:
                c.release()
                del self.consumers[i]
                return True
        return False

    # ------------------------------------------------------ ROUTE pipes

    def route_pipes(self, layer: Optional[int] = None):
        """getRoutePipes (channel.ts:290-300): whole-channel taps get the
        combiner RGBA output; layer taps get that layer's source frames."""
        tap = _Tap()
        if layer is None:
            # attaching a tap flips this channel's program to emit_rgba:
            # precompile that variant so the switch doesn't stall frames
            if self._last_layer_specs:
                from ..graph.warmup import prewarm

                spec = ChannelSpec(
                    self.fmt.width, self.fmt.height, self.out_format,
                    tuple(self._last_layer_specs[n] for n in sorted(self._last_layer_specs)),
                    self.col_spec, self.col_spec, self.gamma_mode,
                    emit_rgba=True, pallas_stages=self.use_pallas,
                )
                try:
                    asyncio.get_running_loop().create_task(prewarm(spec))
                except RuntimeError:
                    pass
            self.taps.append(tap)
            video, audio = tap.streams()
            return video, audio, RGBA_F32
        self.layer_taps.setdefault(layer, []).append(tap)
        video, audio = tap.streams()
        lay = self.layers.get(layer)
        fmt = "v210"
        if lay is not None and lay.cur is not None:
            fmt = lay.cur.layer_spec_fields()["src_format"]
        return video, audio, fmt

    # ------------------------------------------------------- frame loop

    def _needs_rgba(self) -> bool:
        if self.taps:
            return True
        return any(
            c.pix_format is None or c.pix_format != self.out_format or c.needs_rgba
            for c in self.consumers
        )

    def _pin(self, contribs):
        """Move contribution arrays to this channel's device(s).  A no-op
        for frames already resident; cross-chip ROUTE frames ride the
        interconnect here (ICI on TPU pods — the reference's HTTP
        cluster hop replaced by a device-to-device copy).  Under sp
        sharding every param lands row-sharded over the channel's mesh
        (incl. resharding ROUTE frames arriving from another mesh)."""
        if self._sp_mesh is not None:
            from ..parallel.mesh import shard_params_sp

            for c in contribs:
                c.params = shard_params_sp(c.params, self._sp_mesh)
            return contribs
        if self.device is None:
            return contribs
        import jax

        def put(x):
            return jax.device_put(x, self.device) if hasattr(x, "dtype") else x

        for c in contribs:
            c.params = jax.tree.map(put, c.params)
        return contribs

    def _dispatch(self, spec: ChannelSpec, contribs):
        """Run the frame program.  Fused-kernel selection lives inside
        make_channel_program (the spec cache owns it) — this is one call."""
        contribs = self._pin(contribs)
        program = make_channel_program(spec)
        out = program({"layers": [c.params for c in contribs]})
        if isinstance(out, dict):
            return out["packed"], out["rgba"]
        return out, None

    async def render_frame(self) -> ChannelFrame:
        """Assemble and dispatch one channel frame (the per-tick hot path)."""
        t0 = time.monotonic()
        contribs = []
        contrib_layers = []
        for num in sorted(self.layers):
            lay = self.layers[num]
            if not lay.visible:
                continue
            c = await lay.poll()
            if c is not None:
                contribs.append(c)
                contrib_layers.append(num)

        spec = ChannelSpec(
            self.fmt.width,
            self.fmt.height,
            self.out_format,
            tuple(c.spec for c in contribs),
            self.col_spec,
            self.col_spec,
            self.gamma_mode,
            emit_rgba=self._needs_rgba(),
            pallas_stages=self.use_pallas,
        )
        # A structural change can trigger an XLA compile, which must
        # stall only this channel — never the event loop (AMCP/OSC stay
        # responsive; other channels tick).  Once a spec has dispatched
        # successfully it is warm: jitted dispatch is async and cheap, so
        # warm ticks run inline — no per-frame thread hand-off jitter
        # (4x50 Hz channels = 200 hops/s on one core otherwise).
        if spec in self._warm_specs:
            packed, rgba = self._dispatch(spec, contribs)
        else:
            packed, rgba = await asyncio.to_thread(self._dispatch, spec, contribs)
            self._warm_specs.add(spec)

        audio = (
            amix([c.audio for c in contribs])
            if contribs
            else silence(self.fmt.audio_channels, self.fmt.samples_per_frame)
        )

        self._last_layer_specs = dict(zip(contrib_layers, (c.spec for c in contribs)))
        stamps = [c.loadstamp for c in contribs if c.loadstamp is not None]
        frame = ChannelFrame(
            timestamp=self.timestamp,
            packed=packed,
            rgba=rgba,
            audio=audio,
            width=self.fmt.width,
            height=self.fmt.height,
            packed_format=self.out_format,
            loadstamp=min(stamps) if stamps else None,
        )

        # ROUTE taps (zero-copy fan-out of the immutable device array)
        if self.taps and rgba is not None:
            vf = VideoFrame(
                timestamp=self.timestamp,
                format=RGBA_F32,
                payload=rgba,
                width=self.fmt.width,
                height=self.fmt.height,
            )
            af = AudioFrame(timestamp=self.timestamp, samples=audio)
            for tap in self.taps:
                tap.push(vf, af)
        for num, taps in self.layer_taps.items():
            idx = contrib_layers.index(num) if num in contrib_layers else -1
            if idx < 0:
                continue
            c = contribs[idx]
            payload = c.params.get("src")
            if payload is None:
                continue
            vf = VideoFrame(
                timestamp=self.timestamp,
                format=c.spec.src_format,
                payload=payload,
                width=self.fmt.width,
                height=self.fmt.height,
            )
            af = AudioFrame(timestamp=self.timestamp, samples=c.audio)
            for tap in taps:
                tap.push(vf, af)

        self.timestamp += 1
        self.frame_times.append(time.monotonic() - t0)
        if len(self.frame_times) > 500:
            del self.frame_times[:250]
        return frame

    async def run(self) -> None:
        self.running = True
        self.clock.reset()
        frame_num = 0
        while self.running:
            await self.clock.wait(frame_num)
            try:
                frame = await self.render_frame()
                if self.consumers:
                    results = await asyncio.gather(
                        *(c.deliver(frame) for c in self.consumers),
                        return_exceptions=True,
                    )
                    for c, r in zip(self.consumers, results):
                        if isinstance(r, Exception):
                            print(f"channel {self.chan_id}: consumer error: {r}")
                if frame.loadstamp is not None:
                    # ingest -> delivered wall latency (SURVEY.md §5.1)
                    self.timings.record(
                        "e2e_latency", time.monotonic() - frame.loadstamp
                    )
            except asyncio.CancelledError:
                raise
            except Exception as err:
                # one bad frame must not take the channel down
                # (the reference catches per-channel, index.ts:156-170)
                print(f"channel {self.chan_id}: frame {frame_num} error: {err}")
            frame_num += 1

    def start(self) -> None:
        if self._task is None or self._task.done():
            # precompile the empty-channel (black/silence) program so the
            # pacing loop starts clean
            from ..graph.warmup import prewarm

            spec = ChannelSpec(
                self.fmt.width, self.fmt.height, self.out_format, (),
                self.col_spec, self.col_spec, self.gamma_mode,
                emit_rgba=self._needs_rgba(), pallas_stages=self.use_pallas,
            )
            asyncio.create_task(prewarm(spec))
            self._task = asyncio.create_task(self.run())

    async def shutdown(self) -> None:
        self.running = False
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
        self.clear(None)
        for c in self.consumers:
            c.release()
        self.consumers.clear()

    # --------------------------------------------------------- metrics

    def stats(self) -> dict[str, Any]:
        ft = np.asarray(self.frame_times[-200:]) if self.frame_times else np.zeros(1)
        out = {
            "channel": self.chan_id,
            "format": self.fmt.name,
            "frames": self.timestamp,
            "late_frames": self.clock.late_frames,
            "render_p50_ms": float(np.percentile(ft, 50) * 1e3),
            "render_p99_ms": float(np.percentile(ft, 99) * 1e3),
            "layers": sorted(self.layers),
            "consumers": len(self.consumers),
            # per-consumer real-time drop counters (latest-wins /
            # drop-mode consumers shed load instead of stalling)
            "consumer_dropped": [
                int(getattr(c, "dropped", 0)) for c in self.consumers
            ],
        }
        e2e = self.timings.summary().get("e2e_latency")
        if e2e:
            out["e2e_p99_ms"] = e2e["p99_ms"]
        return out
