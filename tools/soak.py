"""Soak test: drive a live server over AMCP with continuous load/play/
transition/mixer churn, verifying stability, recompile behavior and
pacing over time.

    python tools/soak.py [seconds] [--cpu]
"""

from __future__ import annotations

import asyncio
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


async def main(duration: float = 60.0) -> None:
    from phaneron_tpu.config import ConsumerConfig, ServerConfig, VIDEO_FORMATS, VideoFormat
    from phaneron_tpu.server import PhaneronServer

    VIDEO_FORMATS.setdefault(
        "soak720", VideoFormat("soak720", 1, 1280, 720, 1280, 50, 1, 48000, 2)
    )
    cfg = ServerConfig(
        channels=[ConsumerConfig("soak720", {})],
        amcp_port=15299,
        osc_listen_port=19976,
        osc_remote_port=19977,
    )
    server = PhaneronServer(cfg)
    await server.start()
    reader, writer = await asyncio.open_connection("127.0.0.1", cfg.amcp_port)

    async def cmd(c: str) -> str:
        writer.write((c + "\r\n").encode())
        await writer.drain()
        line = (await reader.readline()).decode().strip()
        if line == "400 ERROR":
            line += " | " + (await reader.readline()).decode().strip()
        return line

    rng = random.Random(7)
    sources = ["BARS", "RAMP", "BLACK"]
    transitions = ["", "MIX 12", "CUT"]
    print(await cmd("PLAY 1-1 BARS"))
    frames0 = server.channels[1].timestamp
    t_start = time.monotonic()
    t_end = t_start + duration
    ops = 0
    errors = 0
    while time.monotonic() < t_end:
        action = rng.random()
        if action < 0.4:
            r = await cmd(
                f"LOADBG 1-1 {rng.choice(sources)} {rng.choice(transitions)}".strip()
            )
            r2 = await cmd("PLAY 1-1")
            errors += ("ERROR" in r) + ("ERROR" in r2)
        elif action < 0.7:
            r = await cmd(
                f"MIXER 1-1 FILL {rng.uniform(-0.2,0.2):.2f} {rng.uniform(-0.2,0.2):.2f} "
                f"{rng.uniform(0.3,1.2):.2f} {rng.uniform(0.3,1.2):.2f}"
            )
            errors += "ERROR" in r
        elif action < 0.8:
            errors += "ERROR" in await cmd(f"MIXER 1-1 VOLUME {rng.uniform(0,1):.2f}")
        elif action < 0.9:
            errors += "ERROR" in await cmd("PAUSE 1-1")
            await asyncio.sleep(0.2)
            errors += "ERROR" in await cmd("RESUME 1-1")
        else:
            errors += "ERROR" in await cmd(f"PLAY 1-2 {rng.choice(sources)}")
        ops += 1
        await asyncio.sleep(rng.uniform(0.2, 1.0))

    ch = server.channels[1]
    s = ch.stats()
    window = time.monotonic() - t_start
    frames = s["frames"] - frames0
    expected = window * ch.fmt.fps
    print(
        f"soak done: {ops} ops, {errors} errors, frames={frames} in {window:.0f}s "
        f"(expected ~{expected:.0f}), late={s['late_frames']}, "
        f"render_p99={s['render_p99_ms']:.2f}ms"
    )
    writer.write(b"KILL\r\n")
    await writer.drain()
    await server.shutdown()
    assert errors == 0, f"{errors} command errors"
    import jax

    if jax.default_backend() != "cpu":
        # pacing assertions only on real hardware; the single-core CPU
        # image can't hold 50 fps through structural-compile churn
        assert frames > expected * 0.5, "channel stalled"
    else:
        assert frames > 50, "channel stalled"


if __name__ == "__main__":
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    asyncio.run(main(seconds))
