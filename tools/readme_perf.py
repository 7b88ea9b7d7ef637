"""Regenerate the README performance block from a BENCH_r*.json artifact.

The README's numbers must equal the driver-captured bench run — hand
edits drift (a 12.0 vs 12.633 mismatch shipped in round 3).  This tool
rewrites everything between the perf markers from the JSON, so the
table CANNOT disagree with the recorded artifact.

Usage: python tools/readme_perf.py [BENCH_rNN.json]   (default: newest)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).parents[1]
BEGIN = "<!-- perf:begin -->"
END = "<!-- perf:end -->"
SBEGIN = "<!-- serving:begin -->"
SEND = "<!-- serving:end -->"


def newest_bench() -> Path:
    benches = sorted(ROOT.glob("BENCH_r*.json"))
    if not benches:
        raise SystemExit("no BENCH_r*.json artifact found")
    return benches[-1]


def fmt(v, nd=1):
    return "—" if v is None else f"{v:.{nd}f}"


def render(src: Path) -> str:
    data = json.loads(src.read_text())
    parsed = data.get("parsed", data)
    fps = parsed["value"]
    e = parsed["extra"]

    rows = [
        (
            "**UHD (3840×2160) 4-layer DVE+dissolve composite**",
            fmt(e["uhd_4layer_ms"], 2),
            f"**{fps:.0f}**",
            f"{parsed['vs_baseline']:.2f}×",
        ),
        (
            "same composite, pure-XLA fallback (gather warps)",
            fmt(1000 / e["uhd_4layer_xla_fps"], 1),
            f"{e['uhd_4layer_xla_fps']:.0f}",
            f"{e['uhd_4layer_xla_fps'] / 50:.2f}×",
        ),
        (
            "1080p 4-layer DVE+dissolve composite",
            fmt(1000 / e["hd_4layer_fps"], 2),
            f"{e['hd_4layer_fps']:.0f}",
            f"{e['hd_4layer_fps'] / 50:.1f}×",
        ),
    ]
    i4 = e.get("hd4i_4channels_tick_ms")
    if i4 is not None:
        rows.append(
            (
                "**4 × 1080i50 channels (the reference's default load), one chip**",
                f"{i4:.2f} /field-tick",
                "—",
                f"{e['hd4i_4channels_field_budget_pct']:.0f}% of the 50 Hz field budget",
            )
        )
        i2 = e.get("hd4i_2channels_tick_ms")
        if i2 is not None:
            rows.append(
                (
                    "same, 2-chip config (`configs/quad_1080i_2chip.json`), per chip",
                    f"{i2:.2f} /field-tick",
                    "—",
                    f"{i2 / 20 * 100:.0f}% of the field budget",
                )
            )
    rows.append(
        (
            "4 × 1080p50 channels (progressive), one chip",
            f"{e['hd4_4channels_tick_ms']:.2f} /tick",
            "—",
            f"{e['hd4_4channels_frame_budget_pct']:.0f}% of the 50 Hz frame budget",
        )
    )
    rows.append(
        (
            "1080p MIXER ROTATION layer (two-pass shear Pallas)",
            fmt(e["rotation_pallas_1080p_ms"], 2),
            "—",
            f"{e['rotation_gather_1080p_ms'] / e['rotation_pallas_1080p_ms']:.1f}× the XLA gather",
        )
    )
    worst = e.get("rotation_worst_angle_ms")
    if worst is not None:
        rows.append(
            (
                "worst-case rotation angle (full revolution covered)",
                fmt(worst, 2),
                "—",
                f"{e['rotation_gather_1080p_ms'] / worst:.1f}× the gather",
            )
        )
    rot_u = e.get("rotation_uhd_ms")
    if rot_u is not None and rot_u == rot_u:  # skip NaN
        rows.append(
            (
                "UHD MIXER ROTATION layer (worst band)",
                fmt(rot_u, 2),
                "—",
                f"{rot_u / 20 * 100:.0f}% of the 50 Hz frame budget",
            )
        )
    rows.append(
        (
            "UHD single-layer v210 passthrough (fused, labelled trivial)",
            fmt(1000 / e["uhd_passthrough_fps"], 2),
            f"{e['uhd_passthrough_fps']:.0f}",
            f"{e['uhd_passthrough_fps'] / 50:.0f}×",
        )
    )
    rows.append(
        (
            "8K (7680×4320) v210 passthrough (fused)",
            fmt(1000 / e["k8_passthrough_fps"], 2),
            f"{e['k8_passthrough_fps']:.0f}",
            f"{e['k8_passthrough_fps'] / 50:.1f}×",
        )
    )
    k8c = e.get("k8_composite_ms")
    if k8c is not None and e.get("k8_composite_layers"):
        nl = e["k8_composite_layers"]
        rows.append(
            (
                f"8K {nl}-layer DVE+dissolve composite",
                fmt(k8c, 2),
                f"{1000 / k8c:.0f}",
                f"sp=4 projection {e['k8_composite_sp4_projection_ms']:.2f} ms",
            )
        )
    rows.append(
        (
            "8K single-layer DVE channel",
            fmt(e["k8_1layer_dve_ms"], 2),
            f"{1000 / e['k8_1layer_dve_ms']:.0f}",
            f"sp=4 projection {e['k8_dve_sp4_projection_ms']:.2f} ms",
        )
    )
    rows.append(
        (
            "1080p v210 passthrough (fused)",
            fmt(1000 / e["hd_passthrough_fps"], 3),
            f"{e['hd_passthrough_fps']:.0f}",
            f"~{e['hd1080p50_passthrough_channels_per_chip']} × 1080p50 channels/chip",
        )
    )

    lines = [
        BEGIN,
        f"<!-- generated by tools/readme_perf.py from {src.name}; do not hand-edit -->",
        "",
        "| Path | ms/frame | fps | vs 50 fps target |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r) + " |")
    lines += [
        "",
        "Pipeline latency (the <10 ms north star, unpack→composite→pack):",
        f"1080p 4-layer composite **p50 {e['hd_4layer_pipeline_p50_ms']:.2f} ms, "
        f"p99 {e['hd_4layer_pipeline_p99_ms']:.2f} ms** per frame; UHD 4-layer "
        f"**p50 {e['uhd_4layer_pipeline_p50_ms']:.2f} ms, "
        f"p99 {e['uhd_4layer_pipeline_p99_ms']:.2f} ms** single-chip "
        "(live scanline sharding `sp=2` divides UHD device time across two chips).",
        "",
        f"Stage kernels at 1080p: yadif {e['yadif_1080i_field_ms']:.2f} ms/field; "
        f"720p↔1080p scaler pair {e['scaler_720_1080_pair_ms']:.2f} ms; "
        f"planar spatial unpacks {e['planar_unpack_1080p_ms']['yuv422p10le']:.2f} / "
        f"{e['planar_unpack_1080p_ms']['nv12']:.2f} ms "
        "(yuv422p10le / nv12).  Pallas DVE warp vs the XLA gather warp: "
        + ", ".join(
            f"{k}: {v}×" for k, v in e["warp_speedup_vs_gather"].items()
        )
        + ".",
        END,
    ]
    return "\n".join(lines)


def render_serving(src: Path) -> str:
    """The serving-validation prose, derived from the SAME artifact as
    the table so the two can never contradict each other (the round-4
    README shipped a stale 'exceeds one chip' sentence next to a table
    saying 92% of budget)."""
    data = json.loads(src.read_text())
    parsed = data.get("parsed", data)
    e = parsed["extra"]
    lines = [
        SBEGIN,
        f"<!-- generated by tools/readme_perf.py from {src.name}; do not hand-edit -->",
        "",
        "Serving validation: four progressive 1080p50 channels clock-paced on one",
        "chip with real file consumers attached — zero late frames.  The",
        "reference's true INTERLACED default load (four 1080i50 channels, yadif",
        "rings, fake SDI genlocks) paces via `tools/serve_bench.py <secs>",
        "interlaced4`;",
    ]
    i4 = e.get("hd4i_4channels_tick_ms")
    pct = e.get("hd4i_4channels_field_budget_pct")
    if i4 is not None and pct is not None and pct <= 100:
        lines += [
            f"its device tick measures {i4:.1f} ms/field — {pct:.0f}% of the 20 ms",
            "field budget, so the load FITS ONE CHIP",
            "(`configs/quad_1080i_1chip.json`); `configs/quad_1080i_2chip.json`",
            f"halves that to {e.get('hd4i_2channels_tick_ms', 0) or 0:.1f} ms/chip for headroom.",
        ]
    elif i4 is not None:
        lines += [
            f"its device tick measures {i4:.1f} ms/field — over the 20 ms field",
            "budget on one chip, so `configs/quad_1080i_2chip.json` is the 2+2",
            "placement that serves it.",
        ]
    late = e.get("hd4i_serve_late_frames")
    if late is not None:
        p99 = e.get("hd4i_field_p99_ms")
        secs = e.get("hd4i_serve_seconds")
        lines += [
            f"A recorded {secs:.0f} s live-paced run delivered"
            if secs
            else "A recorded live-paced run delivered",
            f"{e.get('hd4i_serve_frames', '—')} field ticks with"
            f" {late} late (>{'½'} period) and a render p99 of"
            + (f" {p99:.2f} ms." if p99 is not None else " —."),
        ]
    lines += [
        "The fetch/encode path runs on worker threads through the native SPSC",
        "staging ring so a consumer can never stall the frame loop.",
        SEND,
    ]
    return "\n".join(lines)


def main() -> None:
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else newest_bench()
    readme = ROOT / "README.md"
    text = readme.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit("README.md perf markers not found")
    block = render(src)
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END), block, text, flags=re.S
    )
    if SBEGIN in new and SEND in new:
        new = re.sub(
            re.escape(SBEGIN) + r".*?" + re.escape(SEND),
            render_serving(src),
            new,
            flags=re.S,
        )
    readme.write_text(new)
    print(f"README.md perf block regenerated from {src.name}")


if __name__ == "__main__":
    main()
