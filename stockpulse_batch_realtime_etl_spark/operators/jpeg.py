"""Dependency-free baseline JPEG (SOF0) codec in pure numpy/struct.

Closes the last compressed-format seam in operators/multimodal.py: BMP/PPM/
WAV/PNG/Y4M already decode for real; JPEG-class was import-guarded behind
Pillow.  This module implements the actual ITU T.81 baseline machinery —
marker segment walk, DQT/DHT parse, canonical Huffman entropy decode with
0xFF00 byte-unstuffing, DC difference coding, AC run/size + ZRL + EOB,
zigzag ordering, dequantization, 8×8 IDCT, level shift, and JFIF
YCbCr→RGB — with no external library.

Scope: baseline sequential (SOF0) AND progressive (SOF2, T.81 Annex G —
spectral selection, successive approximation, EOB runs, refinement
correction bits), 8-bit, grayscale or colour with any sampling factors
where each component's factor divides the max (covers 4:4:4, 4:2:2,
4:1:1, and the dominant real-world 4:2:0 — interleaved multi-block
MCUs, padded edge blocks, nearest-neighbor chroma upsampling).
Honest remaining seams: arithmetic coding, hierarchical (SOF5+),
lossless, 12-bit precision, and non-dividing sampling ratios raise
``NotImplementedError``.

Oracle strategy (same trick as the PNG rung, multimodal.py:154): the
synthetic corpus images are CONSTANT PER 8×8 BLOCK.  A constant block's
DCT is DC-only (DC = 8·(v−128), all AC zero), and with unit quantization
tables the encode→decode round trip is EXACT — so DuckDB can replay every
decoded pixel from (asset_id, block index) arithmetic without running a
JPEG decoder.  The rounding convention is ``floor(x + 0.5)`` on both
sides (numpy ``np.floor`` here, ``floor(x + 0.5)`` in the oracle SQL) so
banker's-rounding differences can never surface.  The AC run-length /
ZRL / EOB paths — which the DC-only corpus doesn't reach — are pinned
exactly by the lossless coefficient-layer round trip in
tests/test_multimodal.py (Huffman encode → decode of arbitrary
coefficient blocks is bit-lossless, no DCT involved).

Reference parity note: the reference repo has no media pipeline at all —
this rung belongs to the LLM-training-data extension surface (multimodal
columns as opaque binary + real executor-side decode inside mapInPandas).
"""

from __future__ import annotations

import struct

import numpy as np

# JFIF YCbCr → RGB constants (ITU-R BT.601, the values every baseline
# decoder hard-codes).  The oracle SQL uses these literal constants with
# the identical floating-point evaluation order.
_CR_R = 1.402
_CB_G = 0.344136
_CR_G = 0.714136
_CB_B = 1.772

#: zigzag scan order: ZIGZAG[k] = raster index of the k-th zigzag element
ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Huffman table SPECS the encoder writes into DHT (bits-per-length list,
# then symbol values in canonical order).  Any valid prefix code is legal
# JPEG — the decoder reconstructs whatever tables the DHT segment
# declares, so these don't need to be the Annex K defaults.  DC: 12
# category symbols (4×3-bit + 8×5-bit, Kraft sum 0.75).  AC: all 162
# symbols at 8 bits (162/256 < 1) — trivially canonical, and every
# (run, size) symbol incl. ZRL (0xF0) and EOB (0x00) is encodable.
_DC_BITS = [0, 0, 0, 4, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

# Progressive AC Huffman spec: progressive scans additionally need the
# EOBn symbols ((r << 4) | 0 for r = 1..14 — end-of-band runs covering
# 2^r .. 2^{r+1}-1 blocks, T.81 G.1.2.2) that baseline never emits;
# 0x00 stays EOB0 and 0xF0 stays ZRL.  176 symbols, all 8-bit
# (176/256 < 1: trivially canonical).
_ACP_VALS = [r << 4 for r in range(16)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ACP_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for a canonical JPEG Huffman table."""
    codes, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF → 0xFF 0x00 stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write(0xFF, 8 - self._n)  # pad with 1-bits per T.81 F.1.2.3
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs 0xFF 0x00
    and treats a bare 0xFF marker byte as end-of-scan."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._d = data
        self._pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self._pos >= len(self._d):
            raise ValueError("JPEG entropy data truncated")
        b = self._d[self._pos]
        if b == 0xFF:
            if self._pos + 1 >= len(self._d):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self._d[self._pos + 1]
            if nxt == 0x00:
                self._pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn inside the scan
                self._pos += 2
                raise _RestartMarker()
            else:
                # ValueError, not EOFError: all corrupt-scan paths share
                # one catchable type (the module's documented contract)
                raise ValueError(
                    "JPEG entropy data exhausted at marker "
                    f"0xFF{nxt:02X} mid-scan"
                )
        else:
            self._pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, length: int) -> int:
        while self._n < length:
            self._fill()
        v = (self._acc >> (self._n - length)) & ((1 << length) - 1)
        self._n -= length
        self._acc &= (1 << self._n) - 1
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        # JPEG codes are at most 16 bits: stop after exactly 16 reads so
        # an invalid code never consumes a 17th bit (which could pull an
        # extra byte and misreport as "entropy data truncated")
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def byte_align(self) -> None:
        self._n = 0
        self._acc = 0

    def consume_restart(self) -> None:
        """T.81 restart resync: drop the flush-padding bits of the current
        byte, then require and consume an RSTn marker at the (now
        byte-aligned) position.  Called at the DRI cadence, so padding
        bits are NEVER offered to the Huffman decoder — with short-code
        tables (1-bit codes are legal) up to 7 pad bits could otherwise
        decode as a spurious MCU."""
        self.byte_align()
        if (
            self._pos + 1 >= len(self._d)
            or self._d[self._pos] != 0xFF
            or not (0xD0 <= self._d[self._pos + 1] <= 0xD7)
        ):
            raise ValueError(
                "JPEG restart interval elapsed without an RSTn marker"
            )
        self._pos += 2


class _RestartMarker(Exception):
    """Internal signal: an RSTn marker was consumed mid-scan."""


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit raw value to signed diff."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th] + bits + vals)


def encode_scan_blocks(
    component_blocks: list[list[np.ndarray]],
    mcu_blocks: list[int] | None = None,
) -> bytes:
    """Entropy-encode interleaved MCUs of ZIGZAG-ORDER quantized
    coefficient blocks (one list per component).  ``mcu_blocks[i]`` is
    how many consecutive blocks component ``i`` contributes per MCU
    (h_i·v_i for subsampled scans; default 1 each), so MCU k is
    ``comp_i[k·n_i : (k+1)·n_i]`` for every component.  This is the
    lossless Huffman layer on its own — exposed so tests can round-trip
    arbitrary coefficient arrays (full AC run/ZRL/EOB coverage) exactly."""
    counts = mcu_blocks or [1] * len(component_blocks)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    pred = [0] * len(component_blocks)
    n_mcus = len(component_blocks[0]) // counts[0]
    for k in range(n_mcus):
        for ci, blocks in enumerate(component_blocks):
            for zz in blocks[k * counts[ci] : (k + 1) * counts[ci]]:
                _encode_block(w, zz, ci, pred, dc_codes, ac_codes)
    return w.flush()


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    ci: int,
    pred: list[int],
    dc_codes: dict,
    ac_codes: dict,
) -> None:
    """Huffman-encode one zigzag coefficient block (DC diff vs the
    component predictor, then AC run/size with ZRL + EOB)."""
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        raw = diff if diff >= 0 else diff + (1 << size) - 1
        w.write(raw, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        raw = v if v >= 0 else v + (1 << size) - 1
        w.write(raw, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)


def encode_scan_with_restarts(
    component_blocks: list[list[np.ndarray]],
    mcu_blocks: list[int],
    restart_interval: int,
) -> bytes:
    """Entropy-encode interleaved MCUs with T.81 restart markers: every
    ``restart_interval`` MCUs the bitstream byte-aligns (1-padded flush),
    emits RSTn (n cycling 0..7), and resets every DC predictor.  Each
    interval is therefore an independent entropy segment — encoded here
    as separate :func:`encode_scan_blocks` calls joined by the markers,
    which is bit-identical to an inline encoder because predictor reset +
    byte alignment is exactly the per-call starting state."""
    if not restart_interval:
        return encode_scan_blocks(component_blocks, mcu_blocks)
    n_mcus = len(component_blocks[0]) // mcu_blocks[0]
    out = bytearray()
    for i, start in enumerate(range(0, n_mcus, restart_interval)):
        end = min(start + restart_interval, n_mcus)
        chunk = [
            blocks[start * c : end * c]
            for blocks, c in zip(component_blocks, mcu_blocks)
        ]
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += encode_scan_blocks(chunk, mcu_blocks)
    return bytes(out)


def encode_baseline_jpeg(
    comp_coeffs: list[list[np.ndarray]],
    w: int,
    h: int,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a complete baseline JPEG from per-component lists of
    zigzag-order quantized coefficient blocks (unit quant table).  1 list
    → grayscale, 3 lists → YCbCr.  ``sampling`` gives per-component
    (h_i, v_i) factors (default all 1×1 = 4:4:4); with subsampling each
    component's blocks must already be in MCU-interleaved order
    (h_i·v_i consecutive blocks per MCU, raster within the MCU).
    ``restart_interval`` > 0 declares a DRI segment and interleaves RSTn
    markers at that MCU cadence."""
    ncomp = len(comp_coeffs)
    samp = sampling or [(1, 1)] * ncomp
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # Pq=0, Tq=0, all 1s
    sof_comps = b"".join(
        struct.pack(">BBB", cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0)
        for cid in range(ncomp)
    )
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS)) + _seg(
        0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALS)
    )
    sos_comps = b"".join(
        struct.pack(">BB", cid + 1, 0x00) for cid in range(ncomp)
    )
    sos = _seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    # T.81 A.2.2: a single-component scan is NON-interleaved — one data
    # unit per MCU regardless of declared sampling factors (a grayscale
    # file may legally declare 2×2), so its blocks are written in plain
    # raster order
    mcu_blocks = [hi * vi for hi, vi in samp] if ncomp > 1 else [1]
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    scan = encode_scan_with_restarts(comp_coeffs, mcu_blocks, restart_interval)
    return b"\xff\xd8" + dqt + dri + sof + dht + sos + scan + b"\xff\xd9"


def encode_baseline_multiscan_jpeg(
    comp_coeffs: list,
    w: int,
    h: int,
    sampling: list[tuple[int, int]] | None = None,
    scans: list[tuple[int, ...]] | None = None,
) -> bytes:
    """Assemble a SEQUENTIAL MULTI-SCAN baseline JPEG.  ``scans`` is a
    list of component-index tuples, one per SOS (default: one scan per
    component).  Single-component scans are non-interleaved over the
    component's UNPADDED block grid (T.81 A.2.2, padding blocks not
    transmitted); multi-component scans are PARTIAL INTERLEAVES over the
    frame's MCU grid (A.2.3 — e.g. luma alone, then both chromas in one
    interleaved scan).  ``comp_coeffs[ci]`` is the component's zigzag
    blocks in RASTER order over the PADDED grid (the
    :func:`encode_progressive_jpeg` storage convention).  Decoded pixels
    equal the one-scan interleaved transmission of the same
    coefficients."""
    ncomp = len(comp_coeffs)
    samp = sampling or [(1, 1)] * ncomp
    mcux, mcuy, geoms = _comp_geoms(w, h, samp)
    coeffs = [
        np.asarray(c, dtype=np.int64).reshape(-1, 64) for c in comp_coeffs
    ]
    if scans is None:
        scans = [(ci,) for ci in range(ncomp)]
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_comps = b"".join(
        struct.pack(">BBB", cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0)
        for cid in range(ncomp)
    )
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS)) + _seg(
        0xC4, _dht_payload(0x10, _AC_BITS, _AC_VALS)
    )
    out = bytearray(b"\xff\xd8" + dqt + sof + dht)
    for sel in scans:
        sos_comps = b"".join(
            struct.pack(">BB", ci + 1, 0x00) for ci in sel
        )
        out += _seg(
            0xDA, bytes([len(sel)]) + sos_comps + bytes([0, 63, 0])
        )
        units = _dc_scan_units(tuple(sel), geoms, mcux, mcuy)
        comp_lists = {ci: [] for ci in sel}
        for unit in units:
            for ci, idx in unit:
                comp_lists[ci].append(coeffs[ci][idx])
        mcu_blocks = (
            [geoms[ci]["hi"] * geoms[ci]["vi"] for ci in sel]
            if len(sel) > 1
            else [1]
        )
        out += encode_scan_blocks(
            [comp_lists[ci] for ci in sel], mcu_blocks
        )
    out += b"\xff\xd9"
    return bytes(out)


def _block_constant_coeffs(plane_vals: np.ndarray) -> list[np.ndarray]:
    """Coefficient blocks for a block-constant plane: DC = 8·(v−128)
    (the exact DCT of a constant block), all AC zero.  ``plane_vals`` is
    the per-block value array in raster (block-row-major) order."""
    out = []
    for v in plane_vals.reshape(-1):
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = 8 * (int(v) - 128)
        out.append(zz)
    return out


def block_value(asset_id: int, chan: int, block_idx: int) -> int:
    """Deterministic per-block plane values.  chan 0/1/2 = Y/Cb/Cr.
    Mirrored arithmetically by the DuckDB oracle."""
    mults = ((7, 13), (11, 5), (3, 17))
    a, b = mults[chan]
    return (a * asset_id + b * block_idx) % 256


def encode_jpeg(asset_id: int) -> bytes:
    """Real colour baseline JPEG (3-component 4:4:4) of the deterministic
    block-constant image: Y/Cb/Cr planes constant per 8×8 block with
    values from :func:`block_value`.  Dims follow the module's
    ``_image_dims`` convention, so partial MCUs (edge crop) are
    exercised."""
    from stockpulse_batch_realtime_etl_spark.operators.multimodal import (
        _image_dims,
    )

    w, h = _image_dims(asset_id)
    cw, ch = (w + 7) // 8, (h + 7) // 8
    comps = [
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, c, b) for b in range(cw * ch)],
                dtype=np.int64,
            )
        )
        for c in range(3)
    ]
    return encode_baseline_jpeg(comps, w, h)


def _image_dims_420(asset_id: int) -> tuple[int, int]:
    """Per-asset dims for the 4:2:0 corpus: larger than the 4:4:4 rung so
    multi-MCU interleave is exercised (up to 3×2 MCUs of 16×16), and
    rarely a multiple of 16 — partial MCUs with padded edge blocks on
    both axes are the norm, not the exception."""
    return 8 + asset_id % 29, 8 + asset_id % 23


def encode_jpeg_420(asset_id: int) -> bytes:
    """Real colour baseline JPEG with 2×2-subsampled chroma (4:2:0) — the
    dominant real-world JPEG shape: each MCU carries four Y blocks (2×2)
    plus one Cb and one Cr block covering the same 16×16 pixels.

    Plane model (mirrored arithmetically by the DuckDB oracle): the Y
    plane is constant per 8×8 block over the MCU-PADDED grid of
    ``2·mcux`` block columns (so pixel (x,y) reads block
    ``(y//8)·2·mcux + x//8``); each chroma plane is constant per chroma
    block = 16×16 luma pixels after 2× nearest-neighbor upsampling (pixel
    (x,y) reads chroma block ``(y//16)·mcux + x//16``).  DC-only blocks +
    unit quant keep the round trip exact."""
    w, h = _image_dims_420(asset_id)
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    # Y: MCU-interleaved order — per MCU (raster), its 2×2 blocks (raster);
    # values indexed over the PADDED 2·mcux-wide grid
    y_vals = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for j in range(4):
            by, bx = divmod(j, 2)
            y_vals.append(
                block_value(
                    asset_id, 0, (my * 2 + by) * (2 * mcux) + (mx * 2 + bx)
                )
            )
    comps = [
        _block_constant_coeffs(np.array(y_vals, dtype=np.int64)),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 1, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 2, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
    ]
    return encode_baseline_jpeg(
        comps, w, h, sampling=[(2, 2), (1, 1), (1, 1)]
    )


def _image_dims_422(asset_id: int) -> tuple[int, int]:
    """Per-asset dims for the 4:2:2 corpus: MCU is 16×8, so widths up to
    44 give 1-3 MCU columns (rarely a multiple of 16 → padded partial
    MCUs on the x axis are the norm) and heights up to 26 give 1-4 MCU
    rows with partial bottom blocks."""
    return 8 + asset_id % 37, 8 + asset_id % 19


#: RSTn cadence of the 4:2:2 corpus: 2 MCUs → most assets carry several
#: in-scan restart markers, so the registered query exercises restart
#: resync COMBINED with an interleaved subsampled scan on every row.
JPEG422_RESTART_INTERVAL = 2


def encode_jpeg_422(asset_id: int) -> bytes:
    """Real colour baseline JPEG with 2×1-subsampled chroma (4:2:2 — the
    broadcast/video-frame shape) AND a declared restart interval: each
    16×8 MCU carries two Y blocks (side by side) plus one Cb and one Cr
    block covering the same pixels, and every
    ``JPEG422_RESTART_INTERVAL`` MCUs the scan byte-aligns through an
    RSTn marker with all DC predictors reset.

    Plane model (mirrored arithmetically by the DuckDB oracle): the Y
    plane is constant per 8×8 block over the MCU-PADDED grid of
    ``2·mcux`` block columns (pixel (x,y) reads block
    ``(y//8)·2·mcux + x//8``); each chroma plane is constant per chroma
    block = 16×8 luma pixels after 2× horizontal nearest-neighbor
    upsampling (pixel (x,y) reads chroma block ``(y//8)·mcux + x//16``).
    DC-only blocks + unit quant keep the round trip exact."""
    w, h = _image_dims_422(asset_id)
    mcux, mcuy = (w + 15) // 16, (h + 7) // 8
    # Y: MCU-interleaved order — per MCU (raster), its 2 blocks
    # left-to-right; values indexed over the PADDED 2·mcux-wide grid
    y_vals = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for j in range(2):
            y_vals.append(
                block_value(asset_id, 0, my * (2 * mcux) + (mx * 2 + j))
            )
    comps = [
        _block_constant_coeffs(np.array(y_vals, dtype=np.int64)),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 1, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 2, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
    ]
    return encode_baseline_jpeg(
        comps,
        w,
        h,
        sampling=[(2, 1), (1, 1), (1, 1)],
        restart_interval=JPEG422_RESTART_INTERVAL,
    )


def _image_dims_411(asset_id: int) -> tuple[int, int]:
    """Per-asset dims for the 4:1:1 corpus: MCU is 32×8, so widths up to
    68 give 1-3 MCU columns (rarely a multiple of 32 → padded partial
    MCUs on the x axis dominate) and heights up to 26 give 1-4 MCU rows
    with partial bottom blocks."""
    return 8 + asset_id % 61, 8 + asset_id % 19


#: RSTn cadence of the 4:1:1 corpus — same rationale as 4:2:2: most
#: assets carry several in-scan restart markers, so restart resync is
#: exercised inside the widest interleave the decoder supports
JPEG411_RESTART_INTERVAL = 2


def encode_jpeg_411(asset_id: int) -> bytes:
    """Real colour baseline JPEG with 4×1-subsampled chroma (4:1:1 — the
    DV / consumer-camcorder shape) AND a declared restart interval: each
    32×8 MCU carries FOUR Y blocks left-to-right plus one Cb and one Cr
    block covering the same pixels — the WIDEST per-MCU interleave
    baseline JPEG allows (hmax = 4), so partial right-edge MCUs pad up
    to three whole Y block columns.

    Plane model (mirrored arithmetically by the DuckDB oracle): the Y
    plane is constant per 8×8 block over the MCU-PADDED grid of
    ``4·mcux`` block columns (pixel (x,y) reads block
    ``(y//8)·4·mcux + x//8``); each chroma plane is constant per chroma
    block = 32×8 luma pixels after 4× horizontal nearest-neighbor
    upsampling (pixel (x,y) reads chroma block ``(y//8)·mcux + x//32``).
    DC-only blocks + unit quant keep the round trip exact."""
    w, h = _image_dims_411(asset_id)
    mcux, mcuy = (w + 31) // 32, (h + 7) // 8
    y_vals = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for j in range(4):
            y_vals.append(
                block_value(asset_id, 0, my * (4 * mcux) + (mx * 4 + j))
            )
    comps = [
        _block_constant_coeffs(np.array(y_vals, dtype=np.int64)),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 1, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
        _block_constant_coeffs(
            np.array(
                [block_value(asset_id, 2, b) for b in range(mcux * mcuy)],
                dtype=np.int64,
            )
        ),
    ]
    return encode_baseline_jpeg(
        comps,
        w,
        h,
        sampling=[(4, 1), (1, 1), (1, 1)],
        restart_interval=JPEG411_RESTART_INTERVAL,
    )


# ---------------------------------------------------------------------------
# Progressive (SOF2) entropy layer — T.81 Annex G.  Spectral selection
# splits each block's zigzag coefficients into per-scan bands [Ss..Se];
# successive approximation transmits them bitplane-wise (first scan at
# point transform Al, then one refinement bit per scan down to Al=0).
# The algorithms below follow the spec's flow charts (G.1.2.2 first
# scans with EOB runs, G.1.2.3 refinement with correction bits) — the
# same flow the public IJG code implements.
# ---------------------------------------------------------------------------


def _comp_geoms(
    w: int, h: int, sampling: list[tuple[int, int]]
) -> tuple[int, int, list[dict]]:
    """Per-component block-grid geometry: MCU grid dims plus each
    component's PADDED (MCU-aligned, used by interleaved scans and by the
    raster coefficient storage) and UNPADDED (true sample dims, used by
    non-interleaved scans per T.81 A.2.2) block grids."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    geoms = []
    for hi, vi in sampling:
        ci_w = (w * hi + hmax - 1) // hmax
        ci_h = (h * vi + vmax - 1) // vmax
        geoms.append(
            {
                "hi": hi,
                "vi": vi,
                "pbx": mcux * hi,
                "pby": mcuy * vi,
                "ubx": (ci_w + 7) // 8,
                "uby": (ci_h + 7) // 8,
            }
        )
    return mcux, mcuy, geoms


def _dc_scan_units(
    comp_sel: tuple[int, ...],
    geoms: list[dict],
    mcux: int,
    mcuy: int,
) -> list[list[tuple[int, int]]]:
    """The block walk of a DC scan as a list of MCU units, each a list of
    (component, raster-storage index) pairs.  Interleaved (ns > 1): every
    image MCU contributes h_i·v_i blocks per component, raster within the
    MCU, indexed into the PADDED grid.  Non-interleaved (ns == 1): one
    block per unit, raster over the component's UNPADDED grid (T.81
    A.2.2) — still indexed into the padded storage rows."""
    if len(comp_sel) > 1:
        units = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            unit = []
            for ci in comp_sel:
                g = geoms[ci]
                for j in range(g["hi"] * g["vi"]):
                    jy, jx = divmod(j, g["hi"])
                    unit.append(
                        (
                            ci,
                            (my * g["vi"] + jy) * g["pbx"]
                            + mx * g["hi"]
                            + jx,
                        )
                    )
            units.append(unit)
        return units
    ci = comp_sel[0]
    g = geoms[ci]
    return [
        [(ci, by * g["pbx"] + bx)]
        for by in range(g["uby"])
        for bx in range(g["ubx"])
    ]


def _ac_block_indices(geom: dict) -> list[int]:
    """Raster-storage indices of a component's UNPADDED block grid — the
    walk of every AC scan (AC scans are always non-interleaved)."""
    return [
        by * geom["pbx"] + bx
        for by in range(geom["uby"])
        for bx in range(geom["ubx"])
    ]


def encode_dc_scan_first(
    coeffs: list[np.ndarray],
    comp_sel: tuple[int, ...],
    geoms: list[dict],
    mcux: int,
    mcuy: int,
    al: int,
    restart_interval: int = 0,
) -> bytes:
    """First DC scan (Ss=Se=0, Ah=0): diff-code each block's DC in the
    point-transformed domain (arithmetic shift right by Al, G.1.1.1.1).
    ``coeffs[ci]`` is the (n_padded, 64) zigzag raster array.  A nonzero
    ``restart_interval`` byte-aligns, emits RSTn, and resets the
    predictors every that many MCUs — encoded as independent chunks,
    bit-identical to an inline encoder (predictor reset + alignment IS
    the per-chunk starting state)."""
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    units = _dc_scan_units(comp_sel, geoms, mcux, mcuy)
    step = restart_interval or len(units)
    out = bytearray()
    for n, start in enumerate(range(0, len(units), step)):
        if n:
            out += bytes([0xFF, 0xD0 + ((n - 1) % 8)])
        w = _BitWriter()
        pred = {ci: 0 for ci in comp_sel}
        for unit in units[start : start + step]:
            for ci, idx in unit:
                v = int(coeffs[ci][idx, 0]) >> al
                diff = v - pred[ci]
                pred[ci] = v
                size = _category(diff)
                code, length = dc_codes[size]
                w.write(code, length)
                if size:
                    raw = diff if diff >= 0 else diff + (1 << size) - 1
                    w.write(raw, size)
        out += w.flush()
    return bytes(out)


def encode_dc_scan_refine(
    coeffs: list[np.ndarray],
    comp_sel: tuple[int, ...],
    geoms: list[dict],
    mcux: int,
    mcuy: int,
    al: int,
    restart_interval: int = 0,
) -> bytes:
    """DC refinement scan (Ss=Se=0, Ah=Al+1): one raw bit per block —
    bit Al of the (two's-complement) DC value.  No Huffman table."""
    units = _dc_scan_units(comp_sel, geoms, mcux, mcuy)
    step = restart_interval or len(units)
    out = bytearray()
    for n, start in enumerate(range(0, len(units), step)):
        if n:
            out += bytes([0xFF, 0xD0 + ((n - 1) % 8)])
        w = _BitWriter()
        for unit in units[start : start + step]:
            for ci, idx in unit:
                w.write((int(coeffs[ci][idx, 0]) >> al) & 1, 1)
        out += w.flush()
    return bytes(out)


def _flush_eobrun(
    w: _BitWriter, eobrun: int, pend: list[int], ac_codes: dict
) -> None:
    """Emit a pending EOBn symbol (run-length category + low bits, T.81
    G.1.2.2) followed by any correction bits buffered against it."""
    if eobrun:
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        w.write(code, length)
        if nbits:
            w.write(eobrun & ((1 << nbits) - 1), nbits)
    for b in pend:
        w.write(b, 1)


def encode_ac_scan_first(
    blocks: np.ndarray, ss: int, se: int, al: int,
    restart_interval: int = 0,
) -> bytes:
    """First AC scan of one spectral band (ns=1, Ah=0): baseline-style
    run/size coding of the point-transformed coefficients
    (sign·(|v|>>Al)), with trailing zeros folded into cross-block EOB
    runs (EOBn).  ``blocks`` is (n_blocks, 64) zigzag, unpadded-grid
    raster order.  A nonzero ``restart_interval`` encodes each k-block
    interval independently (EOB runs cannot cross a restart — the
    per-chunk flush IS the reset) joined by RSTn markers."""
    if restart_interval:
        out = bytearray()
        for n, start in enumerate(range(0, len(blocks), restart_interval)):
            if n:
                out += bytes([0xFF, 0xD0 + ((n - 1) % 8)])
            out += encode_ac_scan_first(
                blocks[start : start + restart_interval], ss, se, al
            )
        return bytes(out)
    ac_codes = _canonical_codes(_ACP_BITS, _ACP_VALS)
    w = _BitWriter()
    eobrun = 0
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        tv = [(-((-v) >> al) if v < 0 else v >> al) for v in band]
        last = -1
        for i, t in enumerate(tv):
            if t:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                _flush_eobrun(w, eobrun, [], ac_codes)
                eobrun = 0
            continue
        _flush_eobrun(w, eobrun, [], ac_codes)
        eobrun = 0
        r = 0
        for i in range(last + 1):
            t = tv[i]
            if t == 0:
                r += 1
                continue
            while r > 15:
                code, length = ac_codes[0xF0]
                w.write(code, length)
                r -= 16
            size = _category(t)
            code, length = ac_codes[(r << 4) | size]
            w.write(code, length)
            raw = t if t >= 0 else t + (1 << size) - 1
            w.write(raw, size)
            r = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                _flush_eobrun(w, eobrun, [], ac_codes)
                eobrun = 0
    _flush_eobrun(w, eobrun, [], ac_codes)
    return w.flush()


def encode_ac_scan_refine(
    blocks: np.ndarray, ss: int, se: int, al: int,
    restart_interval: int = 0,
) -> bytes:
    """AC refinement scan (ns=1, Ah=Al+1, T.81 G.1.2.3): newly-nonzero
    coefficients (|v|>>Al == 1) are coded run/size with size 1 plus a
    sign bit; history-nonzero coefficients contribute one correction bit
    each, buffered and emitted after the next coded symbol (ZRL /
    newly-nonzero / EOBn) in walk order — exactly where the decoder's
    inline reads expect them."""
    if restart_interval:
        out = bytearray()
        for n, start in enumerate(range(0, len(blocks), restart_interval)):
            if n:
                out += bytes([0xFF, 0xD0 + ((n - 1) % 8)])
            out += encode_ac_scan_refine(
                blocks[start : start + restart_interval], ss, se, al
            )
        return bytes(out)
    ac_codes = _canonical_codes(_ACP_BITS, _ACP_VALS)
    w = _BitWriter()
    eobrun = 0
    pend: list[int] = []  # correction bits riding with the pending EOBn
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        t = [abs(v) >> al for v in band]
        eob_idx = -1
        for i, x in enumerate(t):
            if x == 1:
                eob_idx = i
        r = 0
        br: list[int] = []  # correction bits since the last coded symbol
        for i, x in enumerate(t):
            if x == 0:
                r += 1
                continue
            # ZRLs only up to the last newly-nonzero coefficient: beyond
            # it trailing zeros fold into the EOB run instead
            while r > 15 and i <= eob_idx:
                _flush_eobrun(w, eobrun, pend, ac_codes)
                eobrun = 0
                pend = []
                code, length = ac_codes[0xF0]
                w.write(code, length)
                r -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if x > 1:
                br.append(x & 1)
                continue
            _flush_eobrun(w, eobrun, pend, ac_codes)
            eobrun = 0
            pend = []
            code, length = ac_codes[(r << 4) | 1]
            w.write(code, length)
            w.write(1 if band[i] >= 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 900:
                _flush_eobrun(w, eobrun, pend, ac_codes)
                eobrun = 0
                pend = []
    _flush_eobrun(w, eobrun, pend, ac_codes)
    return w.flush()


def encode_progressive_jpeg(
    comp_coeffs: list,
    w: int,
    h: int,
    sampling: list[tuple[int, int]] | None = None,
    dc_quant: int = 1,
    scans: list[tuple[tuple[int, ...], int, int, int, int]] | None = None,
    dc_restart_interval: int = 0,
    ac_restart_interval: int = 0,
) -> bytes:
    """Assemble a complete progressive (SOF2) JPEG.  ``comp_coeffs[ci]``
    is the component's zigzag coefficient blocks in RASTER order over the
    PADDED (MCU-aligned) block grid — (n_padded, 64) array or list of
    64-vectors.  ``scans`` is the scan script as (component indices, Ss,
    Se, Ah, Al) tuples; the default script interleaves a first DC scan at
    Al=2 with two refinement passes, then spectral-band AC first scans at
    Al=1 per component followed by their refinements — the classic
    libjpeg-style progression shape.  ``dc_quant`` is the DC quantizer
    (AC stay 1); ``dc_restart_interval`` puts RSTn markers in the DC
    scans (a DRI 0 segment then disables them before the first AC scan,
    exercising mid-stream DRI redefinition)."""
    ncomp = len(comp_coeffs)
    samp = sampling or [(1, 1)] * ncomp
    mcux, mcuy, geoms = _comp_geoms(w, h, samp)
    coeffs = [
        np.asarray(c, dtype=np.int64).reshape(-1, 64) for c in comp_coeffs
    ]
    for ci, g in enumerate(geoms):
        if coeffs[ci].shape[0] != g["pbx"] * g["pby"]:
            raise ValueError(
                f"component {ci}: expected {g['pbx'] * g['pby']} padded "
                f"blocks, got {coeffs[ci].shape[0]}"
            )
    if scans is None:
        # generic default progression for ANY component count (JPEG
        # allows up to 4 per interleaved scan): interleaved DC first
        # scan + refinement ladder, then per-component AC band scans
        # (component 0 split into two spectral bands) + refinements
        if ncomp > 4:
            # the default script opens with an interleaved DC scan over
            # all components; T.81 B.2.3 caps Ns at 4 — emitting more
            # would be a silently invalid stream
            raise ValueError(
                "progressive default script supports at most 4 components"
            )
        allc = tuple(range(ncomp))
        if ncomp == 1:
            scans = [
                ((0,), 0, 0, 0, 1),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 0, 1),
                ((0,), 1, 63, 1, 0),
            ]
        else:
            # one band list, instantiated for the first scans (Ah=0,
            # Al=1) and their refinements (Ah=1, Al=0) so the two
            # ladders can never desync
            bands = (
                [((0,), 1, 5)]
                + [((ci,), 1, 63) for ci in range(1, ncomp)]
                + [((0,), 6, 63)]
            )
            scans = [
                (allc, 0, 0, 0, 2),
                (allc, 0, 0, 2, 1),
                (allc, 0, 0, 1, 0),
            ] + [
                (sel, ss, se, ah, al)
                for ah, al in ((0, 1), (1, 0))
                for sel, ss, se in bands
            ]
    qtbl = [1] * 64
    qtbl[0] = dc_quant
    dqt = _seg(0xDB, bytes([0x00]) + bytes(qtbl))
    sof_comps = b"".join(
        struct.pack(">BBB", cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0)
        for cid in range(ncomp)
    )
    sof = _seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    dht = _seg(0xC4, _dht_payload(0x00, _DC_BITS, _DC_VALS)) + _seg(
        0xC4, _dht_payload(0x10, _ACP_BITS, _ACP_VALS)
    )
    out = bytearray(b"\xff\xd8" + dqt + sof + dht)
    cur_dri = 0
    for comp_sel, ss, se, ah, al in scans:
        want_dri = dc_restart_interval if ss == 0 else ac_restart_interval
        if want_dri != cur_dri:
            out += _seg(0xDD, struct.pack(">H", want_dri))
            cur_dri = want_dri
        sos_comps = b"".join(
            struct.pack(">BB", ci + 1, 0x00) for ci in comp_sel
        )
        out += _seg(
            0xDA,
            bytes([len(comp_sel)])
            + sos_comps
            + bytes([ss, se, (ah << 4) | al]),
        )
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            if ah == 0:
                out += encode_dc_scan_first(
                    coeffs, comp_sel, geoms, mcux, mcuy, al, want_dri
                )
            else:
                out += encode_dc_scan_refine(
                    coeffs, comp_sel, geoms, mcux, mcuy, al, want_dri
                )
        else:
            if len(comp_sel) != 1:
                raise ValueError("AC scans are single-component")
            blocks = coeffs[comp_sel[0]][_ac_block_indices(geoms[comp_sel[0]])]
            if ah == 0:
                out += encode_ac_scan_first(blocks, ss, se, al, want_dri)
            else:
                out += encode_ac_scan_refine(blocks, ss, se, al, want_dri)
    out += b"\xff\xd9"
    return bytes(out)


def _image_dims_prog(asset_id: int) -> tuple[int, int]:
    """Per-asset dims for the progressive corpus: 4:2:0 MCUs of 16×16,
    widths 8..48 and heights 8..24 → 1-3 MCU columns / 1-2 rows with
    partial edge MCUs the norm (distinct moduli from every other rung so
    the query is not a re-label of an existing one)."""
    return 8 + asset_id % 41, 8 + asset_id % 17


def encode_jpeg_progressive(asset_id: int) -> bytes:
    """Real PROGRESSIVE (SOF2) colour JPEG with 4:2:0 chroma: the same
    block-constant plane model as the 4:2:0 rung (Y constant per 8×8
    block over the MCU-padded 2·mcux-wide grid, chroma per 16×16), but
    transmitted as an 11-scan progression — interleaved DC first scan at
    Al=2 plus two DC refinement passes (real bitplane data: the DC
    quantizer is 8, so the stored DC value is v−128 with live low bits),
    then per-component spectral-band AC scans and their refinements
    (all-zero AC → cross-block EOB runs, the progressive-only code path).
    Decoded pixels are IDENTICAL to a baseline encode of the same
    coefficients, so the DuckDB oracle replays the same 4:2:0 pixel
    arithmetic with this rung's dims."""
    w, h = _image_dims_prog(asset_id)
    mcux, mcuy, geoms = _comp_geoms(w, h, [(2, 2), (1, 1), (1, 1)])
    comps = []
    for ci, g in enumerate(geoms):
        n = g["pbx"] * g["pby"]
        arr = np.zeros((n, 64), dtype=np.int64)
        # raster storage == the oracle's block index directly: Y block
        # (y//8)·(2·mcux)+(x//8), chroma block (y//16)·mcux+(x//16)
        for idx in range(n):
            arr[idx, 0] = block_value(asset_id, ci, idx) - 128
        comps.append(arr)
    return encode_progressive_jpeg(
        comps,
        w,
        h,
        sampling=[(2, 2), (1, 1), (1, 1)],
        dc_quant=8,
    )


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis matrix M (M[0]=1/√8)."""
    x = np.arange(8, dtype=np.float64)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] = 1.0 / np.sqrt(8.0)
    return m


_IDCT_M = _idct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an 8×8 coefficient block (raster order)."""
    return _IDCT_M.T @ block @ _IDCT_M


def decode_scan(
    data: bytes,
    pos: int,
    n_blocks: int,
    ncomp: int,
    dc_tables: list[dict],
    ac_tables: list[dict],
    restart_interval: int = 0,
    mcu_blocks: list[int] | None = None,
) -> list[list[np.ndarray]]:
    """Entropy-decode ``n_blocks`` interleaved MCUs starting at ``pos``;
    returns per-component lists of zigzag-order coefficient blocks (the
    exact inverse of :func:`encode_scan_blocks`).  ``mcu_blocks[i]`` is
    component ``i``'s blocks per MCU (h_i·v_i; default 1 each) — the DC
    predictor is per-component across the whole scan, shared by all of a
    component's blocks within an MCU (T.81 F.2.1.3.1).

    Restart markers: with a DRI declared, the reader RESYNCS at the
    interval cadence — byte-aligns (discarding the flush padding bits,
    which with short-code DHTs could otherwise decode as a spurious MCU)
    and consumes the RSTn before touching the next interval's data.  An
    RSTn encountered OUTSIDE the declared cadence (or with no DRI) still
    resets the predictors defensively, rolling back any partially decoded
    MCU so the component lists cannot desync."""
    counts = mcu_blocks or [1] * ncomp
    r = _BitReader(data, pos)
    out: list[list[np.ndarray]] = [[] for _ in range(ncomp)]
    pred = [0] * ncomp
    done = 0
    while done < n_blocks:
        mcu_mark = [len(c) for c in out]
        try:
            for ci in range(ncomp):
                for _ in range(counts[ci]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = r.huffman(dc_tables[ci])
                    diff = _extend(r.bits(size), size) if size else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = r.huffman(ac_tables[ci])
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, size = rs >> 4, rs & 0x0F
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        zz[k] = _extend(r.bits(size), size)
                        k += 1
                    out[ci].append(zz)
            done += 1
            if (
                restart_interval
                and done % restart_interval == 0
                and done < n_blocks
            ):
                r.consume_restart()
                pred = [0] * ncomp
        except _RestartMarker:
            # out-of-cadence RSTn: discard the partial MCU, resync
            for ci, mark in enumerate(mcu_mark):
                del out[ci][mark:]
            pred = [0] * ncomp
            r.byte_align()
    return out


def _reconstruct_from_raster(
    qt: dict,
    comps: list,
    w: int,
    h: int,
    mcux: int,
    mcuy: int,
    raster: list[np.ndarray],
) -> dict:
    """Shared back half of both decode paths: per-component dequantize →
    de-zigzag → IDCT → fixed-point snap → crop → upsample → level shift,
    then grayscale clamp or JFIF YCbCr→RGB.  ``raster[ci]`` is the
    component's zigzag coefficient blocks in RASTER order over its padded
    (MCU-aligned) grid."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    ncomp = len(comps)
    if ncomp not in (1, 3):
        # 2-component frames have no defined colour semantics and
        # 4-component ones are CMYK/Adobe-transform territory — an honest
        # seam, not an unpacking crash in the colour transform below
        raise NotImplementedError(
            f"JPEG with {ncomp} components (grayscale and YCbCr only)"
        )
    planes = []
    for ci, (_cid, tq, hi, vi) in enumerate(comps):
        q = qt[tq]
        pbx = mcux * hi
        plane = np.zeros((mcuy * vi * 8, pbx * 8), dtype=np.float64)
        for idx in range(raster[ci].shape[0]):
            zz = raster[ci][idx]
            rasterblk = np.zeros(64, dtype=np.int64)
            rasterblk[ZIGZAG] = zz * q
            gy, gx = divmod(idx, pbx)
            plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = _idct2(
                rasterblk.reshape(8, 8).astype(np.float64)
            )
        # fixed-point reconstruction at 20 fractional bits (the
        # hardware-integer-IDCT convention): snaps the ~1e-13
        # float-matmul residue so integer-valued reconstructions
        # are EXACT integers before the colour transform — which
        # is what lets the DuckDB oracle replay the downstream
        # double arithmetic bit-identically
        plane = np.round(plane * (1 << 20)) / (1 << 20)
        # crop the padding to the component's true sample dims,
        # then nearest-neighbor upsample back to full resolution
        # (pixel (x,y) reads sample (x·h_i//hmax, y·v_i//vmax))
        ci_w = (w * hi + hmax - 1) // hmax
        ci_h = (h * vi + vmax - 1) // vmax
        plane = plane[:ci_h, :ci_w]
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0),
                hmax // hi,
                axis=1,
            )
        planes.append(plane[:h, :w] + 128.0)
    if ncomp == 1:
        vals = np.clip(np.floor(planes[0] + 0.5), 0, 255)
        return {
            "width": w,
            "height": h,
            "vals": vals.reshape(-1).astype(np.int64),
        }
    y, cb, cr = planes
    r_ = y + _CR_R * (cr - 128.0)
    g_ = y - _CB_G * (cb - 128.0) - _CR_G * (cr - 128.0)
    b_ = y + _CB_B * (cb - 128.0)
    rgb = np.stack(
        [
            np.clip(np.floor(r_ + 0.5), 0, 255),
            np.clip(np.floor(g_ + 0.5), 0, 255),
            np.clip(np.floor(b_ + 0.5), 0, 255),
        ],
        axis=-1,
    )
    return {
        "width": w,
        "height": h,
        "vals": rgb.reshape(-1).astype(np.int64),
    }


def decode_jpeg_bytes(payload: bytes) -> dict:
    """Real JPEG decode — baseline (SOF0) AND progressive (SOF2): marker
    walk, DQT/DHT/SOF/SOS parse,
    Huffman entropy decode, dequantize, de-zigzag, IDCT, level shift,
    ``floor(x+0.5)`` round + clamp, JFIF YCbCr→RGB for colour.  Returns
    ``{width, height, vals}`` with ``vals`` int64 row-major (RGB
    interleaved for colour, single channel for grayscale) — the
    multimodal.decode_image_bytes contract.

    TOTALITY on untrusted bytes: every corrupt-input failure surfaces as
    the module's unified ``ValueError`` (``NotImplementedError`` stays
    the honest format-boundary signal).  Arbitrary byte corruption can
    otherwise reach low-level parse errors — a truncated segment's
    ``struct.error``, a missing Huffman table's ``KeyError``, a flipped
    length field's ``IndexError``/``OverflowError`` — and the
    mapInPandas codec seam routes failures to the DLQ by exception type
    (fuzzed by test_jpeg_decoder_total_on_corrupt_inputs)."""
    try:
        return _decode_jpeg_unchecked(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(
            f"corrupt JPEG ({type(e).__name__}: {e})"
        ) from e


def _parse_sof(body: bytes) -> tuple[int, int, list]:
    """Parse a SOF0/SOF2 frame header body into (w, h, comps) with the
    module's precision/sampling validation."""
    prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
    if prec != 8:
        raise NotImplementedError(f"JPEG precision {prec}")
    # corrupt-header plausibility cap (shared with the other containers):
    # SOF dims drive the MCU-grid coefficient allocations, and a flipped
    # dims field would demand gigabytes before any scan decodes —
    # MemoryError is outside the DLQ taxonomy, ValueError dead-letters
    from stockpulse_batch_realtime_etl_spark.operators.multimodal import (
        _check_pixel_budget,
    )

    _check_pixel_budget(w * h, "JPEG SOF header")
    if ncomp not in (1, 3):
        # reject CMYK/2-component frames at the header, BEFORE any scan's
        # entropy decode — reconstruction has the same guard as defense
        raise NotImplementedError(
            f"JPEG with {ncomp} components (grayscale and YCbCr only)"
        )
    comps = []
    for c in range(ncomp):
        cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
        comps.append((cid, tq, samp >> 4, samp & 0x0F))
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _cid, _tq, hi, vi in comps:
        if not (1 <= hi <= 4 and 1 <= vi <= 4) or (hmax % hi or vmax % vi):
            raise NotImplementedError(
                f"JPEG sampling factors {hi}x{vi} (max "
                f"{hmax}x{vmax}): only integer-ratio subsampling "
                "is supported"
            )
    return w, h, comps


def _skip_to_marker(payload: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos``: skips entropy
    bytes, stuffed 0xFF00, in-scan RSTn, and 0xFF fill bytes."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("JPEG truncated after scan data")


def _decode_progressive_scan(
    payload: bytes,
    data_pos: int,
    body: bytes,
    comps: list,
    prog_geom: tuple,
    prog: list[np.ndarray],
    huff: dict,
    restart: int,
) -> int:
    """Decode ONE scan of a progressive frame into the per-component
    coefficient accumulators (T.81 Annex G) and return the payload
    position of the next marker.  DC scans (Ss=Se=0) may be interleaved;
    AC scans are single-component over the unpadded block grid.  First
    scans (Ah=0) Huffman-decode point-transformed values (DC diffs /
    AC run-size with EOBn end-of-band runs); refinement scans (Ah=Al+1)
    add one bitplane — a raw bit per DC, and for AC the correction-bit
    walk of G.1.2.3.  A declared restart interval resyncs the reader
    (byte-align + RSTn) and resets predictors/EOB run at its cadence."""
    mcux, mcuy, geoms = prog_geom
    ns = body[0]
    sel: list[tuple[int, int, int]] = []  # (comp index, Td, Ta)
    by_cid = {c[0]: i for i, c in enumerate(comps)}
    for c in range(ns):
        cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * c)
        if cs not in by_cid:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        sel.append((by_cid[cs], tdta >> 4, tdta & 0x0F))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if al > 13 or (ah and ah != al + 1):
        raise ValueError(f"JPEG bad successive approximation Ah={ah} Al={al}")
    r = _BitReader(payload, data_pos)
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("JPEG DC scan with Se != 0")
            comp_sel = tuple(ci for ci, _, _ in sel)
            units = _dc_scan_units(comp_sel, geoms, mcux, mcuy)
            dc_tbl = {ci: huff.get((0, td)) for ci, td, _ in sel}
            if ah == 0 and any(t is None for t in dc_tbl.values()):
                raise ValueError("JPEG scan references undefined DC table")
            pred = {ci: 0 for ci in comp_sel}
            for n, unit in enumerate(units):
                if restart and n and n % restart == 0:
                    r.consume_restart()
                    pred = {ci: 0 for ci in comp_sel}
                for ci, idx in unit:
                    if ah == 0:
                        size = r.huffman(dc_tbl[ci])
                        diff = _extend(r.bits(size), size) if size else 0
                        pred[ci] += diff
                        prog[ci][idx, 0] = pred[ci] << al
                    elif r.bits(1):
                        prog[ci][idx, 0] |= 1 << al
        else:
            if ns != 1:
                raise ValueError("JPEG AC scan must be single-component")
            if not (ss <= se <= 63):
                raise ValueError(f"JPEG bad spectral band {ss}..{se}")
            ci, _td, ta = sel[0]
            ac_tbl = huff.get((1, ta))
            if ac_tbl is None:
                raise ValueError("JPEG scan references undefined AC table")
            p1, m1 = 1 << al, -(1 << al)
            eobrun = 0
            for n, idx in enumerate(_ac_block_indices(geoms[ci])):
                if restart and n and n % restart == 0:
                    r.consume_restart()
                    eobrun = 0
                coef = prog[ci][idx]
                if ah == 0:
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = r.huffman(ac_tbl)
                        run, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (
                                (1 << run)
                                + (r.bits(run) if run else 0)
                                - 1
                            )
                            break
                        k += run
                        if k > se:
                            raise ValueError("JPEG AC band overrun")
                        coef[k] = _extend(r.bits(s), s) << al
                        k += 1
                else:
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = r.huffman(ac_tbl)
                            run, s = rs >> 4, rs & 0x0F
                            sval = 0
                            if s:
                                if s != 1:
                                    raise ValueError(
                                        "JPEG refinement AC size != 1"
                                    )
                                sval = p1 if r.bits(1) else m1
                            elif run != 15:
                                eobrun = (1 << run) + (
                                    r.bits(run) if run else 0
                                )
                                break
                            # advance: correction bits for history-nonzero
                            # coefficients; stop at the run-th zero (the
                            # new coefficient's home, or 16 skips for ZRL)
                            while k <= se:
                                if coef[k]:
                                    if r.bits(1) and not (
                                        int(coef[k]) & p1
                                    ):
                                        coef[k] += p1 if coef[k] > 0 else m1
                                else:
                                    run -= 1
                                    if run < 0:
                                        break
                                k += 1
                            if sval:
                                if k > se:
                                    raise ValueError("JPEG AC band overrun")
                                coef[k] = sval
                            k += 1
                    if eobrun:
                        while k <= se:
                            if coef[k]:
                                if r.bits(1) and not (int(coef[k]) & p1):
                                    coef[k] += p1 if coef[k] > 0 else m1
                            k += 1
                        eobrun -= 1
    except _RestartMarker:
        raise ValueError("JPEG unexpected restart marker in scan") from None
    return _skip_to_marker(payload, r._pos)


def _decode_jpeg_unchecked(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    progressive = False
    prog: list[np.ndarray] | None = None  # per-comp (n_padded, 64) zigzag
    prog_geom = None  # (mcux, mcuy, geoms) once the first SOS arrives
    eoi = False  # multi-scan frames reconstruct at EOI — reaching it matters
    scanned_ids: set[int] = set()  # component ids that received ≥1 scan
    # component ids whose DC coefficient received ≥1 scan (Ss == 0).  Per
    # T.81 G.1.1.1.1 a component's FIRST progressive scan must be its DC
    # scan, so a component that only ever appeared in AC scans would
    # reconstruct with a silent all-zero DC plane — the same
    # silent-partial class as the any-scan check below, tracked
    # separately.  AC scans are NOT required: a DC-only progression is a
    # valid (low-detail) complete stream.
    dc_scanned_ids: set[int] = set()
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            eoi = True
            break
        if pos + 4 > len(payload):
            # an incomplete segment header must not silently end the walk:
            # a multi-scan frame would otherwise reconstruct from a PARTIAL
            # coefficient accumulator (same silent-lenience class the repo
            # dead-letters elsewhere — PPM tokens, 24-bit WAV tails)
            raise ValueError("JPEG truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq == 0:
                    tbl = np.frombuffer(
                        body, np.uint8, 64, bpos + 1
                    ).astype(np.int64)
                    bpos += 65
                else:
                    tbl = np.frombuffer(
                        body[bpos + 1 : bpos + 129], ">u2"
                    ).astype(np.int64)
                    bpos += 129
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                if bpos + 17 > len(body):
                    # slicing would silently shorten bits/vals and crash
                    # _canonical_codes with an IndexError — corrupt-file
                    # paths must stay inside the unified ValueError contract
                    raise ValueError("JPEG DHT segment truncated")
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("JPEG DHT segment truncated")
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                bpos += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            sof = _parse_sof(body)
        elif marker == 0xC2:  # SOF2 progressive
            sof = _parse_sof(body)
            progressive = True
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"unsupported JPEG frame type (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI: restart cadence for the scan decoder
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA and progressive:  # one scan of a progression
            w, h, comps = sof
            if prog is None:
                mcux_, mcuy_, geoms_ = _comp_geoms(
                    w, h, [(hi, vi) for _, _, hi, vi in comps]
                )
                prog_geom = (mcux_, mcuy_, geoms_)
                prog = [
                    np.zeros(
                        (g["pbx"] * g["pby"], 64), dtype=np.int64
                    )
                    for g in geoms_
                ]
            scanned_ids.update(body[1 + 2 * c] for c in range(body[0]))
            # Only an INITIAL DC scan (Ss == 0 AND Ah == 0) establishes a
            # component's DC plane; a DC *refinement* scan (Ss == 0,
            # Ah != 0) only appends low-order bits, so a stream whose sole
            # DC scan for a component is a refinement violates T.81
            # G.1.1.1.1 just like AC-before-DC does — it would otherwise
            # "refine" an all-zero base and pass the coverage check.
            if (
                body[1 + 2 * body[0]] == 0  # Ss == 0: a DC scan
                and body[3 + 2 * body[0]] >> 4 == 0  # Ah == 0: initial
            ):
                dc_scanned_ids.update(
                    body[1 + 2 * c] for c in range(body[0])
                )
            pos = _decode_progressive_scan(
                payload, pos + 2 + seglen, body, comps, prog_geom, prog,
                huff, restart,
            )
            continue
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            w, h, comps = sof
            ns = body[0]
            scan_tables = []
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * c)
                scan_tables.append((tdta >> 4, tdta & 0x0F))
            ncomp = len(comps)
            if ns != ncomp:
                # T.81 allows a BASELINE frame to spread its components
                # over SEVERAL sequential scans: one per component
                # (non-interleaved, A.2.2 — blocks walk the component's
                # unpadded grid) or any partial interleave (A.2.3 — MCUs
                # of just the selected components over the frame's MCU
                # grid).  Decode this scan into the per-component
                # accumulator — same storage the progressive path uses —
                # and continue the marker walk; reconstruction happens
                # at EOI.  The unit walk is shared with progressive DC
                # scans (_dc_scan_units implements both A.2.2 and A.2.3).
                if prog is None:
                    mcux_, mcuy_, geoms_ = _comp_geoms(
                        w, h, [(hi, vi) for _, _, hi, vi in comps]
                    )
                    prog_geom = (mcux_, mcuy_, geoms_)
                    prog = [
                        np.zeros(
                            (g["pbx"] * g["pby"], 64), dtype=np.int64
                        )
                        for g in geoms_
                    ]
                by_cid = {c[0]: i for i, c in enumerate(comps)}
                comp_sel = []
                for c in range(ns):
                    cs_c = body[1 + 2 * c]
                    if cs_c not in by_cid:
                        raise ValueError(
                            f"JPEG scan references unknown component {cs_c}"
                        )
                    comp_sel.append(by_cid[cs_c])
                    scanned_ids.add(cs_c)
                    dc_scanned_ids.add(cs_c)  # sequential scans carry DC+AC
                units = _dc_scan_units(
                    tuple(comp_sel), prog_geom[2], prog_geom[0], prog_geom[1]
                )
                dc_t = {
                    ci: huff[(0, scan_tables[k][0])]
                    for k, ci in enumerate(comp_sel)
                }
                ac_t = {
                    ci: huff[(1, scan_tables[k][1])]
                    for k, ci in enumerate(comp_sel)
                }
                r = _BitReader(payload, pos + 2 + seglen)
                pred = {ci: 0 for ci in comp_sel}
                try:
                    for n_u, unit in enumerate(units):
                        if restart and n_u and n_u % restart == 0:
                            r.consume_restart()
                            pred = {ci: 0 for ci in comp_sel}
                        for ci, idx in unit:
                            zz = prog[ci][idx]
                            size = r.huffman(dc_t[ci])
                            diff = (
                                _extend(r.bits(size), size) if size else 0
                            )
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = r.huffman(ac_t[ci])
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                run, sz = rs >> 4, rs & 0x0F
                                k += run
                                if k > 63:
                                    raise ValueError(
                                        "JPEG AC coefficient overrun"
                                    )
                                zz[k] = _extend(r.bits(sz), sz)
                                k += 1
                except _RestartMarker:
                    raise ValueError(
                        "JPEG unexpected restart marker in scan"
                    ) from None
                pos = _skip_to_marker(payload, r._pos)
                continue
            if ns == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved —
                # one data unit per MCU and a ceil(w/8)×ceil(h/8) block
                # grid regardless of the declared sampling factors (legal
                # grayscale files may declare 2×2); normalizing the
                # factors to 1×1 makes the generic MCU walk below exactly
                # that grid, and (ncomp == 1) no chroma upsampling runs
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coeffs = decode_scan(
                payload,
                pos + 2 + seglen,
                mcux * mcuy,
                ncomp,
                [huff[(0, t[0])] for t in scan_tables],
                [huff[(1, t[1])] for t in scan_tables],
                restart,
                mcu_blocks=[hi * vi for _, _, hi, vi in comps],
            )
            # convert the scan's MCU-interleaved block lists to raster
            # order over the padded grid, then share the back half with
            # the progressive path
            raster = []
            for ci, (_cid, _tq, hi, vi) in enumerate(comps):
                pbx = mcux * hi
                arr = np.zeros((pbx * mcuy * vi, 64), dtype=np.int64)
                for b, zz in enumerate(coeffs[ci]):
                    m, j = divmod(b, hi * vi)
                    my, mx = divmod(m, mcux)
                    jy, jx = divmod(j, hi)
                    arr[(my * vi + jy) * pbx + mx * hi + jx] = zz
                raster.append(arr)
            return _reconstruct_from_raster(
                qt, comps, w, h, mcux, mcuy, raster
            )
        pos += 2 + seglen
    if prog is not None:
        # progressive frame, or a sequential multi-scan baseline frame —
        # either way the coefficients accumulated per component.  Both
        # reconstruct AT EOI, so a walk that ended any other way (payload
        # exhausted mid-stream) or a frame component that never received a
        # scan (its plane would silently decode all-zero) is corrupt input,
        # not a shorter progression.
        if not eoi:
            raise ValueError("JPEG multi-scan stream ended without EOI")
        w, h, comps = sof
        missing = [c[0] for c in comps if c[0] not in scanned_ids]
        if missing:
            raise ValueError(
                f"JPEG frame components with no scan: {missing}"
            )
        missing_dc = [c[0] for c in comps if c[0] not in dc_scanned_ids]
        if missing_dc:
            raise ValueError(
                "JPEG frame components with AC scans but no DC scan "
                f"(T.81 G.1.1.1.1): {missing_dc}"
            )
        mcux, mcuy, _geoms = prog_geom
        return _reconstruct_from_raster(qt, comps, w, h, mcux, mcuy, prog)
    raise ValueError("JPEG missing SOS scan")
