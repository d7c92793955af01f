"""CCITT fax codecs (T.4 Modified Huffman / T.6 Group 4) + bilevel TIFF."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stockpulse_batch_realtime_etl_spark.operators import ccitt, multimodal


def test_fax_tables_self_check():
    """Cardinalities and prefix-freeness — both directions are built
    from the same tables, so the import-time audit is the transcription
    guard; re-run it explicitly."""
    ccitt._check_tables()
    assert len(ccitt._WHITE_DEC) == 64 + 27 + 13
    assert len(ccitt._BLACK_DEC) == 64 + 27 + 13


def test_mh_known_vectors():
    """Published T.4 codes pin external fidelity (not just round-trip):
    an all-white 1728 row is makeup-1728 + white-terminating-0; a
    single black pixel row is white-0, black-1."""
    enc = ccitt.mh_encode(np.zeros((1, 1728), np.int64))
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("010011011" + "00110101")
    enc = ccitt.mh_encode(np.array([[1]], np.int64))
    bits = "".join(f"{b:08b}" for b in enc)
    # white run 0 = 00110101, black run 1 = 010
    assert bits.startswith("00110101" + "010")


def test_g4_known_vectors():
    """All-white rows code as one V0 bit each (the classic G4
    property); EOFB is two EOLs."""
    enc = ccitt.g4_encode(np.zeros((4, 64), np.int64), eofb=True)
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("1111" + "000000000001" + "000000000001")


def test_mh_round_trip_fuzz():
    rng = np.random.default_rng(3)
    for trial in range(60):
        w = int(rng.integers(1, 260))
        n = int(rng.integers(1, 7))
        rows = (rng.random((n, w)) < rng.random()).astype(np.int64)
        dec = ccitt.mh_decode(ccitt.mh_encode(rows), w, n)
        np.testing.assert_array_equal(dec, rows, err_msg=f"trial {trial}")
    # makeup + extended-makeup widths, both solid colors and stripes
    for w in (64, 1728, 1729, 1791, 1792, 2560, 2623, 2624, 6000):
        for rows in (
            np.zeros((2, w), np.int64),
            np.ones((2, w), np.int64),
            (np.arange(2 * w).reshape(2, w) // 7 % 2).astype(np.int64),
        ):
            np.testing.assert_array_equal(
                ccitt.mh_decode(ccitt.mh_encode(rows), w, 2), rows,
                err_msg=str(w),
            )


def test_g4_round_trip_fuzz():
    rng = np.random.default_rng(5)
    for trial in range(120):
        w = int(rng.integers(1, 200))
        n = int(rng.integers(1, 9))
        rows = (rng.random((n, w)) < rng.random()).astype(np.int64)
        dec = ccitt.g4_decode(ccitt.g4_encode(rows, eofb=bool(trial % 2)), w, n)
        np.testing.assert_array_equal(dec, rows, err_msg=f"trial {trial}")
    for w in (1, 5, 64, 1729, 2700):
        k = np.arange(4 * w).reshape(4, w)
        rows = ((k // 4 + k // w) % 3 == 0).astype(np.int64)
        np.testing.assert_array_equal(
            ccitt.g4_decode(ccitt.g4_encode(rows), w, 4), rows, err_msg=str(w)
        )


def test_fax_corrupt_streams_dead_letter():
    """Truncation, invalid codes, row overruns, and trailing garbage
    all raise ValueError — never hang or return short grids."""
    rows = (np.arange(60).reshape(3, 20) % 3 == 0).astype(np.int64)
    mh, g4 = ccitt.mh_encode(rows), ccitt.g4_encode(rows)
    with pytest.raises(ValueError):
        ccitt.mh_decode(mh[:2], 20, 3)
    with pytest.raises(ValueError):
        ccitt.g4_decode(g4[: max(1, len(g4) // 2)], 20, 3)
    # wrong declared width makes runs overrun the row
    with pytest.raises(ValueError):
        ccitt.mh_decode(mh, 10, 3)
    with pytest.raises(ValueError):
        ccitt.g4_decode(g4, 10, 3)
    # trailing garbage after the last row
    with pytest.raises(ValueError, match="trailing"):
        ccitt.mh_decode(mh + b"\xff", 20, 3)
    with pytest.raises(ValueError):
        ccitt.g4_decode(g4 + b"\xff\xff\xff\xff", 20, 3)
    # an invalid (all-ones) stream hits an invalid code, not a loop
    with pytest.raises(ValueError):
        ccitt.mh_decode(b"\xff" * 8, 64, 1)


def test_bilevel_tiff_round_trip_and_corpus():
    """Bilevel TIFF end-to-end: packed rows + both fax compressions,
    both endians, multi-strip; corpus overlay slots decode to the
    closed form through the generic image decoder."""
    rng = np.random.default_rng(9)
    for trial in range(10):
        w = int(rng.integers(1, 70))
        h = int(rng.integers(1, 20))
        stored = rng.random((h, w)) < rng.random()  # 1 = black
        for e in ("<", ">"):
            for comp in (1, 2, 4):
                d = multimodal.decode_tiff_bytes(multimodal._encode_tiff(
                    stored, e, 4, photometric=0, compression=comp
                ))
                np.testing.assert_array_equal(
                    d["vals"], 1 - stored.astype(np.int64).reshape(-1),
                    err_msg=f"{trial}/{e}/{comp}",
                )
    # photometric 1: stored bit IS the intensity
    stored = np.arange(40).reshape(5, 8) % 3 == 0
    d = multimodal.decode_tiff_bytes(
        multimodal._encode_tiff(stored, "<", 2, photometric=1, compression=1)
    )
    np.testing.assert_array_equal(d["vals"], stored.astype(np.int64).reshape(-1))
    # corpus overlays: uncompressed (59), G4 (109), MH (69)
    for aid, comp in ((59, 1), (109, 4), (69, 2)):
        payload = multimodal.encode_tiff(aid)
        d = multimodal.decode_image_bytes(payload)
        w, h = multimodal._image_dims(aid)
        i = np.arange(w * h, dtype=np.int64)
        np.testing.assert_array_equal(
            d["vals"], ((3 * aid + i // 4) % 7 < 3).astype(np.int64),
            err_msg=str(aid),
        )
        # the compression tag really is the fax code claimed
        e = "<" if aid % 2 == 0 else ">"
        (ifd,) = struct.unpack_from(f"{e}I", payload, 4)
        (n,) = struct.unpack_from(f"{e}H", payload, ifd)
        tags = {}
        for k in range(n):
            tag, typ, cnt, = struct.unpack_from(f"{e}HHI", payload, ifd + 2 + 12 * k)
            (val,) = struct.unpack_from(f"{e}H", payload, ifd + 2 + 12 * k + 8)
            tags[tag] = val
        assert tags[259] == comp and tags[258] == 1 and tags[262] == 0


def test_bilevel_tiff_seams_and_corrupt_shapes():
    """Honest boundaries and corrupt edges of the bilevel path."""
    stored = np.arange(48).reshape(6, 8) % 3 == 0
    good = multimodal._encode_tiff(stored, "<", 2, photometric=0, compression=4)
    # missing BitsPerSample defaults to bilevel (TIFF 6.0 §4) — strip
    # the tag from an uncompressed file and it must still decode
    packed = multimodal._encode_tiff(stored, "<", 2, photometric=0, compression=1)
    buf = bytearray(packed)
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    for k in range(n):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 258:
            struct.pack_into("<H", buf, pos, 32767)  # unknown private tag
    d = multimodal.decode_tiff_bytes(bytes(buf))
    np.testing.assert_array_equal(
        d["vals"], 1 - stored.astype(np.int64).reshape(-1)
    )
    # CCITT with photometric 1 is a seam
    buf = bytearray(good)
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    for k in range(n):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 262:
            struct.pack_into("<H", buf, pos + 8, 1)
    with pytest.raises(NotImplementedError, match="CCITT compression with"):
        multimodal.decode_tiff_bytes(bytes(buf))
    # CCITT on a non-bilevel page is a seam (depth 8 + compression 4)
    gray = ((7 + 13 * np.arange(48, dtype=np.int64)) % 256).reshape(6, 8)
    buf = bytearray(multimodal._encode_tiff(
        gray.astype(np.uint8), "<", 2, photometric=1, compression=1
    ))
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    for k in range(n):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 259:
            struct.pack_into("<H", buf, pos + 8, 4)
    with pytest.raises((NotImplementedError, ValueError)):
        multimodal.decode_tiff_bytes(bytes(buf))
    # encoder guards
    with pytest.raises(ValueError, match="bilevel TIFF compression"):
        multimodal._encode_tiff(stored, "<", 2, photometric=0, compression=5)
    with pytest.raises(ValueError, match="strips only"):
        multimodal._encode_tiff(
            stored, "<", 2, photometric=0, compression=4, tile=(16, 16)
        )
    # truncated fax strip dead-letters through the TIFF walk: shrink
    # the first StripByteCounts entry so the G4 reader runs dry
    buf = bytearray(good)
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    hit = False
    for k in range(n):
        pos = ifd + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", buf, pos)
        if tag == 279 and cnt == 1:
            struct.pack_into("<I", buf, pos + 8, 1)
            hit = True
        elif tag == 279:
            (off,) = struct.unpack_from("<I", buf, pos + 8)
            struct.pack_into("<I", buf, off, 1)
            hit = True
    assert hit
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_tiff_bytes(bytes(buf))


def test_jpeg_in_tiff_and_seams():
    """New-style JPEG-in-TIFF (compression 7, photometric 6): strips
    are JPEG interchange streams decoded by the from-scratch JPEG
    decoder; corpus overlay ids round-trip to the jpeg closed form;
    abbreviated streams / wrong photometric / tiling stay seams."""
    from stockpulse_batch_realtime_etl_spark.operators.jpeg import (
        decode_jpeg_bytes, encode_jpeg,
    )

    for aid in (64, 214):  # variant 2, overlay 1 corpus slots
        assert ((aid // 5) % 10, (aid // 50) % 3) == (2, 1)
        payload = multimodal.encode_tiff(aid)
        d = multimodal.decode_image_bytes(payload)
        ref = decode_jpeg_bytes(encode_jpeg(aid))
        np.testing.assert_array_equal(
            d["vals"], np.asarray(ref["vals"], np.int64), err_msg=str(aid)
        )
        e = "<" if aid % 2 == 0 else ">"
        (ifd,) = struct.unpack_from(f"{e}I", payload, 4)
        (n,) = struct.unpack_from(f"{e}H", payload, ifd)
        tags = {}
        for k in range(n):
            tag = struct.unpack_from(f"{e}H", payload, ifd + 2 + 12 * k)[0]
            tags[tag] = struct.unpack_from(
                f"{e}H", payload, ifd + 2 + 12 * k + 8
            )[0]
        assert tags[259] == 7 and tags[262] == 6
    # seams: JPEGTables (347), YCbCr without JPEG, photometric-2 JPEG
    w, h = multimodal._image_dims(64)
    good = bytearray(multimodal._encode_tiff_jpeg(encode_jpeg(64), "<", w, h))
    (ifd,) = struct.unpack_from("<I", good, 4)
    (n,) = struct.unpack_from("<H", good, ifd)

    def patch(buf, tag, val):
        hit = False
        for k in range(n):
            pos = ifd + 2 + 12 * k
            if struct.unpack_from("<H", buf, pos)[0] == tag:
                struct.pack_into("<H", buf, pos + 8, val)
                hit = True
        assert hit
        return bytes(buf)

    with pytest.raises(NotImplementedError, match="photometric 2"):
        multimodal.decode_tiff_bytes(patch(bytearray(good), 262, 2))
    with pytest.raises(NotImplementedError, match="YCbCr.*without JPEG"):
        # compression back to none, photometric stays 6
        multimodal.decode_tiff_bytes(patch(bytearray(good), 259, 1))
    retag = bytearray(good)
    for k in range(n):  # rewrite RowsPerStrip entry into JPEGTables
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", retag, pos)[0] == 278:
            struct.pack_into("<H", retag, pos, 347)
    with pytest.raises(NotImplementedError, match="JPEGTables"):
        multimodal.decode_tiff_bytes(bytes(retag))
    # a corrupt JPEG stream inside the strip dead-letters as ValueError
    bad = bytearray(good)
    (strip_off,) = (struct.unpack_from("<I", good, ifd + 2 + 12 * k + 8)
                    for k in range(n)
                    if struct.unpack_from("<H", good, ifd + 2 + 12 * k)[0] == 273).__next__()
    bad[strip_off + 2 : strip_off + 4] = b"\x00\x00"  # break the marker walk
    with pytest.raises(ValueError):
        multimodal.decode_tiff_bytes(bytes(bad))


def test_g3_with_eols_round_trip_and_seams():
    """Group 3 1D-with-EOLs (TIFF compression 3): EOL before every row,
    continuous bit stream, fill bits (T4Options bit 2) byte-align row
    starts; corpus slots decode to the bilevel closed form; the MR (2D)
    and uncompressed-mode T4Options bits stay seams."""
    rng = np.random.default_rng(21)
    for trial in range(30):
        w = int(rng.integers(1, 120))
        n = int(rng.integers(1, 7))
        rows = (rng.random((n, w)) < rng.random()).astype(np.int64)
        for fill in (False, True):
            np.testing.assert_array_equal(
                ccitt.g3_decode(ccitt.g3_encode(rows, fill=fill), w, n),
                rows, err_msg=f"{trial}/{fill}",
            )
    # fill really byte-aligns each row's data start
    rows = (np.arange(3 * 17).reshape(3, 17) % 5 < 2).astype(np.int64)
    r = ccitt._BitReader(ccitt.g3_encode(rows, fill=True))
    for _ in range(3):
        ccitt._g3_read_eol(r)
        assert r.pos % 8 == 0
        pos, white = 0, True
        while pos < 17:
            pos += ccitt._read_run(r, white)
            white = not white
    # corpus: variant 3 overlay 2 ids are compression-3 files
    for aid in (119, 269):
        assert ((aid // 5) % 10, (aid // 50) % 3) == (3, 2)
        d = multimodal.decode_image_bytes(multimodal.encode_tiff(aid))
        w, h = multimodal._image_dims(aid)
        i = np.arange(w * h, dtype=np.int64)
        np.testing.assert_array_equal(
            d["vals"], ((3 * aid + i // 4) % 7 < 3).astype(np.int64)
        )
    # T4Options: uncompressed mode (bit 1) stays a seam; retagging a
    # 1D stream as MR (bit 0 — real since r15) makes the first data
    # bits parse as bogus tag/mode bits and dead-letters as corrupt
    stored = np.arange(48).reshape(6, 8) % 3 == 0
    good = multimodal._encode_tiff(
        stored, "<", 2, photometric=0, compression=3, g3_fill=True
    )
    (ifd,) = struct.unpack_from("<I", good, 4)
    (n,) = struct.unpack_from("<H", good, ifd)

    def patch_t4(bit):
        buf = bytearray(good)
        hit = False
        for k in range(n):
            pos = ifd + 2 + 12 * k
            if struct.unpack_from("<H", buf, pos)[0] == 292:
                struct.pack_into("<I", buf, pos + 8, bit)
                hit = True
        assert hit
        return bytes(buf)

    with pytest.raises(NotImplementedError, match="uncompressed mode"):
        multimodal.decode_tiff_bytes(patch_t4(2))
    with pytest.raises(ValueError):
        multimodal.decode_tiff_bytes(patch_t4(1))
    # missing EOL and truncation dead-letter
    with pytest.raises(ValueError):
        ccitt.g3_decode(b"\xff\x00", 8, 1)
    with pytest.raises(ValueError):
        ccitt.g3_decode(ccitt.g3_encode(rows)[:3], 17, 3)


def test_fill_order_2_lsb_first():
    """TIFF FillOrder 2 (tag 266): strip bytes are bit-reversed before
    the bilevel/fax decode; corpus lane ids carry the tag; FillOrder 2
    on multi-bit samples stays a seam and unknown orders dead-letter."""
    stored = np.arange(48).reshape(6, 8) % 3 == 0
    msb = multimodal._encode_tiff(stored, "<", 2, photometric=0, compression=4)
    lsb = multimodal._encode_tiff(
        stored, "<", 2, photometric=0, compression=4, fill_order=2
    )
    assert msb != lsb  # the stored bytes genuinely differ
    np.testing.assert_array_equal(
        multimodal.decode_tiff_bytes(msb)["vals"],
        multimodal.decode_tiff_bytes(lsb)["vals"],
    )
    # corpus lane carries tag 266 = 2
    aid = 69  # (69//20)%2 == 1 -> FillOrder 2; variant 3 overlay 1 (MH)
    payload = multimodal.encode_tiff(aid)
    e = ">"
    (ifd,) = struct.unpack_from(f"{e}I", payload, 4)
    (n,) = struct.unpack_from(f"{e}H", payload, ifd)
    tags = {
        struct.unpack_from(f"{e}H", payload, ifd + 2 + 12 * k)[0]:
        struct.unpack_from(f"{e}H", payload, ifd + 2 + 12 * k + 8)[0]
        for k in range(n)
    }
    assert tags.get(266) == 2
    # seams/corrupt: FillOrder 2 on 8-bit samples; FillOrder 3
    gray = ((7 + 13 * np.arange(48, dtype=np.int64)) % 256).reshape(6, 8)
    g8 = bytearray(multimodal._encode_tiff(
        gray.astype(np.uint8), "<", 2, photometric=1, compression=1
    ))
    (ifd,) = struct.unpack_from("<I", g8, 4)
    (n,) = struct.unpack_from("<H", g8, ifd)

    def add_fill_order(buf, val):
        # rewrite the Compression entry (1=none is the default anyway)
        for k in range(n):
            pos = ifd + 2 + 12 * k
            if struct.unpack_from("<H", buf, pos)[0] == 259:
                struct.pack_into("<H", buf, pos, 266)
                struct.pack_into("<H", buf, pos + 8, val)
        return bytes(buf)

    with pytest.raises(NotImplementedError, match="FillOrder 2"):
        multimodal.decode_tiff_bytes(add_fill_order(bytearray(g8), 2))
    with pytest.raises(ValueError, match="FillOrder 3"):
        multimodal.decode_tiff_bytes(add_fill_order(bytearray(g8), 3))


def test_float_predictor_3():
    """TIFF predictor 3 (TechNote 3): per-row byte-planar shuffle of
    BIG-ENDIAN float bytes + mod-256 differencing, strips and tiles,
    independent of file byte order; integer samples with predictor 3
    and planar+predictor-3 stay seams."""
    i = np.arange(9 * 7, dtype=np.int64)
    n16 = (1237 * 3 + 4099 * i) % 65536
    f64 = ((n16 - 32768) / 65536.0).reshape(7, 9)
    for e in ("<", ">"):
        plain = multimodal._encode_tiff(f64, e, 4, photometric=1)
        pred = multimodal._encode_tiff(
            f64, e, 4, photometric=1, predictor=3
        )
        assert plain != pred
        np.testing.assert_array_equal(
            multimodal.decode_tiff_bytes(pred)["vals"], n16 - 32768
        )
    # corpus slot: variant 9 overlay 2 carries predictor 3
    payload = multimodal.encode_tiff(149)
    (ifd,) = struct.unpack_from(">I", payload, 4)
    (n,) = struct.unpack_from(">H", payload, ifd)
    tags = {
        struct.unpack_from(">H", payload, ifd + 2 + 12 * k)[0]:
        struct.unpack_from(">H", payload, ifd + 2 + 12 * k + 8)[0]
        for k in range(n)
    }
    assert tags.get(317) == 3 and tags.get(339) == 3
    # predictor 3 on integer samples is a seam (patch an int16 file)
    i16 = (n16 - 32768).astype(np.int16).reshape(7, 9)
    buf = bytearray(multimodal._encode_tiff(
        i16, "<", 4, photometric=1, compression=8, predictor=2
    ))
    (ifd,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd)
    for k in range(n):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 317:
            struct.pack_into("<H", buf, pos + 8, 3)
    with pytest.raises(NotImplementedError, match="floating-point predictor"):
        multimodal.decode_tiff_bytes(bytes(buf))
    # encoder guards
    with pytest.raises(ValueError, match="chunky float"):
        multimodal._encode_tiff(i16, "<", 4, photometric=1, predictor=3)
    with pytest.raises(ValueError, match="chunky float"):
        multimodal._encode_tiff(
            np.repeat(f64[:, :, None], 3, axis=2),
            "<", 4, photometric=2, predictor=3, planar=True,
        )


def test_g3_mr_two_dimensional():
    """MR (G3 2D, T4Options bit 0): each EOL carries a tag bit picking
    1D MH or 2D coding against the previous row; the K-factor forces a
    periodic 1D resync row.  Round-trips with fill/FillOrder combos,
    corpus MR slots decode closed-form, and the uncompressed-mode bit
    stays a seam."""
    rng = np.random.default_rng(43)
    for trial in range(40):
        w = int(rng.integers(1, 150))
        n = int(rng.integers(1, 9))
        rows = (rng.random((n, w)) < rng.random()).astype(np.int64)
        k = int(rng.integers(1, 6))
        enc = ccitt.g3_encode(rows, fill=bool(trial % 2), two_d=True, k=k)
        np.testing.assert_array_equal(
            ccitt.g3_decode(enc, w, n, two_d=True), rows,
            err_msg=f"{trial}/k={k}",
        )
    # MR genuinely emits tag bits: a 3-row image with k=4 has exactly
    # one 1D row (the first) — the stream differs from pure 1D
    rows = (np.arange(3 * 20).reshape(3, 20) % 5 < 2).astype(np.int64)
    assert ccitt.g3_encode(rows, two_d=True) != ccitt.g3_encode(rows)
    # TIFF integration: MR corpus slot (variant 3, overlay 2, id//150
    # odd) carries T4Options bit 0 and decodes to the bilevel form
    aid = 269
    assert ((aid // 5) % 10, (aid // 50) % 3, (aid // 150) % 2) == (3, 2, 1)
    d = multimodal.decode_image_bytes(multimodal.encode_tiff(aid))
    w, h = multimodal._image_dims(aid)
    i = np.arange(w * h, dtype=np.int64)
    np.testing.assert_array_equal(
        d["vals"], ((3 * aid + i // 4) % 7 < 3).astype(np.int64)
    )
    # direct TIFF round-trip across fill/FillOrder lanes
    stored = np.arange(48).reshape(6, 8) % 3 == 0
    for fill in (False, True):
        for fo in (1, 2):
            pay = multimodal._encode_tiff(
                stored, ">", 2, photometric=0, compression=3,
                g3_fill=fill, fill_order=fo, g3_2d=True,
            )
            np.testing.assert_array_equal(
                multimodal.decode_tiff_bytes(pay)["vals"],
                1 - stored.astype(np.int64).reshape(-1),
            )


def test_tiff_palette_color():
    """Photometric 3 (r15): 4/8-bit indices look up the 16-bit
    ColorMap (R plane, G plane, B plane); corpus overlay slots decode
    closed-form; missing/short ColorMaps and 4-bit non-palette depths
    dead-letter appropriately."""
    rng = np.random.default_rng(67)
    idx = rng.integers(0, 16, (5, 9))
    cmap = rng.integers(0, 65536, 48)
    pay = multimodal._encode_tiff_palette(idx, cmap, "<", 2, 4, 5)
    d = multimodal.decode_tiff_bytes(pay)
    cm = cmap.reshape(3, 16)
    np.testing.assert_array_equal(
        d["vals"],
        np.stack([cm[0][idx], cm[1][idx], cm[2][idx]], axis=2).reshape(-1),
    )
    # corpus: variant 5 overlays (8-bit Deflate / 4-bit LZW)
    for aid in (79, 129):
        assert ((aid // 5) % 10, (aid // 50) % 3) == (5, (aid // 50) % 3)
        n = 256 if (aid // 50) % 3 == 1 else 16
        d = multimodal.decode_image_bytes(multimodal.encode_tiff(aid))
        w, h = multimodal._image_dims(aid)
        i = np.arange(w * h * 3, dtype=np.int64)
        j = (3 * aid + 5 * (i // 3)) % n
        np.testing.assert_array_equal(
            d["vals"], (1237 * aid + 4099 * ((i % 3) * n + j)) % 65536
        )
    # missing ColorMap is corrupt; short ColorMap too
    (ifd,) = struct.unpack_from("<I", pay, 4)
    (nn,) = struct.unpack_from("<H", pay, ifd)
    buf = bytearray(pay)
    for k in range(nn):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 320:
            struct.pack_into("<H", buf, pos, 32767)
    with pytest.raises(ValueError, match="missing ColorMap"):
        multimodal.decode_tiff_bytes(bytes(buf))
    buf = bytearray(pay)
    for k in range(nn):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 320:
            struct.pack_into("<I", buf, pos + 4, 24)  # count 24 != 48
    with pytest.raises(ValueError, match="ColorMap length"):
        multimodal.decode_tiff_bytes(bytes(buf))
    # depth-4 grayscale (no palette photometric) stays a seam
    buf = bytearray(pay)
    for k in range(nn):
        pos = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, pos)[0] == 262:
            struct.pack_into("<H", buf, pos + 8, 1)
    with pytest.raises(NotImplementedError, match="depth 4"):
        multimodal.decode_tiff_bytes(bytes(buf))
