"""JPEG codec (operators/jpeg_codec.py) — baseline and (r10)
progressive round trips across subsampling/restart variants,
marker-level failure modes, and the fake=False Spark kernels
(extract_features / resize_images) on JPEG payloads.  Everything is
stdlib+numpy; no PIL in the container, so the codec is validated by
exact-shape round trips with bounded loss on smooth images, the
baseline-vs-progressive pixel-identity anchor (both encoders quantize
identically), hand-built EOBn bitstreams, and structural checks."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sstable_hadoop_spark.operators.jpeg_codec import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w)[None, :]
    img[..., 1] = np.linspace(0, 255, h)[:, None]
    img[..., 2] = 100
    return img


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart", [0, 2])
def test_roundtrip_smooth_bounded_error(subsampling, restart):
    img = gradient(48, 48)
    dec = decode_jpeg(encode_jpeg(img, 90, subsampling, restart))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # low-frequency content survives quantization almost exactly;
    # 4:2:0 adds chroma box-average error
    assert err.max() <= (10 if subsampling == "420" else 6)


@pytest.mark.parametrize("shape", [(9, 13), (17, 31), (8, 8), (1, 1),
                                   (16, 24)])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_roundtrip_exact_shape(shape, subsampling):
    """SOF declares the true size; the decoder MCU-pads and crops, so
    any dimensions round-trip to the exact input shape."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(img, 85, subsampling, 2)).shape == img.shape


def test_quality_monotone_size_and_error():
    """Higher quality → more bytes and less reconstruction error."""
    img = gradient(32, 40)
    sizes, errs = [], []
    for q in (30, 70, 95):
        enc = encode_jpeg(img, q)
        sizes.append(len(enc))
        errs.append(np.abs(decode_jpeg(enc).astype(int)
                           - img.astype(int)).mean())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_determinism():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_restart_markers_present_and_reset():
    """restart_interval really emits RSTn markers and the decoder
    resynchronizes across them (DC predictors reset)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    enc = encode_jpeg(img, 75, "444", 3)
    # 7x5 = 35 MCUs at 8x8 → markers every 3 MCUs
    n_rst = sum(enc.count(bytes([0xFF, 0xD0 | i])) for i in range(8))
    assert n_rst >= 10
    dec = decode_jpeg(enc)
    base = decode_jpeg(encode_jpeg(img, 75, "444", 0))
    assert np.array_equal(dec, base)  # restarts are bit-exact neutral


def test_byte_stuffing():
    """Entropy data contains stuffed 0xFF00 pairs and no bare markers
    (other than RST/EOI) — the classic bitstream invariant."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    enc = encode_jpeg(img, 95)
    sos = enc.find(b"\xff\xda")
    body = enc[sos + 2:]
    i = 0
    while i < len(body) - 1:
        if body[i] == 0xFF:
            nxt = body[i + 1]
            assert nxt == 0x00 or nxt == 0xD9 or 0xD0 <= nxt <= 0xD7, \
                f"unexpected marker 0xFF{nxt:02X} inside scan"
            i += 2
        else:
            i += 1


def test_arithmetic_and_12bit_raise():
    img = gradient(8, 8)
    enc = bytearray(encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    # arithmetic-coded SOF9 stays out of scope and must say so
    arith = bytes(enc[:sof]) + b"\xff\xc9" + bytes(enc[sof + 2:])
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(arith)
    # a baseline full-band scan relabeled SOF2 is MALFORMED
    # progressive (a DC scan must have Se=0) — loud, not garbage out
    prog = bytes(enc[:sof]) + b"\xff\xc2" + bytes(enc[sof + 2:])
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    deep = bytearray(enc)
    deep[sof + 4] = 12  # precision byte
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))
    with pytest.raises(ValueError):
        decode_jpeg(b"NOTAJPEG")


def _busy(h: int, w: int) -> np.ndarray:
    """Deterministic high-frequency test image: gradient + noise +
    checker so every spectral band and both refinement outcomes are
    exercised."""
    rng = np.random.RandomState(7)
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 5
                   + np.arange(h)[:, None] * 3) % 256
    img[..., 1] = rng.randint(0, 256, (h, w))
    img[..., 2] = ((np.arange(h)[:, None] // 4
                    + np.arange(w)[None, :] // 4) % 2) * 255
    return img


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("shape", [(37, 29), (16, 16), (8, 24)])
def test_progressive_roundtrip_matches_baseline(shape, subsampling):
    """r10 progressive JPEG: encode_jpeg_progressive quantizes
    identically to encode_jpeg, so after the full scan script (DC
    first+refine, spectral bands, two AC successive-approximation
    levels) the decoded pixels must be BYTE-IDENTICAL to the baseline
    roundtrip — coefficient-exact reconstruction, not approximately
    similar."""
    from sstable_hadoop_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
    )

    img = _busy(*shape)
    for q in (85, 50):
        base = decode_jpeg(encode_jpeg(img, quality=q,
                                       subsampling=subsampling))
        prog_bytes = encode_jpeg_progressive(img, quality=q,
                                             subsampling=subsampling)
        prog = decode_jpeg(prog_bytes)
        assert np.array_equal(base, prog), (shape, subsampling, q)
        # really progressive: SOF2 + the 10-scan script
        assert b"\xff\xc2" in prog_bytes
        assert prog_bytes.count(b"\xff\xda") == 10
        # and the progressive file is self-consistent on re-decode
        assert np.array_equal(decode_jpeg(prog_bytes), prog)


def test_progressive_eobn_runs_decode():
    """EOBn runs longer than one block (which our encoder never emits
    — the Annex K tables lack the symbols — but real progressive
    files use): two hand-built single-component streams with
    IDENTICAL coefficient content, one coded block-by-block with
    EOB0, one folding trailing all-zero blocks into an EOB2 run with
    extension bits, must decode identically."""
    from sstable_hadoop_spark.operators import jpeg_codec as jc

    # 8x32 grayscale → 4 blocks; DC = 10 everywhere; block 0 has one
    # AC coefficient (k=1, value 3); blocks 1-3 have none.
    dc_bits, dc_syms = [0, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], \
        [0, 1, 2, 4]
    # AC table: symbols 0x02 (run0/size2), 0x00 (EOB0), 0x20 (EOB2)
    ac_bits, ac_syms = [1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], \
        [0x02, 0x00, 0x20]
    dc_codes = jc._build_codes(dc_bits, dc_syms)
    ac_codes = jc._build_codes(ac_bits, ac_syms)

    def headers() -> bytearray:
        out = bytearray(b"\xff\xd8")
        out += struct.pack(">HH", 0xFFDB, 67) + b"\x00" + bytes([1] * 64)
        sof = struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0])
        out += struct.pack(">HH", 0xFFC2, len(sof) + 2) + sof
        dht = bytes([0x00]) + bytes(dc_bits) + bytes(dc_syms)
        out += struct.pack(">HH", 0xFFC4, len(dht) + 2) + dht
        dht = bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms)
        out += struct.pack(">HH", 0xFFC4, len(dht) + 2) + dht
        return out

    def sos(ss, se, ah, al, tt) -> bytes:
        body = bytes([1, 1, tt, ss, se, (ah << 4) | al])
        return struct.pack(">HH", 0xFFDA, len(body) + 2) + body

    def dc_scan() -> bytes:
        bw = jc._BitWriter()
        for i in range(4):          # diffs: 10, 0, 0, 0
            cat, bits = jc._magnitude(10 if i == 0 else 0)
            code, ln = dc_codes[cat]
            bw.put(code, ln)
            if cat:
                bw.put(bits, cat)
        bw.flush()
        return bytes(bw.out)

    def ac_block0(bw) -> None:
        code, ln = ac_codes[0x02]   # run 0, size 2 → value 3
        bw.put(code, ln)
        bw.put(3, 2)

    # variant A: every block ends its own EOB0
    bwa = jc._BitWriter()
    ac_block0(bwa)
    for _ in range(4):              # EOB for block 0 tail + blocks 1-3
        code, ln = ac_codes[0x00]
        bwa.put(code, ln)
    bwa.flush()
    # variant B: block 0 tail + blocks 1-3 folded into ONE EOB2 run
    # of length 4 (2^2 + 2 extension bits 0b00 = 4 blocks total)
    bwb = jc._BitWriter()
    ac_block0(bwb)
    code, ln = ac_codes[0x20]
    bwb.put(code, ln)
    bwb.put(0b00, 2)                # 2 extension bits: run = 4 + 0
    bwb.flush()

    imgs = []
    for scan_bytes in (bytes(bwa.out), bytes(bwb.out)):
        stream = headers()
        stream += sos(0, 0, 0, 0, 0x00) + dc_scan()
        stream += sos(1, 63, 0, 0, 0x00) + scan_bytes
        stream += b"\xff\xd9"
        imgs.append(decode_jpeg(bytes(stream)))
    assert np.array_equal(imgs[0], imgs[1])
    # the coefficient content really decoded: non-flat block 0, flat
    # blocks elsewhere
    g = imgs[0][..., 0].astype(int)
    assert g[:, :8].std() > 0
    assert g[:, 8:].std() == 0


def test_grayscale_single_component():
    """1-component scan decodes and replicates to RGB."""
    img = gradient(16, 16)
    enc = encode_jpeg(img, 90)
    # rebuild a grayscale JPEG from scratch using the same tables
    from sstable_hadoop_spark.operators import jpeg_codec as jc

    y = jc._rgb_to_ycbcr(img)[..., 0]
    q = jc._scale_q(jc.K1_LUMA_Q, 90)
    grid = jc._quantized_blocks(y, q)
    bw = jc._BitWriter()
    pred = 0
    dc = jc._build_codes(*jc.K3_DC_LUMA)
    ac = jc._build_codes(*jc.K5_AC_LUMA)
    for by in range(grid.shape[0]):
        for bx in range(grid.shape[1]):
            pred = jc._encode_block(bw, grid[by, bx], pred, dc, ac)
    bw.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    gray = bytearray(b"\xff\xd8")
    gray += seg(0xFFDB, b"\x00" + bytes(q[ZIGZAG].tolist()))
    gray += seg(0xFFC0, struct.pack(">BHHB", 8, 16, 16, 1)
                + bytes([1, 0x11, 0]))
    gray += seg(0xFFC4, bytes([0x00]) + bytes(jc.K3_DC_LUMA[0])
                + bytes(jc.K3_DC_LUMA[1]))
    gray += seg(0xFFC4, bytes([0x10]) + bytes(jc.K5_AC_LUMA[0])
                + bytes(jc.K5_AC_LUMA[1]))
    gray += seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
    gray += bw.out + b"\xff\xd9"

    dec = decode_jpeg(bytes(gray))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    err = np.abs(dec[..., 0].astype(int) - np.round(y).astype(int))
    assert err.max() <= 6


def test_spark_extract_and_resize_jpeg(spark):
    """fake=False kernels dispatch on the JPEG magic: features match
    the decoded pixels and resize re-encodes as JPEG."""
    from sstable_hadoop_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    img = gradient(16, 24)
    payload = encode_jpeg(img, 90)
    decoded = decode_jpeg(payload)  # features reflect decoded pixels
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload),
          {"mime": "image/jpeg", "width": 24, "height": 16,
           "duration_ms": None})],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:long,height:long,duration_ms:long>")

    (row,) = extract_features(media, fake=False).collect()
    assert row["features"][0] == 1.0
    assert abs(row["features"][1] - 24 / 4096) < 1e-6
    assert abs(row["features"][2] - 16 / 4096) < 1e-6
    assert abs(row["features"][3]
               - decoded[:, :, 0].mean() / 255.0) < 1e-6

    (out,) = resize_images(media, 12, 8, fake=False).collect()
    resized = decode_jpeg(bytes(out["payload"]))
    assert bytes(out["payload"])[:2] == b"\xff\xd8"  # stays JPEG
    assert resized.shape == (8, 12, 3)


# --- MJPEG-in-AVI container (operators/avi_mjpeg.py) ----------------------


def test_avi_roundtrip_and_dht_fallback():
    """Container round trip; headerless-MJPEG frames (DHT stripped)
    decode identically via the Annex K fallback."""
    from sstable_hadoop_spark.operators.avi_mjpeg import (
        _strip_dht,
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    frames = [np.full((16, 24, 3), 10 * i, np.uint8) for i in range(6)]
    full = encode_avi_mjpeg(frames, fps=10)
    lean = encode_avi_mjpeg(frames, fps=10, omit_dht=True)
    assert len(lean) < len(full)  # tables really stripped
    for payload in (full, lean):
        avi = parse_avi_mjpeg(payload)
        assert (avi["n_frames"], avi["width"], avi["height"],
                avi["usec_per_frame"]) == (6, 24, 16, 100000)
        mid = decode_jpeg(avi["frames"][3])
        assert abs(float(mid.mean()) - 30.0) < 2.0
    # a stripped frame alone still decodes (default-table path)
    naked = _strip_dht(encode_jpeg(gradient(16, 16), 90))
    assert b"\xff\xc4" not in naked[:naked.find(b"\xff\xda")]
    assert decode_jpeg(naked).shape == (16, 16, 3)


def test_avi_sampling_and_rejection():
    from sstable_hadoop_spark.operators.avi_mjpeg import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
        sample_mjpeg_frames,
    )

    frames = [np.full((8, 8, 3), 20 * i, np.uint8) for i in range(12)]
    avi = encode_avi_mjpeg(frames, fps=10)  # 1200 ms of video
    got = [(i, ms) for i, ms, _ in sample_mjpeg_frames(avi, 300)]
    assert got == [(0, 0), (3, 300), (6, 600), (9, 900)]
    # sub-frame-duration video still yields the first frame
    one = encode_avi_mjpeg(frames[:1], fps=10)
    assert [(i, ms) for i, ms, _ in sample_mjpeg_frames(one, 5000)] \
        == [(0, 0)]
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"RIFFxxxxWAVE")
    # non-MJPEG handler raises naming ffmpeg
    h264 = bytearray(avi)
    pos = h264.find(b"vidsMJPG")
    h264[pos + 4:pos + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        parse_avi_mjpeg(bytes(h264))


def test_spark_sample_frames_real_and_video_features(spark):
    """fake=False frame sampling emits real JPEG frame payloads; the
    feature kernel dispatches AVI payloads to video features."""
    from sstable_hadoop_spark.operators.avi_mjpeg import encode_avi_mjpeg
    from sstable_hadoop_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    frames = [np.full((16, 24, 3), 30 * i, np.uint8) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=10, omit_dht=True)
    media = spark.createDataFrame(
        [(7, "video", bytearray(avi),
          {"mime": "video/x-msvideo", "width": 24, "height": 16,
           "duration_ms": 500})],
        "media_id long, modality string, payload binary, "
        "meta struct<mime:string,width:long,height:long,duration_ms:long>")

    rows = sorted(sample_frames(media, every_ms=200, fake=False).collect(),
                  key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["frame_ms"]) for r in rows] == \
        [(0, 0), (2, 200), (4, 400)]
    for r in rows:
        img = decode_jpeg(bytes(r["payload"]))  # payload IS a JPEG
        assert img.shape == (16, 24, 3)
        assert abs(float(img.mean()) - 30.0 * r["frame_idx"]) < 3.0

    (feat,) = extract_features(media, fake=False).collect()
    f = feat["features"]
    assert f[0] == 3.0                      # video tag
    assert abs(f[3] - 5 / 1000.0) < 1e-6    # n_frames
    assert abs(f[4] - 0.5 / 60.0) < 1e-6    # duration
    # mean luminance of the middle frame (value 60)
    assert abs(f[5] - 60.0 / 255.0) < 0.02


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       quality=st.integers(5, 100),
       subsampling=st.sampled_from(["444", "420"]),
       restart=st.integers(0, 4),
       seed=st.integers(0, 2**31))
def test_jpeg_roundtrip_never_crashes(h, w, quality, subsampling,
                                      restart, seed):
    """Any image size/content/quality/subsampling/restart combination
    round-trips to the exact shape with in-range pixels, and the
    encoder's bitstream contains no unstuffed markers."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    enc = encode_jpeg(img, quality, subsampling, restart)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    assert dec.dtype == np.uint8
    # mean preservation: DC survives quantization, but at extreme
    # quality (<20) the luma quant step reaches 255 and the chroma
    # transform + clipping amplify the drift (hypothesis found a
    # q=5 case at 47.8), so the tight bound applies from q=20 up
    bound = 40.0 if quality >= 20 else 80.0
    assert abs(float(dec.mean()) - float(img.mean())) < bound


@settings(max_examples=10, deadline=None)
@given(n_frames=st.integers(1, 8), fps=st.sampled_from([5, 10, 30]),
       every_ms=st.sampled_from([50, 200, 1000]),
       omit=st.booleans(), seed=st.integers(0, 2**31))
def test_avi_sampling_properties(n_frames, fps, every_ms, omit, seed):
    """Sampling invariants for any container: indices are strictly
    increasing, in range, start at 0, and each sampled payload decodes
    to the frame shape."""
    from sstable_hadoop_spark.operators.avi_mjpeg import (
        encode_avi_mjpeg,
        sample_mjpeg_frames,
    )

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (8, 16, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    avi = encode_avi_mjpeg(frames, fps=fps, omit_dht=omit)
    got = sample_mjpeg_frames(avi, every_ms)
    idxs = [i for i, _, _ in got]
    assert idxs and idxs[0] == 0
    assert idxs == sorted(set(idxs))
    assert all(0 <= i < n_frames for i in idxs)
    assert decode_jpeg(got[-1][2]).shape == (8, 16, 3)


def test_avi_stream_header_is_56_bytes():
    """ADVICE r5: strh must carry the full 56-byte AVISTREAMHEADER
    (rcFrame is an 8-byte RECT); strict third-party readers reject a
    52-byte body."""
    import struct

    import numpy as np

    from sstable_hadoop_spark.operators.avi_mjpeg import encode_avi_mjpeg

    frame = np.zeros((8, 8, 3), dtype=np.uint8)
    avi = encode_avi_mjpeg([frame, frame], fps=5)
    i = avi.index(b"strh")
    size = struct.unpack("<I", avi[i + 4:i + 8])[0]
    assert size == 56
    # rcFrame right/bottom carry the frame dimensions
    right, bottom = struct.unpack("<HH", avi[i + 8 + 52:i + 8 + 56])
    assert (right, bottom) == (8, 8)


def test_progressive_payload_through_multimodal_features():
    """A progressive JPEG payload rides the SAME multimodal dispatch
    as baseline (FFD8 signature → decode_jpeg), and since both
    encoders quantize identically the extracted features are
    bit-identical."""
    from sstable_hadoop_spark.operators.jpeg_codec import (
        encode_jpeg_progressive,
    )
    from sstable_hadoop_spark.operators.multimodal import _real_features

    img = _busy(24, 40)
    fb = _real_features(encode_jpeg(img, 80))
    fp = _real_features(encode_jpeg_progressive(img, 80))
    assert fb == fp
