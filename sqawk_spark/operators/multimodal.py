"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside.
The Spark-side machinery — schema, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested. Decoding is real, stdlib+numpy
only, for WAV/PCM, PNG, baseline JPEG (full entropy decode incl. the
AC path), PROGRESSIVE JPEG (SOF2: 4-scan spectral selection +
successive approximation, the full T.81 Annex G receive), 4:2:0
chroma-subsampled JPEG, and the RIFF/AVI-MJPEG container with frame
sampling; payloads in formats that would need external media
libraries (H.264, arithmetic-coded JPEG, photographic content) fall
back to a deterministic stub that derives fake metadata from the
payload bytes, so the whole path stays oracle-checkable.

At scale: mapInPandas streams Arrow batches through one Python worker
per core, never materializing a partition; binary payloads should ride
in their own column so column pruning skips them when a query only
touches metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, fmt string"
)


def fake_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text UTF-8-encoded as a stand-in binary payload."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return t["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def decode_table(media: DataFrame) -> DataFrame:
    """The decode operator: binary column → metadata via mapInPandas.

    REAL container-header parsing for the standard formats — PNG
    (IHDR), GIF (logical screen), JPEG (SOF scan), WAV (RIFF fmt
    chunk: width=sample rate, height=channels) — needs no media
    library, just the published byte layouts. Payloads that match no
    magic number fall back to the deterministic stub (a full pixel/
    sample decode would need PIL/soundfile, absent in this container);
    the Arrow batch flow, schema contract, and partition behavior are
    identical either way.

    The parser is a closure (pickled by value) rather than a
    module-level function: executor Python workers don't necessarily
    have this repo on their PYTHONPATH, and a by-reference pickle
    would make them try to import it."""

    def sniff(b: bytes):
        import struct

        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return w, h, "image/png"
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return w, h, "image/gif"
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return w, h, "image/jpeg"
                i += 2 + seglen
            return None
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid, clen = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 <= len(b):
                    channels = int.from_bytes(b[i + 10 : i + 12], "little")
                    rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    return rate, channels, "audio/wav"
                i += 8 + clen + (clen & 1)
        return None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "width": [], "height": [], "fmt": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                meta = sniff(b)
                if meta is None:
                    # deterministic fake for unknown containers
                    meta = (
                        16 + (len(b) % 497),
                        16 + (doc_id * 31) % 497,
                        "fake/raw",
                    )
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(b))
                out["width"].append(meta[0])
                out["height"].append(meta[1])
                out["fmt"].append(meta[2])
            yield _pd.DataFrame(out)

    return media.mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_table(fake_media_table(spark, sf_dir))


def extract_frames_stub(spark: SparkSession, sf_dir: str, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing over opaque payloads: one row per
    sampled byte offset — the explode-with-offsets plan shape (the
    row-multiplying step at scale) on bytes we can't decode. For REAL
    container-level frame extraction see
    :func:`multimodal_video_framesample` (RIFF/AVI-MJPEG walk)."""
    media = fake_media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.length("payload") - 1, F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


@query(
    "multimodal_decode_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(16 + octet_length(encode(text)) % 497 AS BIGINT) AS width,
               CAST(16 + (doc_id * 31) % 497 AS BIGINT) AS height,
               'fake/raw' AS fmt
        FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode via Arrow-batched mapInPandas (stubbed
    decoder, real plumbing — see module docstring)."""
    return decode_media(spark, sf_dir)


AUDIO_SR = 8000
AUDIO_SAMPLES = 800          # 100 ms per clip
AUDIO_FRAME = 160            # 20 ms analysis frames → 5 per clip
AUDIO_AMP = 16384            # half of int16 full scale


def _audio_oracle_sql() -> str:
    """Closed-form VALUES oracle for multimodal_audio_features.

    Every synthesized frequency is a multiple of 50 Hz, so each 160-
    sample frame holds an integer number of cycles — all 5 frames of a
    clip are bit-identical and the whole output collapses to 8
    distinct (rms, zcr) pairs keyed by doc_id % 8. Those constants are
    recomputed here at import from the signal definition (sine →
    int16 quantization → framing), independent of the mapInPandas
    path the Spark side exercises."""
    import numpy as np

    rows = []
    for k in range(8):
        freq = 100 * (1 + k)
        ts = np.arange(AUDIO_SAMPLES, dtype=np.float64) / AUDIO_SR
        pcm = (AUDIO_AMP * np.sin(2 * np.pi * freq * ts)).astype("<i2")
        x = pcm.astype(np.float64) / 32768.0
        fx = x[: 5 * AUDIO_FRAME].reshape(5, AUDIO_FRAME)
        rms = np.round(np.sqrt((fx * fx).mean(axis=1)), 6)
        zcr = (np.diff(np.signbit(fx), axis=1) != 0).sum(axis=1)
        assert len(set(rms)) == 1 and len(set(zcr)) == 1
        rows.append(f"({k}, {float(rms[0])!r}, {int(zcr[0])})")
    values = ", ".join(rows)
    return f"""
        SELECT d.doc_id, t.frame_idx,
               CAST(v.rms AS DOUBLE) AS rms, v.zcr
        FROM documents d
        CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(frame_idx)
        JOIN (VALUES {values}) AS v(k, rms, zcr)
          ON d.doc_id % 8 = v.k
    """


@query("multimodal_audio_features", oracle=_audio_oracle_sql())
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + feature extraction, no media library: WAV
    is RIFF headers + raw PCM, so the decoder is ``np.frombuffer``.

    Each document synthesizes a deterministic 100 ms 16-bit mono sine
    clip (frequency keyed by doc_id — standing in for a binary column
    read from parquet), then one Arrow-batched ``mapInPandas`` pass
    parses the RIFF fmt/data chunks, frames the samples into 20 ms
    windows, and emits per-frame RMS energy and zero-crossing counts —
    the first two features of every audio-quality filter.

    Oracle: closed-form — integer cycles per frame collapse the output
    to 8 distinct (rms, zcr) pairs keyed by doc_id % 8, emitted as a
    VALUES join (see ``_audio_oracle_sql``). tests/test_extensions.py
    additionally asserts the analytic ground truth: a pure sine's RMS
    is amplitude/sqrt(2) and per-frame zero crossings are
    2·freq·frame_seconds.

    At scale: synthesis disappears (payloads come from parquet), and
    the pass is one worker-side Arrow stream per partition — no
    shuffle, output rows = clips × frames."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        sr, n, frame, amp = AUDIO_SR, AUDIO_SAMPLES, AUDIO_FRAME, AUDIO_AMP

        def synth_wav(doc_id: int) -> bytes:
            freq = 100 * (1 + doc_id % 8)
            ts = np.arange(n, dtype=np.float64) / sr
            pcm = (amp * np.sin(2 * np.pi * freq * ts)).astype("<i2")
            data = pcm.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        def decode_pcm(wav: bytes):
            assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
            i = 12
            rate, pcm = None, None
            while i + 8 <= len(wav):
                cid = wav[i : i + 4]
                clen = int.from_bytes(wav[i + 4 : i + 8], "little")
                body = wav[i + 8 : i + 8 + clen]
                if cid == b"fmt ":
                    rate = struct.unpack("<I", body[4:8])[0]
                elif cid == b"data":
                    pcm = np.frombuffer(body, dtype="<i2")
                i += 8 + clen + (clen & 1)
            return rate, pcm

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "rms": [], "zcr": []}
            for doc_id in pdf["doc_id"]:
                rate, pcm = decode_pcm(synth_wav(int(doc_id)))
                x = pcm.astype(np.float64) / 32768.0
                n_frames = len(x) // frame
                fx = x[: n_frames * frame].reshape(n_frames, frame)
                rms = np.sqrt((fx * fx).mean(axis=1))
                zcr = (np.diff(np.signbit(fx), axis=1) != 0).sum(axis=1)
                out["doc_id"] += [int(doc_id)] * n_frames
                out["frame_idx"] += list(range(n_frames))
                out["rms"] += list(np.round(rms, 6))
                out["zcr"] += [int(z) for z in zcr]
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run, schema="doc_id bigint, frame_idx int, rms double, zcr int"
    )


IMG_W, IMG_H = 16, 16


_IMAGE_ORACLE = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 200 AS DOUBLE) AS base,
               CAST(doc_id % 256 AS DOUBLE) AS bb
        FROM documents
    )
    SELECT doc_id, 16 AS width, 16 AS height,
           round(base + 7.5, 6) AS mean_r,
           round(base + 7.5, 6) AS mean_g,
           round(bb, 6) AS mean_b,
           round(sqrt(((base*base + 15.0*base + 77.5) * 2 + bb*bb) / 3.0
                 - pow(((base + 7.5) * 2 + bb) / 3.0, 2)), 6) AS std_all
    FROM p
"""
# Closed-form twin of the gradient pixels: base+x never wraps (base<=199,
# x<=15), so mean_r = mean_g = base+7.5 and E[ch^2] has the polynomial
# form above (E[x]=7.5, E[x^2]=77.5 for x in 0..15). round(.,6) parity
# with np.std verified exhaustively over the full doc_id%6400 period.


@query("multimodal_image_stats", oracle=_IMAGE_ORACLE)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, stdlib-only: PNG is chunked zlib — synthesis
    writes genuine 16×16 RGB PNGs (IHDR/IDAT/IEND with CRCs, filter
    type 0 scanlines), and the decoder walks the chunks, inflates the
    IDAT stream, strips the filter bytes, and reduces the pixel matrix
    to per-channel mean/std — the brightness/contrast features an
    image-quality filter starts from.

    Per-document pixels are a deterministic gradient keyed by doc_id,
    so channel means and std have closed-form ground truth — emitted
    as the DuckDB oracle (``_IMAGE_ORACLE``) and additionally asserted
    in tests/test_extensions.py. Same scale shape as the audio pass:
    one Arrow-batched mapInPandas stream per partition, no shuffle."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        w, h = IMG_W, IMG_H

        def chunk(tag: bytes, body: bytes) -> bytes:
            crc = zlib.crc32(tag + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

        def synth_png(doc_id: int) -> bytes:
            base = doc_id % 200
            # R: horizontal gradient, G: vertical gradient, B: constant
            xs = np.arange(w, dtype=np.uint16)
            ys = np.arange(h, dtype=np.uint16)
            r = np.broadcast_to((base + xs) % 256, (h, w))
            g = np.broadcast_to(((base + ys) % 256)[:, None], (h, w))
            b = np.full((h, w), doc_id % 256)
            px = np.stack([r, g, b], axis=2).astype(np.uint8)
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        def decode_png(png: bytes):
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            i = 8
            width = height = None
            idat = b""
            while i + 8 <= len(png):
                (clen,) = struct.unpack(">I", png[i : i + 4])
                tag = png[i + 4 : i + 8]
                body = png[i + 8 : i + 8 + clen]
                if tag == b"IHDR":
                    width, height = struct.unpack(">II", body[:8])
                elif tag == b"IDAT":
                    idat += body
                i += 12 + clen
            raw = zlib.decompress(idat)
            stride = width * 3 + 1
            rows = [
                np.frombuffer(raw[y * stride + 1 : (y + 1) * stride], np.uint8)
                for y in range(height)
            ]
            assert all(raw[y * stride] == 0 for y in range(height))
            return np.stack(rows).reshape(height, width, 3)

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "std_all": [],
            }
            for doc_id in pdf["doc_id"]:
                px = decode_png(synth_png(int(doc_id))).astype(np.float64)
                out["doc_id"].append(int(doc_id))
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["mean_r"].append(round(px[:, :, 0].mean(), 6))
                out["mean_g"].append(round(px[:, :, 1].mean(), 6))
                out["mean_b"].append(round(px[:, :, 2].mean(), 6))
                out["std_all"].append(round(px.std(), 6))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, width int, height int, "
            "mean_r double, mean_g double, mean_b double, std_all double"
        ),
    )


_RESIZE_ORACLE = """
    WITH p AS (
        SELECT doc_id,
               CAST(doc_id % 200 AS BIGINT) AS base,
               CAST(doc_id % 256 AS BIGINT) AS bb
        FROM documents
    )
    SELECT doc_id, 4 AS width, 4 AS height,
           CAST(16 * base + 96 AS BIGINT) AS sum_r,
           CAST(16 * base + 96 AS BIGINT) AS sum_g,
           CAST(16 * bb AS BIGINT) AS sum_b,
           CAST(base + 12 AS INTEGER) AS corner_r,
           CAST(bb AS INTEGER) AS corner_b
    FROM p
"""
# Closed-form twin of the top-left-anchored 4x nearest-neighbor grid:
# sampled columns x in {0,4,8,12} give sum_r = 16*base + 4*(0+4+8+12),
# rows likewise for G, B constant; the (3,3) output pixel samples
# source (12,12), pinning the anchor convention (a center-anchored
# sampler would read source (14,14) and report corner_r = base + 14).


@query("multimodal_image_resize", oracle=_RESIZE_ORACLE)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE over real decoded pixels — the preprocessing step
    a vision-data pipeline runs on every image (reference has no
    multimodal surface; this extends the decode family the brief
    names: decode / feature-extract / RESIZE / frame-sample).

    Decodes the same genuine 16×16 RGB PNGs as
    multimodal_image_stats (chunk walk, zlib inflate, filter strip),
    then downsamples 4× by top-left-anchored nearest neighbor —
    ``px[::4, ::4]``, source pixel (4i, 4j) for output (i, j), the
    convention pinned by the oracle's corner_r — and reports exact
    integer channel sums plus the (3, 3) corner pixel. Integer-only
    output keeps the DuckDB closed-form oracle bit-exact.

    Scale: one Arrow-batched mapInPandas stream per partition (decode
    and resample are per-row, no shuffle); at 100 TB the resize is
    embarrassingly parallel and output shrinks 16× before anything
    downstream touches it."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        w, h = IMG_W, IMG_H

        def chunk(tag: bytes, body: bytes) -> bytes:
            crc = zlib.crc32(tag + body) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", crc)
            )

        def synth_png(doc_id: int) -> bytes:
            base = doc_id % 200
            xs = np.arange(w, dtype=np.uint16)
            ys = np.arange(h, dtype=np.uint16)
            r = np.broadcast_to((base + xs) % 256, (h, w))
            g = np.broadcast_to(((base + ys) % 256)[:, None], (h, w))
            b = np.full((h, w), doc_id % 256)
            px = np.stack([r, g, b], axis=2).astype(np.uint8)
            raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        def decode_png(png: bytes):
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            i = 8
            width = height = None
            idat = b""
            while i + 8 <= len(png):
                (clen,) = struct.unpack(">I", png[i : i + 4])
                tag = png[i + 4 : i + 8]
                body = png[i + 8 : i + 8 + clen]
                if tag == b"IHDR":
                    width, height = struct.unpack(">II", body[:8])
                elif tag == b"IDAT":
                    idat += body
                i += 12 + clen
            raw = zlib.decompress(idat)
            stride = width * 3 + 1
            rows = [
                np.frombuffer(
                    raw[y * stride + 1 : (y + 1) * stride], np.uint8
                )
                for y in range(height)
            ]
            assert all(raw[y * stride] == 0 for y in range(height))
            return np.stack(rows).reshape(height, width, 3)

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "corner_r": [], "corner_b": [],
            }
            for doc_id in pdf["doc_id"]:
                px = decode_png(synth_png(int(doc_id)))
                small = px[::4, ::4].astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["height"].append(small.shape[0])
                out["width"].append(small.shape[1])
                out["sum_r"].append(int(small[:, :, 0].sum()))
                out["sum_g"].append(int(small[:, :, 1].sum()))
                out["sum_b"].append(int(small[:, :, 2].sum()))
                out["corner_r"].append(int(small[3, 3, 0]))
                out["corner_b"].append(int(small[3, 3, 2]))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, width int, height int, "
            "sum_r bigint, sum_g bigint, sum_b bigint, "
            "corner_r int, corner_b int"
        ),
    )


_JPEG_ORACLE = """
    WITH b AS (
        SELECT doc_id,
               CAST((doc_id * 7 + 0 * 53) % 200 + 28
                  + (doc_id * 7 + 1 * 53) % 200 + 28
                  + (doc_id * 7 + 2 * 53) % 200 + 28
                  + (doc_id * 7 + 3 * 53) % 200 + 28 AS BIGINT) AS vsum
        FROM documents
    )
    SELECT doc_id, 16 AS width, 16 AS height,
           CAST(vsum * 64 AS BIGINT) AS pixel_sum,
           round(vsum * 64 / 256.0, 6) AS mean_px,
           CAST((doc_id * 7) % 200 + 28 + 8 AS INTEGER) AS corner_px
    FROM b
"""
# Closed-form twin: each 8x8 block is the constant
# (doc_id*7 + b*53) % 200 + 28 PLUS two AC basis terms chosen for an
# exact integer IDCT — coefficient 5 at zigzag 14 (raster (0,4)) and
# coefficient 3 at zigzag 39 (raster (4,4)). Both bases have entries
# ±cos(π/4)/2, whose pairwise product is exactly ±1/8, and the q=8
# dequantizer multiplies the encoded value by 8 — so the per-pixel
# contributions are exactly ±5 and ±3 gray levels with alternating
# sign pattern [+,-,-,+,+,-,-,+]. Each pattern sums to ZERO over the
# block (pixel_sum stays 64 * sum(block values)); the top-left pixel
# takes +5 +3, so corner_px = vals[0] + 8 pins that the AC path
# actually decoded (a DC-only decode would return vals[0]). Zigzag 39
# sits 24 zeros after zigzag 14, forcing one ZRL (16-zero run) plus a
# run-8 symbol — both AC run-length branches execute on every block.


@query("multimodal_jpeg_decode", oracle=_JPEG_ORACLE)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG entropy decode, stdlib+numpy only — closes
    the "JPEG pixels stubbed" gap for the entropy-coded layer:
    synthesis writes genuine JFIF baseline streams (DQT, SOF0, DHT
    with Annex-K DC codes, SOS, byte-stuffed entropy data) and the
    decoder is a real one — marker walk, Huffman table construction
    from BITS/HUFFVAL, MSB-first bit reader with 0xFF00 unstuffing,
    DC prediction + EXTEND, AC run-length/EOB handling, dequantize,
    inverse zigzag, float64 IDCT, level shift.

    Exactness: the synthesized blocks are a constant (DC) plus two AC
    basis functions picked so the IDCT is integer-exact — the (0,4)
    and (4,4) DCT bases have entries ±cos(π/4)/2 whose products are
    exactly ±1/8, cancelling the q=8 dequantizer into per-pixel
    contributions of exactly ±coefficient gray levels (see the oracle
    comment). The second AC sits 24 zigzag zeros after the first, so
    EVERY block exercises the ZRL (16-zero) and run-length branches,
    and the ``corner_px`` column (= base + 8) fails if the AC path is
    skipped. General gradient JPEGs would reproduce the encoder's
    quantized coefficients, not the source pixels — that roundtrip is
    what the quantization-loss contract of JPEG means, not a decoder
    limitation. Chroma subsampling is covered by the 3-component
    :func:`multimodal_jpeg_chroma420` entry and video containers by
    :func:`multimodal_video_framesample`; the remaining out-of-scope
    surface is real photographic codecs (no media libs to
    cross-check).

    Scale: same shape as the other media passes — one Arrow-batched
    mapInPandas stream per partition, no shuffle, payload column
    prunable when untouched."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        ZIGZAG = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63,
        ]
        # JPEG Annex K.3.1 luminance DC code lengths/values
        DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        DC_VALS = list(range(12))
        # AC table: EOB, ZRL, and the two run/size symbols the
        # synthetic blocks emit — run-13/size-3 (0xD3, the zigzag-14
        # coefficient) and run-8/size-2 (0x82, the zigzag-39
        # coefficient after a ZRL). Canonical incomplete Huffman:
        # lengths 1,2,3,4 (Kraft sum 15/16 < 1).
        AC_BITS = [1, 1, 1, 1] + [0] * 12
        AC_VALS = [0x00, 0xF0, 0xD3, 0x82]
        QUANT = 8
        # encoded AC values: contributions are exactly ±AC1/±AC2 gray
        # levels per pixel (basis product ±1/8 × dequant 8)
        AC1, AC2 = 5, 3

        def huff_codes(bits, vals):
            code, k, out = 0, 0, {}
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return out

        DC_ENC = huff_codes(DC_BITS, DC_VALS)
        AC_ENC = huff_codes(AC_BITS, AC_VALS)

        # orthonormal 8x8 DCT-II basis
        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
        T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, code, ln):
                for i in range(ln - 1, -1, -1):
                    self.acc = (self.acc << 1) | ((code >> i) & 1)
                    self.n += 1
                    if self.n == 8:
                        self.out.append(self.acc)
                        if self.acc == 0xFF:
                            self.out.append(0x00)
                        self.acc = 0
                        self.n = 0

            def flush(self):
                while self.n:
                    self.put(1, 1)
                return bytes(self.out)

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        def synth_jpeg(doc_id: int) -> bytes:
            # base in [28, 227]; AC deviations ±(AC1+AC2) = ±8 keep
            # every pixel inside [20, 235] — no clipping, so the
            # closed-form oracle holds exactly
            vals = [(doc_id * 7 + b * 53) % 200 + 28 for b in range(4)]
            bw = BitWriter()
            pred = 0
            for v in vals:
                diff = (v - 128) - pred
                pred = v - 128
                s = diff if diff >= 0 else -diff
                size = s.bit_length()
                code, ln = DC_ENC[size]
                bw.put(code, ln)
                if size:
                    bits = diff if diff >= 0 else diff + (1 << size) - 1
                    bw.put(bits & ((1 << size) - 1), size)
                # AC1 at zigzag 14: 13-zero run, size 3
                c, ln = AC_ENC[0xD3]
                bw.put(c, ln)
                bw.put(AC1, 3)
                # AC2 at zigzag 39: 24 zeros = ZRL(16) + run 8, size 2
                c, ln = AC_ENC[0xF0]
                bw.put(c, ln)
                c, ln = AC_ENC[0x82]
                bw.put(c, ln)
                bw.put(AC2, 2)
                c, ln = AC_ENC[0x00]  # EOB: zigzag 40..63 all zero
                bw.put(c, ln)
            dqt = bytes([0x00]) + bytes([QUANT] * 64)
            sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
            dht = (
                bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
                + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
            )
            sos = bytes([1, 1, 0x00, 0, 63, 0])
            return (
                b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
                + seg(0xC4, dht) + seg(0xDA, sos) + bw.flush()
                + b"\xff\xd9"
            )

        def huff_decoder(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class BitReader:
            def __init__(self, data):
                self.d = data
                self.i = 0
                self.acc = 0
                self.n = 0

            def bit(self):
                if self.n == 0:
                    b = self.d[self.i]
                    self.i += 1
                    if b == 0xFF:  # stuffing
                        assert self.d[self.i] == 0x00
                        self.i += 1
                    self.acc = b
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def read(self, n):
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v

            def symbol(self, table):
                code, ln = 0, 0
                while True:
                    code = (code << 1) | self.bit()
                    ln += 1
                    if (ln, code) in table:
                        return table[(ln, code)]
                    assert ln <= 16

        def extend(v, s):
            return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

        def decode_jpeg(data: bytes):
            i = 2  # past SOI
            qt = dc_tab = ac_tab = None
            w = h = None
            while True:
                assert data[i] == 0xFF
                marker = data[i + 1]
                if marker == 0xD9:
                    break
                (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
                body = data[i + 4 : i + 2 + ln]
                if marker == 0xDB:
                    assert body[0] == 0x00  # 8-bit table 0
                    qt = np.array(list(body[1:65]), dtype=np.float64)
                elif marker == 0xC0:
                    _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                    assert ncomp == 1 and body[7] == 0x11
                elif marker == 0xC4:
                    j = 0
                    while j < len(body):
                        tc_th = body[j]
                        bits = list(body[j + 1 : j + 17])
                        nv = sum(bits)
                        vals = list(body[j + 17 : j + 17 + nv])
                        tab = huff_decoder(bits, vals)
                        if tc_th >> 4 == 0:
                            dc_tab = tab
                        else:
                            ac_tab = tab
                        j += 17 + nv
                elif marker == 0xDA:
                    i += 2 + ln
                    break
                i += 2 + ln
            br = BitReader(data[i:])
            bw_, bh_ = w // 8, h // 8
            img = np.zeros((h, w), dtype=np.uint8)
            pred = 0
            for by in range(bh_):
                for bx in range(bw_):
                    zz = np.zeros(64, dtype=np.float64)
                    s = br.symbol(dc_tab)
                    diff = extend(br.read(s), s) if s else 0
                    pred += diff
                    zz[0] = pred
                    k = 1
                    while k < 64:
                        rs = br.symbol(ac_tab)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        sz = rs & 0x0F
                        zz[k] = extend(br.read(sz), sz)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[ZIGZAG] = zz * qt
                    F2 = coef.reshape(8, 8)
                    px = T.T @ F2 @ T + 128.0
                    img[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = np.clip(np.round(px), 0, 255).astype(np.uint8)
            return img

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "pixel_sum": [], "mean_px": [], "corner_px": [],
            }
            for doc_id in pdf["doc_id"]:
                img = decode_jpeg(synth_jpeg(int(doc_id)))
                total = int(img.sum(dtype=np.int64))
                out["doc_id"].append(int(doc_id))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["pixel_sum"].append(total)
                out["mean_px"].append(round(total / img.size, 6))
                out["corner_px"].append(int(img[0, 0]))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, width int, height int, "
            "pixel_sum bigint, mean_px double, corner_px int"
        ),
    )


_JPEG420_ORACLE = """
    WITH p AS (
        SELECT doc_id,
               CAST( (doc_id * 7          ) % 160 + 48
                   + (doc_id * 7 +  1 * 53) % 160 + 48
                   + (doc_id * 7 +  2 * 53) % 160 + 48
                   + (doc_id * 7 +  3 * 53) % 160 + 48 AS BIGINT)
                   AS ybase_sum,
               CAST(doc_id % 21 - 10 AS BIGINT) AS cbd,
               CAST((doc_id * 3) % 21 - 10 AS BIGINT) AS crd
        FROM documents
    )
    SELECT doc_id, 16 AS width, 16 AS height,
           CAST(ybase_sum * 64 + 256 * round(1.402 * crd) AS BIGINT)
               AS r_sum,
           CAST(ybase_sum * 64
                + 256 * round(-0.344136 * cbd - 0.714136 * crd)
               AS BIGINT) AS g_sum,
           CAST(ybase_sum * 64 + 256 * round(1.772 * cbd) AS BIGINT)
               AS b_sum,
           CAST((doc_id * 7) % 160 + 48 + 8 + round(1.402 * crd)
               AS INTEGER) AS corner_r
    FROM p
"""
# Closed form for the 4:2:0 entry: the MCU's four luma blocks are the
# same DC+zero-sum-AC construction the grayscale entry proves exact
# (bases (doc_id*7 + b*53) % 160 + 48, AC pair ±5/±3, corner +8), so
# Y.sum() = 64·Σ bases and corner Y = base₀+8. Chroma is DC-only:
# Cb = 128 + doc_id%21-10, Cr = 128 + (3·doc_id)%21-10, replicated
# 2×2 by the upsampler — every pixel gets the SAME color offset, and
# since Y is integer-valued, round(Y + off) = Y + round(off) pixelwise
# (no ±.5 ties exist anywhere in the cbd/crd ∈ [-10,10] domain —
# enumerated over exact rationals), so each channel sum is
# Y_sum + 256·round(offset) and no pixel leaves [22, 233] (no
# clipping). All output columns are integers: nothing float crosses
# the engine boundary.


@query("multimodal_jpeg_chroma420", oracle=_JPEG420_ORACLE)
def multimodal_jpeg_chroma420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Color baseline JPEG with 4:2:0 chroma subsampling — closes the
    "chroma subsampling out of scope" note on the grayscale entry.
    The synthesized streams are genuine 3-component JFIF files
    (SOF0 with per-component sampling factors 0x22/0x11/0x11, one
    interleaved scan), and the decoder is the real general shape: it
    READS the sampling factors from SOF0, walks MCUs in interleaved
    order (Y₀₀ Y₀₁ Y₁₀ Y₁₁ Cb Cr per 16×16 MCU), keeps one DC
    predictor per component, assembles per-component planes at native
    resolution, box-replicates chroma up to the luma grid (the JFIF
    upsampler), and converts YCbCr→RGB with the BT.601 constants —
    nothing is special-cased to the synthetic content except the
    oracle's closed form.

    Exactness: see the oracle comment — luma is the grayscale entry's
    integer-exact DC+AC construction; constant chroma makes the color
    conversion a per-pixel integer shift with no rounding ties and no
    clipping, so channel sums are pinned exactly. The decoded corner
    pixel (base₀ + 8 + round(1.402·crd)) fails if the AC path, the
    MCU interleave order, OR the upsample/conversion is wrong.

    Scale: identical to the other media entries — synthesis and
    decode run inside one Arrow-batched mapInPandas pass, no shuffle,
    no driver traffic; at 100 TB the binary column streams through
    executors partition-local."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        ZIGZAG = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63,
        ]
        DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        DC_VALS = list(range(12))
        AC_BITS = [1, 1, 1, 1] + [0] * 12
        AC_VALS = [0x00, 0xF0, 0xD3, 0x82]
        QUANT = 8
        AC1, AC2 = 5, 3

        def huff_codes(bits, vals):
            code, k, out = 0, 0, {}
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return out

        DC_ENC = huff_codes(DC_BITS, DC_VALS)
        AC_ENC = huff_codes(AC_BITS, AC_VALS)

        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
        T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, code, ln):
                for i in range(ln - 1, -1, -1):
                    self.acc = (self.acc << 1) | ((code >> i) & 1)
                    self.n += 1
                    if self.n == 8:
                        self.out.append(self.acc)
                        if self.acc == 0xFF:
                            self.out.append(0x00)
                        self.acc = 0
                        self.n = 0

            def flush(self):
                while self.n:
                    self.put(1, 1)
                return bytes(self.out)

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        def put_dc(bw, diff):
            s = diff if diff >= 0 else -diff
            size = s.bit_length()
            code, ln = DC_ENC[size]
            bw.put(code, ln)
            if size:
                bits = diff if diff >= 0 else diff + (1 << size) - 1
                bw.put(bits & ((1 << size) - 1), size)

        def put_luma_ac(bw):
            c, ln = AC_ENC[0xD3]  # 13-zero run, size 3 → zigzag 14
            bw.put(c, ln)
            bw.put(AC1, 3)
            c, ln = AC_ENC[0xF0]  # ZRL
            bw.put(c, ln)
            c, ln = AC_ENC[0x82]  # run 8, size 2 → zigzag 39
            bw.put(c, ln)
            bw.put(AC2, 2)
            c, ln = AC_ENC[0x00]  # EOB
            bw.put(c, ln)

        def synth_jpeg420(doc_id: int) -> bytes:
            ybases = [(doc_id * 7 + b * 53) % 160 + 48 for b in range(4)]
            cb = 128 + doc_id % 21 - 10
            cr = 128 + (doc_id * 3) % 21 - 10
            bw = BitWriter()
            pred = 0
            for v in ybases:  # MCU order: Y00 Y01 Y10 Y11
                put_dc(bw, (v - 128) - pred)
                pred = v - 128
                put_luma_ac(bw)
            for v in (cb, cr):  # then Cb, Cr: DC-only blocks
                put_dc(bw, v - 128)
                c, ln = AC_ENC[0x00]
                bw.put(c, ln)
            dqt = bytes([0x00]) + bytes([QUANT] * 64)
            sof = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
                [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
            )
            dht = (
                bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
                + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
            )
            sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
            return (
                b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
                + seg(0xC4, dht) + seg(0xDA, sos) + bw.flush()
                + b"\xff\xd9"
            )

        def huff_decoder(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class BitReader:
            def __init__(self, data):
                self.d = data
                self.i = 0
                self.acc = 0
                self.n = 0

            def bit(self):
                if self.n == 0:
                    b = self.d[self.i]
                    self.i += 1
                    if b == 0xFF:
                        assert self.d[self.i] == 0x00
                        self.i += 1
                    self.acc = b
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def read(self, n):
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v

            def symbol(self, table):
                code, ln = 0, 0
                while True:
                    code = (code << 1) | self.bit()
                    ln += 1
                    if (ln, code) in table:
                        return table[(ln, code)]
                    assert ln <= 16

        def extend(v, s):
            return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

        def decode_jpeg420(data: bytes):
            i = 2
            qt, dc_tabs, ac_tabs = {}, {}, {}
            comps = scan = None
            w = h = None
            while True:
                assert data[i] == 0xFF
                marker = data[i + 1]
                assert marker != 0xD9, "hit EOI before SOS"
                (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
                body = data[i + 4 : i + 2 + ln]
                if marker == 0xDB:
                    qt[body[0] & 0x0F] = np.array(
                        list(body[1:65]), dtype=np.float64
                    )
                elif marker == 0xC0:
                    _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                    comps = []
                    for c in range(ncomp):
                        cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                        comps.append((cid, hv >> 4, hv & 0x0F, tq))
                elif marker == 0xC4:
                    j = 0
                    while j < len(body):
                        tc_th = body[j]
                        bits = list(body[j + 1 : j + 17])
                        nv = sum(bits)
                        tab = huff_decoder(
                            bits, list(body[j + 17 : j + 17 + nv])
                        )
                        if tc_th >> 4 == 0:
                            dc_tabs[tc_th & 0x0F] = tab
                        else:
                            ac_tabs[tc_th & 0x0F] = tab
                        j += 17 + nv
                elif marker == 0xDA:
                    ns = body[0]
                    scan = []
                    for c in range(ns):
                        cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                        ci = next(
                            k for k, cc in enumerate(comps) if cc[0] == cs
                        )
                        scan.append((ci, tt >> 4, tt & 0x0F))
                    i += 2 + ln
                    break
                i += 2 + ln
            br = BitReader(data[i:])
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            planes = [
                np.zeros((mcuy * 8 * c[2], mcux * 8 * c[1]))
                for c in comps
            ]
            pred = [0] * len(comps)
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, td, ta in scan:
                        _, hc, vc, tq = comps[ci]
                        for by in range(vc):
                            for bx in range(hc):
                                zz = np.zeros(64, dtype=np.float64)
                                s = br.symbol(dc_tabs[td])
                                pred[ci] += (
                                    extend(br.read(s), s) if s else 0
                                )
                                zz[0] = pred[ci]
                                k = 1
                                while k < 64:
                                    rs = br.symbol(ac_tabs[ta])
                                    if rs == 0x00:
                                        break
                                    if rs == 0xF0:
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    sz = rs & 0x0F
                                    zz[k] = extend(br.read(sz), sz)
                                    k += 1
                                coef = np.zeros(64, dtype=np.float64)
                                coef[ZIGZAG] = zz * qt[tq]
                                blk = T.T @ coef.reshape(8, 8) @ T + 128.0
                                planes[ci][
                                    (my * vc + by) * 8 : (my * vc + by + 1) * 8,
                                    (mx * hc + bx) * 8 : (mx * hc + bx + 1) * 8,
                                ] = blk
            def up(ci):
                p = planes[ci]
                _, hc, vc, _ = comps[ci]
                return np.repeat(
                    np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1
                )[:h, :w]

            Y = planes[0][:h, :w]
            Cb, Cr = up(1), up(2)
            R = np.clip(np.round(Y + 1.402 * (Cr - 128.0)), 0, 255)
            G = np.clip(
                np.round(
                    Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
                ),
                0, 255,
            )
            B = np.clip(np.round(Y + 1.772 * (Cb - 128.0)), 0, 255)
            return R, G, B

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "r_sum": [], "g_sum": [], "b_sum": [], "corner_r": [],
            }
            for doc_id in pdf["doc_id"]:
                R, G, B = decode_jpeg420(synth_jpeg420(int(doc_id)))
                out["doc_id"].append(int(doc_id))
                out["height"].append(R.shape[0])
                out["width"].append(R.shape[1])
                out["r_sum"].append(int(R.sum(dtype=np.int64)))
                out["g_sum"].append(int(G.sum(dtype=np.int64)))
                out["b_sum"].append(int(B.sum(dtype=np.int64)))
                out["corner_r"].append(int(R[0, 0]))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, width int, height int, "
            "r_sum bigint, g_sum bigint, b_sum bigint, corner_r int"
        ),
    )


_VIDEO_ORACLE = """
    WITH f AS (
        SELECT d.doc_id, u.f
        FROM documents d,
             UNNEST(generate_series(0, CAST(d.doc_id % 5 + 2 AS BIGINT), 2))
                 AS u(f)
    ),
    s AS (
        SELECT doc_id,
               CAST(count(*) AS INTEGER) AS n_sampled,
               CAST(sum(  (doc_id * 7 + f * 11 + 0 * 53) % 200 + 28
                        + (doc_id * 7 + f * 11 + 1 * 53) % 200 + 28
                        + (doc_id * 7 + f * 11 + 2 * 53) % 200 + 28
                        + (doc_id * 7 + f * 11 + 3 * 53) % 200 + 28
                   ) * 64 AS BIGINT) AS pixel_sum
        FROM f GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.doc_id % 5 + 3 AS INTEGER) AS n_frames,
           s.n_sampled,
           16 AS width, 16 AS height,
           s.pixel_sum,
           round(s.pixel_sum / (256.0 * s.n_sampled), 6) AS mean_px,
           CAST((d.doc_id * 7) % 200 + 28 + 8 AS INTEGER) AS first_corner_px
    FROM documents d JOIN s USING (doc_id)
"""
# Closed-form twin of the AVI entry: video doc_id has
# n = doc_id % 5 + 3 frames (3..7); sampling every 2nd frame keeps
# f = 0, 2, ... (generate_series stop n-1 inclusive → ceil(n/2)
# samples). Frame f block b is the constant
# (doc_id*7 + f*11 + b*53) % 200 + 28 plus the same zero-sum AC pair
# the JPEG entry proves exact (±5/±3 with corner +8), so per-frame
# pixel_sum is 64 * Σ_b base and first_corner_px pins the AC path on
# the first sampled frame.


@query("multimodal_video_framesample", oracle=_VIDEO_ORACLE)
def multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container parsing + frame sampling — upgrades the
    former byte-offset stub (:func:`extract_frames_stub`) to a genuine
    RIFF/AVI walk over MJPEG streams, the published container layout
    (msdn AVIMAINHEADER/AVISTREAMHEADER; RIFF chunks are word-aligned,
    and the synthesizer forces odd-length frame payloads so the pad
    byte handling is exercised on every chunk).

    Synthesis writes a complete AVI: RIFF('AVI ') → LIST(hdrl) with
    avih + LIST(strl)(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) →
    LIST(movi) with one '00dc' chunk per frame (each a real baseline
    JFIF stream, the JPEG entry's integer-exact block construction) →
    idx1. The reader walks the chunk tree (no offset shortcuts),
    cross-checks avih dwTotalFrames against the movi chunk count,
    samples every 2nd frame, and entropy-decodes only the sampled
    frames — the honest scope line moves to "real codecs (H.264)
    absent"; the container layer is no longer stubbed.

    Scale: frame extraction is the row-multiplying step
    (n_frames × docs); sampling happens INSIDE the Arrow batch before
    any decode, so unsampled frames cost a chunk-header skip, not a
    decode — the pattern that matters when a 100 TB corpus holds
    hour-long videos: never decode what the sampler drops. One
    mapInPandas pass, no shuffle."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        ZIGZAG = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63,
        ]
        DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        DC_VALS = list(range(12))
        AC_BITS = [1, 1, 1, 1] + [0] * 12
        AC_VALS = [0x00, 0xF0, 0xD3, 0x82]
        QUANT = 8
        AC1, AC2 = 5, 3
        SAMPLE_EVERY = 2

        def huff_codes(bits, vals):
            code, k, out = 0, 0, {}
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return out

        DC_ENC = huff_codes(DC_BITS, DC_VALS)
        AC_ENC = huff_codes(AC_BITS, AC_VALS)
        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
        T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, code, ln):
                for i in range(ln - 1, -1, -1):
                    self.acc = (self.acc << 1) | ((code >> i) & 1)
                    self.n += 1
                    if self.n == 8:
                        self.out.append(self.acc)
                        if self.acc == 0xFF:
                            self.out.append(0x00)
                        self.acc = 0
                        self.n = 0

            def flush(self):
                while self.n:
                    self.put(1, 1)
                return bytes(self.out)

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        def synth_frame(doc_id: int, f: int) -> bytes:
            vals = [(doc_id * 7 + f * 11 + b * 53) % 200 + 28 for b in range(4)]
            bw = BitWriter()
            pred = 0
            for v in vals:
                diff = (v - 128) - pred
                pred = v - 128
                s = diff if diff >= 0 else -diff
                size = s.bit_length()
                code, ln = DC_ENC[size]
                bw.put(code, ln)
                if size:
                    bits = diff if diff >= 0 else diff + (1 << size) - 1
                    bw.put(bits & ((1 << size) - 1), size)
                c, ln = AC_ENC[0xD3]
                bw.put(c, ln)
                bw.put(AC1, 3)
                c, ln = AC_ENC[0xF0]
                bw.put(c, ln)
                c, ln = AC_ENC[0x82]
                bw.put(c, ln)
                bw.put(AC2, 2)
                c, ln = AC_ENC[0x00]
                bw.put(c, ln)
            dqt = bytes([0x00]) + bytes([QUANT] * 64)
            sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
            dht = (
                bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
                + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
            )
            sos = bytes([1, 1, 0x00, 0, 63, 0])
            jp = (
                b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
                + seg(0xC4, dht) + seg(0xDA, sos) + bw.flush()
                + b"\xff\xd9"
            )
            if len(jp) % 2 == 0:
                # force odd payloads so every movi chunk needs its RIFF
                # pad byte — the alignment branch runs on every frame
                jp = jp[:2] + seg(0xFE, b"p") + jp[2:]
            return jp

        def chunk(fourcc: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(listtype: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", listtype + body)

        def synth_avi(doc_id: int) -> bytes:
            n = doc_id % 5 + 3
            frames = [synth_frame(doc_id, f) for f in range(n)]
            avih = struct.pack(
                "<10I", 40000, 0, 0, 0x10, n, 0, 1, max(map(len, frames)),
                16, 16,
            ) + b"\x00" * 16
            strh = (
                b"vidsMJPG" + struct.pack("<IHHIIIIIII", 0, 0, 0, 0, 1, 25,
                                          0, n, 0, 10000)
                + struct.pack("<I", 0) + struct.pack("<4H", 0, 0, 16, 16)
            )
            strf = struct.pack(
                "<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG", 16 * 16 * 3,
                0, 0, 0, 0,
            )
            hdrl = lst(
                b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
            )
            movi_items = [chunk(b"00dc", fr) for fr in frames]
            movi = lst(b"movi", b"".join(movi_items))
            off, idx = 4, b""
            for it, fr in zip(movi_items, frames):
                idx += b"00dc" + struct.pack("<III", 0x10, off, len(fr))
                off += len(it)
            return chunk(b"RIFF", b"AVI " + hdrl + movi + chunk(b"idx1", idx))

        def riff_children(body: bytes):
            i = 0
            while i + 8 <= len(body):
                fourcc = body[i : i + 4]
                (ln,) = struct.unpack("<I", body[i + 4 : i + 8])
                yield fourcc, body[i + 8 : i + 8 + ln]
                i += 8 + ln + (ln & 1)  # word alignment

        def parse_avi(data: bytes):
            assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
            n_frames = w = h = None
            frames = []
            for fourcc, body in riff_children(data[12 : 8 + struct.unpack("<I", data[4:8])[0]]):
                if fourcc != b"LIST":
                    continue
                if body[:4] == b"hdrl":
                    for cc, b2 in riff_children(body[4:]):
                        if cc == b"avih":
                            hdr = struct.unpack("<10I", b2[:40])
                            n_frames, w, h = hdr[4], hdr[8], hdr[9]
                elif body[:4] == b"movi":
                    for cc, b2 in riff_children(body[4:]):
                        if cc == b"00dc":
                            frames.append(b2)
            assert n_frames == len(frames), "avih/movi frame count mismatch"
            return w, h, frames

        def huff_decoder(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class BitReader:
            def __init__(self, data):
                self.d = data
                self.i = 0
                self.acc = 0
                self.n = 0

            def bit(self):
                if self.n == 0:
                    b = self.d[self.i]
                    self.i += 1
                    if b == 0xFF:
                        assert self.d[self.i] == 0x00
                        self.i += 1
                    self.acc = b
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def read(self, n):
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v

            def symbol(self, table):
                code, ln = 0, 0
                while True:
                    code = (code << 1) | self.bit()
                    ln += 1
                    if (ln, code) in table:
                        return table[(ln, code)]
                    assert ln <= 16

        def extend(v, s):
            return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

        def decode_jpeg(data: bytes):
            i = 2
            qt = dc_tab = ac_tab = None
            w = h = None
            while True:
                assert data[i] == 0xFF
                marker = data[i + 1]
                if marker == 0xD9:
                    break
                (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
                body = data[i + 4 : i + 2 + ln]
                if marker == 0xDB:
                    qt = np.array(list(body[1:65]), dtype=np.float64)
                elif marker == 0xC0:
                    _, h, w, _ = struct.unpack(">BHHB", body[:6])
                elif marker == 0xC4:
                    j = 0
                    while j < len(body):
                        tc_th = body[j]
                        bits = list(body[j + 1 : j + 17])
                        nv = sum(bits)
                        vals = list(body[j + 17 : j + 17 + nv])
                        tab = huff_decoder(bits, vals)
                        if tc_th >> 4 == 0:
                            dc_tab = tab
                        else:
                            ac_tab = tab
                        j += 17 + nv
                elif marker == 0xDA:
                    i += 2 + ln
                    break
                i += 2 + ln
            br = BitReader(data[i:])
            img = np.zeros((h, w), dtype=np.uint8)
            pred = 0
            for by in range(h // 8):
                for bx in range(w // 8):
                    zz = np.zeros(64, dtype=np.float64)
                    s = br.symbol(dc_tab)
                    diff = extend(br.read(s), s) if s else 0
                    pred += diff
                    zz[0] = pred
                    k = 1
                    while k < 64:
                        rs = br.symbol(ac_tab)
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        k += rs >> 4
                        sz = rs & 0x0F
                        zz[k] = extend(br.read(sz), sz)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[ZIGZAG] = zz * qt
                    px = T.T @ coef.reshape(8, 8) @ T + 128.0
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.round(px), 0, 255
                    ).astype(np.uint8)
            return img

        for pdf in batches:
            out = {
                "doc_id": [], "n_frames": [], "n_sampled": [],
                "width": [], "height": [], "pixel_sum": [],
                "mean_px": [], "first_corner_px": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, frames = parse_avi(synth_avi(d))
                sampled = frames[::SAMPLE_EVERY]
                total = 0
                first_corner = None
                for fr in sampled:
                    img = decode_jpeg(fr)
                    total += int(img.sum(dtype=np.int64))
                    if first_corner is None:
                        first_corner = int(img[0, 0])
                out["doc_id"].append(d)
                out["n_frames"].append(len(frames))
                out["n_sampled"].append(len(sampled))
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(total)
                out["mean_px"].append(
                    round(total / (w * h * len(sampled)), 6)
                )
                out["first_corner_px"].append(first_corner)
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, n_frames int, n_sampled int, width int, "
            "height int, pixel_sum bigint, mean_px double, "
            "first_corner_px int"
        ),
    )


_JPEG_PROG_ORACLE = """
    WITH b AS (
        SELECT doc_id,
               CAST((doc_id * 7 + 0 * 53) % 200 + 28
                  + (doc_id * 7 + 1 * 53) % 200 + 28
                  + (doc_id * 7 + 2 * 53) % 200 + 28
                  + (doc_id * 7 + 3 * 53) % 200 + 28 AS BIGINT) AS vsum
        FROM documents
    )
    SELECT doc_id, 16 AS width, 16 AS height, 4 AS n_scans,
           CAST(vsum * 64 AS BIGINT) AS pixel_sum,
           CAST((doc_id * 7) % 200 + 28 + 9 AS INTEGER) AS corner_px
    FROM b
"""
# Closed-form twin for the PROGRESSIVE entry: the coefficient
# construction extends the baseline one (same ±1/8-exact bases at
# q=8) with a THIRD coefficient of value 1 at zigzag 10 (raster
# (4,0), also a ±cos(π/4)/2 basis) whose point-transformed first-scan
# value (1 >> 1) is ZERO — it exists only through the refinement
# scan's newly-nonzero path, so corner_px = base + 5 + 3 + 1 fails if
# ANY of the four scans (DC first/refine, AC first/refine) is
# mis-decoded.  Every AC basis sums to zero over the block, so
# pixel_sum stays 64·Σbases; deviations ≤ ±9 keep pixels in
# [19, 236] — no clipping, all outputs integer.


@query("multimodal_jpeg_progressive", oracle=_JPEG_PROG_ORACLE)
def multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG (SOF2) decode — the other half of
    real-web JPEG next to the baseline entry (reference has no media
    surface; extension scope per SURVEY §2 notes).  Synthesis writes
    genuine 4-scan progressive streams and the decoder implements the
    full T.81 Annex G receive:

    - scan 1: DC, spectral 0..0, successive approximation Ah=0 Al=1
      (diff-coded point-transformed DC, arithmetic shift);
    - scan 2: DC refinement, Ah=1 Al=0 (one raw appended bit/block);
    - scan 3: AC first, band 1..63, Al=1 — run/size symbols with
      progressive EOB-run semantics, values arriving scaled <<1;
    - scan 4: AC refinement, Ah=1 Al=0 — the G.1.2.3 algorithm:
      correction bits on already-nonzero coefficients interleaved
      with the zero-run decode, newly-significant ±1 insertion (the
      zigzag-10 coefficient exists ONLY here), ZRL skipping 16
      zero-history positions, EOB-run consuming residual corrections.

    Exactness: see _JPEG_PROG_ORACLE's comment.  Scale: one
    Arrow-batched mapInPandas stream per partition, no shuffle."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    ids = t["documents"].select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        ZIGZAG = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
            28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
            37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
            54, 47, 55, 62, 63,
        ]
        DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        DC_VALS = list(range(12))
        # one AC table serving both AC scans: EOB, ZRL, first-scan
        # run/size symbols (13,2)=0xD2 and (8,1)=0x81, refinement
        # newly-nonzero symbol (9,1)=0x91. Canonical complete code:
        # lengths 1,2,3,4,4 (Kraft sum 1).
        AC_BITS = [1, 1, 1, 2] + [0] * 12
        AC_VALS = [0x00, 0xF0, 0xD2, 0x81, 0x91]
        QUANT = 8
        AC1, AC2, AC3 = 5, 3, 1  # zigzag 14, 39, 10

        def huff_codes(bits, vals):
            code, k, out = 0, 0, {}
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return out

        DC_ENC = huff_codes(DC_BITS, DC_VALS)
        AC_ENC = huff_codes(AC_BITS, AC_VALS)

        x = np.arange(8)
        T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
        T[0, :] = 1.0 / (2.0 * np.sqrt(2.0))

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, code, ln):
                for i in range(ln - 1, -1, -1):
                    self.acc = (self.acc << 1) | ((code >> i) & 1)
                    self.n += 1
                    if self.n == 8:
                        self.out.append(self.acc)
                        if self.acc == 0xFF:
                            self.out.append(0x00)
                        self.acc = 0
                        self.n = 0

            def flush(self):
                while self.n:
                    self.put(1, 1)
                return bytes(self.out)

        def seg(marker, body):
            return (
                bytes([0xFF, marker])
                + struct.pack(">H", len(body) + 2)
                + body
            )

        def sos(ss, se, ah, al):
            return seg(
                0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
            )

        def put_dc_diff(bw, diff):
            s = diff if diff >= 0 else -diff
            size = s.bit_length()
            code, ln = DC_ENC[size]
            bw.put(code, ln)
            if size:
                bits = diff if diff >= 0 else diff + (1 << size) - 1
                bw.put(bits & ((1 << size) - 1), size)

        def synth_progressive(doc_id: int) -> bytes:
            vals = [(doc_id * 7 + b * 53) % 200 + 28 for b in range(4)]
            dcs = [v - 128 for v in vals]
            # scan 1: DC first, Al=1 — diff-code arithmetic-shifted DC
            bw = BitWriter()
            pred = 0
            for dc in dcs:
                hi = dc >> 1
                put_dc_diff(bw, hi - pred)
                pred = hi
            scan1 = bw.flush()
            # scan 2: DC refinement — one raw low bit per block
            bw = BitWriter()
            for dc in dcs:
                bw.put(dc & 1, 1)
            scan2 = bw.flush()
            # scan 3: AC first, Al=1 — zz10 carries (1 >> 1) = 0 and
            # vanishes; zz14 → 2 after 13 zeros, zz39 → 1 after
            # ZRL + 8 zeros, then EOB (per-block EOB run of 1)
            bw = BitWriter()
            for _ in dcs:
                c, ln = AC_ENC[0xD2]
                bw.put(c, ln)
                bw.put(AC1 >> 1, 2)  # +2, size 2
                c, ln = AC_ENC[0xF0]
                bw.put(c, ln)
                c, ln = AC_ENC[0x81]
                bw.put(c, ln)
                bw.put(AC2 >> 1, 1)  # +1, size 1
                c, ln = AC_ENC[0x00]
                bw.put(c, ln)
            scan3 = bw.flush()
            # scan 4: AC refinement (G.1.2.3 emit): zz1..9 zero-history
            # (run 9), zz10 newly nonzero +1 → symbol 0x91 + sign bit;
            # zz11..13 still-zero positions consumed by the coefficient
            # placement walk; zz14 nonzero-history → correction bit
            # (5 = 4|1); zz15..38: 24 zero-history → ZRL (16, no
            # embedded corrections) leaves 8 → the run of the NEXT
            # symbol... but the next nonzero-history zz39 only takes a
            # correction bit — refinement runs count up to the next
            # NEWLY-significant coefficient, so after the ZRL the
            # remaining band has no new coefficients: EOB (0,0) whose
            # run consumes the rest, appending correction bits of the
            # remaining nonzero-history coefficients — exactly zz39.
            bw = BitWriter()
            for _ in dcs:
                c, ln = AC_ENC[0x91]
                bw.put(c, ln)
                bw.put(1, 1)  # sign of the new zz10 coefficient: +
                # next symbol: ZRL — its placement walk crosses zz14,
                # so zz14's correction bit rides INSIDE this walk
                # (after the symbol code), then 16 zero-history skips
                # land the cursor past zz26
                c, ln = AC_ENC[0xF0]
                bw.put(c, ln)
                bw.put(AC1 & 1, 1)  # zz14 correction (5 = 4 + 1)
                # EOB run of 1: remaining band corrections append —
                # exactly the zz39 bit (3 = 2 + 1)
                c, ln = AC_ENC[0x00]
                bw.put(c, ln)
                bw.put(AC2 & 1, 1)
            scan4 = bw.flush()
            dqt = bytes([0x00]) + bytes([QUANT] * 64)
            sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
            dht = (
                bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
                + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
            )
            return (
                b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof)
                + seg(0xC4, dht)
                + sos(0, 0, 0, 1) + scan1
                + sos(0, 0, 1, 0) + scan2
                + sos(1, 63, 0, 1) + scan3
                + sos(1, 63, 1, 0) + scan4
                + b"\xff\xd9"
            )

        def huff_decoder(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class BitReader:
            def __init__(self, data):
                self.d = data
                self.i = 0
                self.acc = 0
                self.n = 0

            def bit(self):
                if self.n == 0:
                    b = self.d[self.i]
                    self.i += 1
                    if b == 0xFF:
                        assert self.d[self.i] == 0x00
                        self.i += 1
                    self.acc = b
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def read(self, n):
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v

            def symbol(self, table):
                code, ln = 0, 0
                while True:
                    code = (code << 1) | self.bit()
                    ln += 1
                    if (ln, code) in table:
                        return table[(ln, code)]
                    assert ln <= 16

        def extend(v, s):
            return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

        def decode_progressive(data: bytes):
            i = 2
            qt = dc_tab = ac_tab = None
            w = h = None
            coefs = None  # per-block zigzag-domain coefficients
            n_scans = 0
            while True:
                assert data[i] == 0xFF
                marker = data[i + 1]
                if marker == 0xD9:
                    break
                (ln,) = struct.unpack(">H", data[i + 2 : i + 4])
                body = data[i + 4 : i + 2 + ln]
                if marker == 0xDB:
                    qt = np.array(list(body[1:65]), dtype=np.float64)
                elif marker == 0xC2:
                    _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                    assert ncomp == 1
                    coefs = [
                        np.zeros(64, dtype=np.int64)
                        for _ in range((h // 8) * (w // 8))
                    ]
                elif marker == 0xC4:
                    j = 0
                    while j < len(body):
                        tc_th = body[j]
                        bits = list(body[j + 1 : j + 17])
                        nv = sum(bits)
                        vals = list(body[j + 17 : j + 17 + nv])
                        tab = huff_decoder(bits, vals)
                        if tc_th >> 4 == 0:
                            dc_tab = tab
                        else:
                            ac_tab = tab
                        j += 17 + nv
                elif marker == 0xDA:
                    ss, se = body[3], body[4]
                    ah, al = body[5] >> 4, body[5] & 0x0F
                    # entropy data runs to the next non-stuffing marker
                    j = i + 2 + ln
                    k2 = j
                    while not (
                        data[k2] == 0xFF and data[k2 + 1] != 0x00
                    ):
                        k2 += 1
                    br = BitReader(data[j:k2])
                    n_scans += 1
                    if ss == 0 and ah == 0:  # DC first
                        pred = 0
                        for c in coefs:
                            s = br.symbol(dc_tab)
                            diff = extend(br.read(s), s) if s else 0
                            pred += diff
                            c[0] = pred << al
                    elif ss == 0:  # DC refinement
                        for c in coefs:
                            if br.bit():
                                c[0] |= 1 << al
                    elif ah == 0:  # AC first
                        eobrun = 0
                        for c in coefs:
                            if eobrun:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = br.symbol(ac_tab)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r < 15:
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += br.read(r)
                                        break
                                    k += 16  # ZRL
                                    continue
                                k += r
                                c[k] = extend(br.read(s), s) << al
                                k += 1
                    else:  # AC refinement — T.81 G.1.2.3 receive
                        p1, m1 = 1 << al, -1 << al
                        eobrun = 0
                        for c in coefs:
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = br.symbol(ac_tab)
                                    r, s = rs >> 4, rs & 0x0F
                                    newval = 0
                                    if s == 0:
                                        if r < 15:
                                            eobrun = 1 << r
                                            if r:
                                                eobrun += br.read(r)
                                            break
                                        # ZRL: r stays 15 → skip 16
                                    else:
                                        assert s == 1
                                        newval = p1 if br.bit() else m1
                                    # placement walk: advance over the
                                    # band, refining nonzero-history
                                    # coefficients, counting down r
                                    # zero-history positions
                                    while k <= se:
                                        if c[k] != 0:
                                            if br.bit() and (
                                                c[k] & p1
                                            ) == 0:
                                                c[k] += (
                                                    p1
                                                    if c[k] > 0
                                                    else m1
                                                )
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if newval and k <= se:
                                        c[k] = newval
                                    k += 1
                            if eobrun > 0:
                                # EOB run: refine remaining nonzero-
                                # history coefficients of this block
                                while k <= se:
                                    if c[k] != 0:
                                        if br.bit() and (
                                            c[k] & p1
                                        ) == 0:
                                            c[k] += (
                                                p1 if c[k] > 0 else m1
                                            )
                                    k += 1
                                eobrun -= 1
                    i = k2
                    continue
                i += 2 + ln
            bw_, bh_ = w // 8, h // 8
            img = np.zeros((h, w), dtype=np.uint8)
            for bi, c in enumerate(coefs):
                by, bx = divmod(bi, bw_)
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = c.astype(np.float64) * qt
                F2 = coef.reshape(8, 8)
                px = T.T @ F2 @ T + 128.0
                img[
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ] = np.clip(np.round(px), 0, 255).astype(np.uint8)
            return img, n_scans

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "n_scans": [], "pixel_sum": [], "corner_px": [],
            }
            for doc_id in pdf["doc_id"]:
                img, ns = decode_progressive(
                    synth_progressive(int(doc_id))
                )
                out["doc_id"].append(int(doc_id))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["n_scans"].append(ns)
                out["pixel_sum"].append(int(img.sum(dtype=np.int64)))
                out["corner_px"].append(int(img[0, 0]))
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        run,
        schema=(
            "doc_id bigint, width int, height int, n_scans int, "
            "pixel_sum bigint, corner_px int"
        ),
    )
