"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Three decode tiers:

* REAL image-container decode (`parse_image_meta` / `decode_image_meta`):
  PNG IHDR, GIF logical-screen, and JPEG SOFn dimensions parsed from the
  actual bytes with the stdlib — genuinely implemented semantics,
  oracle-checked (the image generator's dimension formula is the oracle).
* REAL deep pixel decode for gray8 PNGs (`png_gray8_pixels` /
  `decode_image_pixels`): chunk walk with CRC verification, IDAT zlib
  inflate, full per-row filter reconstruction (None/Sub/Up/Average/
  Paeth) — pure stdlib, property-tested across all filter types and
  oracle-checked against the generator's pixel formula.
* REAL deep audio decode for mono PCM16 WAV (`parse_wav_pcm` /
  `decode_audio_pcm_stats`): RIFF chunk walk (word-aligned, fmt-before-
  data, declared sizes honored), sample stream unpacked and reduced to
  integer stats — oracle-checked against the generator's sample formula.
* REAL deep video decode for uncompressed AVI (`parse_avi_frames` /
  `decode_video_frames`): RIFF/AVI walk (LIST hdrl avih header, LIST
  movi '00db'/'00dc' frame chunks, word alignment), frame payloads
  sampled every N and reduced to byte sums — oracle-checked against the
  generator's pixel formula.
* STUBBED residual deep decode (color/interlaced images, compressed
  audio/video codecs — no PIL/ffmpeg in this container): binary
  payloads carry a deterministic fake header `MM1|<kind>|<width>|
  <height>|`; a real decoder drops in behind the `_HAS_PIL` import
  guard. The Spark-side contract — schema, batching, partition behavior
  — is real and tested either way.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id long, kind string, width int, height int, n_bytes long, ok boolean"
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def make_fake_payload(kind, width, height, body):
    """Column expr building a deterministic fake binary payload.
    ``kind`` may be a literal str or a Column."""
    kind_col = F.lit(kind) if isinstance(kind, str) else kind
    return F.encode(
        F.concat_ws(
            "|", F.lit("MM1"), kind_col, width.cast("string"),
            height.cast("string"), body,
        ),
        "utf-8",
    )


def _decode_header(raw: bytes) -> tuple[str, int, int, bool]:
    try:
        parts = raw.decode("utf-8", errors="ignore").split("|", 4)
        if parts[0] != "MM1":
            return ("unknown", -1, -1, False)
        return (parts[1], int(parts[2]), int(parts[3]), True)
    except Exception:
        return ("unknown", -1, -1, False)


def decode_media_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """DF(id, kind, width, height, n_bytes, ok) via mapInPandas.

    Arrow batches stream through the Python worker; no per-row round trips.
    A real decoder would replace `_decode_header` (e.g. PIL image open on
    BytesIO) — signature and plan shape are identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raws = pdf[bin_col]
            meta = [_decode_header(bytes(r)) if r is not None else ("null", -1, -1, False) for r in raws]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "kind": [m[0] for m in meta],
                    "width": pd.array([m[1] for m in meta], dtype="int32"),
                    "height": pd.array([m[2] for m in meta], dtype="int32"),
                    "n_bytes": [len(bytes(r)) if r is not None else 0 for r in raws],
                    "ok": [m[3] for m in meta],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, META_SCHEMA)


REAL_IMAGE_KINDS = ("png", "gif", "jpeg")


def synth_image_bytes(kind: str, width: int, height: int) -> bytes:
    """A REAL, well-formed minimal image file of the given dimensions —
    stdlib only. Used by fixtures/tests so the parser below is exercised
    against genuine container formats, not fake headers."""
    import struct
    import zlib

    if kind == "png":
        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray8
        raw = b"".join(
            b"\x00" + bytes((x * 7 + y) % 256 for x in range(width))
            for y in range(height)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
    if kind == "gif":
        return (
            b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b"
        )
    if kind == "jpeg":
        # SOI, APP0/JFIF, SOF0 (baseline, carries the dimensions), EOI
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9"
        )
    raise ValueError(f"unknown kind {kind!r}")


def parse_image_meta(raw: bytes) -> tuple[str, int, int, bool]:
    """(kind, width, height, ok) parsed from REAL image bytes — PNG IHDR,
    GIF logical screen descriptor, JPEG SOFn marker walk. Pure stdlib, so
    the decode semantics are genuinely implemented (not stubbed) for the
    three dominant web image containers; anything else reports unknown."""
    import struct

    try:
        if raw[:8] == b"\x89PNG\r\n\x1a\n" and raw[12:16] == b"IHDR":
            w, h = struct.unpack(">II", raw[16:24])
            return ("png", w, h, True)
        if raw[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", raw[6:10])
            return ("gif", w, h, True)
        if raw[:2] == b"\xff\xd8":
            i = 2
            while i + 1 < len(raw):
                if raw[i] != 0xFF:
                    break
                # legal 0xFF fill bytes may pad before any marker id
                while i + 1 < len(raw) and raw[i + 1] == 0xFF:
                    i += 1
                if i + 1 >= len(raw):
                    break
                marker = raw[i + 1]
                # standalone markers carry NO length segment: TEM (0x01),
                # RSTn (0xD0-0xD7), SOI (0xD8), EOI (0xD9)
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    i += 2
                    continue
                if i + 4 > len(raw):
                    break
                seglen = struct.unpack(">H", raw[i + 2 : i + 4])[0]
                # SOFn markers (C0-CF except C4/C8/CC) carry dimensions —
                # parsed even when the segment ends the stream
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > len(raw):
                        break
                    h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
                    return ("jpeg", w, h, True)
                i += 2 + seglen
        return ("unknown", -1, -1, False)
    except Exception:
        return ("unknown", -1, -1, False)


def png_gray8_pixels(raw: bytes) -> tuple[int, int, bytearray] | None:
    """(width, height, pixels) decoded from a non-interlaced 8-bit
    grayscale PNG — REAL pixel decode with the stdlib alone: chunk walk
    with CRC verification, concatenated-IDAT zlib inflate, and full
    per-row filter reconstruction (None/Sub/Up/Average/Paeth, bpp=1).
    Returns None for anything that is not a well-formed gray8
    non-interlaced PNG. Pixels are row-major, one byte each."""
    import struct
    import zlib

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        i, width, height, idat, seen_ihdr = 8, 0, 0, [], False
        while i + 8 <= len(raw):
            (length,) = struct.unpack(">I", raw[i : i + 4])
            tag = raw[i + 4 : i + 8]
            data = raw[i + 8 : i + 8 + length]
            if len(data) < length or i + 12 + length > len(raw):
                return None
            (crc,) = struct.unpack(">I", raw[i + 8 + length : i + 12 + length])
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, inter = struct.unpack(
                    ">IIBBBBB", data
                )
                if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
                    return None  # only gray8 non-interlaced implemented
                seen_ihdr = True
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
            i += 12 + length
        if not seen_ihdr or width <= 0 or height <= 0:
            return None
        stream = zlib.decompress(b"".join(idat))
        if len(stream) != (width + 1) * height:
            return None
        out = bytearray(width * height)
        prev_start = None
        for y in range(height):
            row_off = y * (width + 1)
            ftype = stream[row_off]
            row = bytearray(stream[row_off + 1 : row_off + 1 + width])
            if ftype == 1:  # Sub: left neighbor (bpp=1)
                for x in range(1, width):
                    row[x] = (row[x] + row[x - 1]) & 0xFF
            elif ftype == 2:  # Up
                if prev_start is not None:
                    for x in range(width):
                        row[x] = (row[x] + out[prev_start + x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(width):
                    left = row[x - 1] if x else 0
                    up = out[prev_start + x] if prev_start is not None else 0
                    row[x] = (row[x] + (left + up) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(width):
                    a = row[x - 1] if x else 0
                    b = out[prev_start + x] if prev_start is not None else 0
                    c = (
                        out[prev_start + x - 1]
                        if (prev_start is not None and x)
                        else 0
                    )
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[x] = (row[x] + pred) & 0xFF
            elif ftype != 0:
                return None
            out[y * width : (y + 1) * width] = row
            prev_start = y * width
        return (width, height, out)
    except Exception:
        return None


PIXEL_SCHEMA = (
    "id long, width int, height int, n_pixels long, pixel_sum long, "
    "pixel_min int, pixel_max int, pixel_mean double, ok boolean"
)


def decode_image_pixels(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """DF(id, width, height, n_pixels, pixel_sum, pixel_min, pixel_max,
    pixel_mean, ok): REAL deep image decode for gray8 PNGs — the pixel
    plane is reconstructed from the actual bytes (png_gray8_pixels:
    inflate + per-row unfilter), then reduced to deterministic stats that
    the oracle reproduces from the generator formula. Arrow-batched
    mapInPandas; non-PNG / malformed payloads report ok=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                dec = png_gray8_pixels(bytes(r)) if r is not None else None
                if dec is None:
                    rows.append((int(i), -1, -1, 0, 0, -1, -1, 0.0, False))
                else:
                    w, h, px = dec
                    s = sum(px)
                    n = len(px)
                    # the ratio6 floor idiom (same IEEE ops as both
                    # engines); Python round() is half-EVEN and would
                    # diverge at .5 boundaries
                    mean6 = math.floor((s / n) * 1e6 + 0.5) / 1e6
                    rows.append(
                        (int(i), w, h, n, s, min(px), max(px), mean6, True)
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "n_pixels", "pixel_sum",
                         "pixel_min", "pixel_max", "pixel_mean", "ok"],
            ).astype({"width": "int32", "height": "int32",
                      "pixel_min": "int32", "pixel_max": "int32"})

    return df.select(id_col, bin_col).mapInPandas(batches, PIXEL_SCHEMA)


def decode_image_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """DF(id, kind, width, height, n_bytes, ok): REAL image-container
    decode over Arrow batches (parse_image_meta — PNG/GIF/JPEG headers from
    the actual bytes). The deep-decode path (pixel data, PIL) stays behind
    the _HAS_PIL guard; dimensions/type detection is fully implemented."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raws = pdf[bin_col]
            meta = [
                parse_image_meta(bytes(r)) if r is not None else ("null", -1, -1, False)
                for r in raws
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "kind": [m[0] for m in meta],
                    "width": pd.array([m[1] for m in meta], dtype="int32"),
                    "height": pd.array([m[2] for m in meta], dtype="int32"),
                    "n_bytes": [len(bytes(r)) if r is not None else 0 for r in raws],
                    "ok": [m[3] for m in meta],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, META_SCHEMA)


def synth_wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    """A REAL, well-formed mono 16-bit PCM WAV file — stdlib struct only.
    Sample i = ((i * 37) % 20001) - 10000 (deterministic, the oracle's
    formula)."""
    import struct

    data = b"".join(
        struct.pack("<h", ((i * 37) % 20001) - 10000) for i in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_pcm(raw: bytes) -> tuple[int, list[int]] | None:
    """(sample_rate, samples) decoded from mono 16-bit PCM WAV bytes —
    REAL RIFF chunk walk (fmt before data, declared sizes honored, odd
    chunks padded per spec). None for anything malformed or non-PCM16."""
    import struct

    try:
        if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
            return None
        (riff_len,) = struct.unpack("<I", raw[4:8])
        if riff_len + 8 > len(raw):
            return None
        i, rate, bits, channels, fmt_seen = 12, 0, 0, 0, False
        # bound the walk at the declared RIFF payload (spec; matches
        # parse_avi_frames) — trailing junk bytes are not chunks
        end = min(len(raw), riff_len + 8)
        while i + 8 <= end:
            tag = raw[i : i + 4]
            (clen,) = struct.unpack("<I", raw[i + 4 : i + 8])
            if i + 8 + clen > end:
                return None  # chunk claims bytes beyond the RIFF payload
            data = raw[i + 8 : i + 8 + clen]
            if tag == b"fmt ":
                if clen < 16:
                    return None
                audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", data[:16]
                )
                if audio_fmt != 1:
                    return None  # only uncompressed PCM implemented
                fmt_seen = True
            elif tag == b"data":
                if not fmt_seen or bits != 16 or channels != 1:
                    return None
                n = clen // 2
                samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
                return (rate, samples)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        return None
    except Exception:
        return None


AUDIO_SCHEMA = (
    "id long, sample_rate int, n_samples long, amp_min int, amp_max int, "
    "amp_sum long, ok boolean"
)


def decode_audio_pcm_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """DF(id, sample_rate, n_samples, amp_min, amp_max, amp_sum, ok):
    REAL audio decode for mono PCM16 WAV payloads — the sample stream is
    reconstructed from the actual bytes (parse_wav_pcm) and reduced to
    integer stats the oracle reproduces from the generator formula.
    Arrow-batched mapInPandas; malformed/non-PCM payloads report ok=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                dec = parse_wav_pcm(bytes(r)) if r is not None else None
                if dec is None or not dec[1]:
                    rows.append((int(i), -1, 0, 0, 0, 0, False))
                else:
                    rate, s = dec
                    rows.append(
                        (int(i), rate, len(s), min(s), max(s), sum(s), True)
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "sample_rate", "n_samples", "amp_min",
                         "amp_max", "amp_sum", "ok"],
            ).astype({"sample_rate": "int32", "amp_min": "int32",
                      "amp_max": "int32"})

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_SCHEMA)


def with_synth_audio(df: DataFrame, id_col: str) -> DataFrame:
    """DF(id, payload): deterministic REAL WAV bytes per id — rate =
    8000 + (id % 8) * 1000, n_samples = id % 500 + 50. The generator
    formula doubles as the oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf[id_col]]
            payloads = [
                synth_wav_bytes(8000 + (i % 8) * 1000, i % 500 + 50)
                for i in ids
            ]
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(batches, "id long, payload binary")


def synth_avi_bytes(width: int, height: int, n_frames: int) -> bytes:
    """A REAL, minimal uncompressed AVI container — stdlib struct only.
    RIFF('AVI ') holding LIST('hdrl') with an avih main header (frame
    count + dims) and LIST('movi') with one '00db' (uncompressed video
    frame) chunk per frame; frame f's payload is gray8 bytes
    p(f, j) = (f * 31 + j) % 256 over width*height pixels (the oracle's
    formula)."""
    import struct

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        33367, 0, 0, 0x10, n_frames, 0, 1, width * height, width, height,
        0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    frames = b"".join(
        chunk(
            b"00db",
            bytes((f * 31 + j) % 256 for j in range(width * height)),
        )
        for f in range(n_frames)
    )
    movi = lst(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(raw: bytes) -> tuple[int, int, int, list[bytes]] | None:
    """(width, height, declared_frames, frame_payloads) parsed from REAL
    AVI bytes: RIFF walk, LIST(hdrl)/avih main header, LIST(movi) frame
    chunks ('00db'/'00dc'), word-aligned throughout. None if malformed."""
    import struct

    try:
        if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
            return None
        width = height = declared = -1
        frames: list[bytes] = []

        def walk(lo: int, hi: int) -> bool:
            nonlocal width, height, declared
            i = lo
            while i + 8 <= hi:
                tag = raw[i : i + 4]
                (clen,) = struct.unpack("<I", raw[i + 4 : i + 8])
                if i + 8 + clen > hi:
                    return False
                if tag == b"LIST":
                    if not walk(i + 12, i + 8 + clen):
                        return False
                elif tag == b"avih":
                    if clen < 40:
                        return False
                    vals = struct.unpack("<10I", raw[i + 8 : i + 48])
                    declared, width, height = vals[4], vals[8], vals[9]
                elif tag in (b"00db", b"00dc"):
                    frames.append(raw[i + 8 : i + 8 + clen])
                i += 8 + clen + (clen & 1)
            return True

        if not walk(12, min(len(raw), struct.unpack("<I", raw[4:8])[0] + 8)):
            return None
        if width <= 0 or height <= 0 or declared < 0:
            return None
        return (width, height, declared, frames)
    except Exception:
        return None


FRAME_SCHEMA = (
    "id long, frame_idx int, width int, height int, byte_sum long, ok boolean"
)


def decode_video_frames(
    df: DataFrame, id_col: str, bin_col: str, every_n: int = 5
) -> DataFrame:
    """DF(id, frame_idx, width, height, byte_sum, ok): REAL video frame
    sampling — the AVI container is walked from the actual bytes
    (parse_avi_frames) and every ``every_n``-th frame's payload is
    reduced to an integer byte sum the oracle reproduces from the
    generator's pixel formula. The cardinality change (one input row ->
    many frame rows) flows through one Arrow mapInPandas; malformed
    payloads emit a single ok=false row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                dec = parse_avi_frames(bytes(r)) if r is not None else None
                if dec is None or dec[2] != len(dec[3]):
                    rows.append((int(i), -1, -1, -1, 0, False))
                    continue
                w, h, _n, frames = dec
                for f in range(0, len(frames), every_n):
                    rows.append((int(i), f, w, h, sum(frames[f]), True))
            yield pd.DataFrame(
                rows,
                columns=["id", "frame_idx", "width", "height", "byte_sum", "ok"],
            ).astype({"frame_idx": "int32", "width": "int32", "height": "int32"})

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


def with_synth_videos(df: DataFrame, id_col: str) -> DataFrame:
    """DF(id, payload): deterministic REAL AVI bytes per id — w = id%16+4,
    h = id%12+4, n_frames = id%20+1. The generator formula doubles as the
    oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf[id_col]]
            payloads = [
                synth_avi_bytes(i % 16 + 4, i % 12 + 4, i % 20 + 1)
                for i in ids
            ]
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(batches, "id long, payload binary")


def with_synth_images(df: DataFrame, id_col: str) -> DataFrame:
    """DF(id, payload): deterministic REAL image bytes per id — kind
    cycles png/gif/jpeg, dims derived from the id (w = id%64+1,
    h = id%48+1). The generator formula doubles as the oracle: parsing
    the generated bytes must reproduce the formula exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(i) for i in pdf[id_col]]
            payloads = [
                synth_image_bytes(
                    REAL_IMAGE_KINDS[i % 3], i % 64 + 1, i % 48 + 1
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(batches, "id long, payload binary")


def resize_stub(
    df: DataFrame, id_col: str, bin_col: str, max_dim: int = 256
) -> DataFrame:
    """Resize plumbing: (id, width, height, payload) -> capped dims
    preserving aspect ratio, payload rewritten with the new header. A real
    implementation swaps the dimension math + header rewrite for
    PIL.Image.thumbnail over BytesIO; the binary-in/binary-out Arrow batch
    shape, schema and partition behavior are identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, outs = [], [], [], []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(r) if r is not None else b""
                kind, wd, ht, ok = _decode_header(raw)
                if not ok or wd <= 0 or ht <= 0:
                    nw, nh = -1, -1
                    payload = raw
                else:
                    scale = min(1.0, max_dim / max(wd, ht))
                    nw, nh = max(int(wd * scale), 1), max(int(ht * scale), 1)
                    body = raw.split(b"|", 4)[4] if raw.count(b"|") >= 4 else b""
                    payload = b"|".join(
                        [b"MM1", kind.encode(), str(nw).encode(),
                         str(nh).encode(), body]
                    )
                ids.append(int(i)); ws.append(nw); hs.append(nh); outs.append(payload)
            yield pd.DataFrame({
                "id": pd.array(ids, dtype="int64"),
                "width": pd.array(ws, dtype="int32"),
                "height": pd.array(hs, dtype="int32"),
                "payload": outs,
            })

    return df.select(id_col, bin_col).mapInPandas(
        batches, "id long, width int, height int, payload binary"
    )


def extract_features_stub(
    df: DataFrame, id_col: str, bin_col: str, dim: int = 8
) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> float vector. The
    deterministic stand-in is a normalized byte histogram over ``dim``
    buckets (real math over the real bytes — exercises the binary->vector
    Arrow path end to end); a real extractor replaces the histogram with a
    model forward pass, same signature and schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # byte histogram via np.frombuffer + bincount — no per-byte Python
        for pdf in it:
            ids, feats = [], []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(r) if r is not None else b""
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                n = float(len(raw)) or 1.0
                ids.append(int(i))
                feats.append((hist / n).tolist())
            yield pd.DataFrame({"id": pd.array(ids, dtype="int64"),
                                "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        batches, "id long, features array<double>"
    )


def frame_sample_stub(df: DataFrame, id_col: str, bin_col: str, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits (id, frame_idx) rows for frames the
    decoder WOULD extract (height acts as fake frame count). Real impl would
    yield decoded frame bytes; plumbing (explode cardinality change through
    mapInPandas) is the tested part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames = [], []
            for i, r in zip(pdf[id_col], pdf[bin_col]):
                kind, _w, h, ok = _decode_header(bytes(r) if r is not None else b"")
                if ok and kind == "video":
                    for f in range(0, max(h, 0), every_n):
                        ids.append(int(i))
                        frames.append(f)
            yield pd.DataFrame({"id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(frames, dtype="int32")})

    return df.select(id_col, bin_col).mapInPandas(batches, "id long, frame_idx int")
