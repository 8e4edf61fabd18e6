"""Real ISO-BMFF (MP4) container codec — pure stdlib/numpy.

Writer: Motion-JPEG video in an ISO base-media file (``jpeg`` visual
sample entry, ISO/IEC 14496-12 + the QuickTime MJPEG convention) —
each sample is a REAL baseline JPEG produced by this repo's encoder
(jpeg.py), so the whole video path is decodable end-to-end with code
in this package. H.264 bitstream decode remains out of scope (no
entropy-decoder here and no ffmpeg in the container) — but the
CONTAINER layer below is codec-agnostic: the parser walks any
ISO-BMFF file's box tree and reconstructs the full sample table
(offsets/sizes/timestamps) regardless of what codec the samples hold,
which is the part a 100 TB video-corpus pipeline needs for frame
SAMPLING (seek tables, per-frame slicing) before any GPU decode.

Box coverage: ftyp/mdat/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/
vmhd/dinf/dref/stbl/stsd/stts/stsc/stsz/stco/co64.

Scale notes: everything here is per-payload work inside Arrow-batched
mapInPandas (media.py) — no driver involvement, no shuffle of pixel
data; only sampled-frame features leave the executor.
"""

from __future__ import annotations

import struct

import numpy as np

_TIMESCALE = 1000  # 1 tick = 1 ms


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def encode_mp4(frames: list, fps: int = 4, quality: int = 85) -> bytes:
    """RGB frames ((h, w, 3) uint8, all same size) → a valid
    single-track Motion-JPEG MP4. Deterministic byte-for-byte."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_mp4 needs at least one frame")
    h, w, _ = np.asarray(frames[0]).shape
    samples = [encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality) for f in frames]
    delta = _TIMESCALE // fps
    duration = delta * len(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    chunk_offset = len(ftyp) + 8  # first sample starts right after mdat header

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume 1.0
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),          # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt group, volume, reserved
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, _TIMESCALE, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)        # data_reference_index
        + b"\x00" * 16                # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)        # frame_count
        + b"\x00" * 32                # compressorname
        + struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, len(samples), delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, fourcc = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box {fourcc!r} at {pos}")
        yield fourcc, pos + header, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, a, b in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return a, b
    return None


def parse_mp4(payload: bytes) -> dict:
    """Parse any single-video-track ISO-BMFF payload into
    {brand, timescale, duration_ms, width, height, codec, n_samples,
    samples: [(offset, size, ts_ms), ...]} using the real sample
    table (stts×stsc×stsz×stco/co64). Raises ValueError on non-BMFF
    bytes — callers treat that as 'not decodable'."""
    buf = bytes(payload)
    brand = None
    ftyp = _find(buf, 0, len(buf), b"ftyp")
    if ftyp is not None:
        brand = buf[ftyp[0] : ftyp[0] + 4].decode("latin1")
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("no moov box: not an ISO-BMFF payload")
    mvhd = _find(buf, *moov, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    ver = buf[mvhd[0]]
    if ver == 1:
        timescale, duration = struct.unpack_from(">IQ", buf, mvhd[0] + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", buf, mvhd[0] + 4 + 8)
    out = {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // max(1, timescale),
        "width": None,
        "height": None,
        "codec": None,
        "n_samples": 0,
        "samples": [],
    }
    for fc, a, b in _iter_boxes(buf, *moov):
        if fc != b"trak":
            continue
        mdia = _find(buf, a, b, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(buf, *mdia, b"hdlr")
        if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(buf, *mdia, b"mdhd")
        mver = buf[mdhd[0]]
        if mver == 1:
            m_ts = struct.unpack_from(">I", buf, mdhd[0] + 4 + 16)[0]
        else:
            m_ts = struct.unpack_from(">I", buf, mdhd[0] + 4 + 8)[0]
        stbl = _find(buf, *_find(buf, *mdia, b"minf"), b"stbl")
        stsd = _find(buf, *stbl, b"stsd")
        n_desc = struct.unpack_from(">I", buf, stsd[0] + 4)[0]
        if n_desc >= 1:
            esize, efc = struct.unpack_from(">I4s", buf, stsd[0] + 8)
            out["codec"] = efc.decode("latin1")
            ebase = stsd[0] + 8 + 8
            out["width"], out["height"] = struct.unpack_from(">HH", buf, ebase + 24)
        # ---- sample table ----
        stts = _find(buf, *stbl, b"stts")
        n_ent = struct.unpack_from(">I", buf, stts[0] + 4)[0]
        deltas: list[int] = []
        for i in range(n_ent):
            cnt, d = struct.unpack_from(">II", buf, stts[0] + 8 + 8 * i)
            deltas.extend([d] * cnt)
        stsz = _find(buf, *stbl, b"stsz")
        fixed, n_samples = struct.unpack_from(">II", buf, stsz[0] + 4)
        sizes = (
            [fixed] * n_samples
            if fixed
            else list(struct.unpack_from(f">{n_samples}I", buf, stsz[0] + 12))
        )
        stco = _find(buf, *stbl, b"stco")
        if stco is not None:
            n_ch = struct.unpack_from(">I", buf, stco[0] + 4)[0]
            chunk_offsets = list(struct.unpack_from(f">{n_ch}I", buf, stco[0] + 8))
        else:
            co64 = _find(buf, *stbl, b"co64")
            n_ch = struct.unpack_from(">I", buf, co64[0] + 4)[0]
            chunk_offsets = list(struct.unpack_from(f">{n_ch}Q", buf, co64[0] + 8))
        stsc = _find(buf, *stbl, b"stsc")
        n_runs = struct.unpack_from(">I", buf, stsc[0] + 4)[0]
        runs = [
            struct.unpack_from(">III", buf, stsc[0] + 8 + 12 * i)
            for i in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_index)
        # expand chunk → samples_per_chunk over all chunks
        per_chunk: list[int] = []
        for i, (first, spc, _desc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(chunk_offsets)
            per_chunk.extend([spc] * (last - first + 1))
        samples = []
        si = 0
        ts = 0
        for ci, co in enumerate(chunk_offsets):
            off = co
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                d = deltas[si] if si < len(deltas) else 0
                samples.append((off, sizes[si], ts * 1000 // max(1, m_ts)))
                off += sizes[si]
                ts += d
                si += 1
        out["n_samples"] = n_samples
        out["samples"] = samples
        break
    return out


def extract_sample(payload: bytes, index: int) -> bytes:
    """Return the raw bytes of sample ``index`` via the sample table."""
    info = parse_mp4(payload)
    off, size, _ts = info["samples"][index]
    return bytes(payload[off : off + size])


def sample_at_ms(payload: bytes, ts_ms: int) -> bytes:
    """Raw bytes of the last sample whose timestamp <= ts_ms (the
    frame on screen at that instant)."""
    info = parse_mp4(payload)
    chosen = info["samples"][0]
    for s in info["samples"]:
        if s[2] <= ts_ms:
            chosen = s
        else:
            break
    off, size, _ = chosen
    return bytes(payload[off : off + size])


def mp4_features(payload: bytes) -> np.ndarray:
    """8 REAL statistics from an MJPEG MP4: the first frame's pixel
    features (real container parse + real JPEG decode), with the last
    two slots carrying container stats (n_samples, duration_s) —
    mirror of image_features/audio_features for the video kind."""
    from .codecs import pixel_features
    from .jpeg import decode_jpeg

    info = parse_mp4(payload)
    if info["codec"] != "jpeg" or not info["samples"]:
        raise ValueError(f"cannot decode codec {info['codec']!r} (container parsed fine)")
    off, size, _ = info["samples"][0]
    feats = pixel_features(decode_jpeg(bytes(payload[off : off + size])))
    feats = feats.copy()
    feats[6] = float(info["n_samples"])
    feats[7] = info["duration_ms"] / 1000.0
    return feats
