"""Minimal pure-stdlib PDF writer: one page, one Flate-compressed
DeviceRGB image XObject at 1pt/px (reference visualization.py:30-33
saves figures as PNG or PDF via plt.savefig; this is the
matplotlib-free fallback's PDF path, sharing the raster Canvas that
ml/png.py renders)."""

from __future__ import annotations

import zlib


def write_pdf(path: str, pixels: list[list[tuple[int, int, int]]]) -> str:
    """Write rows of (r, g, b) pixels (top row first) as a single-page
    PDF whose media box is exactly the image size in points."""
    h = len(pixels)
    w = len(pixels[0]) if h else 0
    raw = bytes(c for row in pixels for px in row for c in px)
    img = zlib.compress(raw, 9)
    content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
            f"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>"
        ).encode(),
        (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
            f"/Length {len(img)} >>\nstream\n"
        ).encode()
        + img
        + b"\nendstream",
        (f"<< /Length {len(content)} >>\nstream\n").encode()
        + content
        + b"\nendstream",
    ]

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path
