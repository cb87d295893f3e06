"""Pure-Python image codec: uncompressed 24-bit BMP and binary PGM/PPM.

A minimal, dependency-free decoder exposing the slice of the PIL ``Image``
surface the multimodal kernels use (``open``/``convert("L")``/``getdata``/
``resize``/``save``/``seek``/``n_frames``), so ``real_decode=True`` works
in containers without pillow: pillow is used when installed, this codec
otherwise.  Formats are decoded from their public specifications (Windows
BMP file format; netpbm P5/P6); grayscale conversion uses the same ITU-R
601-2 integer formula as pillow ((299R + 587G + 114B) // 1000) so features
are identical whichever decoder runs.

Concatenated P5/P6 documents are exposed as FRAMES (netpbm files
concatenate legally), giving the frame-sampling kernel a multi-frame
fixture format that needs no animation codec.
"""

from __future__ import annotations

import struct


class _Frame:
    __slots__ = ("w", "h", "mode", "pix")

    def __init__(self, w: int, h: int, mode: str, pix: list):
        self.w, self.h, self.mode, self.pix = w, h, mode, pix


class MiniImage:
    """PIL-Image-lookalike over decoded frames (mode "L" or "RGB")."""

    def __init__(self, frames: list[_Frame]):
        if not frames:
            raise ValueError("no frames")
        self._frames = frames
        self._i = 0

    # -- PIL surface ------------------------------------------------------
    @property
    def n_frames(self) -> int:
        return len(self._frames)

    def seek(self, i: int) -> None:
        if not 0 <= i < len(self._frames):
            raise EOFError(f"frame {i} of {len(self._frames)}")
        self._i = i

    @property
    def _cur(self) -> _Frame:
        return self._frames[self._i]

    @property
    def width(self) -> int:
        return self._cur.w

    @property
    def height(self) -> int:
        return self._cur.h

    @property
    def mode(self) -> str:
        return self._cur.mode

    def convert(self, mode: str) -> "MiniImage":
        f = self._cur
        if mode == f.mode:
            return MiniImage([_Frame(f.w, f.h, f.mode, list(f.pix))])
        if mode == "L" and f.mode == "RGB":
            pix = [(r * 299 + g * 587 + b * 114) // 1000 for r, g, b in f.pix]
            return MiniImage([_Frame(f.w, f.h, "L", pix)])
        raise ValueError(f"convert {f.mode} -> {mode} unsupported")

    def getdata(self) -> list:
        return list(self._cur.pix)

    def resize(self, size: tuple[int, int]) -> "MiniImage":
        # Nearest neighbor — the schema/shape contract is what matters
        # here, not resample quality (pillow's default is bicubic, so
        # resized PIXELS differ between decoders; sizes agree).
        w2, h2 = size
        if w2 <= 0 or h2 <= 0:
            raise ValueError("resize to empty image")
        f = self._cur
        pix = [
            f.pix[min(f.h - 1, y * f.h // h2) * f.w + min(f.w - 1, x * f.w // w2)]
            for y in range(h2)
            for x in range(w2)
        ]
        return MiniImage([_Frame(w2, h2, f.mode, pix)])

    def save(self, fp, format: str | None = None) -> None:
        """Write the current frame as binary netpbm: P5 for "L", P6 for
        "RGB" (``format`` accepted for PIL-call compatibility; only the
        netpbm family is supported)."""
        if format is not None and format.upper() not in ("PPM", "PGM", "PNM"):
            raise ValueError(f"builtin codec writes netpbm only, not {format}")
        f = self._cur
        if f.mode == "L":
            fp.write(b"P5\n%d %d\n255\n" % (f.w, f.h))
            fp.write(bytes(bytearray(f.pix)))
        else:
            fp.write(b"P6\n%d %d\n255\n" % (f.w, f.h))
            flat = bytearray()
            for r, g, b in f.pix:
                flat += bytes((r, g, b))
            fp.write(bytes(flat))


def _parse_pnm_at(data: bytes, pos: int) -> tuple[_Frame, int]:
    magic = data[pos : pos + 2]
    channels = 3 if magic == b"P6" else 1
    pos += 2
    vals: list[int] = []
    while len(vals) < 3:
        # Skip whitespace and '#' comment lines between header tokens.
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    pos += 1  # single whitespace byte after maxval
    n = w * h * channels
    raster = data[pos : pos + n]
    if len(raster) < n:
        raise ValueError("truncated netpbm raster")
    if channels == 1:
        pix: list = list(raster)
        mode = "L"
    else:
        pix = [tuple(raster[i : i + 3]) for i in range(0, n, 3)]
        mode = "RGB"
    return _Frame(w, h, mode, pix), pos + n


def _parse_bmp(data: bytes) -> _Frame:
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    off_bits = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core headers unsupported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got {bpp}bpp/c{compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    pix: list = [None] * (w * h)
    for row in range(h):
        src_row = (h - 1 - row) if bottom_up else row
        base = off_bits + src_row * stride
        line = data[base : base + w * 3]
        if len(line) < w * 3:
            raise ValueError("truncated BMP raster")
        for x in range(w):
            b, g, r = line[3 * x : 3 * x + 3]
            pix[row * w + x] = (r, g, b)
    return _Frame(w, h, "RGB", pix)


def open(fp) -> MiniImage:  # noqa: A001 - mirrors PIL.Image.open
    """Decode BMP / P5 / P6 bytes (or a file-like) to a MiniImage;
    concatenated netpbm documents become frames."""
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    if data[:2] == b"BM":
        return MiniImage([_parse_bmp(data)])
    if data[:2] in (b"P5", b"P6"):
        frames = []
        pos = 0
        while pos < len(data) and data[pos : pos + 2] in (b"P5", b"P6"):
            frame, pos = _parse_pnm_at(data, pos)
            frames.append(frame)
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
        return MiniImage(frames)
    raise ValueError("unrecognized image format (builtin codec: BMP/P5/P6)")


# PIL-module-shaped alias so callers can treat this module as `Image`.
Image = MiniImage
