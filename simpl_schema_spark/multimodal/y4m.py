"""From-scratch YUV4MPEG2 (.y4m) stream parser — no codec libraries.

Y4M is the standard UNCOMPRESSED video interchange format (public spec:
the ``yuv4mpeg(5)`` man page shipped with mjpegtools; also summarized in
the multimedia.cx wiki).  The layout is trivially parseable:

- stream header line: ``YUV4MPEG2`` + space-separated tagged params
  (``W<int> H<int> F<num>:<den> I<..> A<..> C<colorspace> X<..>``),
  terminated by ``\\n``
- each frame: a ``FRAME`` line (optional params, ``\\n``-terminated)
  followed by raw planar YUV bytes whose size is fixed by W/H/colorspace

That makes it the video analog of what :mod:`.minipng` is for images: a
real, dependency-free decode path exercising the full Spark plumbing —
actual frame counts, actual luma planes — with compressed codecs (mp4/
webm) remaining the documented ffmpeg plug-point.

Everything here is pure functions over ``bytes``; the Spark integration
lives in :func:`..media.sample_video_frames`.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["Y4mError", "Y4mInfo", "parse_header", "frame_offsets", "y_plane"]


class Y4mError(ValueError):
    """Malformed YUV4MPEG2 payload."""


@dataclass(frozen=True)
class Y4mInfo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    header_len: int   # offset of the first FRAME line
    frame_size: int   # raw plane bytes per frame (excludes the FRAME line)

    @property
    def y_size(self) -> int:
        return self.width * self.height


def _plane_bytes(w: int, h: int, colorspace: str) -> int:
    """Total raw bytes of one frame's planes for a colorspace tag."""
    y = w * h
    # bit-depth-suffixed tags (C420p10, C422p12, …) store 2 bytes/sample;
    # reject them explicitly rather than mis-sizing the frame as 8-bit and
    # failing later with a misleading 'expected FRAME marker' error
    for depth_suffix in ("p10", "p12", "p14", "p16"):
        if colorspace.endswith(depth_suffix):
            raise Y4mError(
                f"unsupported colorspace C{colorspace}: >8-bit-per-sample "
                "streams are not handled (8-bit 420/422/444/mono only)"
            )
    if colorspace.startswith("420"):  # 420jpeg / 420mpeg2 / 420paldv / 420
        if w % 2 or h % 2:
            raise Y4mError(f"4:2:0 requires even dimensions, got {w}x{h}")
        return y + 2 * ((w // 2) * (h // 2))
    if colorspace.startswith("422"):
        if w % 2:
            raise Y4mError(f"4:2:2 requires even width, got {w}")
        return y + 2 * ((w // 2) * h)
    if colorspace == "444alpha":
        return 4 * y
    if colorspace.startswith("444"):
        return 3 * y
    if colorspace.startswith("mono"):
        return y
    raise Y4mError(f"unsupported colorspace C{colorspace}")


def parse_header(payload: bytes) -> Y4mInfo:
    """Parse the stream header; raises :class:`Y4mError` when malformed."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise Y4mError("missing YUV4MPEG2 signature")
    # no byte cap: the spec puts no length limit on X-comment tags, and
    # find() is a single linear scan either way
    nl = payload.find(b"\n")
    if nl < 0:
        raise Y4mError("unterminated stream header")
    width = height = 0
    fps_num, fps_den = 0, 1
    colorspace = "420jpeg"  # spec default
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == b"C":
                colorspace = val.decode("ascii")
            # I (interlace), A (aspect), X (comment): irrelevant to layout
        except (ValueError, UnicodeDecodeError) as e:
            raise Y4mError(f"bad header token {tok!r}") from e
    if width <= 0 or height <= 0:
        raise Y4mError("header missing W/H")
    return Y4mInfo(
        width, height, fps_num, fps_den, colorspace,
        header_len=nl + 1,
        frame_size=_plane_bytes(width, height, colorspace),
    )


def frame_offsets(payload: bytes, info: Y4mInfo) -> list[int]:
    """Byte offset of each frame's Y plane, in stream order.

    Truncated trailing data raises (a cut-off stream should fail loudly,
    not silently drop the tail frame).
    """
    offs: list[int] = []
    pos = info.header_len
    end = len(payload)
    while pos < end:
        if payload[pos:pos + 5] != b"FRAME":
            raise Y4mError(f"expected FRAME marker at offset {pos}")
        nl = payload.find(b"\n", pos)
        if nl < 0:
            raise Y4mError(f"unterminated FRAME line at offset {pos}")
        data = nl + 1
        if data + info.frame_size > end:
            raise Y4mError(f"truncated frame at offset {pos}")
        offs.append(data)
        pos = data + info.frame_size
    return offs


def y_plane(payload: bytes, info: Y4mInfo, offset: int) -> bytes:
    """The luma plane (``width*height`` bytes) of the frame at ``offset``."""
    return payload[offset:offset + info.y_size]
