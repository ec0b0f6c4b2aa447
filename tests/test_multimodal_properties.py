"""Property-based checks for the pure-Python image header parser — no
Spark needed.  At 100 TB the decode stage sees arbitrary garbage bytes;
the parser must be TOTAL (parse or return None, never raise) and must
round-trip every well-formed header it claims to support."""

import struct

from hypothesis import given, settings, strategies as st

from waimak_spark.multimodal import _parse_image_header

_MAGICS = [b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF87a", b"GIF89a"]


@settings(max_examples=300, deadline=None)
@given(prefix=st.sampled_from(_MAGICS), tail=st.binary(max_size=64))
def test_parser_is_total_on_arbitrary_bytes(prefix, tail):
    """Any byte string — including ones that start with a recognized
    magic and then go wrong — parses to a tuple or None, never an
    exception (a raising parser kills the whole Spark task on one
    corrupt row)."""
    out = _parse_image_header(prefix + tail)
    assert out is None or (len(out) == 3
                           and all(isinstance(x, int) for x in out))


def test_truncated_ihdr_returns_none():
    """Regression (found by making the fuzz deliberate): a payload with
    the PNG magic and an IHDR tag but dimensions cut off used to raise
    struct.error — at scale that kills the Spark task on one corrupt
    row instead of nulling it."""
    b = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x00\x00"
    assert _parse_image_header(b) is None
    assert _parse_image_header(b[:20]) is None


def test_png_truncated_before_color_byte_returns_none():
    """Regression (ADVICE r6): a PNG payload truncated to exactly 25
    bytes — dimensions complete, depth byte present, COLOR byte missing —
    made ``depth_color`` a 1-byte slice and ``depth_color[1]`` raised
    IndexError inside the Arrow batch, violating the parser's totality
    contract.  24- and 25-byte truncations must both return None; the
    26-byte payload is the shortest parseable PNG header."""
    import struct

    full = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", 7, 5) + bytes([8, 2]))
    assert len(full) == 26
    assert _parse_image_header(full) == (7, 5, 3)
    assert _parse_image_header(full[:25]) is None
    assert _parse_image_header(full[:24]) is None


_dim = st.integers(min_value=1, max_value=0xFFFF)


@settings(max_examples=100, deadline=None)
@given(w=_dim, h=_dim,
       color_type=st.sampled_from([0, 2, 3, 4, 6]),
       depth=st.sampled_from([8, 16]))
def test_png_header_roundtrip(w, h, color_type, depth):
    expected = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    hdr = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", w, h)
           + bytes([depth, color_type, 0, 0, 0]))
    assert _parse_image_header(hdr) == (w, h, expected)


@settings(max_examples=100, deadline=None)
@given(w=_dim, h=_dim, channels=st.sampled_from([1, 3]),
       segments=st.lists(
           st.tuples(st.sampled_from([0xE0, 0xE1, 0xFE]),  # APP0/APP1/COM
                     st.binary(max_size=16)),
           max_size=4))
def test_jpeg_sof_roundtrip_behind_arbitrary_segments(w, h, channels,
                                                      segments):
    """The SOF scan must skip any number of benign APPn/comment segments
    (real camera JPEGs front-load EXIF) and still find the frame
    header."""
    body = b"\xff\xd8"
    for marker, payload in segments:
        body += bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload
    body += (b"\xff\xc0" + struct.pack(">H", 8 + 3 * channels)
             + b"\x08" + struct.pack(">HH", h, w) + bytes([channels]))
    assert _parse_image_header(body) == (w, h, channels)


@settings(max_examples=100, deadline=None)
@given(w=_dim, h=_dim, ver=st.sampled_from([b"GIF87a", b"GIF89a"]))
def test_gif_header_roundtrip(w, h, ver):
    hdr = ver + struct.pack("<HH", w, h)
    assert _parse_image_header(hdr) == (w, h, 1)
