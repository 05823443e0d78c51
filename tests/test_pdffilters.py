"""Standard PDF stream filters (LZW/RunLength/ASCIIHex/ASCII85):
encoder<->decoder round-trips including the LZW spec edges (early
code-width change, table reset past 4096 codes) and the ASCII85
shortcuts."""

import numpy as np
import pytest

from doctr_ray.sources.pdffilters import (
    ascii85_decode,
    ascii85_encode,
    ascii_hex_decode,
    ascii_hex_encode,
    decode_stream,
    filter_chain,
    lzw_decode,
    lzw_encode,
    rle_decode,
    rle_encode,
)


def _cases():
    rng = np.random.default_rng(7)
    return [
        b"",
        b"A",
        b"AAAAAAA",
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.integers(0, 256, 3000, np.uint8)),  # incompressible
        bytes(rng.integers(0, 4, 5000, np.uint8)),  # repetitive
        bytes(20000),  # long zero run -> LZW table reset territory
        bytes(range(256)) * 40,
    ]


@pytest.mark.parametrize("early", [0, 1])
def test_lzw_roundtrip(early):
    for data in _cases():
        assert lzw_decode(lzw_encode(data, early), early) == data


def test_lzw_table_reset_exceeds_4096_codes():
    # enough distinct phrases to force a Clear mid-stream
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 60000, np.uint8))
    enc = lzw_encode(data)
    assert lzw_decode(enc) == data


def test_rle_roundtrip_and_eod():
    for data in _cases():
        enc = rle_encode(data)
        assert enc.endswith(b"\x80")
        assert rle_decode(enc) == data
    # literal+run mix
    assert rle_decode(rle_encode(b"abcddddde")) == b"abcddddde"


def test_ascii_hex_roundtrip_whitespace_and_odd():
    for data in _cases():
        assert ascii_hex_decode(ascii_hex_encode(data)) == data
    assert ascii_hex_decode(b"4 1 4\n2>") == b"AB"
    assert ascii_hex_decode(b"414>") == b"A@"  # odd digit padded with 0


def test_ascii85_roundtrip_and_shortcuts():
    for data in _cases():
        assert ascii85_decode(ascii85_encode(data)) == data
    assert ascii85_encode(b"\0\0\0\0") == b"z~>"
    assert ascii85_decode(b"z~>") == b"\0\0\0\0"
    assert ascii85_decode(b"<~z~>") == b"\0\0\0\0"
    with pytest.raises(ValueError):
        ascii85_decode(b"\xff~>")


def test_filter_chain_parses_name_and_array():
    assert filter_chain(b"<< /Length 3 >>") == []
    assert filter_chain(b"<< /Filter /FlateDecode >>") == [b"FlateDecode"]
    assert filter_chain(b"<< /Filter [/ASCII85Decode /LZWDecode] >>") == [
        b"ASCII85Decode",
        b"LZWDecode",
    ]


def test_decode_stream_chain_order():
    import zlib

    data = b"payload bytes" * 20
    raw = ascii85_encode(rle_encode(zlib.compress(data)))
    head = b"<< /Filter [/ASCII85Decode /RunLengthDecode /FlateDecode] >>"
    assert decode_stream(head, raw) == data
    with pytest.raises(NotImplementedError, match="/DCTDecode"):
        decode_stream(b"<< /Filter /DCTDecode >>", b"x")
