"""Standard-security-handler decryption: AES/RC4 known-answer vectors
(FIPS 197 appendix C / RFC 6229) and full encrypt->decrypt round trips
through all three PDF readers for R3 (RC4-128), R4 (AES-128) and R6
(AES-256)."""

import numpy as np
import pytest

from doctr_ray.sources.pdfcrypt import (
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ecb_decrypt,
    aes_ecb_encrypt,
    decrypt_pdf,
    encrypt_pdf,
    rc4,
)


def test_aes128_fips197_vector():
    # FIPS 197 appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes_ecb_encrypt(key, pt) == ct
    assert aes_ecb_decrypt(key, ct) == pt


def test_aes256_fips197_vector():
    # FIPS 197 appendix C.3
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert aes_ecb_encrypt(key, pt) == ct
    assert aes_ecb_decrypt(key, ct) == pt


def test_aes_cbc_roundtrip_and_vectorized_blocks():
    rng = np.random.default_rng(3)
    key = bytes(rng.integers(0, 256, 16, np.uint8))
    iv = bytes(rng.integers(0, 256, 16, np.uint8))
    for n in (0, 1, 15, 16, 17, 4096):
        data = bytes(rng.integers(0, 256, n, np.uint8))
        assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data


def test_rc4_known_vectors():
    assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45a01f645fc35b383552544b9bf5"
    )
    data = b"attack at dawn"
    assert rc4(b"\x01\x02\x03\x04\x05", rc4(b"\x01\x02\x03\x04\x05", data)) == data


@pytest.mark.parametrize("revision", [2, 3, 4, 6])
def test_encrypted_text_pdf_roundtrip(revision):
    from doctr_ray.sources.pdftext import extract_pdf_text, make_simple_pdf

    pages = [["secret line one", "and two"], ["page deux"]]
    clean = make_simple_pdf(pages)
    enc = encrypt_pdf(clean, revision=revision)
    assert b"/Encrypt" in enc
    assert extract_pdf_text(enc) == extract_pdf_text(clean)


@pytest.mark.parametrize("revision", [3, 4, 6])
def test_encrypted_scanned_pdf_rasterizes(revision):
    from doctr_ray.sources.pdfimage import (
        extract_pdf_page_images,
        make_scanned_pdf,
    )

    imgs = [np.full((8, 8), v, np.uint8) for v in (40, 90)]
    enc = encrypt_pdf(make_scanned_pdf(imgs, image_format="flate"), revision)
    out = extract_pdf_page_images(enc)
    assert [int(o[0, 0]) for o in out] == [40, 90]


def test_encrypted_font_pdf_rasterizes():
    from doctr_ray.sources.pdffont import (
        make_truetype_pdf,
        rasterize_truetype_pdf,
    )

    clean = make_truetype_pdf([["TOP SECRET"]])
    enc = encrypt_pdf(clean, revision=4)
    a, b = rasterize_truetype_pdf(clean), rasterize_truetype_pdf(enc)
    assert np.array_equal(a[0], b[0])


def test_wrong_password_raises():
    """A non-empty USER password must refuse, not garble."""
    from doctr_ray.sources.pdftext import make_simple_pdf

    enc = encrypt_pdf(make_simple_pdf([["x"]]), revision=3)
    # corrupt /U so the empty-password check fails
    import re

    m = re.search(rb"/U <([0-9a-f]+)>", enc)
    bad = enc.replace(m.group(1), m.group(1)[::-1])
    with pytest.raises(ValueError, match="password required"):
        decrypt_pdf(bad)


def test_non_standard_handler_raises():
    from doctr_ray.sources.pdftext import make_simple_pdf

    enc = encrypt_pdf(make_simple_pdf([["x"]]), revision=3)
    bad = enc.replace(b"/Filter /Standard", b"/Filter /MyCrypt")
    with pytest.raises(NotImplementedError, match="non-Standard"):
        decrypt_pdf(bad)


def test_encrypted_objstm_combo():
    """The realistic modern encrypted file: /ObjStm-packed AND
    encrypted — decrypt first, then expand the object streams."""
    from doctr_ray.sources.pdfimage import (
        extract_pdf_page_images,
        make_scanned_pdf,
        repack_with_objstm,
    )
    from doctr_ray.sources.pdftext import extract_pdf_text, make_simple_pdf

    clean = make_simple_pdf([["alpha beta", "gamma"], ["delta"]])
    combo = encrypt_pdf(repack_with_objstm(clean), revision=4)
    assert extract_pdf_text(combo) == ["alpha beta", "gamma", "delta"]

    imgs = [np.full((8, 8), v, np.uint8) for v in (10, 20)]
    combo2 = encrypt_pdf(
        repack_with_objstm(make_scanned_pdf(imgs, image_format="flate")),
        revision=3,
    )
    assert [int(o[0, 0]) for o in extract_pdf_page_images(combo2)] == [10, 20]
