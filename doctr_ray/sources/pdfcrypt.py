"""Standard security handler decryption (PDF 32000 §7.6) — pure
stdlib + numpy, no OpenSSL.

The reference opens encrypted PDFs through pypdfium2 (io/pdf.py:16-43,
which links a real crypto stack). The overwhelmingly common encrypted
PDF in the wild is "owner-password-only": the USER password is empty,
so any conforming reader silently decrypts. This module covers exactly
that case for every standard-handler revision:

- **R2/R3** (``/V 1``/``/V 2``): RC4 with a 40..128-bit MD5-derived key
  (Algorithm 2), per-object keys salted with objnum/gen.
- **R4** (``/V 4``): crypt filters — ``/CFM /V2`` (RC4) and
  ``/CFM /AESV2`` (AES-128-CBC, 16-byte IV prefix, PKCS#7).
- **R6** (``/V 5``, ISO 32000-2): ``/CFM /AESV3`` — AES-256-CBC with
  the SHA-2 hardened hash (Algorithm 2.B), file key unwrapped from
  ``/UE``.

AES itself is implemented here on numpy: CBC *decryption* is
parallel across blocks (ECB-decrypt all blocks vectorized, then one
shifted XOR), so page-sized image streams decrypt at array speed.
The matching ENCRYPT side (`encrypt_pdf`) writes fixtures for all
three revisions — round-trip proof without any external tool.

Passwords beyond the empty user password raise ``ValueError``
("password required") after failing the /U check — same contract a
full PDF library exposes.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np

# --- AES core (FIPS 197), vectorized over blocks ---------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_SBOX_NP = np.frombuffer(_SBOX, np.uint8)
_INV_SBOX_NP = np.frombuffer(_INV_SBOX, np.uint8)


def _xtime_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint16)
    t = (t << 1) ^ np.where(t & 0x80, 0x1B, 0)
    return (t & 0xFF).astype(np.uint8)


_XT = _xtime_table()


def _gf_mul_table(c: int) -> np.ndarray:
    """GF(2^8) multiply-by-constant lookup table."""
    out = np.zeros(256, np.uint8)
    for x in range(256):
        a, b, r = x, c, 0
        while b:
            if b & 1:
                r ^= a
            a = (a << 1) ^ (0x1B if a & 0x80 else 0)
            a &= 0xFF
            b >>= 1
        out[x] = r
    return out


_M2, _M3 = _gf_mul_table(2), _gf_mul_table(3)
_M9, _M11, _M13, _M14 = (
    _gf_mul_table(9),
    _gf_mul_table(11),
    _gf_mul_table(13),
    _gf_mul_table(14),
)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _expand_key(key: bytes) -> np.ndarray:
    """AES key schedule -> (rounds+1, 16) uint8 round keys."""
    nk = len(key) // 4
    rounds = {4: 10, 6: 12, 8: 14}[nk]
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    rk = np.array(w, np.uint8).reshape(rounds + 1, 16)
    return rk


#: ShiftRows / InvShiftRows as flat-index gathers on the 16-byte
#: column-major AES state (byte i sits at row i%4, col i//4)
_SHIFT = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11])
_INV_SHIFT = np.array([0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3])


def _ecb_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 -> AES-ECB encrypt, vectorized across n."""
    s = blocks ^ rk[0]
    rounds = len(rk) - 1
    for r in range(1, rounds):
        s = _SBOX_NP[s][:, _SHIFT]
        a0, a1, a2, a3 = s[:, 0::4], s[:, 1::4], s[:, 2::4], s[:, 3::4]
        m = np.empty_like(s)
        m[:, 0::4] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
        m[:, 1::4] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
        m[:, 2::4] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
        m[:, 3::4] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        s = m ^ rk[r]
    s = _SBOX_NP[s][:, _SHIFT] ^ rk[rounds]
    return s


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 -> AES-ECB decrypt, vectorized across n."""
    rounds = len(rk) - 1
    s = blocks ^ rk[rounds]
    for r in range(rounds - 1, 0, -1):
        s = _INV_SBOX_NP[s[:, _INV_SHIFT]] ^ rk[r]
        a0, a1, a2, a3 = s[:, 0::4], s[:, 1::4], s[:, 2::4], s[:, 3::4]
        m = np.empty_like(s)
        m[:, 0::4] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
        m[:, 1::4] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
        m[:, 2::4] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
        m[:, 3::4] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = m
    s = _INV_SBOX_NP[s[:, _INV_SHIFT]] ^ rk[0]
    return s


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """CBC decrypt — ECB-decrypt every block in ONE vectorized call,
    then XOR with the shifted ciphertext (block i-1). PKCS#7 unpad."""
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]
    if not data:
        return b""
    rk = _expand_key(key)
    ct = np.frombuffer(data, np.uint8).reshape(-1, 16)
    pt = _ecb_decrypt_blocks(ct, rk)
    prev = np.vstack([np.frombuffer(iv, np.uint8), ct[:-1]])
    out = (pt ^ prev).tobytes()
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16:
            out = out[:-n]
    return out


# scalar T-table encryption for the inherently SEQUENTIAL paths
# (CBC encryption, the R6 hash loop) — numpy per-16-byte-block calls
# are overhead-bound, classic 32-bit T-tables run ~50x faster there
_T0: list[int] = []
_T1: list[int] = []
_T2: list[int] = []
_T3: list[int] = []
for _x in range(256):
    _s = _SBOX[_x]
    _t = (int(_M2[_s]) << 24) | (_s << 16) | (_s << 8) | int(_M3[_s])
    _T0.append(_t)
    _T1.append(((_t >> 8) | (_t << 24)) & 0xFFFFFFFF)
    _T2.append(((_t >> 16) | (_t << 16)) & 0xFFFFFFFF)
    _T3.append(((_t >> 24) | (_t << 8)) & 0xFFFFFFFF)


def _expand_key_words(key: bytes) -> list[int]:
    rk = _expand_key(key)
    return [
        (int(r[4 * i]) << 24)
        | (int(r[4 * i + 1]) << 16)
        | (int(r[4 * i + 2]) << 8)
        | int(r[4 * i + 3])
        for r in rk
        for i in range(4)
    ]


def _encrypt_block_words(
    rkw: list[int], rounds: int, w0: int, w1: int, w2: int, w3: int
) -> tuple[int, int, int, int]:
    T0, T1, T2, T3, S = _T0, _T1, _T2, _T3, _SBOX
    w0 ^= rkw[0]
    w1 ^= rkw[1]
    w2 ^= rkw[2]
    w3 ^= rkw[3]
    k = 4
    for _ in range(rounds - 1):
        e0 = T0[w0 >> 24] ^ T1[(w1 >> 16) & 255] ^ T2[(w2 >> 8) & 255] ^ T3[w3 & 255] ^ rkw[k]
        e1 = T0[w1 >> 24] ^ T1[(w2 >> 16) & 255] ^ T2[(w3 >> 8) & 255] ^ T3[w0 & 255] ^ rkw[k + 1]
        e2 = T0[w2 >> 24] ^ T1[(w3 >> 16) & 255] ^ T2[(w0 >> 8) & 255] ^ T3[w1 & 255] ^ rkw[k + 2]
        e3 = T0[w3 >> 24] ^ T1[(w0 >> 16) & 255] ^ T2[(w1 >> 8) & 255] ^ T3[w2 & 255] ^ rkw[k + 3]
        w0, w1, w2, w3 = e0, e1, e2, e3
        k += 4
    e0 = (S[w0 >> 24] << 24) | (S[(w1 >> 16) & 255] << 16) | (S[(w2 >> 8) & 255] << 8) | S[w3 & 255]
    e1 = (S[w1 >> 24] << 24) | (S[(w2 >> 16) & 255] << 16) | (S[(w3 >> 8) & 255] << 8) | S[w0 & 255]
    e2 = (S[w2 >> 24] << 24) | (S[(w3 >> 16) & 255] << 16) | (S[(w0 >> 8) & 255] << 8) | S[w1 & 255]
    e3 = (S[w3 >> 24] << 24) | (S[(w0 >> 16) & 255] << 16) | (S[(w1 >> 8) & 255] << 8) | S[w2 & 255]
    return (
        e0 ^ rkw[k],
        e1 ^ rkw[k + 1],
        e2 ^ rkw[k + 2],
        e3 ^ rkw[k + 3],
    )


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """CBC encrypt (block-sequential by nature — scalar T-tables)."""
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    rkw = _expand_key_words(key)
    rounds = len(rkw) // 4 - 1
    prev = struct.unpack(">4I", iv)
    out = bytearray()
    for i in range(0, len(data), 16):
        blk = struct.unpack_from(">4I", data, i)
        prev = _encrypt_block_words(
            rkw,
            rounds,
            blk[0] ^ prev[0],
            blk[1] ^ prev[1],
            blk[2] ^ prev[2],
            blk[3] ^ prev[3],
        )
        out += struct.pack(">4I", *prev)
    return bytes(out)


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    return _ecb_encrypt_blocks(
        np.frombuffer(data, np.uint8).reshape(-1, 16), rk
    ).tobytes()


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    rk = _expand_key(key)
    return _ecb_decrypt_blocks(
        np.frombuffer(data, np.uint8).reshape(-1, 16), rk
    ).tobytes()


# --- RC4 --------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (its own inverse)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --- Standard security handler ----------------------------------------------

_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _key_r2_r4(
    owner: bytes, p: int, id0: bytes, rev: int, keylen: int,
    password: bytes = b"", encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: MD5 file-key derivation for revisions 2-4."""
    pwd = (password + _PAD)[:32]
    h = hashlib.md5(pwd + owner[:32] + struct.pack("<i", p) + id0)
    if rev >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if rev >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _user_check_r2_r4(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3+): the /U value proving a password."""
    if rev == 2:
        return rc4(key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def _hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (ISO 32000-2): the hardened SHA-2 hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Per-object key (R2-4, Algorithm 1); R5/6 uses the file key."""
    ext = struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
    if aes:
        ext += b"sAlT"
    return hashlib.md5(file_key + ext).digest()[: min(len(file_key) + 5, 16)]


_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_STR_ENTRY = {
    k: re.compile(rb"/" + k + rb"\s*(?:\((?P<lit>(?:[^()\\]|\\.)*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>)")
    for k in (b"O", b"U", b"OE", b"UE")
}


def _pdf_string(head: bytes, key: bytes) -> bytes | None:
    m = _STR_ENTRY[key].search(head)
    if m is None:
        return None
    if m.group("hex") is not None:
        hx = re.sub(rb"\s", b"", m.group("hex"))
        return bytes.fromhex(hx.decode("ascii"))
    body = m.group("lit")
    out = bytearray()
    i = 0
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
        ord("f"): 12, ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:
                j = i + 1
                while j < min(i + 4, len(body)) and 0x30 <= body[j] <= 0x37:
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _num_entry(head: bytes, key: bytes, default: int | None = None) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(-?\d+)", head)
    return int(m.group(1)) if m else default


class StandardDecryptor:
    """File-key holder + per-object stream decryptor (empty user
    password only — the silent-open case)."""

    def __init__(self, enc_head: bytes, id0: bytes):
        v = _num_entry(enc_head, b"V", 0)
        r = _num_entry(enc_head, b"R", 2)
        self.aes = False
        if v in (4, 5):
            cfm = re.search(rb"/CFM\s*/(\w+)", enc_head)
            self.aes = cfm is not None and cfm.group(1) in (b"AESV2", b"AESV3")
        o = _pdf_string(enc_head, b"O")
        u = _pdf_string(enc_head, b"U")
        p = _num_entry(enc_head, b"P", -1)
        if o is None or u is None:
            raise NotImplementedError("encrypted PDF without /O or /U")
        if v == 5:  # R5/R6: AES-256, SHA-2 key derivation
            vsalt, ksalt = u[32:40], u[40:48]
            if r >= 6:
                h = _hash_r6(b"", vsalt)
            else:  # R5 (deprecated Adobe extension)
                h = hashlib.sha256(vsalt).digest()
            if h != u[:32]:
                raise ValueError("encrypted PDF: password required")
            ikey = (
                _hash_r6(b"", ksalt) if r >= 6 else hashlib.sha256(ksalt).digest()
            )
            ue = _pdf_string(enc_head, b"UE")
            if ue is None:
                raise NotImplementedError("encrypted PDF without /UE")
            self.key = aes_cbc_decrypt(ikey, b"\x00" * 16, ue, unpad=False)
            self.v5 = True
        else:
            keylen = (_num_entry(enc_head, b"Length", 40) or 40) // 8
            if v == 1:
                keylen = 5
            em = re.search(rb"/EncryptMetadata\s+(true|false)", enc_head)
            encmeta = em is None or em.group(1) == b"true"
            key = _key_r2_r4(o, p, id0, r, keylen, b"", encmeta)
            # verify the EMPTY user password against /U
            u_ok = _user_check_r2_r4(key, id0, r)
            if (r == 2 and u_ok != u[:32]) or (r >= 3 and u_ok[:16] != u[:16]):
                raise ValueError("encrypted PDF: password required")
            self.key = key
            self.v5 = False

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.v5:
            return aes_cbc_decrypt(self.key, data[:16], data[16:])
        okey = _object_key(self.key, num, gen, self.aes)
        if self.aes:
            return aes_cbc_decrypt(okey, data[:16], data[16:])
        return rc4(okey, data)

    def encrypt(self, num: int, gen: int, data: bytes, iv: bytes) -> bytes:
        if self.v5:
            return iv + aes_cbc_encrypt(self.key, iv, data)
        okey = _object_key(self.key, num, gen, self.aes)
        if self.aes:
            return iv + aes_cbc_encrypt(okey, iv, data)
        return rc4(okey, data)


def decrypt_pdf(data: bytes) -> bytes:
    """Encrypted PDF -> equivalent DECRYPTED PDF bytes (streams
    decrypted, /Encrypt dropped), so every downstream reader
    (pdftext / pdfimage / pdffont) parses it unchanged. Raises
    ``ValueError('password required')`` when the user password is
    not empty."""
    em = _ENC_REF_RE.search(data)
    if em is None:
        return data
    enc_num = int(em.group(1))
    idm = _ID_RE.search(data)
    id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
    # locate the encryption dict (always top-level, never encrypted)
    om = re.search(rb"(?m)^" + str(enc_num).encode() + rb"\s+\d+\s+obj\b", data)
    if om is None:
        raise NotImplementedError("encrypted PDF: /Encrypt object not found")
    enc_head = data[om.end() : data.find(b"endobj", om.end())]
    if b"/Standard" not in enc_head:
        raise NotImplementedError(
            "encrypted PDF with a non-Standard security handler"
        )
    dec = StandardDecryptor(enc_head, id0)

    # rewrite every stream object with its decrypted payload
    obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
    out = bytearray()
    pos = 0
    root = re.search(rb"/Root\s+(\d+)\s+(\d+)\s+R", data)
    while True:
        m = obj_re.search(data, pos)
        if m is None:
            break
        num, gen = int(m.group(1)), int(m.group(2))
        em2 = data.find(b"endobj", m.end())
        sm = re.compile(rb"stream\r?\n").search(data, m.end())
        if num == enc_num or sm is None or (em2 != -1 and em2 < sm.start()):
            pos = em2 + 6 if em2 != -1 else len(data)
            if num != enc_num:
                head = data[m.end() : em2 if em2 != -1 else len(data)]
                out += m.group(0) + head + b"endobj\n"
            continue
        head = data[m.end() : sm.start()]
        lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        if lm is None:
            raise NotImplementedError("encrypted stream with indirect /Length")
        length = int(lm.group(1))
        raw = data[sm.end() : sm.end() + length]
        endpos = sm.end() + length
        pos = data.find(b"endobj", endpos)
        pos = pos + 6 if pos != -1 else endpos
        if b"/Type" in head and b"/XRef" in head:
            plain = raw  # the xref stream is never encrypted
        else:
            plain = dec.decrypt(num, gen, raw)
        head = (
            head[: lm.start()]
            + b"/Length " + str(len(plain)).encode()
            + head[lm.end() :]
        )
        out += (
            m.group(0) + head + b"stream\n" + plain + b"\nendstream\nendobj\n"
        )
    trailer = b"trailer\n<< /Size 0 "
    if root is not None:
        trailer += b"/Root " + root.group(1) + b" " + root.group(2) + b" R "
    if idm is not None:
        trailer += b"/ID [<" + idm.group(1) + b"> <" + idm.group(1) + b">] "
    trailer += b">>\n%%EOF\n"
    return b"%PDF-1.6\n" + bytes(out) + trailer


# --- fixture writer: encrypt a clean PDF ------------------------------------


def encrypt_pdf(data: bytes, revision: int = 3) -> bytes:
    """Encrypt a classic PDF with the standard handler and an EMPTY
    user password (owner password fixed to b'owner') — revisions 3
    (RC4-128), 4 (AES-128 /AESV2) and 6 (AES-256 /AESV3). IVs and
    salts are derived deterministically from the object number so
    fixtures are byte-reproducible."""
    if revision not in (2, 3, 4, 6):
        raise ValueError("revision must be 2, 3, 4 or 6")
    id0 = hashlib.md5(data[:1024] + str(len(data)).encode()).digest()
    p = -3904  # print/copy allowed, modify denied — a typical mask
    owner_pwd, user_pwd = b"owner", b""

    if revision == 6:
        # Algorithm 8/9/10 (ISO 32000-2) with deterministic salts
        fkey = hashlib.sha256(b"filekey" + id0).digest()
        uvs, uks = id0[:8], id0[8:16]
        u = _hash_r6(user_pwd, uvs) + uvs + uks
        ue = aes_cbc_encrypt(
            _hash_r6(user_pwd, uks), b"\x00" * 16, fkey, pad=False
        )
        ovs, oks = id0[4:12], id0[12:16] + id0[:4]
        o = _hash_r6(owner_pwd, ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(
            _hash_r6(owner_pwd, oks, u), b"\x00" * 16, fkey, pad=False
        )
        perms = aes_ecb_encrypt(
            fkey, struct.pack("<i", p) + b"\xff\xff\xff\xffTadb" + id0[:4]
        )
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
            b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/P " + str(p).encode()
            + b" /O <" + o.hex().encode()
            + b"> /U <" + u.hex().encode()
            + b"> /OE <" + oe.hex().encode()
            + b"> /UE <" + ue.hex().encode()
            + b"> /Perms <" + perms.hex().encode() + b"> >>"
        )

        class _Enc:
            v5, aes, key = True, True, fkey

            def encrypt(self, num, gen, blob, iv):
                return iv + aes_cbc_encrypt(fkey, iv, blob)

        enc = _Enc()
    else:
        keylen = 5 if revision == 2 else 16
        # Algorithm 3: /O from the owner password
        okey = hashlib.md5((owner_pwd + _PAD)[:32]).digest()
        if revision >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey).digest()
        okey = okey[:keylen]
        o = rc4(okey, (user_pwd + _PAD)[:32])
        if revision >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in okey), o)
        fkey = _key_r2_r4(o, p, id0, revision, keylen)
        u = _user_check_r2_r4(fkey, id0, revision)
        v = {2: 1, 3: 2, 4: 4}[revision]
        enc_dict = (
            b"<< /Filter /Standard /V " + str(v).encode()
            + b" /R " + str(revision).encode()
            + b" /Length " + str(keylen * 8).encode()
            + (
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
                b" /StmF /StdCF /StrF /StdCF"
                if revision == 4
                else b""
            )
            + b" /P " + str(p).encode()
            + b" /O <" + o.hex().encode()
            + b"> /U <" + u.hex().encode() + b"> >>"
        )

        class _Enc:
            v5, aes = False, revision == 4
            key = fkey

            def encrypt(self, num, gen, blob, iv):
                okey2 = _object_key(fkey, num, gen, self.aes)
                if self.aes:
                    return iv + aes_cbc_encrypt(okey2, iv, blob)
                return rc4(okey2, blob)

        enc = _Enc()

    # re-emit: encrypt every stream payload, then append /Encrypt +
    # a rebuilt trailer
    obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
    out = bytearray(b"%PDF-1.6\n")
    pos = 0
    max_num = 0
    root = re.search(rb"/Root\s+(\d+)\s+(\d+)\s+R", data)
    while True:
        m = obj_re.search(data, pos)
        if m is None:
            break
        num, gen = int(m.group(1)), int(m.group(2))
        max_num = max(max_num, num)
        em2 = data.find(b"endobj", m.end())
        sm = re.compile(rb"stream\r?\n").search(data, m.end())
        if sm is None or (em2 != -1 and em2 < sm.start()):
            head = data[m.end() : em2 if em2 != -1 else len(data)]
            out += m.group(0) + head + b"endobj\n"
            pos = em2 + 6 if em2 != -1 else len(data)
            continue
        head = data[m.end() : sm.start()]
        lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        if lm is None:
            raise ValueError("encrypt_pdf needs direct /Length streams")
        length = int(lm.group(1))
        raw = data[sm.end() : sm.end() + length]
        endpos = sm.end() + length
        pos = data.find(b"endobj", endpos)
        pos = pos + 6 if pos != -1 else endpos
        iv = hashlib.md5(b"iv" + str(num).encode() + id0).digest()
        blob = enc.encrypt(num, gen, raw, iv)
        head = (
            head[: lm.start()]
            + b"/Length " + str(len(blob)).encode()
            + head[lm.end() :]
        )
        out += m.group(0) + head + b"stream\n" + blob + b"\nendstream\nendobj\n"
    enc_num = max_num + 1
    out += str(enc_num).encode() + b" 0 obj\n" + enc_dict + b"\nendobj\n"
    trailer = b"trailer\n<< /Size " + str(enc_num + 1).encode() + b" "
    if root is not None:
        trailer += b"/Root " + root.group(1) + b" " + root.group(2) + b" R "
    trailer += (
        b"/Encrypt " + str(enc_num).encode() + b" 0 R "
        b"/ID [<" + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] "
        b">>\n%%EOF\n"
    )
    return bytes(out) + trailer
