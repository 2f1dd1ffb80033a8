"""Encryption at rest for tile-table fragments — AES-256-GCM.

Parity target: the reference's ``encryption_key="…32 bytes…"`` table
option (mytile/ha_mytile.cc:75 HA_TOPTION_STRING("encryption_key"),
ha_mytile.cc:788-795 → ``sm.encryption_type = AES_256_GCM``; negative
case in mysql-test/mytile/t/encryption.test).

Spark-first shape: every fragment file is written as a parquet byte
buffer sealed with AES-256-GCM (fresh random 96-bit nonce per file,
whole-file authentication).  Encrypt happens inside the distributed
writer (one task per fragment) and decrypt inside the distributed reader
(binaryFile scan → mapInArrow), so at 100 TB crypto parallelism equals
fragment parallelism — the driver never sees plaintext data.

The key itself is never persisted.  The sidecar stores only the cipher
name and a salted SHA-256 key fingerprint so a wrong key fails fast with
a clean error (and GCM authentication would reject it regardless).
"""

from __future__ import annotations

import hashlib
import os
from typing import Union

MAGIC = b"TTENC1\x00"  # file header: magic + 12-byte nonce + GCM ciphertext
NONCE_LEN = 12
CIPHER_NAME = "AES_256_GCM"


def normalize_key(key: Union[str, bytes]) -> bytes:
    """The reference requires a 32-byte key string (AES-256); same here."""
    kb = key.encode() if isinstance(key, str) else bytes(key)
    if len(kb) != 32:
        raise ValueError(
            f"encryption_key must be exactly 32 bytes (AES-256), got {len(kb)}"
        )
    return kb


def key_fingerprint(key: Union[str, bytes]) -> str:
    """Salted digest persisted in the sidecar for fast wrong-key errors.
    One-way; never usable as key material."""
    return hashlib.sha256(b"tiledb-spark-keycheck:" + normalize_key(key)).hexdigest()


def encrypt_bytes(key: Union[str, bytes], data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: PLC0415

    nonce = os.urandom(NONCE_LEN)
    ct = AESGCM(normalize_key(key)).encrypt(nonce, data, MAGIC)
    return MAGIC + nonce + ct


def decrypt_bytes(key: Union[str, bytes], blob: bytes) -> bytes:
    from cryptography.exceptions import InvalidTag  # noqa: PLC0415
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: PLC0415

    blob = bytes(blob)
    if blob[: len(MAGIC)] != MAGIC:
        raise ValueError("not an encrypted tile fragment (bad magic)")
    nonce = blob[len(MAGIC) : len(MAGIC) + NONCE_LEN]
    ct = blob[len(MAGIC) + NONCE_LEN :]
    try:
        return AESGCM(normalize_key(key)).decrypt(nonce, ct, MAGIC)
    except InvalidTag:
        raise ValueError("wrong encryption key (GCM authentication failed)") from None
