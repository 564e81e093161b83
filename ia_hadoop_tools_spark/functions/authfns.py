"""HMAC cookie signing for authenticated archive fetches.

Reference: jobs/ArchiveFileExtractor.java:213-218,291 signs each range fetch
with ``signer.getHMacCookieStr(1000)`` and petabox/HMACPetaboxAuthProvider.java:42-50
refreshes a shared cookie at half-expiry; the ``HMACSigner`` class itself
lives in the external webarchive-commons library, so its exact cookie wire
format is NOT part of this tree. This module keeps the SEAM with a
documented, self-consistent format — deployments using the real scheme swap
:func:`hmac_cookie_str` for their signer; everything that consumes the
cookie (``http_import``, ``fetch_member``) takes an opaque string.

Format here: ``<name>=<expiry_epoch>-<hex hmac_sha1(secret, "name:expiry")>``
— expiry-bound so a leaked cookie dies, verifiable server-side with the
shared secret only.
"""

from __future__ import annotations

import hashlib
import hmac
import time


def hmac_cookie_str(
    name: str,
    secret: str,
    expiry_seconds: int = 1000,
    now: float | None = None,
) -> str:
    """Signed, expiry-bound cookie string (see module doc for the format)."""
    exp = int((time.time() if now is None else now) + expiry_seconds)
    sig = hmac.new(
        secret.encode("utf-8"), f"{name}:{exp}".encode("utf-8"), hashlib.sha1
    ).hexdigest()
    return f"{name}={exp}-{sig}"


def verify_hmac_cookie(cookie: str, secret: str, now: float | None = None) -> bool:
    """Server-side check: signature valid AND not expired."""
    try:
        name, rest = cookie.split("=", 1)
        exp_s, sig = rest.split("-", 1)
        exp = int(exp_s)
    except ValueError:
        return False
    want = hmac.new(
        secret.encode("utf-8"), f"{name}:{exp}".encode("utf-8"), hashlib.sha1
    ).hexdigest()
    ts = time.time() if now is None else now
    return hmac.compare_digest(sig, want) and ts < exp


class CookieRefresher:
    """Half-expiry refresh of a shared cookie (HMACPetaboxAuthProvider:43-47)."""

    def __init__(self, name: str, secret: str, expiry_seconds: int = 1000):
        self.name = name
        self.secret = secret
        self.expiry_seconds = expiry_seconds
        self._cookie: str | None = None
        self._generated = 0.0

    def get(self, now: float | None = None) -> str:
        ts = time.time() if now is None else now
        if (
            self._cookie is None
            or ts > self._generated + self.expiry_seconds / 2
        ):
            self._cookie = hmac_cookie_str(
                self.name, self.secret, self.expiry_seconds, now=ts
            )
            self._generated = ts
        return self._cookie
