"""Load the reference implementation as a byte-equality oracle.

The reference tree at /root/reference is read-only PUBLIC content; we import
its pure parsing/URL modules *in place* (no code is copied into this repo).
``libs.logging`` builds a rotating file handler at import time (logging.py:
28-45), so a no-op stand-in is registered first; ``libs.functions`` imports
``requests`` (available in the image) but we never touch its network paths.
"""

from __future__ import annotations

import sys
import types

_REF_ROOT = "/root/reference"


class _NullLogger:
    def log(self, *_args, **_kwargs):
        pass


def _load():
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    # libs.functions does `requests.packages.urllib3.util.ssl_.DEFAULT_CIPHERS
    # += ...` at import (functions.py:13-14); modern urllib3 dropped that
    # attribute, so pre-seed it (value irrelevant — no network is used).
    import urllib3.util.ssl_ as _ssl_mod  # noqa: PLC0415

    if not hasattr(_ssl_mod, "DEFAULT_CIPHERS"):
        _ssl_mod.DEFAULT_CIPHERS = "DEFAULT"
    if "libs.logging" not in sys.modules:
        stub = types.ModuleType("libs.logging")
        stub.logger = _NullLogger()
        stub.Logger = _NullLogger
        sys.modules["libs.logging"] = stub
    import libs.functions as ref_functions  # noqa: PLC0415
    import libs.parsers as ref_parsers  # noqa: PLC0415

    return ref_functions, ref_parsers


ref_functions, ref_parsers = _load()
