"""Filename-parity alias for users arriving from the reference repo.
The gswm shim auto-detects the WebUI generation (function patch on <=1.5.2,
ImageRNG class patch on >=1.6.0) — both filenames load the same Script."""

from gswm.integrations.a1111 import Script  # noqa: F401
