"""A1111 WebUI script entry file — drop into stable-diffusion-webui/scripts/.

Single file covering BOTH WebUI generations (the reference ships one file per
API era; gswm.integrations.a1111 picks the patch point at runtime and fixes
the >=1.6.0 restore bug).  Requires `gswm` importable (pip install -e or
PYTHONPATH).
"""

from gswm.integrations.a1111 import Script  # noqa: F401
