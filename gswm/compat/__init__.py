"""Reference-compatibility layer: pure-NumPy golden re-derivations of the
reference algorithms (spec'd from SURVEY.md §2/§3 citations, not copied), used
as the parity oracle in tests, plus helpers for consuming reference-produced
artifacts (info_data.txt)."""

from gswm.compat.numpy_reference import (  # noqa: F401
    reference_embed_numpy,
    reference_decode_numpy,
)
