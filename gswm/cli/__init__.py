"""Command-line entry points mirroring the reference's surfaces:

  python -m gswm.cli.gs_embed    — watermark latent synthesis (+ optional
                                   txt2img when local weights exist); the
                                   SD-CLI patch recipe's role (README.md:107-145)
  python -m gswm.cli.gs_extract  — extract.py flag-compatible extraction
  python -m gswm.cli.gs_distort  — `distortions` flag-compatible attack sweeps
"""
