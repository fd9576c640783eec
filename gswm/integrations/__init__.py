"""Host-app integration surfaces, shaped like the reference's front-ends:

  comfyui.py — GSLatent + GSKSamplerAdvanced node pair (nodes.py parity)
  a1111.py   — A1111-script-shaped shim (scripts/GS_watermark_insert_* parity)

Both delegate to the ONE parameterized gswm core (SURVEY.md §2.2 de-dup) and
degrade gracefully when their host (ComfyUI / A1111 WebUI) is absent.
"""
