"""ComfyUI drop-in: symlink/copy this directory into ComfyUI/custom_nodes/
(the role of the reference's ComfyUI_GSWaterMark package).  Requires `gswm`
importable in ComfyUI's Python environment."""

from gswm.integrations.comfyui import (  # noqa: F401
    NODE_CLASS_MAPPINGS,
    NODE_DISPLAY_NAME_MAPPINGS,
)
