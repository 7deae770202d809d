"""PNG input/output.

The reference reaches libpng through a C FFI (png_image.zig:6-9). Here
Pillow does the codec work on the host; what matters for parity is the
buffer convention, reproduced exactly:

- rows are stored bottom-up in memory: the reader flips vertically
  (png_image.zig:86) and the writer flips back (png_image.zig:136),
- quantization is ``trunc(clamp(255.999 * c, 0, 255))``
  (png_image.zig:138-140),
- only the RGB channels are kept; alpha is dropped (png_image.zig:44-59).
"""

from __future__ import annotations

import numpy as np
from PIL import Image as PILImage


def read_png(path) -> np.ndarray:
    """Read a PNG into ``(H, W, 3)`` f32 in [0, 1], row 0 = image bottom."""
    with PILImage.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return arr[::-1].copy()


def quantize(image: np.ndarray) -> np.ndarray:
    """Float image -> uint8 with the reference's clamp (png_image.zig:138)."""
    return np.clip(255.999 * image, 0.0, 255.0).astype(np.uint8)


def write_png(path, image: np.ndarray) -> None:
    """Write ``(H, W, 3)`` f32 (row 0 = bottom) as an 8-bit RGB PNG."""
    data = quantize(np.asarray(image))[::-1]
    PILImage.fromarray(data, "RGB").save(path, format="PNG")
