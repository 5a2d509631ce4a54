"""Minimal dependency-free PNG encoder for the workbench viewport.

The reference renders into a Dear PyGui raw texture (gui/viewport.py:208);
the browser workbench ships frames as PNG data URLs instead.  Stdlib-only
(zlib + struct): RGB8, no filtering (filter byte 0 per scanline).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def encode_rgb(img) -> bytes:
    """[H, W, 3] float (0..1) or uint8 array -> PNG bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    h, w, _ = img.shape
    raw = b''.join(b'\x00' + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        return (struct.pack('>I', len(data)) + tag + data
                + struct.pack('>I', zlib.crc32(tag + data)))

    ihdr = struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0)
    return (b'\x89PNG\r\n\x1a\n' + chunk(b'IHDR', ihdr)
            + chunk(b'IDAT', zlib.compress(raw, 6)) + chunk(b'IEND', b''))
