"""Image export.

Replaces the reference's output path: immediate-mode GL point plotting
(``glColor3d``/``glVertex2i``, Hw4/MySdlApplication.cpp:1312-1314) and the
in-tree-but-dead PPM writer (``writePpmScreenshot``, Hw4/ppm.cpp:15-25).

Renders come out of the core in GL screen coordinates (row j=0 = bottom
scanline); writers flip to top-down raster order.  Colors are accumulated
unclamped like the reference (GL clamps at rasterization); writers clamp to
[0, 1] at export.
"""
from __future__ import annotations

import numpy as np


def to_uint8(img) -> np.ndarray:
    """[H,W,3] float (j=0 bottom) -> top-down uint8 raster."""
    arr = np.asarray(img, np.float64)
    arr = np.clip(arr, 0.0, 1.0)
    arr = arr[::-1]  # GL bottom-up -> raster top-down
    return (arr * 255.0 + 0.5).astype(np.uint8)


def write_ppm(path: str, img) -> None:
    """Binary P6 PPM, the format of the reference's ppm.cpp."""
    raster = to_uint8(img)
    h, w, _ = raster.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(raster.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Read a binary P6 PPM back to top-down uint8 [H,W,3]."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"P6":
            raise ValueError(f"not a P6 PPM: {magic!r}")
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        maxval = int(f.readline())
        if maxval != 255:
            raise ValueError("only maxval 255 supported")
        data = np.frombuffer(f.read(w * h * 3), np.uint8)
    return data.reshape(h, w, 3)


def write_png(path: str, img) -> None:
    """PNG via PIL when available, else fall back to PPM next to it."""
    raster = to_uint8(img)
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        write_ppm(path.rsplit(".", 1)[0] + ".ppm", img)
        return
    Image.fromarray(raster).save(path)


def write_image(path: str, img) -> None:
    if path.endswith(".ppm"):
        write_ppm(path, img)
    elif path.endswith(".npy"):
        np.save(path, np.asarray(img))
    else:
        write_png(path, img)
