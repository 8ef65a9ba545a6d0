#!/usr/bin/env python3
"""Generate small synthetic layout PNGs used as test fixtures.

The color semantics follow the reference layout format
(/root/reference/parseLayout.c:15-24, colors are 0xAABBGGRR words over
RGBA bytes, i.e. RGB tuples below):

  WALL           (0, 0, 0)
  EMPTY          (255, 255, 255)
  OUTSIDE        (127, 127, 127)
  DOOR           (223, 223, 223)
  WINDOW         (0, 255, 0)
  BALCONY_WINDOW (0, 127, 255)
  BALCONY_DOOR   (0, 0, 255)
"""
import numpy as np
from PIL import Image

WALL = (0, 0, 0)
EMPTY = (255, 255, 255)
OUTSIDE = (127, 127, 127)
DOOR = (223, 223, 223)
WINDOW = (0, 255, 0)
BALCONY_WINDOW = (0, 127, 255)
BALCONY_DOOR = (0, 0, 255)


def mini(path):
    """Two rooms: one with a window (gets daylight), one windowless with a
    door (gets a synthetic ceiling light). ~64x48 px at 30 px/m."""
    w, h = 64, 48
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = OUTSIDE
    # apartment body: walls with empty interior
    img[6:42, 6:58] = WALL
    img[8:40, 8:32] = EMPTY    # room A (window)
    img[8:40, 34:56] = EMPTY   # room B (windowless)
    # window in room A's left outer wall (rows 16..28 of the 2px wall band)
    img[16:28, 6:8] = WINDOW
    # door between rooms (in the 2px wall column x=32..34)
    img[20:28, 32:34] = DOOR
    Image.fromarray(img, "RGB").save(path)


def tiled(src_path, path, kx, ky):
    """kx x ky grid of copies of an existing layout PNG — the scene-scale
    stress fixture (round-4 VERDICT #2). Every copy keeps its own OUTSIDE
    border (example.png's borders are all OUTSIDE), so the apartments stay
    disjoint: rect count and texel count scale by exactly kx*ky parsed
    copies of the base scene's geometry."""
    img = np.asarray(Image.open(src_path).convert("RGB"))
    Image.fromarray(np.tile(img, (ky, kx, 1)), "RGB").save(path)


def tiny(path):
    """Single room with one window; smallest useful scene."""
    w, h = 36, 30
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = OUTSIDE
    img[5:25, 5:31] = WALL
    img[7:23, 7:29] = EMPTY
    img[12:18, 5:7] = WINDOW
    Image.fromarray(img, "RGB").save(path)


if __name__ == "__main__":
    import os
    d = os.path.dirname(os.path.abspath(__file__))
    mini(os.path.join(d, "mini.png"))
    tiny(os.path.join(d, "tiny.png"))
    print("wrote mini.png, tiny.png")
