"""Prediction colorization + class metadata for Cityscapes/GTAV.

Replaces the reference's palette text files + util.colorize
(segmentation/util/util.py colorize, segmentation/data/*_colors.txt)
with the standard 19-class Cityscapes trainId palette embedded here.
"""
from __future__ import annotations

import numpy as np

__all__ = ["CITYSCAPES_CLASSES", "CITYSCAPES_PALETTE", "colorize"]

CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
)

CITYSCAPES_PALETTE = np.array([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32),
], np.uint8)


def colorize(label: np.ndarray, palette: np.ndarray = CITYSCAPES_PALETTE,
             ignore_label: int = 255) -> np.ndarray:
    """(H, W) int labels → (H, W, 3) uint8 color image; ignore → black."""
    out = np.zeros((*label.shape, 3), np.uint8)
    valid = label != ignore_label
    out[valid] = palette[np.clip(label[valid], 0, len(palette) - 1)]
    return out
