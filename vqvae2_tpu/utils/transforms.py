"""Affine transforms for pose/parsing pre/post-processing — TPU-host rebuild
of reference ``utils/transforms.py`` (``get_affine_transform`` :100-134,
``_box2cs``/``_xywh2cs`` :170-183, ``transform_logits`` :81-97,
``transform_parsing`` :60-78).  cv2-backed, host-side (these feed/readback
the jitted model, they are not in the compiled path)."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _get_dir(src_point, rot_rad: float) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.asarray([
        src_point[0] * cs - src_point[1] * sn,
        src_point[0] * sn + src_point[1] * cs,
    ], np.float32)


def _get_3rd_point(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    direct = a - b
    return b + np.asarray([-direct[1], direct[0]], np.float32)


def get_affine_transform(center, scale, rot, output_size,
                         shift=(0.0, 0.0), inv: bool = False) -> np.ndarray:
    """2×3 affine matrix mapping a (center, scale) person box onto
    ``output_size`` (h, w) — reference ``utils/transforms.py:100-134``."""
    import cv2

    center = np.asarray(center, np.float32)
    scale = np.asarray(scale if np.ndim(scale) else [scale, scale], np.float32)
    shift = np.asarray(shift, np.float32)

    src_w = scale[0]
    dst_h, dst_w = output_size

    rot_rad = np.pi * rot / 180
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.asarray([0, (dst_w - 1) * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    dst[0] = [(dst_w - 1) * 0.5, (dst_h - 1) * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = _get_3rd_point(src[0], src[1])
    dst[2] = _get_3rd_point(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


def box2cs(box: Sequence[float], aspect_ratio: float = 0.5
           ) -> Tuple[np.ndarray, np.ndarray]:
    """(x, y, w, h) box → (center, scale) with aspect snapping (reference
    ``_box2cs``/``_xywh2cs``, :170-183)."""
    x, y, w, h = box[:4]
    center = np.asarray([x + w * 0.5, y + h * 0.5], np.float32)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    return center, np.asarray([w, h], np.float32)


def affine_image(img: np.ndarray, center, scale, rot, output_size,
                 nearest: bool = False, border=0) -> np.ndarray:
    """Warp an image/label map into the crop frame (reference ``crop``
    :156-168 / ``transform_parsing`` :60-78)."""
    import cv2

    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(
        img, trans, (int(output_size[1]), int(output_size[0])),
        flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=border)


def transform_logits(logits: np.ndarray, center, scale, width, height,
                     input_size) -> np.ndarray:
    """Warp model-space logits back to the original image frame (reference
    ``transform_logits``, :81-97)."""
    import cv2

    trans = get_affine_transform(center, scale, 0, input_size, inv=True)
    out = [
        cv2.warpAffine(logits[:, :, i], trans, (int(width), int(height)),
                       flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        for i in range(logits.shape[2])
    ]
    return np.stack(out, axis=2)
