"""Media IO: image grids, image sequences, mp4/gif.

Parity target: reference `threestudio/utils/saving.py:22-652` (SaverMixin):
`save_image_grid` rows of rgb/grayscale images with optional text overlay,
`save_img_sequence` -> mp4. cv2/trimesh/wandb are not available in this
environment; PIL + imageio cover the shipped functionality (obj export lives
in models/exporters).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

try:
    import imageio.v2 as imageio
except Exception:  # pragma: no cover
    imageio = None


def _to_uint8(img: np.ndarray, data_range=(0, 1)) -> np.ndarray:
    lo, hi = data_range
    img = (np.asarray(img, np.float32) - lo) / (hi - lo)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def grayscale_to_rgb(img: np.ndarray, data_range=None) -> np.ndarray:
    """[H,W] or [H,W,1] -> [H,W,3]; normalizes to its own min/max if no
    range given (reference get_grayscale_image_)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 3:
        img = img[..., 0]
    if data_range is None:
        lo, hi = np.nanmin(img), np.nanmax(img)
        hi = hi if hi > lo else lo + 1e-6
    else:
        lo, hi = data_range
    norm = np.clip((img - lo) / (hi - lo), 0, 1)
    return np.stack([norm] * 3, axis=-1)


def make_image_grid(rows: List[List[np.ndarray]], align: int = 4) -> np.ndarray:
    """Rows of [H,W,3] float images in [0,1] -> single uint8 grid."""
    row_imgs = []
    for row in rows:
        imgs = [_to_uint8(im) for im in row]
        h = max(im.shape[0] for im in imgs)
        imgs = [_pad_to(im, h, im.shape[1]) for im in imgs]
        row_imgs.append(np.concatenate(imgs, axis=1))
    w = max(im.shape[1] for im in row_imgs)
    row_imgs = [_pad_to(im, im.shape[0], w) for im in row_imgs]
    return np.concatenate(row_imgs, axis=0)


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - img.shape[0], w - img.shape[1]
    if ph == 0 and pw == 0:
        return img
    return np.pad(img, ((0, ph), (0, pw), (0, 0)))


def save_image(path: str, img: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if img.dtype != np.uint8:
        img = _to_uint8(img)
    from PIL import Image
    Image.fromarray(img).save(path)


def save_image_grid(path: str, rows: List[List[np.ndarray]]) -> None:
    save_image(path, make_image_grid(rows))


def save_video(path: str, frames: List[np.ndarray], fps: int = 30) -> str:
    """Frames [H,W,3] float [0,1] or uint8 -> mp4 (gif fallback when no
    ffmpeg backend is available). Returns the path actually written."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [f if f.dtype == np.uint8 else _to_uint8(f) for f in frames]
    if imageio is None:
        raise RuntimeError("imageio unavailable; cannot save video")
    try:
        imageio.mimsave(path, frames, fps=fps)
        return path
    except Exception:
        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(gif, frames, duration=1000 / fps)
        return gif


def save_img_sequence(path: str, frame_dir: str, pattern: str = ".png",
                      fps: int = 30) -> None:
    """Assemble saved frames into a video (reference save_img_sequence)."""
    files = sorted(
        f for f in os.listdir(frame_dir) if f.endswith(pattern))
    frames = [imageio.imread(os.path.join(frame_dir, f)) for f in files]
    if frames:
        save_video(path, frames, fps=fps)


def render_row_from_output(out: dict) -> List[np.ndarray]:
    """Standard validation row: rgb | normal | opacity | depth
    (reference multiprompt_radience_field_generator.py:235-278); the
    rgb column prefers the VAE-decoded image when the renderer emits
    latents (reference :243 decoded_rgb)."""
    row = [np.asarray(out.get("decoded_rgb", out["comp_rgb"]))]
    if "comp_normal" in out:
        row.append(np.asarray(out["comp_normal"]))
    row.append(grayscale_to_rgb(np.asarray(out["opacity"]), (0, 1)))
    row.append(grayscale_to_rgb(np.asarray(out["depth"])))
    return row
