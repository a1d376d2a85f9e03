"""Image IO helpers (ref afldm/io_utils.py:10-61). NHWC, values in [-1, 1]."""

import numpy as np


def image_to_tensor(path, size=None):
    """Load an image file to a (1, H, W, 3) float32 array in [-1, 1]
    (ref io_utils.py:10-40)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BICUBIC)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
    return arr[None]


def tensor_to_images(t, denorm=True):
    """(N, H, W, 3) [-1,1] -> list of uint8 arrays."""
    a = np.asarray(t, dtype=np.float32)
    if denorm:
        a = a / 2 + 0.5
    a = np.clip(a, 0, 1)
    return [(x * 255).astype(np.uint8) for x in a]


def save_gif_from_tensors(tensors, path, denorm=True, duration=200):
    """Concatenate each batch horizontally and write an animated GIF
    (ref io_utils.py:43-61)."""
    from PIL import Image
    frames = []
    for t in tensors:
        imgs = tensor_to_images(t, denorm)
        row = np.concatenate(imgs, axis=1)
        frames.append(Image.fromarray(row))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=duration, loop=0)
