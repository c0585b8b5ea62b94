"""Vision offline preprocessing CLI:
    python experiments/vision/setup.py {grayscale,edge,mask} in_dir out_dir

Reference: /root/reference/vision/setup.py:26-164 (PIL L-convert; skimage
canny sigma=2; dlib HOG + 68-landmark predictor -> OpenCV region rendering,
white-canvas fallback). Here grayscale/edge run through our jax kernels
(batched on device); the mask stage consumes a PRECOMPUTED landmarks file
(--landmarks: .npz mapping filename -> (68, 2) array) since dlib-style face
detection has no sane on-device equivalent (SURVEY.md §3.5) — files without
landmarks get the reference's white-canvas fallback."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.image import transforms as T                       # noqa: E402
from mvae_tpu.utils.png import write_png                         # noqa: E402


def _iter_images(in_dir):
    from PIL import Image
    for name in sorted(os.listdir(in_dir)):
        if name.lower().endswith((".png", ".jpg", ".jpeg")):
            yield name, Image.open(os.path.join(in_dir, name)).convert('RGB')


def build_grayscale_dataset(in_dir, out_dir):
    import jax.numpy as jnp
    for name, img in _iter_images(in_dir):
        rgb = np.asarray(img, np.float32)[None] / 255.0
        g = np.asarray(T.rgb_to_grayscale(jnp.asarray(rgb)))[0, ..., 0]
        write_png(os.path.join(out_dir, name), g)


def build_edge_dataset(in_dir, out_dir, canny_mode='absolute'):
    import jax.numpy as jnp
    for name, img in _iter_images(in_dir):
        rgb = np.asarray(img, np.float32)[None] / 255.0
        e = np.asarray(T.canny_edges(jnp.asarray(rgb), sigma=2.0,
                                     threshold_mode=canny_mode))[0, ..., 0]
        write_png(os.path.join(out_dir, name), e)


def build_mask_dataset(in_dir, out_dir, landmarks_file=None):
    lms = {}
    if landmarks_file:
        with np.load(landmarks_file) as z:
            lms = {k: z[k] for k in z.files}
    for name, img in _iter_images(in_dir):
        w, h = img.size
        mask = T.landmark_mask(h, w, lms.get(name))
        write_png(os.path.join(out_dir, name), mask[..., 0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('type', choices=['grayscale', 'edge', 'mask'])
    p.add_argument('in_dir', type=str)
    p.add_argument('out_dir', type=str)
    p.add_argument('--landmarks', type=str, default=None,
                   help='npz of filename -> (68,2) landmark points (mask only)')
    p.add_argument('--canny-mode', choices=['absolute', 'relative'],
                   default='absolute',
                   help="edge thresholds: 'absolute' = skimage defaults "
                        "(reference parity, vision/setup.py:72); 'relative' "
                        "scales 0.1/0.2 by each image's max gradient")
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.type == 'grayscale':
        build_grayscale_dataset(args.in_dir, args.out_dir)
    elif args.type == 'edge':
        build_edge_dataset(args.in_dir, args.out_dir, args.canny_mode)
    else:
        build_mask_dataset(args.in_dir, args.out_dir, args.landmarks)
    print(f"wrote {args.type} variants to {args.out_dir}")


if __name__ == "__main__":
    main()
