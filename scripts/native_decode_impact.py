"""Measure the trained-metric impact of native-libjpeg vs PIL-exact decode.

The native ingest (native/image_decode.cc, DCT-prescaled decode) differs
from PIL pixels by a few percent (tests/test_native.py tolerance), and it
is the default for real CelebA (data/celeba.py). This script quantifies
what that divergence does to TRAINED metrics on the celeba parity
protocol (VERDICT r2 #7):

  1. render the synthetic-celeba parity arrays to real JPEGs (quality 95,
     178x218 aligned-crop geometry) + Eval/Anno metadata;
  2. ingest the same files twice — native path and --exact-decode PIL
     path — and report the raw pixel delta;
  3. train the celeba parity protocol (same seed) on each ingest and
     report test ELBO + IWAE log p(image) for both.

Results land in BASELINE.md's parity-notes section.

Run on the TPU host:  python scripts/native_decode_impact.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np                                            # noqa: E402


def build_jpeg_tree(root, n_train=2000, n_val=500):
    """Synthetic celeba arrays -> real JPEG files + metadata tree."""
    from PIL import Image
    from mvae_tpu.data.celeba import synthetic_celeba, ATTR_IX_TO_KEEP
    os.makedirs(os.path.join(root, "Eval"), exist_ok=True)
    os.makedirs(os.path.join(root, "Anno"), exist_ok=True)
    os.makedirs(os.path.join(root, "img_align_celeba"), exist_ok=True)
    tr = synthetic_celeba(n_train, seed=0)
    va = synthetic_celeba(n_val, seed=1)
    imgs = np.concatenate([tr.arrays["image"], va.arrays["image"]])
    attrs = np.concatenate([tr.arrays["attrs"], va.arrays["attrs"]])
    n = len(imgs)
    with open(os.path.join(root, "Eval", "list_eval_partition.txt"),
              "w") as f:
        for i in range(n):
            f.write(f"{i + 1:06d}.jpg {0 if i < n_train else 1}\n")
    # full 40-attr header; the 18 kept columns carry the synthetic attrs
    names = [f"a{j}" for j in range(40)]
    with open(os.path.join(root, "Anno", "list_attr_celeba.txt"),
              "w") as f:
        f.write(f"{n}\n")
        f.write(" ".join(names) + "\n")
        for i in range(n):
            row = -np.ones(40, np.int64)
            row[np.asarray(ATTR_IX_TO_KEEP)] = \
                2 * attrs[i].astype(np.int64) - 1
            f.write(f"{i + 1:06d}.jpg "
                    + " ".join(f"{v:2d}" for v in row) + "\n")
    for i in range(n):
        # upsample 64 -> the real 178x218 aligned geometry so the decode
        # paths exercise their true resize/center-crop pipelines
        im = Image.fromarray(
            (imgs[i] * 255).astype(np.uint8)).resize((178, 218),
                                                     Image.BILINEAR)
        im.save(os.path.join(root, "img_align_celeba", f"{i + 1:06d}.jpg"),
                quality=95)
    return n_train, n_val


def run(root):
    from mvae_tpu.data.celeba import load_celeba
    import parity_convergence as pc

    ds_pil_tr = load_celeba(root, "train", exact_decode=True)
    ds_nat_tr = load_celeba(root, "train", exact_decode=False)
    ds_pil_va = load_celeba(root, "val", exact_decode=True)
    ds_nat_va = load_celeba(root, "val", exact_decode=False)
    a, b = ds_pil_tr.arrays["image"], ds_nat_tr.arrays["image"]
    pix = {"mean_abs": float(np.mean(np.abs(a - b))),
           "p99_abs": float(np.percentile(np.abs(a - b), 99)),
           "max_abs": float(np.max(np.abs(a - b)))}
    print("pixel delta (native vs PIL, [0,1] scale):", pix, flush=True)

    out = {"pixel_delta": pix}
    for tag, tr, va in (("pil", ds_pil_tr, ds_pil_va),
                        ("native", ds_nat_tr, ds_nat_va)):
        q8 = lambda x: (np.round(x * 255.0) / 255.0).astype(np.float32)  # noqa: E731
        r = pc.run_ours_celeba(q8(tr.arrays["image"]),
                               tr.arrays["attrs"].astype(np.float32),
                               q8(va.arrays["image"]),
                               va.arrays["attrs"].astype(np.float32))
        print(f"[{tag}] {r}", flush=True)
        out[tag] = r
    for k in ("test_elbo", "iwae_100", "iwae_500"):
        out[f"rel_diff_{k}"] = (abs(out["native"][k] - out["pil"][k])
                                / abs(out["pil"][k]))
    path = os.path.join(os.path.dirname(__file__), "..",
                        "trained_models", "native_decode_impact.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k.startswith("rel_diff")}, indent=1))


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/celeba_jpeg_tree"
    if not os.path.isfile(os.path.join(root, "Eval",
                                       "list_eval_partition.txt")):
        print("building JPEG tree...", flush=True)
        build_jpeg_tree(root)
    run(root)
