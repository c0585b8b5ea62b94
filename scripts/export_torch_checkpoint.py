"""Convert one of our msgpack checkpoints to the reference .pth.tar format.

    python scripts/export_torch_checkpoint.py --family celeba \
        trained_models/model_best.msgpack --out model_best.pth.tar

The output matches the reference's torch.save payload
({'state_dict', 'best_loss', 'n_latents', 'optimizer'},
mnist/train.py:115-121) with each family's published state_dict key names
and tensor layouts, so any torch consumer of the reference layout loads it
directly. Inverse of scripts/import_torch_checkpoint.py; round-trip
identity tested in tests/test_torch_export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvae_tpu.utils.torch_export import FAMILIES, export_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="our .msgpack checkpoint path")
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--out", default=None,
                    help="output path (default: alongside the input, "
                         ".pth.tar extension)")
    ns = ap.parse_args(argv)
    out = ns.out
    if out is None:
        base = os.path.splitext(ns.checkpoint)[0]
        out = base + ".pth.tar"
    out_path, meta = export_checkpoint(ns.family, ns.checkpoint, out)
    print(f"exported {ns.checkpoint} -> {out_path}")
    print(f"meta: {meta}")


if __name__ == "__main__":
    main()
