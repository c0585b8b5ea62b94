"""MultiMNIST dataset generation CLI — flag surface per
/root/reference/multimnist/datasets.py:293-311 (min/max digits, no-resize,
no-translate, fixed, scramble, reverse, no-repeat)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.multimnist import make_dataset                # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--min-digits', type=int, default=0)
    p.add_argument('--max-digits', type=int, default=4)
    p.add_argument('--no-resize', action='store_true', default=False)
    p.add_argument('--no-translate', action='store_true', default=False)
    p.add_argument('--fixed', action='store_true', default=False)
    p.add_argument('--scramble', action='store_true', default=False)
    p.add_argument('--reverse', action='store_true', default=False)
    p.add_argument('--no-repeat', action='store_true', default=False)
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--n-train', type=int, default=60000)
    p.add_argument('--n-test', type=int, default=10000)
    args = p.parse_args(argv)
    out = make_dataset(
        args.data_dir, n_train=args.n_train, n_test=args.n_test,
        min_digits=args.min_digits, max_digits=args.max_digits,
        resize=not args.no_resize, translate=not args.no_translate,
        fixed=args.fixed, scramble=args.scramble, reverse=args.reverse,
        no_repeat=args.no_repeat)
    print(f"wrote multimnist shards to {out}")


if __name__ == "__main__":
    main()
