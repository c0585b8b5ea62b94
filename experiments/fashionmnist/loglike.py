"""FashionMNIST marginal log-likelihood (IWAE; see core/loglike.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.mnist import load_mnist                       # noqa: E402
from mvae_tpu.models.fashionmnist import FashionMnistMVAE        # noqa: E402
from mvae_tpu.train.loglike_cli import run_loglike               # noqa: E402


def main(argv=None):
    return run_loglike(
        argv, FashionMnistMVAE,
        lambda a: load_mnist(a.data_dir, train=False, variant="FashionMNIST",
                             flatten=False))


if __name__ == "__main__":
    main()
