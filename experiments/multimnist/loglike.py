"""MultiMNIST marginal log-likelihood (IWAE; see core/loglike.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.multimnist import load_multimnist             # noqa: E402
from mvae_tpu.models.multimnist import MultiMnistMVAE            # noqa: E402
from mvae_tpu.train.loglike_cli import run_loglike               # noqa: E402


def main(argv=None):
    return run_loglike(argv, MultiMnistMVAE,
                       lambda a: load_multimnist(a.data_dir, train=False))


if __name__ == "__main__":
    main()
