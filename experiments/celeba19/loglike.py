"""CelebA-19 marginal log-likelihood (IWAE; see core/loglike.py). The
reference ships no evaluation script for celeba19 at all."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.celeba import load_celeba                     # noqa: E402
from mvae_tpu.models.celeba19 import Celeba19MVAE                # noqa: E402
from mvae_tpu.train.loglike_cli import run_loglike               # noqa: E402


def main(argv=None):
    return run_loglike(argv, Celeba19MVAE,
                       lambda a: load_celeba(a.data_dir, 'test'))


if __name__ == "__main__":
    main()
