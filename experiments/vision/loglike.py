"""Vision marginal log-likelihood (IWAE; see core/loglike.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from mvae_tpu.data.vision import load_celeb_vision               # noqa: E402
from mvae_tpu.models.vision import VisionMVAE                    # noqa: E402
from mvae_tpu.train.loglike_cli import run_loglike               # noqa: E402


def main(argv=None):
    return run_loglike(argv, VisionMVAE,
                       lambda a: load_celeb_vision(a.data_dir, 'test'))


if __name__ == "__main__":
    main()
