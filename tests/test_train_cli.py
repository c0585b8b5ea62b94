"""End-to-end smoke: the mnist train/sample/loglike CLIs run on synthetic
data (tiny settings) and produce their artifacts."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # full train-CLI integration (trains a model)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("mnist_models")
    data = tmp_path_factory.mktemp("mnist_data")
    from experiments.mnist import train as mnist_train
    # monkeypatch tiny synthetic datasets for speed
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.data.pipeline import ArrayDataset
    import numpy as np

    def tiny_load(root, train=True, **kw):
        n = 200 if train else 100
        imgs, labels = synthetic_mnist(n, seed=0 if train else 1)
        return ArrayDataset({"image": imgs.reshape(n, 784).astype(np.float32),
                             "text": labels})

    mnist_train.load_mnist = tiny_load
    mnist_train.main(['--epochs', '2', '--batch-size', '50',
                      '--annealing-epochs', '2', '--n-latents', '8',
                      '--out-dir', str(out), '--data-dir', str(data)])
    assert (out / "checkpoint.msgpack").exists()
    assert (out / "model_best.msgpack").exists()
    return out


def test_sample_all_modes(trained, tmp_path):
    from experiments.mnist import sample as mnist_sample
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.data.pipeline import ArrayDataset
    import numpy as np

    def tiny_load(root, train=False, **kw):
        imgs, labels = synthetic_mnist(100, seed=1)
        return ArrayDataset({"image": imgs.reshape(100, 784).astype(np.float32),
                             "text": labels})

    mnist_sample.load_mnist = tiny_load
    ckpt = str(trained / "model_best.msgpack")
    for extra in ([], ['--condition-on-image', '0'],
                  ['--condition-on-text', '0'],
                  ['--condition-on-image', '3', '--condition-on-text', '3']):
        mnist_sample.main([ckpt, '--n-samples', '4',
                           '--out-dir', str(tmp_path)] + extra)
        assert (tmp_path / "sample_image.png").exists()
        assert (tmp_path / "sample_text.txt").exists()
        (tmp_path / "sample_image.png").unlink()


def test_resume_continues_from_checkpoint(trained, tmp_path, capsys):
    from experiments.mnist import train as mnist_train
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.data.pipeline import ArrayDataset
    import numpy as np

    def tiny_load(root, train=True, **kw):
        n = 200 if train else 100
        imgs, labels = synthetic_mnist(n, seed=0 if train else 1)
        return ArrayDataset({"image": imgs.reshape(n, 784).astype(np.float32),
                             "text": labels})

    mnist_train.load_mnist = tiny_load
    mnist_train.main(['--epochs', '3', '--batch-size', '50',
                      '--annealing-epochs', '2', '--n-latents', '8',
                      '--out-dir', str(tmp_path), '--data-dir', str(tmp_path),
                      '--resume', str(trained / "checkpoint.msgpack")])
    out = capsys.readouterr().out
    assert "resumed from" in out
    # fixture trained 2 epochs, so resume starts at epoch 3
    assert "Train Epoch: 3" in out
    assert "Train Epoch: 1 " not in out


def test_loglike_tightens_with_k(trained):
    from experiments.mnist import loglike as mnist_loglike
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.data.pipeline import ArrayDataset
    import numpy as np

    def tiny_load(root, train=False, **kw):
        imgs, labels = synthetic_mnist(50, seed=1)
        return ArrayDataset({"image": imgs.reshape(50, 784).astype(np.float32),
                             "text": labels})

    mnist_loglike.load_mnist = tiny_load
    ckpt = str(trained / "model_best.msgpack")
    ll_1 = mnist_loglike.main([ckpt, '--n-samples', '1', '--seed', '3'])
    ll_64 = mnist_loglike.main([ckpt, '--n-samples', '64', '--seed', '3'])
    # IWAE bound is monotone in K (in expectation; generous margin)
    assert ll_64 >= ll_1 - 1.0
