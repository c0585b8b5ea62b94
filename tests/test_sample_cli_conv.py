"""sample.py / loglike.py smoke for the conv families (celeba, celeba19,
vision, multimnist): run the real CLI mains against a freshly initialized
checkpoint (generation needs no training) and tiny synthetic data."""

import jax
import numpy as np
import pytest

from mvae_tpu.train.checkpoint import save_checkpoint


def _make_ckpt(tmp_path, model, name):
    params, state = model.init(jax.random.key(0))
    save_checkpoint({"params": params, "state": state},
                    {"model": name, "n_latents": model.n_latents,
                     "epoch": 0, "best_loss": 0.0}, True, str(tmp_path))
    return str(tmp_path / "model_best.msgpack")


@pytest.fixture()
def tiny_celeba(monkeypatch):
    from mvae_tpu.data.celeba import synthetic_celeba
    import experiments.celeba.sample as cs
    import experiments.celeba.loglike as cl
    import experiments.celeba19.sample as c19s
    loader = lambda root, part, **kw: synthetic_celeba(40, seed=1)  # noqa
    monkeypatch.setattr(cs, "load_celeba", loader)
    monkeypatch.setattr(c19s, "load_celeba", loader)
    monkeypatch.setattr(cl, "load_celeba", loader)
    return loader


@pytest.mark.slow
def test_celeba_sample_and_loglike(tmp_path, tiny_celeba):
    from mvae_tpu.models.celeba import CelebaMVAE
    import experiments.celeba.sample as cs
    import experiments.celeba.loglike as cl
    ckpt = _make_ckpt(tmp_path, CelebaMVAE(8), "celeba")
    for extra in ([], ['--condition-on-attrs', 'Male'],
                  ['--condition-on-text', 'Smiling'],       # alias spelling
                  ['--condition-on-image', 'Male',
                   '--condition-on-attrs', 'Male']):
        cs.main([ckpt, '--n-samples', '4', '--out-dir', str(tmp_path)]
                + extra)
        assert (tmp_path / "sample_image.png").exists()
        assert (tmp_path / "sample_attrs.txt").exists()
    ll = cl.main([ckpt, '--n-samples', '3', '--batch-size', '20',
                  '--max-examples', '20'])
    assert np.isfinite(ll)


def test_celeba_sample_rejects_unknown_attribute(tmp_path, tiny_celeba):
    from mvae_tpu.models.celeba import CelebaMVAE
    import experiments.celeba.sample as cs
    ckpt = _make_ckpt(tmp_path, CelebaMVAE(8), "celeba")
    with pytest.raises(SystemExit):
        cs.main([ckpt, '--condition-on-attrs', 'NotAnAttribute'])


@pytest.mark.slow
def test_celeba19_sample(tmp_path, tiny_celeba):
    from mvae_tpu.models.celeba19 import Celeba19MVAE
    import experiments.celeba19.sample as c19s
    ckpt = _make_ckpt(tmp_path, Celeba19MVAE(8), "celeba19")
    for extra in ([], ['--condition-on-attrs', 'Male']):
        c19s.main([ckpt, '--n-samples', '2', '--out-dir', str(tmp_path)]
                  + extra)
        assert (tmp_path / "sample_image.png").exists()


def test_vision_sample_unconditional(tmp_path):
    from mvae_tpu.models.vision import VisionMVAE, MODALITIES
    import experiments.vision.sample as vs
    ckpt = _make_ckpt(tmp_path, VisionMVAE(8), "vision")
    vs.main([ckpt, '--n-samples', '2', '--out-dir', str(tmp_path)])
    for m in MODALITIES:
        assert (tmp_path / "samples" / f"sample_{m}.png").exists()


@pytest.mark.slow
def test_vision_sample_condition_file_all_types(tmp_path):
    """--condition-file/--condition-type: an arbitrary user image is
    re-preprocessed into the requested modality's space (crop 64, gray/
    edge/obscure/watermark kernels, mask inversion — vision/sample.py
    :51-103 semantics) before conditioning."""
    from PIL import Image
    from mvae_tpu.models.vision import VisionMVAE, MODALITIES
    import experiments.vision.sample as vs
    ckpt = _make_ckpt(tmp_path, VisionMVAE(8), "vision")
    rng = np.random.default_rng(3)
    cond = tmp_path / "cond.png"
    Image.fromarray(rng.integers(0, 255, (80, 70, 3), np.uint8)).save(cond)
    for ctype in MODALITIES:
        out = tmp_path / ctype
        vs.main([ckpt, '--n-samples', '1', '--out-dir', str(out),
                 '--condition-file', str(cond), '--condition-type', ctype])
        assert (out / "samples" / "sample_image.png").exists()
    with pytest.raises(SystemExit):
        vs.main([ckpt, '--condition-file', str(cond),
                 '--condition-type', 'nonsense'])


@pytest.mark.slow
def test_multimnist_sample(tmp_path, monkeypatch):
    from mvae_tpu.models.multimnist import MultiMnistMVAE
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.data.text import encode_string
    import experiments.multimnist.sample as ms
    rng = np.random.default_rng(0)
    imgs = rng.random((30, 50, 50, 1)).astype(np.float32)
    texts = np.stack([encode_string("12")] * 30)
    monkeypatch.setattr(ms, "load_multimnist",
                        lambda root, train=False, **kw: ArrayDataset(
                            {"image": imgs, "text": texts}))
    ckpt = _make_ckpt(tmp_path, MultiMnistMVAE(8), "multimnist")
    for extra in ([], ['--condition-on-text', '12'],
                  ['--condition-on-image', '12']):
        ms.main([ckpt, '--n-samples', '2', '--out-dir', str(tmp_path)]
                + extra)
        assert (tmp_path / "sample_image.png").exists()
        assert (tmp_path / "sample_text.txt").exists()
    with pytest.raises(SystemExit):
        ms.main([ckpt, '--condition-on-image', '999'])


@pytest.mark.slow
def test_loglike_cli_remaining_families(tmp_path, monkeypatch):
    """loglike.py smoke for the four families not covered elsewhere
    (mnist: tests/test_train_cli.py; celeba: above) — the reference
    promised this evaluator for every experiment (README.md:36) but
    shipped none."""
    import jax.numpy as jnp
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.data.celeba import synthetic_celeba
    from mvae_tpu.data.text import encode_string
    from mvae_tpu.data.vision import derive_modalities
    rng = np.random.default_rng(1)

    from mvae_tpu.models.fashionmnist import FashionMnistMVAE
    import experiments.fashionmnist.loglike as fl
    monkeypatch.setattr(fl, "load_mnist", lambda root, **kw: ArrayDataset(
        {"image": rng.random((30, 28, 28, 1), np.float32),
         "text": (np.arange(30) % 10).astype(np.int32)}))
    ck = _make_ckpt(tmp_path / "f", FashionMnistMVAE(8), "fashionmnist")
    ll = fl.main([ck, '--n-samples', '3', '--batch-size', '15',
                  '--max-examples', '15'])
    assert np.isfinite(ll)

    from mvae_tpu.models.multimnist import MultiMnistMVAE
    import experiments.multimnist.loglike as ml
    monkeypatch.setattr(ml, "load_multimnist",
                        lambda root, train=False, **kw: ArrayDataset(
                            {"image": rng.random((20, 50, 50, 1),
                                                 np.float32),
                             "text": np.stack([encode_string("31")] * 20)}))
    ck = _make_ckpt(tmp_path / "m", MultiMnistMVAE(8), "multimnist")
    ll = ml.main([ck, '--n-samples', '3', '--batch-size', '10',
                  '--max-examples', '10'])
    assert np.isfinite(ll)

    from mvae_tpu.models.celeba19 import Celeba19MVAE
    import experiments.celeba19.loglike as c19l
    monkeypatch.setattr(c19l, "load_celeba",
                        lambda root, part, **kw: synthetic_celeba(20, seed=2))
    ck = _make_ckpt(tmp_path / "c", Celeba19MVAE(8), "celeba19")
    ll = c19l.main([ck, '--n-samples', '2', '--batch-size', '10',
                    '--max-examples', '10'])
    assert np.isfinite(ll)

    from mvae_tpu.models.vision import VisionMVAE
    import experiments.vision.loglike as vl
    rgb = synthetic_celeba(10, seed=3).arrays["image"]
    mods = derive_modalities(rgb, seed=3)
    monkeypatch.setattr(vl, "load_celeb_vision",
                        lambda root, part, **kw: ArrayDataset(
                            {k: jnp.asarray(v) for k, v in mods.items()}))
    ck = _make_ckpt(tmp_path / "v", VisionMVAE(8), "vision")
    ll = vl.main([ck, '--n-samples', '2', '--batch-size', '5',
                  '--max-examples', '5'])
    assert np.isfinite(ll)
