"""torch-checkpoint importer: reference state_dict -> our pytrees.

Builds torch modules with the reference's EXACT attribute names and
Sequential indices (so state_dict keys match the published checkpoint
contract, e.g. ``image_encoder.features.3.running_mean``), imports them
via mvae_tpu.utils.torch_import, and asserts

  1. the imported pytree has exactly the structure+shapes of
     ``<Model>.init()`` (every family), and
  2. forward passes through the imported weights match the torch
     reference flow (eval mode) — covering every layout conversion:
     conv/convT transposes, view-order FC permutations, BN running
     stats, bi-GRU and AR-GRU parameter layouts, head concatenation.

Reference architectures: mnist/model.py:14-146,
fashionmnist/model.py:26-165, multimnist/model.py:29-235,
celeba/model.py:14-190, celeba19/model.py:23-209, vision/model.py:12-180.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mvae_tpu.models import model_ctor  # noqa: E402
from mvae_tpu.utils.torch_import import (  # noqa: E402
    import_state_dict, import_checkpoint)

L = 10
RTOL = 2e-4
ATOL = 2e-4


class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


def _randomize_bn(module, rng):
    """Give every BN layer non-trivial running stats so eval-mode forwards
    actually exercise the imported mean/var."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            c = m.running_mean.shape[0]
            m.running_mean.copy_(torch.tensor(
                rng.standard_normal(c), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                0.5 + rng.random(c), dtype=torch.float32))


def _sd(container):
    return {k: v.detach().numpy() for k, v in container.state_dict().items()}


def _np(t):
    return t.detach().numpy()


def _assert_same_tree(imported, reference, what):
    s_imp = jax.tree_util.tree_structure(imported)
    s_ref = jax.tree_util.tree_structure(reference)
    assert s_imp == s_ref, f"{what} structure differs:\n{s_imp}\nvs\n{s_ref}"
    for a, b in zip(jax.tree_util.tree_leaves(imported),
                    jax.tree_util.tree_leaves(reference)):
        assert np.shape(a) == np.shape(b), (
            f"{what} leaf shape {np.shape(a)} != {np.shape(b)}")


# ---------------------------------------------------------------------------
# torch reference builders (attribute names == reference state_dict keys)
# ---------------------------------------------------------------------------


def _dcgan_image_encoder(cin, c_last_stride, hw, L):
    """celeba/celeba19/vision/multimnist ImageEncoder shape: conv x4 with
    BN from the 2nd, classifier [Linear, Swish, Dropout, Linear]."""
    m = nn.Module()
    m.features = nn.Sequential(
        nn.Conv2d(cin, 32, 4, 2, 1, bias=False), Swish(),
        nn.Conv2d(32, 64, 4, 2, 1, bias=False), nn.BatchNorm2d(64), Swish(),
        nn.Conv2d(64, 128, 4, 2, 1, bias=False), nn.BatchNorm2d(128),
        Swish(),
        nn.Conv2d(128, 256, 4, c_last_stride, 0, bias=False),
        nn.BatchNorm2d(256), Swish())
    m.classifier = nn.Sequential(
        nn.Linear(256 * hw * hw, 512), Swish(), nn.Dropout(p=0.1),
        nn.Linear(512, L * 2))
    return m


def _dcgan_image_decoder(cout, c_first_stride, hw, L, k3=4):
    m = nn.Module()
    m.upsample = nn.Sequential(nn.Linear(L, 256 * hw * hw), Swish())
    m.hallucinate = nn.Sequential(
        nn.ConvTranspose2d(256, 128, 4, c_first_stride, 0, bias=False),
        nn.BatchNorm2d(128), Swish(),
        nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
        nn.BatchNorm2d(64), Swish(),
        nn.ConvTranspose2d(64, 32, k3, 2, 1, bias=False),
        nn.BatchNorm2d(32), Swish(),
        nn.ConvTranspose2d(32, cout, 4, 2, 1, bias=False))
    return m


def _enc_forward(m, x, hw, L):
    x = m.features(x)
    x = x.reshape(-1, 256 * hw * hw)
    x = m.classifier(x)
    return x[:, :L], x[:, L:]


def _dec_forward(m, z, hw):
    z = m.upsample(z)
    z = z.reshape(-1, 256, hw, hw)
    return m.hallucinate(z)


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


# ---------------------------------------------------------------------------
# mnist
# ---------------------------------------------------------------------------


def _build_mnist(L):
    c = nn.Module()
    ie = nn.Module()
    ie.fc1, ie.fc2 = nn.Linear(784, 512), nn.Linear(512, 512)
    ie.fc31, ie.fc32 = nn.Linear(512, L), nn.Linear(512, L)
    id_ = nn.Module()
    id_.fc1, id_.fc2 = nn.Linear(L, 512), nn.Linear(512, 512)
    id_.fc3, id_.fc4 = nn.Linear(512, 512), nn.Linear(512, 784)
    te = nn.Module()
    te.fc1 = nn.Embedding(10, 512)
    te.fc2 = nn.Linear(512, 512)
    te.fc31, te.fc32 = nn.Linear(512, L), nn.Linear(512, L)
    td = nn.Module()
    td.fc1, td.fc2 = nn.Linear(L, 512), nn.Linear(512, 512)
    td.fc3, td.fc4 = nn.Linear(512, 512), nn.Linear(512, 10)
    c.image_encoder, c.image_decoder = ie, id_
    c.text_encoder, c.text_decoder = te, td
    return c


def test_mnist_import_structure_and_forward():
    tm = _build_mnist(L)
    model = model_ctor("mnist")(L)
    params, state = import_state_dict("mnist", _sd(tm), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "mnist params")
    _assert_same_tree(state, ref_s, "mnist state")

    rng = np.random.default_rng(0)
    img = rng.random((5, 784)).astype(np.float32)
    lab = np.array([0, 3, 9, 1, 7])
    mu, logvar, _ = model.encode(
        params, state, {"image": jnp.asarray(img),
                        "text": jnp.asarray(lab, jnp.int32)}, None, False)

    s = torch.sigmoid
    with torch.no_grad():
        x = torch.tensor(img)
        h = x @ tm.image_encoder.fc1.weight.T + tm.image_encoder.fc1.bias
        h = h * s(h)
        h = h @ tm.image_encoder.fc2.weight.T + tm.image_encoder.fc2.bias
        h = h * s(h)
        t_mu = h @ tm.image_encoder.fc31.weight.T + tm.image_encoder.fc31.bias
        t_lv = h @ tm.image_encoder.fc32.weight.T + tm.image_encoder.fc32.bias
    np.testing.assert_allclose(np.asarray(mu[0]), _np(t_mu),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar[0]), _np(t_lv),
                               rtol=RTOL, atol=ATOL)

    with torch.no_grad():
        e = tm.text_encoder.fc1(torch.tensor(lab))
        e = e * s(e)
        e = tm.text_encoder.fc2(e)
        e = e * s(e)
        t_mu = tm.text_encoder.fc31(e)
    np.testing.assert_allclose(np.asarray(mu[1]), _np(t_mu),
                               rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((5, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        h = torch.tensor(np.asarray(z))
        for fc in (tm.image_decoder.fc1, tm.image_decoder.fc2,
                   tm.image_decoder.fc3):
            h = fc(h)
            h = h * s(h)
        t_img = tm.image_decoder.fc4(h)
    np.testing.assert_allclose(np.asarray(recons["image"]), _np(t_img),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# celeba (conv/convT/BN + view-order FC permutations + BN1d MLPs)
# ---------------------------------------------------------------------------


def _build_celeba(L):
    c = nn.Module()
    c.image_encoder = _dcgan_image_encoder(3, 1, 5, L)
    c.image_decoder = _dcgan_image_decoder(3, 1, 5, L)
    ae = nn.Module()
    ae.net = nn.Sequential(
        nn.Linear(18, 512), nn.BatchNorm1d(512), Swish(),
        nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
        nn.Linear(512, L * 2))
    ad = nn.Module()
    ad.net = nn.Sequential(
        nn.Linear(L, 512), nn.BatchNorm1d(512), Swish(),
        nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
        nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
        nn.Linear(512, 18))
    c.attrs_encoder, c.attrs_decoder = ae, ad
    return c


@pytest.mark.slow
def test_celeba_import_structure_and_forward():
    tm = _build_celeba(L)
    rng = np.random.default_rng(1)
    _randomize_bn(tm, rng)
    tm.eval()
    model = model_ctor("celeba")(L)
    params, state = import_state_dict("celeba", _sd(tm), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "celeba params")
    _assert_same_tree(state, ref_s, "celeba state")

    img = rng.random((3, 64, 64, 3)).astype(np.float32)
    attrs = (rng.random((3, 18)) < 0.5).astype(np.float32)
    mu, logvar, _ = model.encode(
        params, state, {"image": jnp.asarray(img),
                        "attrs": jnp.asarray(attrs)}, None, False)
    with torch.no_grad():
        t_mu, t_lv = _enc_forward(tm.image_encoder, _nchw(img), 5, L)
        a = tm.attrs_encoder.net(torch.tensor(attrs))
    np.testing.assert_allclose(np.asarray(mu[0]), _np(t_mu),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar[0]), _np(t_lv),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(mu[1]), _np(a[:, :L]),
                               rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((3, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        t_img = _dec_forward(tm.image_decoder, torch.tensor(np.asarray(z)), 5)
        t_attr = tm.attrs_decoder.net(torch.tensor(np.asarray(z)))
    np.testing.assert_allclose(
        np.asarray(recons["image"]),
        np.transpose(_np(t_img), (0, 2, 3, 1)), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(recons["attrs"]), _np(t_attr),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# fashionmnist (no-BN conv stacks, two-layer upsampler, net Sequentials)
# ---------------------------------------------------------------------------


def _build_fashionmnist(L):
    c = nn.Module()
    ie = nn.Module()
    ie.features = nn.Sequential(
        nn.Conv2d(1, 64, 4, 2, 1, bias=False), Swish(),
        nn.Conv2d(64, 128, 4, 2, 1, bias=False), Swish())
    ie.classifier = nn.Sequential(
        nn.Linear(128 * 7 * 7, 512), Swish(), nn.Linear(512, L * 2))
    id_ = nn.Module()
    id_.upsampler = nn.Sequential(
        nn.Linear(L, 512), Swish(), nn.Linear(512, 128 * 7 * 7), Swish())
    id_.hallucinate = nn.Sequential(
        nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False), Swish(),
        nn.ConvTranspose2d(64, 1, 4, 2, 1, bias=False))
    te = nn.Module()
    te.net = nn.Sequential(nn.Embedding(10, 512), Swish(),
                           nn.Linear(512, 512), Swish(),
                           nn.Linear(512, L * 2))
    td = nn.Module()
    td.net = nn.Sequential(nn.Linear(L, 512), Swish(),
                           nn.Linear(512, 512), Swish(),
                           nn.Linear(512, 512), Swish(),
                           nn.Linear(512, 10))
    c.image_encoder, c.image_decoder = ie, id_
    c.text_encoder, c.text_decoder = te, td
    return c


def test_fashionmnist_import_structure_and_forward():
    tm = _build_fashionmnist(L)
    tm.eval()
    model = model_ctor("fashionmnist")(L)
    params, state = import_state_dict("fashionmnist", _sd(tm), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "fashionmnist params")
    _assert_same_tree(state, ref_s, "fashionmnist state")

    rng = np.random.default_rng(2)
    img = rng.random((4, 28, 28, 1)).astype(np.float32)
    mu, logvar, _ = model.encode(
        params, state, {"image": jnp.asarray(img),
                        "text": jnp.asarray([1, 2, 3, 4], jnp.int32)},
        None, False)
    with torch.no_grad():
        x = tm.image_encoder.features(_nchw(img))
        x = tm.image_encoder.classifier(x.reshape(x.shape[0], -1))
    np.testing.assert_allclose(np.asarray(mu[0]), _np(x[:, :L]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar[0]), _np(x[:, L:]),
                               rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((4, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        h = tm.image_decoder.upsampler(torch.tensor(np.asarray(z)))
        t_img = tm.image_decoder.hallucinate(h.reshape(-1, 128, 7, 7))
    np.testing.assert_allclose(
        np.asarray(recons["image"]),
        np.transpose(_np(t_img), (0, 2, 3, 1)), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# multimnist (bi-GRU encoder + 2-layer AR-GRU decoder)
# ---------------------------------------------------------------------------


def _build_multimnist(L, n_chars, H):
    c = nn.Module()
    c.image_encoder = _dcgan_image_encoder(1, 2, 2, L)
    c.image_decoder = _dcgan_image_decoder(1, 2, 2, L, k3=5)
    te = nn.Module()
    te.embed = nn.Embedding(n_chars, H)
    te.gru = nn.GRU(H, H, 1, bidirectional=True)
    te.h2p = nn.Linear(H, L * 2)
    td = nn.Module()
    td.embed = nn.Embedding(n_chars, H)
    td.z2h = nn.Linear(L, H)
    td.gru = nn.GRU(H + L, H, 2)
    td.h2o = nn.Linear(H + L, n_chars)
    c.text_encoder, c.text_decoder = te, td
    return c


@pytest.mark.slow
def test_multimnist_import_structure_and_forward():
    from mvae_tpu.data.text import MAX_LENGTH, N_CHARACTERS, SOS
    H = 200
    tm = _build_multimnist(L, N_CHARACTERS, H)
    rng = np.random.default_rng(3)
    _randomize_bn(tm, rng)
    tm.eval()
    model = model_ctor("multimnist")(L)
    params, state = import_state_dict("multimnist", _sd(tm), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "multimnist params")
    _assert_same_tree(state, ref_s, "multimnist state")

    img = rng.random((3, 50, 50, 1)).astype(np.float32)
    text = rng.integers(0, N_CHARACTERS, (3, MAX_LENGTH))
    mu, logvar, _ = model.encode(
        params, state, {"image": jnp.asarray(img),
                        "text": jnp.asarray(text, jnp.int32)}, None, False)
    with torch.no_grad():
        t_mu, t_lv = _enc_forward(tm.image_encoder, _nchw(img), 2, L)
        e = tm.text_encoder.embed(torch.tensor(text)).transpose(0, 1)
        out, _h = tm.text_encoder.gru(e, None)
        last = out[-1]
        last = last[:, :H] + last[:, H:]
        t_txt = tm.text_encoder.h2p(last)
    np.testing.assert_allclose(np.asarray(mu[0]), _np(t_mu),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(mu[1]), _np(t_txt[:, :L]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar[1]), _np(t_txt[:, L:]),
                               rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((3, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        zt = torch.tensor(np.asarray(z))
        t_img = _dec_forward(tm.image_decoder, zt, 2)
        # reference AR decode loop (multimnist/model.py:206-235), eval mode
        B = zt.shape[0]
        c_in = torch.full((B,), SOS, dtype=torch.long)
        h = tm.text_decoder.z2h(zt).unsqueeze(0).repeat(2, 1, 1)
        words = []
        for _ in range(MAX_LENGTH):
            e = tm.text_decoder.embed(c_in)
            e = e * torch.sigmoid(e)
            e = torch.cat((e, zt), dim=1).unsqueeze(0)
            o, h = tm.text_decoder.gru(e, h)
            o = torch.cat((o.squeeze(0), zt), dim=1)
            o = tm.text_decoder.h2o(o)
            c_in = torch.max(torch.log_softmax(o, dim=1), dim=1)[1]
            words.append(o)
        t_words = torch.stack(words, dim=1)
    np.testing.assert_allclose(
        np.asarray(recons["image"]),
        np.transpose(_np(t_img), (0, 2, 3, 1)), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(recons["text"]), _np(t_words),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# celeba19 (18 per-attr ModuleList nets -> stacked expert axis)
# ---------------------------------------------------------------------------


def _build_celeba19(L, n_attrs=18):
    c = nn.Module()
    c.image_encoder = _dcgan_image_encoder(3, 1, 5, L)
    c.image_decoder = _dcgan_image_decoder(3, 1, 5, L)

    def enc():
        m = nn.Module()
        m.net = nn.Sequential(nn.Embedding(2, 512), Swish(),
                              nn.Linear(512, 512), Swish(),
                              nn.Linear(512, L * 2))
        return m

    def dec():
        m = nn.Module()
        m.net = nn.Sequential(nn.Linear(L, 512), Swish(),
                              nn.Linear(512, 512), Swish(),
                              nn.Linear(512, 512), Swish(),
                              nn.Linear(512, 1))
        return m

    c.attr_encoders = nn.ModuleList([enc() for _ in range(n_attrs)])
    c.attr_decoders = nn.ModuleList([dec() for _ in range(n_attrs)])
    return c


@pytest.mark.slow
def test_celeba19_import_structure_and_stacked_experts():
    tm = _build_celeba19(L)
    rng = np.random.default_rng(4)
    _randomize_bn(tm, rng)
    tm.eval()
    model = model_ctor("celeba19")(L)
    params, state = import_state_dict("celeba19", _sd(tm), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "celeba19 params")
    _assert_same_tree(state, ref_s, "celeba19 state")

    img = rng.random((2, 64, 64, 3)).astype(np.float32)
    attrs = (rng.random((2, 18)) < 0.5).astype(np.float32)
    mu, logvar, _ = model.encode(
        params, state, {"image": jnp.asarray(img),
                        "attrs": jnp.asarray(attrs)}, None, False)
    with torch.no_grad():
        for i in range(18):
            x = tm.attr_encoders[i].net(
                torch.tensor(attrs[:, i]).long())
            np.testing.assert_allclose(np.asarray(mu[1 + i]),
                                       _np(x[:, :L]),
                                       rtol=RTOL, atol=ATOL)
            np.testing.assert_allclose(np.asarray(logvar[1 + i]),
                                       _np(x[:, L:]),
                                       rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((2, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        t_attr = torch.cat([tm.attr_decoders[i].net(
            torch.tensor(np.asarray(z))) for i in range(18)], dim=1)
    np.testing.assert_allclose(np.asarray(recons["attrs"]), _np(t_attr),
                               rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# vision (six DCGAN pairs under <m>_encoder / <m>_decoder names)
# ---------------------------------------------------------------------------


def test_vision_import_structure_and_one_modality_forward():
    from mvae_tpu.models.vision import MODALITIES, CHANNELS
    c = nn.Module()
    for m in MODALITIES:
        setattr(c, f"{m}_encoder",
                _dcgan_image_encoder(CHANNELS[m], 1, 5, L))
        setattr(c, f"{m}_decoder",
                _dcgan_image_decoder(CHANNELS[m], 1, 5, L))
    rng = np.random.default_rng(5)
    _randomize_bn(c, rng)
    c.eval()
    model = model_ctor("vision")(L)
    params, state = import_state_dict("vision", _sd(c), L)
    ref_p, ref_s = model.init(jax.random.key(0))
    _assert_same_tree(params, ref_p, "vision params")
    _assert_same_tree(state, ref_s, "vision state")

    inputs = {m: jnp.asarray(rng.random(
        (2, 64, 64, CHANNELS[m])).astype(np.float32)) for m in MODALITIES}
    mu, logvar, _ = model.encode(params, state, inputs, None, False)
    with torch.no_grad():
        t_mu, _t = _enc_forward(getattr(c, "gray_encoder"),
                                _nchw(np.asarray(inputs["gray"])), 5, L)
    np.testing.assert_allclose(np.asarray(mu[MODALITIES.index("gray")]),
                               _np(t_mu), rtol=RTOL, atol=ATOL)

    z = jnp.asarray(rng.standard_normal((2, L)), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        t_img = _dec_forward(getattr(c, "edge_decoder"),
                             torch.tensor(np.asarray(z)), 5)
    np.testing.assert_allclose(
        np.asarray(recons["edge"]),
        np.transpose(_np(t_img), (0, 2, 3, 1)), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# end-to-end: reference .pth.tar file -> our msgpack -> sample entry
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_warm_start_training_from_imported_checkpoint(tmp_path, capsys):
    """--resume with a params-only imported checkpoint warm-starts the
    driver (fresh optimizer/PRNG, epoch 1) instead of crashing on the
    missing opt_state; reference fine-tuning flow mnist/train.py:160-171."""
    tm = _build_mnist(L)
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": tm.state_dict(), "best_loss": 9.9,
                "n_latents": L, "optimizer": {}}, str(path))
    out_path, _meta = import_checkpoint("mnist", str(path), str(tmp_path))

    from experiments.mnist import train as mnist_train
    from mvae_tpu.data.mnist import synthetic_mnist
    from mvae_tpu.data.pipeline import ArrayDataset

    def tiny_load(root, train=True, **kw):
        n = 100 if train else 50
        imgs, labels = synthetic_mnist(n, seed=0 if train else 1)
        return ArrayDataset({"image": imgs.reshape(n, 784).astype(np.float32),
                             "text": labels})

    orig = mnist_train.load_mnist
    mnist_train.load_mnist = tiny_load
    try:
        mnist_train.main(['--epochs', '1', '--batch-size', '50',
                          '--annealing-epochs', '1', '--n-latents', str(L),
                          '--out-dir', str(tmp_path / "out"),
                          '--data-dir', str(tmp_path),
                          '--resume', out_path])
    finally:
        mnist_train.load_mnist = orig
    out = capsys.readouterr().out
    assert "warm-started" in out
    assert "Train Epoch: 1" in out


def test_import_checkpoint_file_roundtrip(tmp_path):
    tm = _build_mnist(L)
    path = tmp_path / "model_best.pth.tar"
    torch.save({"state_dict": tm.state_dict(), "best_loss": 123.4,
                "n_latents": L, "optimizer": {}}, str(path))

    out_path, meta = import_checkpoint("mnist", str(path), str(tmp_path))
    assert meta["n_latents"] == L and meta["best_loss"] == 123.4

    from mvae_tpu.train.driver import load_model_checkpoint
    model, params, state, meta2 = load_model_checkpoint(
        out_path, model_ctor("mnist"))
    assert meta2["model"] == "mnist"
    z = jnp.zeros((2, L), jnp.float32)
    recons, _ = model.decode(params, state, z, None, False)
    with torch.no_grad():
        h = torch.zeros(2, L)
        s = torch.sigmoid
        for fc in (tm.image_decoder.fc1, tm.image_decoder.fc2,
                   tm.image_decoder.fc3):
            h = fc(h)
            h = h * s(h)
        t_img = tm.image_decoder.fc4(h)
    np.testing.assert_allclose(np.asarray(recons["image"]), _np(t_img),
                               rtol=RTOL, atol=ATOL)
