"""Checkpoint export (ours -> reference .pth.tar): round-trip identity with
the importer for all six families, plus the file-level CLI contract."""

import numpy as np
import pytest
import jax

from mvae_tpu.models import model_ctor
from mvae_tpu.utils.torch_export import export_state_dict, export_checkpoint
from mvae_tpu.utils.torch_import import import_state_dict

FAMILY_LATENTS = {"mnist": 8, "fashionmnist": 8, "multimnist": 8,
                  "celeba": 12, "celeba19": 12, "vision": 12}


def _assert_tree_equal(a, b, path=""):
    la, lb = (jax.tree_util.tree_flatten_with_path(a),
              jax.tree_util.tree_flatten_with_path(b))
    assert la[1] == lb[1], f"tree structure mismatch at {path}"
    for (ka, va), (_, vb) in zip(la[0], lb[0]):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"leaf {jax.tree_util.keystr(ka)}")


@pytest.mark.parametrize(
    "family",
    # fast lane keeps the mnist case; the conv families each pay a full
    # model.init (3-8 s on this host) and run in the `slow` lane
    [f if f == "mnist" else pytest.param(f, marks=pytest.mark.slow)
     for f in sorted(FAMILY_LATENTS)])
def test_export_import_roundtrip_bit_identical(family):
    model = model_ctor(family)(FAMILY_LATENTS[family])
    params, state = model.init(jax.random.key(0))
    sd = export_state_dict(family, params, state)
    # every exported array is a plain numpy f32/i64 (torch.save-able)
    for k, v in sd.items():
        assert isinstance(v, np.ndarray), k
    p2, s2 = import_state_dict(family, sd, FAMILY_LATENTS[family])
    _assert_tree_equal(params, jax.tree_util.tree_map(np.asarray, p2))
    # BN-less families import empty per-layer state dicts; compare only
    # the leaves (values) plus structure via the same flatten
    _assert_tree_equal(state, jax.tree_util.tree_map(np.asarray, s2))


def test_export_checkpoint_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from mvae_tpu.train.checkpoint import save_checkpoint
    family = "celeba"
    model = model_ctor(family)(FAMILY_LATENTS[family])
    params, state = model.init(jax.random.key(1))
    save_checkpoint({"params": params, "state": state},
                    {"model": family, "n_latents": FAMILY_LATENTS[family],
                     "best_loss": 123.5},
                    is_best=True, folder=str(tmp_path))
    out, meta = export_checkpoint(
        family, str(tmp_path / "model_best.msgpack"),
        str(tmp_path / "model_best.pth.tar"))
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["n_latents"] == FAMILY_LATENTS[family]
    assert ckpt["best_loss"] == 123.5
    assert all(isinstance(v, torch.Tensor)
               for v in ckpt["state_dict"].values())
    # and the reference-side importer reads the file straight back
    from mvae_tpu.utils.torch_import import load_reference_checkpoint
    sd, ref_meta = load_reference_checkpoint(out)
    p2, s2 = import_state_dict(family, sd, FAMILY_LATENTS[family])
    _assert_tree_equal(params, jax.tree_util.tree_map(np.asarray, p2))
    _assert_tree_equal(state, jax.tree_util.tree_map(np.asarray, s2))


def test_export_cli(tmp_path, capsys):
    pytest.importorskip("torch")
    from mvae_tpu.train.checkpoint import save_checkpoint
    from scripts.export_torch_checkpoint import main
    model = model_ctor("mnist")(8)
    params, state = model.init(jax.random.key(2))
    save_checkpoint({"params": params, "state": state},
                    {"model": "mnist", "n_latents": 8},
                    is_best=True, folder=str(tmp_path))
    main([str(tmp_path / "model_best.msgpack"), "--family", "mnist"])
    out = capsys.readouterr().out
    assert "exported" in out
    assert (tmp_path / "model_best.pth.tar").exists()


def _torch_sd(family):
    """Reference-layout torch state_dicts from the import-test builders."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from tests.test_torch_import import (
        L as TL, _sd, _build_mnist, _build_celeba, _build_fashionmnist,
        _build_multimnist, _build_celeba19, _randomize_bn,
        _dcgan_image_encoder, _dcgan_image_decoder)
    rng = np.random.default_rng(17)
    if family == "mnist":
        tm = _build_mnist(TL)
    elif family == "celeba":
        tm = _build_celeba(TL)
    elif family == "fashionmnist":
        tm = _build_fashionmnist(TL)
    elif family == "multimnist":
        from mvae_tpu.data.text import N_CHARACTERS
        tm = _build_multimnist(TL, N_CHARACTERS, 200)
    elif family == "celeba19":
        tm = _build_celeba19(TL)
    else:
        from mvae_tpu.models.vision import MODALITIES, CHANNELS
        tm = nn.Module()
        for m in MODALITIES:
            setattr(tm, f"{m}_encoder",
                    _dcgan_image_encoder(CHANNELS[m], 1, 5, TL))
            setattr(tm, f"{m}_decoder",
                    _dcgan_image_decoder(CHANNELS[m], 1, 5, TL))
    _randomize_bn(tm, rng)
    return _sd(tm), TL


@pytest.mark.parametrize("family", sorted(FAMILY_LATENTS))
def test_reverse_roundtrip_torch_weights_bit_identical(family):
    """export(import(torch_sd)) reproduces every reference key and value
    bit-for-bit — the direction that guards a strict modern-torch
    load_state_dict on exported files."""
    sd, tl = _torch_sd(family)
    params, state = import_state_dict(family, sd, tl)
    sd2 = export_state_dict(family, params, state)
    extra = {k for k in sd2 if k not in sd}
    missing = {k for k in sd if k not in sd2}
    # torch-0.3-era reference modules lack num_batches_tracked; we emit it
    assert all(k.endswith("num_batches_tracked") for k in extra), extra
    assert not missing, missing
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(sd2[k], np.float32), np.asarray(sd[k], np.float32),
            err_msg=k)
