"""Export this framework's checkpoints to the reference PyTorch format.

The inverse of utils/torch_import.py: maps our (params, state) pytrees back
onto each family's published ``state_dict`` key names and tensor layouts,
and saves ``{'state_dict', 'best_loss', 'n_latents', 'optimizer'}`` exactly
as the reference's ``save_checkpoint`` does (mnist/train.py:115-121). A
user can train on TPU here and hand the resulting ``.pth.tar`` to any
torch consumer of the reference layout (e.g. a modern-torch
reimplementation of the reference models — the reference code itself is
Python-2-only).

Every layout conversion is the exact inverse of the import module's
(Linear transpose, OIHW/HWIO, the view-order permutations of FCs feeding/
consuming ``view(-1, C, H, W)``, GRU gate layout, mnist's split posterior
heads, celeba19's expert-axis unstacking). Round-trip identity —
``import_state_dict(export_state_dict(p, s)) == (p, s)`` bit-for-bit, and
the reverse on torch-initialized weights — is asserted for all six
families in tests/test_torch_export.py.

BatchNorm note: the reference (torch 0.3 era) had no
``num_batches_tracked`` buffer; modern torch modules do and default-
strict ``load_state_dict`` wants it. We emit it (value 0) — harmless
extra key for ancient consumers, required for modern ones.
"""

import numpy as np

__all__ = ["export_state_dict", "export_checkpoint", "FAMILIES"]


def _np(v):
    return np.ascontiguousarray(np.asarray(v, dtype=np.float32))


def _x_lin(sd, p, lin):
    sd[p + ".weight"] = _np(lin["w"]).T.copy()
    sd[p + ".bias"] = _np(lin["b"])


def _x_lin_cat(sd, p_mu, p_lv, lin):
    """Our single 2L head [mu | logvar] -> two L-wide torch heads."""
    w, b = _np(lin["w"]), _np(lin["b"])
    L = w.shape[1] // 2
    sd[p_mu + ".weight"] = w[:, :L].T.copy()
    sd[p_mu + ".bias"] = b[:L].copy()
    sd[p_lv + ".weight"] = w[:, L:].T.copy()
    sd[p_lv + ".bias"] = b[L:].copy()


def _x_lin_up(sd, p, c, h, w, lin):
    """Inverse of _lin_up: our (h, w, c)-ordered output columns back to
    torch's ``view(B, c, h, w)`` order."""
    W = _np(lin["w"])                                   # (in, h*w*c)
    W = W.reshape(-1, h, w, c).transpose(0, 3, 1, 2).reshape(W.shape[0], -1)
    sd[p + ".weight"] = W.T.copy()
    b = _np(lin["b"]).reshape(h, w, c).transpose(2, 0, 1).reshape(-1)
    sd[p + ".bias"] = b.copy()


def _x_lin_flat(sd, p, c, h, w, lin):
    """Inverse of _lin_flat: our (h, w, c)-ordered input rows back to
    torch's ``x.flatten(1)`` of (B, c, h, w)."""
    W = _np(lin["w"])                                   # (h*w*c, out)
    W = W.reshape(h, w, c, -1).transpose(2, 0, 1, 3).reshape(c * h * w, -1)
    sd[p + ".weight"] = W.T.copy()
    sd[p + ".bias"] = _np(lin["b"])


def _x_conv(sd, p, conv):
    sd[p + ".weight"] = _np(conv["w"]).transpose(3, 2, 0, 1).copy()


def _x_convT(sd, p, conv):
    sd[p + ".weight"] = _np(conv["w"]).transpose(3, 2, 0, 1).copy()


def _x_bn(sd, p, bn_params, bn_state):
    sd[p + ".weight"] = _np(bn_params["scale"])
    sd[p + ".bias"] = _np(bn_params["bias"])
    sd[p + ".running_mean"] = _np(bn_state["mean"])
    sd[p + ".running_var"] = _np(bn_state["var"])
    sd[p + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _x_embed(sd, p, emb):
    sd[p + ".weight"] = _np(emb["table"])


def _x_gru(sd, p, layer, g, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    sd[f"{p}.weight_ih{sfx}"] = _np(g["w_ih"]).T.copy()
    sd[f"{p}.weight_hh{sfx}"] = _np(g["w_hh"]).T.copy()
    sd[f"{p}.bias_ih{sfx}"] = _np(g["b_ih"])
    sd[f"{p}.bias_hh{sfx}"] = _np(g["b_hh"])


def _x_dcgan_enc(sd, mod, conv_ix, bn_ix, params, state):
    for j, ci in enumerate(conv_ix):
        _x_conv(sd, f"{mod}.features.{ci}", params[j]["conv"])
        if 0 < j <= len(bn_ix):
            _x_bn(sd, f"{mod}.features.{bn_ix[j - 1]}",
                  params[j]["bn"], state[j])


def _x_dcgan_dec(sd, mod, conv_ix, bn_ix, params, state):
    for j, ci in enumerate(conv_ix):
        _x_convT(sd, f"{mod}.hallucinate.{ci}", params[j]["conv"])
        if j < len(bn_ix):
            _x_bn(sd, f"{mod}.hallucinate.{bn_ix[j]}",
                  params[j]["bn"], state[j])


# ---------------------------------------------------------------------------
# per-family exporters: (params, state) -> reference state_dict
# ---------------------------------------------------------------------------


def _export_mnist(params, state):
    sd = {}
    for i, lin in enumerate(params["image_enc"][:2]):
        _x_lin(sd, f"image_encoder.fc{i + 1}", lin)
    _x_lin_cat(sd, "image_encoder.fc31", "image_encoder.fc32",
               params["image_enc"][2])
    for i, lin in enumerate(params["image_dec"]):
        _x_lin(sd, f"image_decoder.fc{i + 1}", lin)
    _x_embed(sd, "text_encoder.fc1", params["text_enc"]["embed"])
    _x_lin(sd, "text_encoder.fc2", params["text_enc"]["fc"])
    _x_lin_cat(sd, "text_encoder.fc31", "text_encoder.fc32",
               params["text_enc"]["head"])
    for i, lin in enumerate(params["text_dec"]):
        _x_lin(sd, f"text_decoder.fc{i + 1}", lin)
    return sd


def _export_fashionmnist(params, state):
    sd = {}
    enc = params["image_enc"]
    for j, ci in enumerate((0, 2)):
        _x_conv(sd, f"image_encoder.features.{ci}", enc["conv"][j]["conv"])
    _x_lin_flat(sd, "image_encoder.classifier.0", 128, 7, 7, enc["fc"])
    _x_lin(sd, "image_encoder.classifier.2", enc["head"])
    dec = params["image_dec"]
    _x_lin(sd, "image_decoder.upsampler.0", dec["up"][0])
    _x_lin_up(sd, "image_decoder.upsampler.2", 128, 7, 7, dec["up"][1])
    for j, ci in enumerate((0, 2)):
        _x_convT(sd, f"image_decoder.hallucinate.{ci}",
                 dec["deconv"][j]["conv"])
    _x_embed(sd, "text_encoder.net.0", params["text_enc"]["embed"])
    _x_lin(sd, "text_encoder.net.2", params["text_enc"]["fc"])
    _x_lin(sd, "text_encoder.net.4", params["text_enc"]["head"])
    for i, ix in enumerate((0, 2, 4, 6)):
        _x_lin(sd, f"text_decoder.net.{ix}", params["text_dec"][i])
    return sd


def _export_multimnist(params, state):
    sd = {}
    enc = params["image_enc"]
    _x_dcgan_enc(sd, "image_encoder", (0, 2, 5, 8), (3, 6, 9),
                 enc["conv"], state["enc"]["image"])
    _x_lin_flat(sd, "image_encoder.classifier.0", 256, 2, 2,
                enc["head"]["fc"])
    _x_lin(sd, "image_encoder.classifier.3", enc["head"]["out"])
    dec = params["image_dec"]
    _x_lin_up(sd, "image_decoder.upsample.0", 256, 2, 2, dec["up"])
    _x_dcgan_dec(sd, "image_decoder", (0, 3, 6, 9), (1, 4, 7),
                 dec["deconv"], state["dec"]["image"])
    te = params["text_enc"]
    _x_embed(sd, "text_encoder.embed", te["embed"])
    _x_gru(sd, "text_encoder.gru", 0, te["gru_f"])
    _x_gru(sd, "text_encoder.gru", 0, te["gru_b"], reverse=True)
    _x_lin(sd, "text_encoder.h2p", te["h2p"])
    td = params["text_dec"]
    _x_embed(sd, "text_decoder.embed", td["embed"])
    _x_lin(sd, "text_decoder.z2h", td["z2h"])
    _x_gru(sd, "text_decoder.gru", 0, td["gru1"])
    _x_gru(sd, "text_decoder.gru", 1, td["gru2"])
    _x_lin(sd, "text_decoder.h2o", td["h2o"])
    return sd


def _x_celeba_image_side(sd, params, state):
    enc = params["image_enc"]
    _x_dcgan_enc(sd, "image_encoder", (0, 2, 5, 8), (3, 6, 9),
                 enc["conv"], state["enc"]["image"])
    _x_lin_flat(sd, "image_encoder.classifier.0", 256, 5, 5,
                enc["head"]["fc"])
    _x_lin(sd, "image_encoder.classifier.3", enc["head"]["out"])
    dec = params["image_dec"]
    _x_lin_up(sd, "image_decoder.upsample.0", 256, 5, 5, dec["up"])
    _x_dcgan_dec(sd, "image_decoder", (0, 3, 6, 9), (1, 4, 7),
                 dec["deconv"], state["dec"]["image"])


def _x_mlp_bn(sd, mod, lin_ix, bn_ix, head_ix, mlp, state):
    for j, (li, bi) in enumerate(zip(lin_ix, bn_ix)):
        _x_lin(sd, f"{mod}.{li}", mlp["blocks"][j]["fc"])
        _x_bn(sd, f"{mod}.{bi}", mlp["blocks"][j]["bn"], state[j])
    _x_lin(sd, f"{mod}.{head_ix}", mlp["head"])


def _export_celeba(params, state):
    sd = {}
    _x_celeba_image_side(sd, params, state)
    _x_mlp_bn(sd, "attrs_encoder.net", (0, 3), (1, 4), 6,
              params["attrs_enc"], state["enc"]["attrs"])
    _x_mlp_bn(sd, "attrs_decoder.net", (0, 3, 6), (1, 4, 7), 9,
              params["attrs_dec"], state["dec"]["attrs"])
    return sd


def _export_celeba19(params, state, n_attrs=18):
    sd = {}
    _x_celeba_image_side(sd, params, state)

    def unstack(prefix, idx, stacked):
        w, b = _np(stacked["w"]), _np(stacked["b"])
        for i in range(n_attrs):
            sd[f"{prefix}.{i}.net.{idx}.weight"] = w[i].T.copy()
            sd[f"{prefix}.{i}.net.{idx}.bias"] = b[i].copy()

    ae = params["attr_enc_experts"]
    emb = _np(ae["embed"])                              # (18, 2, 512)
    for i in range(n_attrs):
        sd[f"attr_encoders.{i}.net.0.weight"] = emb[i].copy()
    unstack("attr_encoders", 2, ae["fc"])
    unstack("attr_encoders", 4, ae["head"])
    ad = params["attr_dec_experts"]
    for j, idx in enumerate((0, 2, 4)):
        unstack("attr_decoders", idx, ad["fc"][j])
    unstack("attr_decoders", 6, ad["head"])
    return sd


def _export_vision(params, state):
    from mvae_tpu.models.vision import MODALITIES
    sd = {}
    for m in MODALITIES:
        enc = params[f"{m}_enc"]
        _x_dcgan_enc(sd, f"{m}_encoder", (0, 2, 5, 8), (3, 6, 9),
                     enc["conv"], state["enc"][m])
        _x_lin_flat(sd, f"{m}_encoder.classifier.0", 256, 5, 5,
                    enc["head"]["fc"])
        _x_lin(sd, f"{m}_encoder.classifier.3", enc["head"]["out"])
        dec = params[f"{m}_dec"]
        _x_lin_up(sd, f"{m}_decoder.upsample.0", 256, 5, 5, dec["up"])
        _x_dcgan_dec(sd, f"{m}_decoder", (0, 3, 6, 9), (1, 4, 7),
                     dec["deconv"], state["dec"][m])
    return sd


FAMILIES = {
    "mnist": _export_mnist,
    "fashionmnist": _export_fashionmnist,
    "multimnist": _export_multimnist,
    "celeba": _export_celeba,
    "celeba19": _export_celeba19,
    "vision": _export_vision,
}


def export_state_dict(family, params, state):
    """Map our (params, state) pytrees to a reference-layout state_dict of
    numpy arrays (keys and tensor layouts per family model file)."""
    if family not in FAMILIES:
        raise ValueError(f"unknown family '{family}' "
                         f"(choose from {sorted(FAMILIES)})")
    import jax
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)
    return FAMILIES[family](params, state)


def export_checkpoint(family, in_path, out_path):
    """Convert one of our msgpack checkpoints to a reference-format
    ``.pth.tar``; returns (out_path, meta)."""
    import torch
    # restore through the model template: flax's msgpack state-dicts store
    # lists as {"0": ...} dicts, so the raw payload must be re-shaped
    from mvae_tpu.models import model_ctor
    from mvae_tpu.train.driver import load_model_checkpoint
    _, params, state, meta = load_model_checkpoint(in_path,
                                                   model_ctor(family))
    sd = export_state_dict(family, params, state)
    ckpt = {
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "n_latents": int(meta.get("n_latents", 0)) or None,
        "best_loss": meta.get("best_loss"),
        "optimizer": None,      # reference loaders ignore it (README parity)
    }
    torch.save(ckpt, out_path)
    return out_path, meta
