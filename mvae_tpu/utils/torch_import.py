"""Import trained reference PyTorch checkpoints into this framework.

The reference saves ``{'state_dict', 'best_loss', 'n_latents', 'optimizer'}``
via ``torch.save`` (mnist/train.py:115-121,263-268 and the same pattern in
every experiment). A user switching frameworks keeps their trained models:
this module maps each family's published ``state_dict`` key names onto our
parameter pytrees, so ``sample.py`` / ``loglike.py`` / ``train.py --resume``
(params only) run directly on reference-trained weights.

Layout conversions (all proven bit-faithful by the golden-transplant tests
``tests/test_golden_parity_{mnist,conv}.py`` and re-verified end-to-end by
``tests/test_torch_import.py``):
  * Linear: torch stores (out, in) — we store (in, out): transpose.
  * Conv2d: OIHW -> HWIO.
  * ConvTranspose2d: (in, out, kh, kw) -> (kh, kw, out, in) (the forward-
    conv HWIO layout that lax.conv_transpose(transpose_kernel=True) takes).
  * FC feeding ``x.view(-1, C, H, W)``: output columns permuted to our
    (H, W, C) reshape order; FC consuming ``x.flatten(1)`` of (B, C, H, W):
    input rows permuted likewise.
  * BatchNorm: weight/bias -> scale/bias params; running_mean/running_var
    -> {"mean","var"} state (num_batches_tracked unused — torch only needs
    it for momentum=None, which the reference never uses).
  * GRU: weight_ih_l{k}[_reverse] (3H, in) -> w_ih (in, 3H); gate order
    [r|z|n] is identical.
  * mnist's two separate posterior heads (fc31 mu, fc32 logvar —
    mnist/model.py:77-78) concatenate into our single 2L head.
  * celeba19's 18 per-attribute ModuleList nets (celeba19/model.py:26-29)
    stack into our leading expert axis.

Checkpoints may be Python-2-era pickles (the reference is py2 code):
``load_reference_checkpoint`` falls back to ``encoding='latin1'``.
"""

import numpy as np

__all__ = ["import_state_dict", "load_reference_checkpoint",
           "import_checkpoint", "FAMILIES"]


def _a(sd, key):
    if key not in sd:
        raise KeyError(f"reference state_dict is missing '{key}' — wrong "
                       f"--family, or not a reference checkpoint?")
    return np.ascontiguousarray(np.asarray(sd[key], dtype=np.float32))


def _lin(sd, p):
    return {"w": _a(sd, p + ".weight").T.copy(), "b": _a(sd, p + ".bias")}


def _lin_cat(sd, p_mu, p_lv):
    """Two L-wide torch heads -> one 2L head ordered [mu | logvar]."""
    return {"w": np.concatenate([_a(sd, p_mu + ".weight").T,
                                 _a(sd, p_lv + ".weight").T], axis=1),
            "b": np.concatenate([_a(sd, p_mu + ".bias"),
                                 _a(sd, p_lv + ".bias")])}


def _lin_up(sd, p, c, h, w):
    """FC whose torch output feeds ``x.view(B, c, h, w)``: permute output
    columns to our NHWC reshape order (h, w, c)."""
    W = _a(sd, p + ".weight").T                         # (in, c*h*w)
    W = W.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(W.shape[0], -1)
    b = _a(sd, p + ".bias").reshape(c, h, w).transpose(1, 2, 0).reshape(-1)
    return {"w": W.copy(), "b": b.copy()}


def _lin_flat(sd, p, c, h, w):
    """FC consuming ``x.flatten(1)`` of torch (B, c, h, w): permute input
    rows to our (h, w, c) flatten order."""
    W = _a(sd, p + ".weight").T                         # (c*h*w, out)
    W = W.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(c * h * w, -1)
    return {"w": W.copy(), "b": _a(sd, p + ".bias")}


def _conv(sd, p):
    return {"w": _a(sd, p + ".weight").transpose(2, 3, 1, 0).copy()}


def _convT(sd, p):
    return {"w": _a(sd, p + ".weight").transpose(2, 3, 1, 0).copy()}


def _bn(sd, p):
    params = {"scale": _a(sd, p + ".weight"), "bias": _a(sd, p + ".bias")}
    state = {"mean": _a(sd, p + ".running_mean"),
             "var": _a(sd, p + ".running_var")}
    return params, state


def _embed(sd, p):
    return {"table": _a(sd, p + ".weight")}


def _gru(sd, p, layer, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {"w_ih": _a(sd, f"{p}.weight_ih{sfx}").T.copy(),
            "w_hh": _a(sd, f"{p}.weight_hh{sfx}").T.copy(),
            "b_ih": _a(sd, f"{p}.bias_ih{sfx}"),
            "b_hh": _a(sd, f"{p}.bias_hh{sfx}")}


def _dcgan_enc(sd, mod, conv_ix, bn_ix):
    """Reference DCGAN encoder ``features`` Sequential -> our conv-stack
    list. conv_ix/bn_ix are the Sequential indices of Conv2d/BatchNorm2d
    layers (BN absent for the first conv: bn_ix is one shorter)."""
    params, state = [], []
    for j, ci in enumerate(conv_ix):
        p = {"conv": _conv(sd, f"{mod}.features.{ci}")}
        st = {}
        if 0 < j <= len(bn_ix):
            p["bn"], st = _bn(sd, f"{mod}.features.{bn_ix[j - 1]}")
        params.append(p)
        state.append(st)
    return params, state


def _dcgan_dec(sd, mod, conv_ix, bn_ix):
    """Reference DCGAN decoder ``hallucinate`` Sequential -> our deconv
    list (BN after every convT except the last logits layer)."""
    params, state = [], []
    for j, ci in enumerate(conv_ix):
        p = {"conv": _convT(sd, f"{mod}.hallucinate.{ci}")}
        st = {}
        if j < len(bn_ix):
            p["bn"], st = _bn(sd, f"{mod}.hallucinate.{bn_ix[j]}")
        params.append(p)
        state.append(st)
    return params, state


# ---------------------------------------------------------------------------
# per-family converters: state_dict -> (params, state) matching
# <Model>.init()'s pytree exactly
# ---------------------------------------------------------------------------


def _import_mnist(sd, L):
    """mnist/model.py:14-146 (plain-MLP bimodal)."""
    params = {
        "image_enc": [_lin(sd, "image_encoder.fc1"),
                      _lin(sd, "image_encoder.fc2"),
                      _lin_cat(sd, "image_encoder.fc31",
                               "image_encoder.fc32")],
        "image_dec": [_lin(sd, f"image_decoder.fc{i}") for i in (1, 2, 3, 4)],
        "text_enc": {"embed": _embed(sd, "text_encoder.fc1"),
                     "fc": _lin(sd, "text_encoder.fc2"),
                     "head": _lin_cat(sd, "text_encoder.fc31",
                                      "text_encoder.fc32")},
        "text_dec": [_lin(sd, f"text_decoder.fc{i}") for i in (1, 2, 3, 4)],
    }
    return params, {"enc": {}, "dec": {}}


def _import_fashionmnist(sd, L):
    """fashionmnist/model.py:26-165 (small no-BN CNN + label MLPs)."""
    conv_p, _ = _dcgan_enc(sd, "image_encoder", (0, 2), ())
    deconv_p, _ = _dcgan_dec(sd, "image_decoder", (0, 2), ())
    params = {
        "image_enc": {"conv": conv_p,
                      "fc": _lin_flat(sd, "image_encoder.classifier.0",
                                      128, 7, 7),
                      "head": _lin(sd, "image_encoder.classifier.2")},
        "image_dec": {"up": [_lin(sd, "image_decoder.upsampler.0"),
                             _lin_up(sd, "image_decoder.upsampler.2",
                                     128, 7, 7)],
                      "deconv": deconv_p},
        "text_enc": {"embed": _embed(sd, "text_encoder.net.0"),
                     "fc": _lin(sd, "text_encoder.net.2"),
                     "head": _lin(sd, "text_encoder.net.4")},
        "text_dec": [_lin(sd, f"text_decoder.net.{i}") for i in (0, 2, 4, 6)],
    }
    return params, {"enc": {}, "dec": {}}


def _import_multimnist(sd, L):
    """multimnist/model.py:29-235 (CNN+BN images, bi-GRU / AR-GRU text)."""
    conv_p, conv_st = _dcgan_enc(sd, "image_encoder", (0, 2, 5, 8), (3, 6, 9))
    deconv_p, deconv_st = _dcgan_dec(sd, "image_decoder",
                                     (0, 3, 6, 9), (1, 4, 7))
    params = {
        "image_enc": {"conv": conv_p,
                      "head": {"fc": _lin_flat(
                          sd, "image_encoder.classifier.0", 256, 2, 2),
                          "out": _lin(sd, "image_encoder.classifier.3")}},
        "image_dec": {"up": _lin_up(sd, "image_decoder.upsample.0",
                                    256, 2, 2),
                      "deconv": deconv_p},
        "text_enc": {"embed": _embed(sd, "text_encoder.embed"),
                     "gru_f": _gru(sd, "text_encoder.gru", 0),
                     "gru_b": _gru(sd, "text_encoder.gru", 0, reverse=True),
                     "h2p": _lin(sd, "text_encoder.h2p")},
        "text_dec": {"embed": _embed(sd, "text_decoder.embed"),
                     "z2h": _lin(sd, "text_decoder.z2h"),
                     "gru1": _gru(sd, "text_decoder.gru", 0),
                     "gru2": _gru(sd, "text_decoder.gru", 1),
                     "h2o": _lin(sd, "text_decoder.h2o")},
    }
    state = {"enc": {"image": conv_st}, "dec": {"image": deconv_st}}
    return params, state


def _celeba_image_side(sd):
    conv_p, conv_st = _dcgan_enc(sd, "image_encoder", (0, 2, 5, 8), (3, 6, 9))
    deconv_p, deconv_st = _dcgan_dec(sd, "image_decoder",
                                     (0, 3, 6, 9), (1, 4, 7))
    enc = {"conv": conv_p,
           "head": {"fc": _lin_flat(sd, "image_encoder.classifier.0",
                                    256, 5, 5),
                    "out": _lin(sd, "image_encoder.classifier.3")}}
    dec = {"up": _lin_up(sd, "image_decoder.upsample.0", 256, 5, 5),
           "deconv": deconv_p}
    return enc, dec, conv_st, deconv_st


def _mlp_bn(sd, mod, lin_ix, bn_ix, head_ix):
    blocks, state = [], []
    for li, bi in zip(lin_ix, bn_ix):
        bp, bst = _bn(sd, f"{mod}.{bi}")
        blocks.append({"fc": _lin(sd, f"{mod}.{li}"), "bn": bp})
        state.append(bst)
    return {"blocks": blocks, "head": _lin(sd, f"{mod}.{head_ix}")}, state


def _import_celeba(sd, L):
    """celeba/model.py:14-190 (DCGAN image + BN1d-MLP attribute nets)."""
    img_enc, img_dec, conv_st, deconv_st = _celeba_image_side(sd)
    attr_enc, ae_st = _mlp_bn(sd, "attrs_encoder.net", (0, 3), (1, 4), 6)
    attr_dec, ad_st = _mlp_bn(sd, "attrs_decoder.net", (0, 3, 6), (1, 4, 7), 9)
    params = {"image_enc": img_enc, "image_dec": img_dec,
              "attrs_enc": attr_enc, "attrs_dec": attr_dec}
    state = {"enc": {"image": conv_st, "attrs": ae_st},
             "dec": {"image": deconv_st, "attrs": ad_st}}
    return params, state


def _import_celeba19(sd, L, n_attrs=18):
    """celeba19/model.py:23-209 — the 18 per-attribute ModuleList nets
    stack into our leading expert axis (models/celeba19.py)."""
    img_enc, img_dec, conv_st, deconv_st = _celeba_image_side(sd)

    def stacked(prefix, idx):
        return {"w": np.stack([_a(sd, f"{prefix}.{i}.net.{idx}.weight").T
                               for i in range(n_attrs)]),
                "b": np.stack([_a(sd, f"{prefix}.{i}.net.{idx}.bias")
                               for i in range(n_attrs)])}

    params = {
        "image_enc": img_enc, "image_dec": img_dec,
        "attr_enc_experts": {
            "embed": np.stack([_a(sd, f"attr_encoders.{i}.net.0.weight")
                               for i in range(n_attrs)]),     # (18, 2, 512)
            "fc": stacked("attr_encoders", 2),
            "head": stacked("attr_encoders", 4)},
        "attr_dec_experts": {
            "fc": [stacked("attr_decoders", i) for i in (0, 2, 4)],
            "head": stacked("attr_decoders", 6)},
    }
    state = {"enc": {"image": conv_st}, "dec": {"image": deconv_st}}
    return params, state


def _import_vision(sd, L):
    """vision/model.py:12-180 — six DCGAN pairs named <m>_encoder /
    <m>_decoder; our params use <m>_enc / <m>_dec."""
    from mvae_tpu.models.vision import MODALITIES
    params, enc_st, dec_st = {}, {}, {}
    for m in MODALITIES:
        conv_p, cst = _dcgan_enc(sd, f"{m}_encoder", (0, 2, 5, 8), (3, 6, 9))
        deconv_p, dst = _dcgan_dec(sd, f"{m}_decoder", (0, 3, 6, 9),
                                   (1, 4, 7))
        params[f"{m}_enc"] = {
            "conv": conv_p,
            "head": {"fc": _lin_flat(sd, f"{m}_encoder.classifier.0",
                                     256, 5, 5),
                     "out": _lin(sd, f"{m}_encoder.classifier.3")}}
        params[f"{m}_dec"] = {"up": _lin_up(sd, f"{m}_decoder.upsample.0",
                                            256, 5, 5),
                              "deconv": deconv_p}
        enc_st[m], dec_st[m] = cst, dst
    return params, {"enc": enc_st, "dec": dec_st}


FAMILIES = {
    "mnist": _import_mnist,
    "fashionmnist": _import_fashionmnist,
    "multimnist": _import_multimnist,
    "celeba": _import_celeba,
    "celeba19": _import_celeba19,
    "vision": _import_vision,
}


def import_state_dict(family, sd, n_latents):
    """Map a reference ``state_dict`` (dict of arrays, torch tensors, or
    anything np.asarray accepts) to this framework's (params, state)."""
    if family not in FAMILIES:
        raise ValueError(f"unknown family '{family}' "
                         f"(choose from {sorted(FAMILIES)})")
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    return FAMILIES[family](sd, n_latents)


def load_reference_checkpoint(path):
    """Load a reference ``.pth.tar`` -> (state_dict_of_numpy, meta). Falls
    back to latin1 decoding for Python-2-era pickles."""
    import torch
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except UnicodeDecodeError:
            ckpt = torch.load(path, map_location="cpu", weights_only=False,
                              encoding="latin1")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    meta = {k: v for k, v in ckpt.items()
            if k not in ("state_dict", "optimizer")
            and isinstance(v, (int, float, str))}
    return sd, meta


def import_checkpoint(family, in_path, out_dir, n_latents=None):
    """Convert a reference checkpoint file to our msgpack format; returns
    (out_path, meta). The result loads with ``load_model_checkpoint`` and
    drives sample.py / loglike.py unchanged."""
    from mvae_tpu.train.checkpoint import save_checkpoint, BEST
    sd, ref_meta = load_reference_checkpoint(in_path)
    if n_latents is None:
        n_latents = ref_meta.get("n_latents")
    if n_latents is None:
        raise ValueError("checkpoint carries no n_latents; pass n_latents=")
    params, state = import_state_dict(family, sd, n_latents)
    meta = {"model": family, "n_latents": int(n_latents),
            "imported_from": str(in_path), **{
                k: v for k, v in ref_meta.items() if k != "n_latents"}}
    save_checkpoint({"params": params, "state": state}, meta,
                    is_best=True, folder=out_dir)
    import os
    return os.path.join(out_dir, BEST), meta
