"""Golden end-to-end transplant parity for the BN/conv families.

Closes the gap between "primitives match torch" and "the composed ELBO
matches": build the reference's CelebA MVAE (conv+BN+dropout heads,
/root/reference/celeba/model.py:66-190) and MultiMNIST MVAE (CNN+BN encoder
+ autoregressive 2-layer GRU text decoder,
/root/reference/multimnist/model.py:75-235) in torch, copy every weight AND
BN running statistic into our pytrees, and assert the fused multi-term eval
ELBO equals the reference's 3-forward eager computation.

Also verifies the engine's closed-form sequential-EMA composition
(core/engine.py:commit_ema_states) reproduces the reference's T-commits-
per-step BN running statistics exactly over 10 training steps.

Transplant note: the FC layers flanking the conv stacks cross a spatial
reshape, and torch's view(B, C, H, W) is channel-major while our NHWC
reshape is channel-minor — weights crossing that boundary are permuted
(_lin_up/_lin_flat), a pure re-parameterization of the same function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
from mvae_tpu.models.multimnist import MultiMnistMVAE

torch.manual_seed(0)

MASKS = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])


def _swish(x):
    return x * torch.sigmoid(x)


def _lin(mod):
    return {"w": jnp.asarray(mod.weight.detach().numpy().T),
            "b": jnp.asarray(mod.bias.detach().numpy())}


def _lin_up(mod, c, h, w):
    """torch fc whose output feeds x.view(B, c, h, w) (channel-major):
    permute the output columns to our NHWC reshape order (h, w, c)."""
    W = mod.weight.detach().numpy().T            # (in, c*h*w)
    W = W.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(W.shape[0], -1)
    b = (mod.bias.detach().numpy().reshape(c, h, w)
         .transpose(1, 2, 0).reshape(-1))
    return {"w": jnp.asarray(W.copy()), "b": jnp.asarray(b.copy())}


def _lin_flat(mod, c, h, w):
    """torch fc consuming x.flatten(1) of (B, c, h, w): permute the input
    rows to our (h, w, c) flatten order."""
    W = mod.weight.detach().numpy().T            # (c*h*w, out)
    W = (W.reshape(c, h, w, -1).transpose(1, 2, 0, 3)
         .reshape(c * h * w, -1))
    return {"w": jnp.asarray(W.copy()),
            "b": jnp.asarray(mod.bias.detach().numpy())}


def _conv_w(mod):   # torch OIHW -> HWIO
    return {"w": jnp.asarray(np.transpose(
        mod.weight.detach().numpy(), (2, 3, 1, 0)))}


def _convT_w(mod):  # torch (in, out, kh, kw) -> (kh, kw, out, in)
    return {"w": jnp.asarray(np.transpose(
        mod.weight.detach().numpy(), (2, 3, 1, 0)))}


def _bn(mod):
    # .copy(): jnp.asarray can zero-copy the torch storage on CPU, and the
    # running stats are updated IN PLACE by later torch train forwards
    p = {"scale": jnp.asarray(mod.weight.detach().numpy()),
         "bias": jnp.asarray(mod.bias.detach().numpy())}
    st = {"mean": jnp.asarray(mod.running_mean.detach().numpy().copy()),
          "var": jnp.asarray(mod.running_var.detach().numpy().copy())}
    return p, st


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _torch_kld(mu, lv):
    return -0.5 * (1 + lv - mu ** 2 - lv.exp()).sum(1)


def _torch_bce(x, t):
    return (x.clamp(min=0) - x * t + torch.log1p((-x.abs()).exp()))


def _torch_poe(mus, lvs, eps=1e-8):
    mu, lv = torch.stack(mus), torch.stack(lvs)
    t = 1.0 / (lv.exp() + eps)
    pd_mu = (mu * t).sum(0) / t.sum(0)
    return pd_mu, torch.log(1.0 / t.sum(0))


# ---------------------------------------------------------------------------
# CelebA (conv + BN + BN1d attr nets)
# ---------------------------------------------------------------------------

class _TorchCeleba(torch.nn.Module):
    """Faithful reference CelebA MVAE (celeba/model.py:66-190)."""

    def __init__(self, L):
        super().__init__()
        S = _swish
        self.L = L
        self.enc_convs = torch.nn.ModuleList([
            torch.nn.Conv2d(3, 32, 4, 2, 1, bias=False),
            torch.nn.Conv2d(32, 64, 4, 2, 1, bias=False),
            torch.nn.Conv2d(64, 128, 4, 2, 1, bias=False),
            torch.nn.Conv2d(128, 256, 4, 1, 0, bias=False)])
        self.enc_bns = torch.nn.ModuleList([
            torch.nn.BatchNorm2d(c) for c in (64, 128, 256)])
        self.enc_fc = torch.nn.Linear(256 * 5 * 5, 512)
        self.enc_out = torch.nn.Linear(512, 2 * L)
        self.dec_up = torch.nn.Linear(L, 256 * 5 * 5)
        self.dec_convs = torch.nn.ModuleList([
            torch.nn.ConvTranspose2d(256, 128, 4, 1, 0, bias=False),
            torch.nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
            torch.nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
            torch.nn.ConvTranspose2d(32, 3, 4, 2, 1, bias=False)])
        self.dec_bns = torch.nn.ModuleList([
            torch.nn.BatchNorm2d(c) for c in (128, 64, 32)])
        self.attr_enc_fcs = torch.nn.ModuleList(
            [torch.nn.Linear(N_ATTRS, 512), torch.nn.Linear(512, 512)])
        self.attr_enc_bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(512), torch.nn.BatchNorm1d(512)])
        self.attr_enc_out = torch.nn.Linear(512, 2 * L)
        self.attr_dec_fcs = torch.nn.ModuleList(
            [torch.nn.Linear(L, 512), torch.nn.Linear(512, 512),
             torch.nn.Linear(512, 512)])
        self.attr_dec_bns = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(512) for _ in range(3)])
        self.attr_dec_out = torch.nn.Linear(512, N_ATTRS)

    def enc_image(self, x):
        x = _swish(self.enc_convs[0](x))
        for conv, bn in zip(self.enc_convs[1:], self.enc_bns):
            x = _swish(bn(conv(x)))
        h = _swish(self.enc_fc(x.flatten(1)))
        return self.enc_out(h)                 # eval: dropout inert

    def enc_attrs(self, a):
        for fc, bn in zip(self.attr_enc_fcs, self.attr_enc_bns):
            a = _swish(bn(fc(a)))
        return self.attr_enc_out(a)

    def dec_image(self, z):
        x = _swish(self.dec_up(z)).view(-1, 256, 5, 5)
        for conv, bn in zip(self.dec_convs[:-1], self.dec_bns):
            x = _swish(bn(conv(x)))
        return self.dec_convs[-1](x)

    def dec_attrs(self, z):
        for fc, bn in zip(self.attr_dec_fcs, self.attr_dec_bns):
            z = _swish(bn(fc(z)))
        return self.attr_dec_out(z)


def _celeba_params_from_torch(tm, L):
    enc_conv, enc_st = [], []
    for i, conv in enumerate(tm.enc_convs):
        p = {"conv": _conv_w(conv)}
        st = {}
        if i > 0:
            p["bn"], st = _bn(tm.enc_bns[i - 1])
        enc_conv.append(p)
        enc_st.append(st)
    dec_conv, dec_st = [], []
    for i, conv in enumerate(tm.dec_convs):
        p = {"conv": _convT_w(conv)}
        st = {}
        if i < 3:
            p["bn"], st = _bn(tm.dec_bns[i])
        dec_conv.append(p)
        dec_st.append(st)

    def mlp_bn(fcs, bns, out):
        blocks, sts = [], []
        for fc, bn in zip(fcs, bns):
            bp, bs = _bn(bn)
            blocks.append({"fc": _lin(fc), "bn": bp})
            sts.append(bs)
        return {"blocks": blocks, "head": _lin(out)}, sts

    ae_p, ae_st = mlp_bn(tm.attr_enc_fcs, tm.attr_enc_bns, tm.attr_enc_out)
    ad_p, ad_st = mlp_bn(tm.attr_dec_fcs, tm.attr_dec_bns, tm.attr_dec_out)
    params = {
        "image_enc": {"conv": enc_conv,
                      "head": {"fc": _lin_flat(tm.enc_fc, 256, 5, 5),
                               "out": _lin(tm.enc_out)}},
        "image_dec": {"up": _lin_up(tm.dec_up, 256, 5, 5),
                      "deconv": dec_conv},
        "attrs_enc": ae_p,
        "attrs_dec": ad_p,
    }
    state = {"enc": {"image": enc_st, "attrs": ae_st},
             "dec": {"image": dec_st, "attrs": ad_st}}
    return params, state


@pytest.mark.slow
def test_celeba_eval_elbo_matches_torch_reference_flow():
    L = 12
    tm = _TorchCeleba(L)
    rng = np.random.default_rng(0)
    B = 6
    image = rng.random((B, 64, 64, 3)).astype(np.float32)
    attrs = (rng.random((B, N_ATTRS)) < 0.3).astype(np.float32)

    # give the BN running stats non-trivial values with one train forward
    tm.train()
    with torch.no_grad():
        ti = _nchw(image)
        ta = torch.from_numpy(attrs)
        tm.enc_image(ti); tm.enc_attrs(ta)
        tm.dec_image(torch.randn(B, L)); tm.dec_attrs(torch.randn(B, L))
    tm.eval()

    beta, li, la = 0.7, 1.0, 10.0
    with torch.no_grad():
        img_p = tm.enc_image(ti)
        att_p = tm.enc_attrs(ta)
        zeros = torch.zeros(B, L)

        def term(ui, ua):
            mus, lvs = [zeros], [zeros]
            if ui:
                mus.append(img_p[:, :L]); lvs.append(img_p[:, L:])
            if ua:
                mus.append(att_p[:, :L]); lvs.append(att_p[:, L:])
            mu, lv = _torch_poe(mus, lvs)
            total = beta * _torch_kld(mu, lv)
            if ui:
                r = tm.dec_image(mu)     # eval: z = mu
                total = total + li * _torch_bce(r.flatten(1),
                                                ti.flatten(1)).sum(1)
            if ua:
                r = tm.dec_attrs(mu)
                # per-attribute BCE loop == sum over the attr axis
                # (celeba/train.py:54-58)
                total = total + la * _torch_bce(r, ta).sum(1)
            return total.mean()

        torch_total = term(True, True) + term(True, False) + term(False, True)
        per_term_want = [float(term(True, True)), float(term(True, False)),
                         float(term(False, True))]

    model = CelebaMVAE(L)
    params, state = _celeba_params_from_torch(tm, L)
    lambdas = jnp.asarray([[li, la]] * 3)
    batch = {"image": jnp.asarray(image), "attrs": jnp.asarray(attrs)}
    total, aux, _ = multi_term_elbo(model, params, state, batch, MASKS,
                                    lambdas, None, beta, train=False)
    np.testing.assert_allclose(float(total), float(torch_total),
                               rtol=1e-4, atol=1e-2)
    for got, want in zip(np.asarray(aux["per_term"]), per_term_want):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


# ---------------------------------------------------------------------------
# MultiMNIST (CNN+BN + autoregressive 2-layer GRU decode)
# ---------------------------------------------------------------------------

class _TorchMultiMnist(torch.nn.Module):
    """Faithful reference MultiMNIST MVAE (multimnist/model.py:75-235)."""

    def __init__(self, L, H=200):
        super().__init__()
        self.L, self.H = L, H
        self.enc_convs = torch.nn.ModuleList([
            torch.nn.Conv2d(1, 32, 4, 2, 1, bias=False),
            torch.nn.Conv2d(32, 64, 4, 2, 1, bias=False),
            torch.nn.Conv2d(64, 128, 4, 2, 1, bias=False),
            torch.nn.Conv2d(128, 256, 4, 2, 0, bias=False)])
        self.enc_bns = torch.nn.ModuleList([
            torch.nn.BatchNorm2d(c) for c in (64, 128, 256)])
        self.enc_fc = torch.nn.Linear(256 * 2 * 2, 512)
        self.enc_out = torch.nn.Linear(512, 2 * L)
        self.dec_up = torch.nn.Linear(L, 256 * 2 * 2)
        self.dec_convs = torch.nn.ModuleList([
            torch.nn.ConvTranspose2d(256, 128, 4, 2, 0, bias=False),
            torch.nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
            torch.nn.ConvTranspose2d(64, 32, 5, 2, 1, bias=False),
            torch.nn.ConvTranspose2d(32, 1, 4, 2, 1, bias=False)])
        self.dec_bns = torch.nn.ModuleList([
            torch.nn.BatchNorm2d(c) for c in (128, 64, 32)])
        self.txt_embed = torch.nn.Embedding(12, H)
        self.txt_gru = torch.nn.GRU(H, H, 1, bidirectional=True)
        self.txt_h2p = torch.nn.Linear(H, 2 * L)
        self.gen_embed = torch.nn.Embedding(12, H)
        self.gen_z2h = torch.nn.Linear(L, H)
        self.gen_gru = torch.nn.GRU(H + L, H, 2)   # eval: dropout inert
        self.gen_h2o = torch.nn.Linear(H + L, 12)

    def enc_image(self, x):
        x = _swish(self.enc_convs[0](x))
        for conv, bn in zip(self.enc_convs[1:], self.enc_bns):
            x = _swish(bn(conv(x)))
        return self.enc_out(_swish(self.enc_fc(x.flatten(1))))

    def enc_text(self, t):
        x = self.txt_embed(t).transpose(0, 1)
        x, _ = self.txt_gru(x)
        x = x[-1]
        H = self.H
        return self.txt_h2p(x[:, :H] + x[:, H:])

    def dec_image(self, z):
        x = _swish(self.dec_up(z)).view(-1, 256, 2, 2)
        for conv, bn in zip(self.dec_convs[:-1], self.dec_bns):
            x = _swish(bn(conv(x)))
        return self.dec_convs[-1](x)

    def dec_text(self, z):
        B = z.shape[0]
        c_in = torch.full((B,), 10, dtype=torch.long)      # SOS
        h = self.gen_z2h(z).unsqueeze(0).repeat(2, 1, 1)
        outs = []
        for _ in range(4):
            e = torch.cat((_swish(self.gen_embed(c_in)), z), dim=1)
            o, h = self.gen_gru(e.unsqueeze(0), h)
            o = self.gen_h2o(torch.cat((o.squeeze(0), z), dim=1))
            outs.append(o)
            c_in = torch.max(F.log_softmax(o, dim=1), dim=1)[1]
        return torch.stack(outs, dim=1)                    # (B, 4, 12)


def _gru_p(tgru, layer=0, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    g = lambda n: getattr(tgru, n + sfx).detach().numpy()  # noqa: E731
    return {"w_ih": jnp.asarray(g("weight_ih").T),
            "w_hh": jnp.asarray(g("weight_hh").T),
            "b_ih": jnp.asarray(g("bias_ih")),
            "b_hh": jnp.asarray(g("bias_hh"))}


def _multimnist_params_from_torch(tm):
    enc_conv, enc_st = [], []
    for i, conv in enumerate(tm.enc_convs):
        p = {"conv": _conv_w(conv)}
        st = {}
        if i > 0:
            p["bn"], st = _bn(tm.enc_bns[i - 1])
        enc_conv.append(p)
        enc_st.append(st)
    dec_conv, dec_st = [], []
    for i, conv in enumerate(tm.dec_convs):
        p = {"conv": _convT_w(conv)}
        st = {}
        if i < 3:
            p["bn"], st = _bn(tm.dec_bns[i])
        dec_conv.append(p)
        dec_st.append(st)
    params = {
        "image_enc": {"conv": enc_conv,
                      "head": {"fc": _lin_flat(tm.enc_fc, 256, 2, 2),
                               "out": _lin(tm.enc_out)}},
        "image_dec": {"up": _lin_up(tm.dec_up, 256, 2, 2),
                      "deconv": dec_conv},
        "text_enc": {
            "embed": {"table": jnp.asarray(
                tm.txt_embed.weight.detach().numpy())},
            "gru_f": _gru_p(tm.txt_gru),
            "gru_b": _gru_p(tm.txt_gru, reverse=True),
            "h2p": _lin(tm.txt_h2p)},
        "text_dec": {
            "embed": {"table": jnp.asarray(
                tm.gen_embed.weight.detach().numpy())},
            "z2h": _lin(tm.gen_z2h),
            "gru1": _gru_p(tm.gen_gru, layer=0),
            "gru2": _gru_p(tm.gen_gru, layer=1),
            "h2o": _lin(tm.gen_h2o)},
    }
    state = {"enc": {"image": enc_st}, "dec": {"image": dec_st}}
    return params, state


@pytest.mark.slow
def test_multimnist_eval_elbo_matches_torch_reference_flow():
    L = 10
    tm = _TorchMultiMnist(L)
    rng = np.random.default_rng(1)
    B = 5
    image = rng.random((B, 50, 50, 1)).astype(np.float32)
    text = rng.integers(0, 12, (B, 4)).astype(np.int64)

    tm.train()
    with torch.no_grad():
        ti = _nchw(image)
        tm.enc_image(ti)
        tm.dec_image(torch.randn(B, L))
    tm.eval()

    beta, li, lt = 0.9, 1.0, 10.0
    with torch.no_grad():
        tt = torch.from_numpy(text)
        img_p = tm.enc_image(ti)
        txt_p = tm.enc_text(tt)
        zeros = torch.zeros(B, L)

        def term(ui, ut):
            mus, lvs = [zeros], [zeros]
            if ui:
                mus.append(img_p[:, :L]); lvs.append(img_p[:, L:])
            if ut:
                mus.append(txt_p[:, :L]); lvs.append(txt_p[:, L:])
            mu, lv = _torch_poe(mus, lvs)
            total = beta * _torch_kld(mu, lv)
            if ui:
                r = tm.dec_image(mu)
                total = total + li * _torch_bce(r.flatten(1),
                                                ti.flatten(1)).sum(1)
            if ut:
                r = tm.dec_text(mu)                       # (B, 4, 12)
                # CE per position summed over 4 positions
                # (multimnist/train.py:54-61), +1e-6 inside log_softmax
                logp = F.log_softmax(r + 1e-6, dim=-1)
                nll = -logp.gather(-1, tt.unsqueeze(-1)).squeeze(-1)
                total = total + lt * nll.sum(1)
            return total.mean()

        torch_total = term(True, True) + term(True, False) + term(False, True)

    model = MultiMnistMVAE(L)
    params, state = _multimnist_params_from_torch(tm)
    lambdas = jnp.asarray([[li, lt]] * 3)
    batch = {"image": jnp.asarray(image),
             "text": jnp.asarray(text.astype(np.int32))}
    total, aux, _ = multi_term_elbo(model, params, state, batch, MASKS,
                                    lambdas, None, beta, train=False)
    np.testing.assert_allclose(float(total), float(torch_total),
                               rtol=1e-4, atol=1e-2)


# ---------------------------------------------------------------------------
# BN EMA: term-mean commit vs the reference's T sequential commits
# ---------------------------------------------------------------------------

def test_bn_ema_commit_matches_torch_sequential_exactly():
    """The engine's closed-form EMA composition (engine.commit_ema_states)
    must reproduce the reference's SEQUENTIAL commits bit-for-bit (to f32
    tolerance): decoders get T commits in term order (every forward decodes
    all modalities), encoders get one commit per term where the modality is
    present (same batch => identical moments each time). 10 steps on the
    real CelebA nets, wildly different per-term z to stress the weighting."""
    from mvae_tpu.core.engine import commit_ema_states

    L, B, T = 8, 4, 3
    tm = _TorchCeleba(L)
    tm.train()
    model = CelebaMVAE(L)
    params, state = _celeba_params_from_torch(tm, L)

    rng = np.random.default_rng(5)
    zs = rng.normal(size=(T, B, L)).astype(np.float32) * \
        np.asarray([0.3, 1.0, 3.0], np.float32)[:, None, None]
    image = rng.random((B, 64, 64, 3)).astype(np.float32)
    attrs = (rng.random((B, N_ATTRS)) < 0.3).astype(np.float32)
    masks = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])

    # torch: the reference's per-step flow — encode present modalities per
    # term, decode all modalities per term, EMA updated at every forward
    with torch.no_grad():
        ti, ta = _nchw(image), torch.from_numpy(attrs)
        for _ in range(10):
            for t, (ui, ua) in enumerate([(1, 1), (1, 0), (0, 1)]):
                if ui:
                    tm.enc_image(ti)
                if ua:
                    tm.enc_attrs(ta)
                z = torch.from_numpy(zs[t])
                tm.dec_image(z)
                tm.dec_attrs(z)

    # ours: encode once + vmapped decode + closed-form commit, 10 steps
    batch = {"image": jnp.asarray(image), "attrs": jnp.asarray(attrs)}
    zj = jnp.asarray(zs)

    @jax.jit
    def step(st):
        _, _, enc_st = model.encode(params, st, batch, None, True)
        _, dec_states = jax.vmap(
            lambda zt: model.decode(params, st, zt, None, True))(zj)
        return commit_ema_states(model, st, enc_st, dec_states, masks)

    for _ in range(10):
        state = step(state)

    def check(got, want_mod):
        np.testing.assert_allclose(np.asarray(got["mean"]),
                                   want_mod.running_mean.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["var"]),
                                   want_mod.running_var.numpy(),
                                   rtol=1e-4, atol=1e-5)

    for i, bn in enumerate(tm.dec_bns):          # decoder convT BNs
        check(state["dec"]["image"][i], bn)
    for i, bn in enumerate(tm.attr_dec_bns):     # decoder attr BN1ds
        check(state["dec"]["attrs"][i], bn)
    for i, bn in enumerate(tm.enc_bns):          # encoder conv BNs (k=2)
        check(state["enc"]["image"][i + 1], bn)
    for i, bn in enumerate(tm.attr_enc_bns):     # encoder attr BN1ds (k=2)
        check(state["enc"]["attrs"][i], bn)


# ---------------------------------------------------------------------------
# celeba19 (21-term objective: joint + image-only + 18 attr-only + sampled
# subsets) and vision (7-term decode-all-six BCE/6) — the two most
# structurally transformed families (stacked experts, recon/posterior mask
# decoupling). Torch module builders are shared with test_torch_import.
# ---------------------------------------------------------------------------

from mvae_tpu.utils.torch_import import import_state_dict  # noqa: E402


@pytest.mark.slow
def test_celeba19_eval_elbo_matches_torch_reference_flow():
    """Transplant a torch celeba19 MVAE and assert our fused 22-term eval
    ELBO (20 static + 2 pinned 'sampled' subset rows, one with and one
    without the image) equals the reference's sequential eager flow
    (celeba19/train.py:260-304: elbo_loss at :26-60, per-attribute scalar
    BCE, lambda_image/lambda_attrs on the two lambda-bearing terms only)."""
    from test_torch_import import _build_celeba19, _randomize_bn, _sd
    from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS

    L, B = 12, 5
    tm = _build_celeba19(L)
    rng = np.random.default_rng(7)
    _randomize_bn(tm, rng)
    tm.eval()

    image = rng.random((B, 64, 64, 3)).astype(np.float32)
    attrs = (rng.random((B, N_ATTRS)) < 0.4).astype(np.float32)
    beta, li, la = 0.7, 1.5, 10.0

    # masks: the 20 static terms + two pinned "sampled" rows
    from mvae_tpu.core.subsets import celeba19_static_terms
    static_m, static_l = celeba19_static_terms(N_ATTRS, li, la)
    samp = np.zeros((2, 1 + N_ATTRS), np.float32)
    samp[0, [0, 5, 9]] = 1.0       # image + attrs {4, 8}
    samp[1, [3, 10, 14]] = 1.0     # attrs {2, 9, 13} (no image)
    masks = np.concatenate([static_m, samp])
    lambdas = np.concatenate([static_l, np.ones_like(samp)])

    ti = _nchw(image)
    ta = torch.from_numpy(attrs)
    with torch.no_grad():
        from test_torch_import import _enc_forward
        img_mu, img_lv = _enc_forward(tm.image_encoder, ti, 5, L)
        att_p = [tm.attr_encoders[i].net(ta[:, i].long())
                 for i in range(N_ATTRS)]
        zeros = torch.zeros(B, L)

        def term(mask_row, lam_row):
            mus, lvs = [zeros], [zeros]
            if mask_row[0]:
                mus.append(img_mu); lvs.append(img_lv)
            for i in range(N_ATTRS):
                if mask_row[1 + i]:
                    mus.append(att_p[i][:, :L]); lvs.append(att_p[i][:, L:])
            mu, lv = _torch_poe(mus, lvs)
            bce = torch.zeros(B)
            if mask_row[0]:
                from test_torch_import import _dec_forward
                r = _dec_forward(tm.image_decoder, mu, 5)    # eval: z = mu
                bce = bce + lam_row[0] * _torch_bce(
                    r.flatten(1), ti.flatten(1)).sum(1)
            for i in range(N_ATTRS):
                if mask_row[1 + i]:
                    r = tm.attr_decoders[i].net(mu).squeeze(1)
                    bce = bce + lam_row[1 + i] * _torch_bce(r, ta[:, i])
            return (bce + beta * _torch_kld(mu, lv)).mean()

        per_term_want = [float(term(masks[t], lambdas[t]))
                         for t in range(masks.shape[0])]
        torch_total = sum(per_term_want)

    model = Celeba19MVAE(L)
    params, state = import_state_dict("celeba19", _sd(tm), L)
    batch = {"image": jnp.asarray(image), "attrs": jnp.asarray(attrs)}
    total, aux, _ = multi_term_elbo(model, params, state, batch,
                                    jnp.asarray(masks), jnp.asarray(lambdas),
                                    None, beta, train=False)
    for got, want in zip(np.asarray(aux["per_term"]), per_term_want):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(float(total), float(torch_total),
                               rtol=1e-4, atol=5e-2)


@pytest.mark.slow
def test_vision_eval_elbo_matches_torch_reference_flow():
    """Transplant a torch vision MVAE and assert our fused 7-term eval ELBO
    (joint + 6 unimodal posteriors, each reconstructing ALL six modalities
    at weight 1/6 — decoupled recon/posterior masks) equals the reference's
    7 sequential eager forwards (vision/train.py:186-283, elbo_loss :20-58
    with its catalogued arg-shift NameError FIXED, not replicated: every
    term scores all six true modality pairs; see PARITY.md §2.6)."""
    from test_torch_import import (_build_celeba19, _randomize_bn, _sd,  # noqa: F401
                                   _dcgan_image_encoder, _dcgan_image_decoder,
                                   _enc_forward, _dec_forward)
    from mvae_tpu.models.vision import VisionMVAE, MODALITIES, CHANNELS

    L, B = 12, 4
    c = torch.nn.Module()
    for m in MODALITIES:
        setattr(c, f"{m}_encoder", _dcgan_image_encoder(CHANNELS[m], 1, 5, L))
        setattr(c, f"{m}_decoder", _dcgan_image_decoder(CHANNELS[m], 1, 5, L))
    rng = np.random.default_rng(11)
    _randomize_bn(c, rng)
    c.eval()

    inputs_np = {m: rng.random((B, 64, 64, CHANNELS[m])).astype(np.float32)
                 for m in MODALITIES}
    beta = 0.6
    n_mod = len(MODALITIES)

    t_in = {m: _nchw(inputs_np[m]) for m in MODALITIES}
    with torch.no_grad():
        post = {m: _enc_forward(getattr(c, f"{m}_encoder"), t_in[m], 5, L)
                for m in MODALITIES}
        zeros = torch.zeros(B, L)

        def term(present):
            mus, lvs = [zeros], [zeros]
            for m in present:
                mus.append(post[m][0]); lvs.append(post[m][1])
            mu, lv = _torch_poe(mus, lvs)
            bce = torch.zeros(B)
            for m in MODALITIES:                 # decode ALL six
                r = _dec_forward(getattr(c, f"{m}_decoder"), mu, 5)
                bce = bce + _torch_bce(r.flatten(1),
                                       t_in[m].flatten(1)).sum(1)
            return (bce / float(n_mod) + beta * _torch_kld(mu, lv)).mean()

        per_term_want = [float(term(MODALITIES))]          # joint
        per_term_want += [float(term((m,))) for m in MODALITIES]
        torch_total = sum(per_term_want)

    model = VisionMVAE(L)
    params, state = import_state_dict("vision", _sd(c), L)
    masks = np.concatenate([np.ones((1, n_mod), np.float32),
                            np.eye(n_mod, dtype=np.float32)])
    lambdas = np.full((1 + n_mod, n_mod), 1.0 / n_mod, np.float32)
    recon_masks = np.ones_like(masks)
    batch = {m: jnp.asarray(inputs_np[m]) for m in MODALITIES}
    total, aux, _ = multi_term_elbo(model, params, state, batch,
                                    jnp.asarray(masks), jnp.asarray(lambdas),
                                    None, beta, train=False,
                                    recon_masks=jnp.asarray(recon_masks))
    for got, want in zip(np.asarray(aux["per_term"]), per_term_want):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(float(total), float(torch_total),
                               rtol=1e-4, atol=5e-2)
