"""Golden end-to-end parity vs PyTorch (SURVEY.md §4.3): build the
reference's MNIST MVAE in torch, copy its weights into our model, and
assert the fused multi-term eval ELBO matches the reference's 3-forward
eager computation to float tolerance.

The torch side reimplements the reference FORMULAS (mnist/model.py,
mnist/train.py:20-94) — eval mode (z = mu), single-eps PoE convention.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mvae_tpu.core.engine import multi_term_elbo
from mvae_tpu.models.mnist import MnistMVAE

L = 16
MASKS = jnp.asarray([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
LAMBDAS = jnp.asarray([[1.0, 10.0]] * 3)


def _torch_mnist(seed=0):
    torch.manual_seed(seed)
    m = torch.nn.ModuleDict({
        "img_enc1": torch.nn.Linear(784, 512),
        "img_enc2": torch.nn.Linear(512, 512),
        "img_head": torch.nn.Linear(512, 2 * L),
        "img_dec1": torch.nn.Linear(L, 512),
        "img_dec2": torch.nn.Linear(512, 512),
        "img_dec3": torch.nn.Linear(512, 512),
        "img_dec4": torch.nn.Linear(512, 784),
        "txt_embed": torch.nn.Embedding(10, 512),
        "txt_fc": torch.nn.Linear(512, 512),
        "txt_head": torch.nn.Linear(512, 2 * L),
        "txt_dec1": torch.nn.Linear(L, 512),
        "txt_dec2": torch.nn.Linear(512, 512),
        "txt_dec3": torch.nn.Linear(512, 512),
        "txt_dec4": torch.nn.Linear(512, 10),
    })
    m.eval()
    return m


def _swish(x):
    return x * torch.sigmoid(x)


def _torch_encode(m, image, text):
    h = _swish(m["img_enc2"](_swish(m["img_enc1"](image))))
    img_p = m["img_head"](h)
    h = _swish(m["txt_fc"](_swish(m["txt_embed"](text))))
    txt_p = m["txt_head"](h)
    return img_p, txt_p


def _torch_poe(mus, logvars, eps=1e-8):
    mu = torch.stack(mus)
    logvar = torch.stack(logvars)
    var = logvar.exp() + eps
    t = 1.0 / var
    pd_mu = (mu * t).sum(0) / t.sum(0)
    pd_var = 1.0 / t.sum(0)
    return pd_mu, pd_var.log()


def _torch_decode(m, z):
    h = _swish(m["img_dec3"](_swish(m["img_dec2"](_swish(m["img_dec1"](z))))))
    img = m["img_dec4"](h)
    h = _swish(m["txt_dec3"](_swish(m["txt_dec2"](_swish(m["txt_dec1"](z))))))
    txt = m["txt_dec4"](h)
    return img, txt


def _torch_elbo(img_r, image, txt_r, text, mu, logvar, li, lt, beta):
    total = -0.5 * (1 + logvar - mu ** 2 - logvar.exp()).sum(1) * beta
    if img_r is not None:
        bce = (img_r.clamp(min=0) - img_r * image
               + torch.log1p((-img_r.abs()).exp()))
        total = total + li * bce.sum(1)
    if txt_r is not None:
        logp = F.log_softmax(txt_r + 1e-6, dim=1)
        total = total + lt * F.nll_loss(logp, text, reduction="none")
    return total.mean()


def _params_from_torch(m):
    def lin(name):
        return {"w": jnp.asarray(m[name].weight.detach().numpy().T),
                "b": jnp.asarray(m[name].bias.detach().numpy())}
    return {
        "image_enc": [lin("img_enc1"), lin("img_enc2"), lin("img_head")],
        "image_dec": [lin("img_dec1"), lin("img_dec2"), lin("img_dec3"),
                      lin("img_dec4")],
        "text_enc": {"embed": {"table": jnp.asarray(
            m["txt_embed"].weight.detach().numpy())},
            "fc": lin("txt_fc"), "head": lin("txt_head")},
        "text_dec": [lin("txt_dec1"), lin("txt_dec2"), lin("txt_dec3"),
                     lin("txt_dec4")],
    }


def test_full_eval_elbo_matches_torch_reference_flow():
    tm = _torch_mnist()
    rng = np.random.default_rng(0)
    image = rng.random((20, 784)).astype(np.float32)
    text = rng.integers(0, 10, 20).astype(np.int64)

    # --- torch: the reference's three separate eval forwards -------------
    with torch.no_grad():
        ti, tt = torch.from_numpy(image), torch.from_numpy(text)
        img_p, txt_p = _torch_encode(tm, ti, tt)
        zeros = torch.zeros(20, L)
        beta, li, lt = 0.7, 1.0, 10.0

        def term(use_img, use_txt):
            mus, lvs = [zeros], [zeros]
            if use_img:
                mus.append(img_p[:, :L]); lvs.append(img_p[:, L:])
            if use_txt:
                mus.append(txt_p[:, :L]); lvs.append(txt_p[:, L:])
            mu, lv = _torch_poe(mus, lvs)
            img_r, txt_r = _torch_decode(tm, mu)   # eval: z = mu
            return _torch_elbo(img_r if use_img else None, ti,
                               txt_r if use_txt else None, tt,
                               mu, lv, li, lt, beta)

        torch_total = term(True, True) + term(True, False) + term(False, True)

    # --- ours: one fused multi-term graph with transplanted weights ------
    model = MnistMVAE(L)
    params = _params_from_torch(tm)
    state = {"enc": {}, "dec": {}}
    batch = {"image": jnp.asarray(image),
             "text": jnp.asarray(text.astype(np.int32))}
    total, aux, _ = multi_term_elbo(model, params, state, batch, MASKS,
                                    LAMBDAS, None, 0.7, train=False)

    np.testing.assert_allclose(float(total), float(torch_total),
                               rtol=2e-4, atol=2e-3)
    # per-term parity too
    for t, (ui, ut) in enumerate([(True, True), (True, False), (False, True)]):
        with torch.no_grad():
            want = float(term(ui, ut))
        np.testing.assert_allclose(float(aux["per_term"][t]), want,
                                   rtol=2e-4, atol=2e-3)


def test_iwae_log_marginal_matches_independent_torch_estimator():
    """SURVEY.md hard part (e): validate loglike.py against an independently
    written torch IWAE estimator, using the SAME z (deterministic z = q
    mean, i.e. a single 'sample' with eps = 0) and transplanted weights."""
    from mvae_tpu.core.loglike import _log_normal
    from mvae_tpu.core.poe import masked_product_of_experts

    tm = _torch_mnist(seed=1)
    rng = np.random.default_rng(3)
    image = rng.random((10, 784)).astype(np.float32)
    text = rng.integers(0, 10, 10).astype(np.int64)

    # ---- torch estimator (independent implementation) --------------------
    with torch.no_grad():
        ti, tt = torch.from_numpy(image), torch.from_numpy(text)
        img_p, txt_p = _torch_encode(tm, ti, tt)
        zeros = torch.zeros(10, L)
        q_mu, q_lv = _torch_poe(
            [zeros, img_p[:, :L], txt_p[:, :L]],
            [zeros, img_p[:, L:], txt_p[:, L:]])
        z = q_mu                                   # eps = 0
        img_r, _ = _torch_decode(tm, z)
        bce = (img_r.clamp(min=0) - img_r * ti
               + torch.log1p((-img_r.abs()).exp())).sum(1)
        log_px_z = -bce

        def logn(x, mu, lv):
            return (-0.5 * (lv + np.log(2 * np.pi)
                            + (x - mu) ** 2 * (-lv).exp())).sum(1)
        want = log_px_z + logn(z, torch.zeros_like(z), torch.zeros_like(z)) \
            - logn(z, q_mu, q_lv)

    # ---- ours: same math through the model API ---------------------------
    model = MnistMVAE(L)
    params = _params_from_torch(tm)
    state = {"enc": {}, "dec": {}}
    batch = {"image": jnp.asarray(image),
             "text": jnp.asarray(text.astype(np.int32))}
    mu_all, lv_all, _ = model.encode(params, state, batch, None, False)
    q_mu_j, q_lv_j = masked_product_of_experts(mu_all, lv_all, jnp.ones(2))
    zj = q_mu_j
    recons, _ = model.decode(params, state, zj, None, False)
    log_px = -model.recon_loss("image", recons["image"], batch["image"])
    got = (log_px
           + _log_normal(zj, jnp.zeros_like(zj), jnp.zeros_like(zj))
           - _log_normal(zj, q_mu_j, q_lv_j))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-3)
