"""Trained-to-convergence parity, part 2: fashionmnist / celeba19 / vision.

Companion to scripts/parity_convergence.py (which covers mnist, celeba,
multimnist) — together the six reference experiment families all get a
framework-vs-eager-torch convergence table. Same ground rules: the torch
side re-implements the REFERENCE flow (one eager forward per ELBO term,
reference loss formulas, reference eval semantics), both sides consume
identical deterministic synthetic arrays (no network egress here), and the
table records final test ELBO + IWAE log p(image) at K=100/500 with the
q(z|everything) proposal (README.md:36 recipe).

Reference anchors:
  fashionmnist: /root/reference/fashionmnist/{model.py:70-165,train.py:20-94}
    (3 ELBO terms; conv image nets WITHOUT BatchNorm; eval at default
    lambdas, fashionmnist/train.py:246-248. The reference's annealing
    off-by-one at :182 is deliberately NOT mirrored — both sides here use
    the mnist-style (epoch-1) schedule, SURVEY.md §2.6).
  celeba19:     /root/reference/celeba19/{model.py,train.py:26-60,230-304}
    (20 + approx_m terms per step, subset sampling via the SAME numpy
    sampler on both sides — mvae_tpu.core.subsets; eval on the joint term
    only at default lambdas, celeba19/train.py:332-334).
  vision:       /root/reference/vision/{model.py,train.py} intent
    (7 terms; every term reconstructs ALL six modalities with BCE/6 weight,
    vision/train.py:227-283; eval joint term only, :297-330).

Images are pre-quantized to the uint8 grid in the data functions so the
framework's uint8 device-resident pipeline and the torch side see
bit-identical pixels.

Run via parity_convergence.py:  python scripts/parity_convergence.py
    --family {fashionmnist,celeba19,vision}
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TRAIN_SEED = int(os.environ.get("MVAE_PARITY_SEED", "0"))  # see
# parity_convergence.py — trajectory seed, data seeds stay fixed
BF16 = os.environ.get("MVAE_PARITY_BF16") == "1"  # ours-side bf16 mode
# (see parity_convergence.py; duplicated to avoid a circular import)
FAST = os.environ.get("MVAE_PARITY_FAST") == "1"  # celeba19
# --fast-term-decode mode: image-decode forwards skipped for
# attribute-only terms (losses/grads exact; image-decoder BN running
# stats see only image-bearing terms). The parity row tests whether that
# documented statistics divergence moves TRAINED metrics.


def compute_dtype():
    if not BF16:
        return None
    import jax.numpy as jnp
    return jnp.bfloat16


def _q8(x):
    """Snap float images to the uint8 grid (what the device-resident
    pipeline stores); keeps torch and jax inputs bit-identical."""
    return (np.round(x * 255.0) / 255.0).astype(np.float32)


def _cached(name, build, counts=None):
    """Generate the family's arrays once and persist them: the ours phase
    (TPU process) and the torch phase (CPU-forced process) may run in
    separate processes, and vision's modality derivation runs jax kernels
    whose f32 rounding could flip a uint8 quantization boundary between
    backends — loading one saved copy keeps both sides bit-identical."""
    path = os.path.join(os.path.dirname(__file__), "..", "trained_models",
                        f"parity_data_{name}.npz")
    if os.path.exists(path):
        z = np.load(path)
        cached = tuple(z[f"a{i}"] for i in range(len(z.files)))
        # the cache is keyed only by family name; protocol edits to the
        # data shaping (n_train/n_test) must invalidate it rather than
        # silently reuse stale arrays. counts: expected shape[0] per array.
        if counts is None or tuple(v.shape[0] for v in cached) == \
                tuple(counts):
            return cached
        print(f"[parity] stale {path} (protocol changed) — regenerating",
              flush=True)
    out = tuple(build())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{f"a{i}": v for i, v in enumerate(out)})
    return out


# ---------------------------------------------------------------------------
# shared torch pieces
# ---------------------------------------------------------------------------

def _torch_bce(x, t):
    import torch
    return x.clamp(min=0) - x * t + torch.log1p((-x.abs()).exp())


def _torch_logn(z, mu, lv):
    return (-0.5 * (lv + np.log(2 * np.pi)
                    + (z - mu) ** 2 * (-lv).exp())).sum(1)


def _torch_kld(mu, lv):
    return -0.5 * (1 + lv - mu ** 2 - lv.exp()).sum(1)


def _torch_poe(mus, lvs):
    """Precision-weighted fusion over a list of (B, L) expert params
    (reference ProductOfExperts, mnist/model.py:149-163)."""
    import torch
    mu, lv = torch.stack(mus), torch.stack(lvs)
    t = 1.0 / (lv.exp() + 1e-8)
    return (mu * t).sum(0) / t.sum(0), torch.log(1.0 / t.sum(0))


# ---------------------------------------------------------------------------
# fashionmnist (conv image nets, no BN; 3 terms; eval default lambdas)
# ---------------------------------------------------------------------------

FASHION_PROTOCOL = dict(n_latents=64, batch_size=100, lr=1e-3, epochs=12,
                        annealing_epochs=10, lambda_image=1.0,
                        lambda_text=10.0, n_train=10000, n_test=2000,
                        iwae_examples=500, iwae_batch=100)
# epochs: beta reaches 1 at epoch 10; both sides start overfitting the
# 10k synthetic set soon after (ours' test loss bottoms ~epoch 13), and
# final-epoch eval past that point measures trajectory noise, not fit


def _fashion_data():
    def build():
        from mvae_tpu.data.mnist import synthetic_mnist
        P = FASHION_PROTOCOL
        xtr, ytr = synthetic_mnist(P["n_train"], seed=2)
        xte, yte = synthetic_mnist(P["n_test"], seed=3)
        return (_q8(xtr.reshape(-1, 28, 28, 1)), ytr.astype(np.int64),
                _q8(xte.reshape(-1, 28, 28, 1)), yte.astype(np.int64))
    P = FASHION_PROTOCOL
    return _cached("fashionmnist", build,
                   counts=(P["n_train"], P["n_train"],
                           P["n_test"], P["n_test"]))


def run_torch_fashion(xtr, ytr, xte, yte):
    import torch
    import torch.nn.functional as F
    P = FASHION_PROTOCOL
    L = P["n_latents"]
    torch.manual_seed(TRAIN_SEED)

    class M(torch.nn.Module):
        """Reference FashionMNIST MVAE (fashionmnist/model.py:70-165)."""

        def __init__(self):
            super().__init__()
            self.enc = torch.nn.Sequential(
                torch.nn.Conv2d(1, 64, 4, 2, 1, bias=False), torch.nn.SiLU(),
                torch.nn.Conv2d(64, 128, 4, 2, 1, bias=False),
                torch.nn.SiLU())
            self.enc_head = torch.nn.Sequential(
                torch.nn.Linear(128 * 7 * 7, 512), torch.nn.SiLU(),
                torch.nn.Linear(512, 2 * L))
            self.dec_up = torch.nn.Sequential(
                torch.nn.Linear(L, 512), torch.nn.SiLU(),
                torch.nn.Linear(512, 128 * 7 * 7), torch.nn.SiLU())
            self.dec = torch.nn.Sequential(
                torch.nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
                torch.nn.SiLU(),
                torch.nn.ConvTranspose2d(64, 1, 4, 2, 1, bias=False))
            self.te = torch.nn.Embedding(10, 512)
            self.tf, self.th = (torch.nn.Linear(512, 512),
                                torch.nn.Linear(512, 2 * L))
            self.td = torch.nn.Sequential(
                torch.nn.Linear(L, 512), torch.nn.SiLU(),
                torch.nn.Linear(512, 512), torch.nn.SiLU(),
                torch.nn.Linear(512, 512), torch.nn.SiLU(),
                torch.nn.Linear(512, 10))

        def infer(self, image=None, text=None):
            B = image.shape[0] if image is not None else text.shape[0]
            mus, lvs = [torch.zeros(B, L)], [torch.zeros(B, L)]
            if image is not None:
                h = self.enc_head(self.enc(image).flatten(1))
                mus.append(h[:, :L]); lvs.append(h[:, L:])
            if text is not None:
                h = self.th(F.silu(self.tf(F.silu(self.te(text)))))
                mus.append(h[:, :L]); lvs.append(h[:, L:])
            return _torch_poe(mus, lvs)

        def forward(self, image=None, text=None, train=True):
            mu, lv = self.infer(image, text)
            z = mu + torch.randn_like(mu) * (0.5 * lv).exp() if train else mu
            img = self.dec(self.dec_up(z).view(-1, 128, 7, 7))
            return img, self.td(z), mu, lv

    def elbo(i_r, image, t_r, text, mu, lv, li, lt, beta):
        total = beta * _torch_kld(mu, lv)
        if i_r is not None:
            total = total + li * _torch_bce(i_r.flatten(1),
                                            image.flatten(1)).sum(1)
        if t_r is not None:
            logp = F.log_softmax(t_r + 1e-6, dim=1)
            total = total + lt * F.nll_loss(logp, text, reduction="none")
        return total.mean()

    m = M()
    opt = torch.optim.Adam(m.parameters(), lr=P["lr"])
    B = P["batch_size"]
    n_batches = len(xtr) // B
    rng = np.random.default_rng(TRAIN_SEED)
    xtr_t = np.transpose(xtr, (0, 3, 1, 2)).copy()
    xte_t = np.transpose(xte, (0, 3, 1, 2)).copy()
    t0 = time.time()
    for epoch in range(1, P["epochs"] + 1):
        order = rng.permutation(len(xtr))
        for bi in range(n_batches):
            idx = order[bi * B:(bi + 1) * B]
            image = torch.from_numpy(xtr_t[idx])
            text = torch.from_numpy(ytr[idx])
            beta = min(1.0, (bi + (epoch - 1) * n_batches + 1)
                       / (P["annealing_epochs"] * n_batches))
            opt.zero_grad()
            a = m(image, text)
            b = m(image)
            c = m(text=text)
            loss = (elbo(a[0], image, a[1], text, a[2], a[3],
                         P["lambda_image"], P["lambda_text"], beta)
                    + elbo(b[0], image, None, None, b[2], b[3],
                           P["lambda_image"], P["lambda_text"], beta)
                    + elbo(None, None, c[1], text, c[2], c[3],
                           P["lambda_image"], P["lambda_text"], beta))
            loss.backward()
            opt.step()
        print(f"[torch fashion] epoch {epoch} loss {float(loss):.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    m.eval()
    with torch.no_grad():
        tot, n = 0.0, 0     # eval at DEFAULT lambdas (train.py:246-248)
        for lo in range(0, len(xte) - len(xte) % B, B):
            image = torch.from_numpy(xte_t[lo:lo + B])
            text = torch.from_numpy(yte[lo:lo + B])
            a = m(image, text, train=False)
            b = m(image, train=False)
            c = m(text=text, train=False)
            t = (elbo(a[0], image, a[1], text, a[2], a[3], 1.0, 1.0, 1.0)
                 + elbo(b[0], image, None, None, b[2], b[3], 1.0, 1.0, 1.0)
                 + elbo(None, None, c[1], text, c[2], c[3], 1.0, 1.0, 1.0))
            tot += float(t) * B
            n += B
        test_elbo = tot / n

        def iwae(k):
            torch.manual_seed(1)
            vals = []
            for lo in range(0, P["iwae_examples"], P["iwae_batch"]):
                image = torch.from_numpy(xte_t[lo:lo + P["iwae_batch"]])
                text = torch.from_numpy(yte[lo:lo + P["iwae_batch"]])
                q_mu, q_lv = m.infer(image, text)
                lws = []
                for _ in range(k):
                    z = q_mu + torch.randn_like(q_mu) * (0.5 * q_lv).exp()
                    i_r = m.dec(m.dec_up(z).view(-1, 128, 7, 7))
                    lpxz = -_torch_bce(i_r.flatten(1),
                                       image.flatten(1)).sum(1)
                    lws.append(lpxz
                               + _torch_logn(z, torch.zeros_like(z),
                                             torch.zeros_like(z))
                               - _torch_logn(z, q_mu, q_lv))
                lw = torch.stack(lws)
                vals.append(torch.logsumexp(lw, 0) - np.log(k))
            return float(torch.cat(vals).mean())

        return {"test_elbo": test_elbo, "iwae_100": iwae(100),
                "iwae_500": iwae(500),
                "train_seconds": round(time.time() - t0, 1)}


def run_ours_fashion(xtr, ytr, xte, yte):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.models.fashionmnist import FashionMnistMVAE
    from mvae_tpu.train.driver import run_training
    from mvae_tpu.train.loop import make_eval_step
    from mvae_tpu.core.loglike import iwae_log_marginal

    P = FASHION_PROTOCOL
    train_ds = ArrayDataset({"image": xtr, "text": ytr.astype(np.int32)})
    test_ds = ArrayDataset({"image": xte, "text": yte.astype(np.int32)})
    args = SimpleNamespace(batch_size=P["batch_size"], lr=P["lr"],
                           epochs=P["epochs"],
                           annealing_epochs=P["annealing_epochs"],
                           log_interval=50, seed=TRAIN_SEED, resume=None)
    model = FashionMnistMVAE(P["n_latents"], compute_dtype=compute_dtype())
    masks = [[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
    lambdas = [[P["lambda_image"], P["lambda_text"]]] * 3
    out_dir = os.path.join(os.path.dirname(__file__), "..", "trained_models",
                           "parity_fashionmnist")
    t0 = time.time()
    params, state = run_training(
        model, train_ds, test_ds, args, masks, lambdas, out_dir=out_dir,
        eval_term_lambdas=[[1.0, 1.0]] * 3,
        meta={"model": "fashionmnist", "n_latents": P["n_latents"]})
    train_seconds = round(time.time() - t0, 1)

    ev = make_eval_step(model, masks, [[1.0, 1.0]] * 3)
    B = P["batch_size"]
    tot, n = 0.0, 0
    for lo in range(0, len(xte) - len(xte) % B, B):
        batch = {"image": jnp.asarray(xte[lo:lo + B]),
                 "text": jnp.asarray(yte[lo:lo + B].astype(np.int32))}
        loss, _ = ev(params, state, batch)
        tot += float(loss) * B
        n += B
    test_elbo = tot / n

    def iwae(k):
        vals = []
        fn = jax.jit(lambda b, r: iwae_log_marginal(
            model, params, state, b, jnp.ones(2), ("image",), r, k))
        for i, lo in enumerate(range(0, P["iwae_examples"], P["iwae_batch"])):
            batch = {"image": jnp.asarray(xte[lo:lo + P["iwae_batch"]]),
                     "text": jnp.asarray(
                         yte[lo:lo + P["iwae_batch"]].astype(np.int32))}
            vals.append(np.asarray(fn(batch, jax.random.key(400 + i))))
        return float(np.concatenate(vals).mean())

    return {"test_elbo": test_elbo, "iwae_100": iwae(100),
            "iwae_500": iwae(500), "train_seconds": train_seconds}


# ---------------------------------------------------------------------------
# celeba19 (19 experts, 20 + approx_m terms; eval joint-only, default
# lambdas)
# ---------------------------------------------------------------------------

CELEBA19_PROTOCOL = dict(n_latents=100, batch_size=100, lr=1e-4, epochs=8,
                         annealing_epochs=3, lambda_image=1.0,
                         lambda_attrs=10.0, approx_m=1, n_train=2000,
                         n_test=500, iwae_examples=200, iwae_batch=100)


def _celeba19_data():
    def build():
        from mvae_tpu.data.celeba import synthetic_celeba
        P = CELEBA19_PROTOCOL
        tr = synthetic_celeba(P["n_train"], seed=0)
        te = synthetic_celeba(P["n_test"], seed=1)
        return (_q8(tr.arrays["image"]), tr.arrays["attrs"],
                _q8(te.arrays["image"]), te.arrays["attrs"])
    P = CELEBA19_PROTOCOL
    return _cached("celeba19", build,
                   counts=(P["n_train"], P["n_train"],
                           P["n_test"], P["n_test"]))


def run_torch_celeba19(xtr, atr, xte, ate):
    import torch
    from mvae_tpu.core.subsets import celeba19_step_terms
    P = CELEBA19_PROTOCOL
    L, A = P["n_latents"], 18
    torch.manual_seed(TRAIN_SEED)

    class M(torch.nn.Module):
        """Reference CelebA19 MVAE (celeba19/model.py): the celeba image
        nets plus 18 per-attribute expert nets in ModuleLists (:26-29)."""

        def __init__(self):
            super().__init__()
            self.enc = torch.nn.Sequential(
                torch.nn.Conv2d(3, 32, 4, 2, 1, bias=False), torch.nn.SiLU(),
                torch.nn.Conv2d(32, 64, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(64), torch.nn.SiLU(),
                torch.nn.Conv2d(64, 128, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(128), torch.nn.SiLU(),
                torch.nn.Conv2d(128, 256, 4, 1, 0, bias=False),
                torch.nn.BatchNorm2d(256), torch.nn.SiLU())
            self.enc_head = torch.nn.Sequential(
                torch.nn.Linear(256 * 5 * 5, 512), torch.nn.SiLU(),
                torch.nn.Dropout(0.1), torch.nn.Linear(512, 2 * L))
            self.dec_up = torch.nn.Sequential(
                torch.nn.Linear(L, 256 * 5 * 5), torch.nn.SiLU())
            self.dec = torch.nn.Sequential(
                torch.nn.ConvTranspose2d(256, 128, 4, 1, 0, bias=False),
                torch.nn.BatchNorm2d(128), torch.nn.SiLU(),
                torch.nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(64), torch.nn.SiLU(),
                torch.nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(32), torch.nn.SiLU(),
                torch.nn.ConvTranspose2d(32, 3, 4, 2, 1, bias=False))
            self.attr_enc = torch.nn.ModuleList([
                torch.nn.Sequential(
                    torch.nn.Embedding(2, 512), torch.nn.SiLU(),
                    torch.nn.Linear(512, 512), torch.nn.SiLU(),
                    torch.nn.Linear(512, 2 * L))
                for _ in range(A)])
            self.attr_dec = torch.nn.ModuleList([
                torch.nn.Sequential(
                    torch.nn.Linear(L, 512), torch.nn.SiLU(),
                    torch.nn.Linear(512, 512), torch.nn.SiLU(),
                    torch.nn.Linear(512, 512), torch.nn.SiLU(),
                    torch.nn.Linear(512, 1))
                for _ in range(A)])

        def infer(self, image, attrs, mask):
            """mask: (19,) 0/1 over [image, attr_0..attr_17]."""
            B = image.shape[0]
            mus, lvs = [torch.zeros(B, L)], [torch.zeros(B, L)]
            if mask[0]:
                h = self.enc_head(self.enc(image).flatten(1))
                mus.append(h[:, :L]); lvs.append(h[:, L:])
            for i in range(A):
                if mask[1 + i]:
                    h = self.attr_enc[i](attrs[:, i].long())
                    mus.append(h[:, :L]); lvs.append(h[:, L:])
            return _torch_poe(mus, lvs)

        def forward(self, image, attrs, mask, train=True):
            mu, lv = self.infer(image, attrs, mask)
            z = mu + torch.randn_like(mu) * (0.5 * lv).exp() if train else mu
            img = self.dec(self.dec_up(z).view(-1, 256, 5, 5))
            att = torch.cat([d(z) for d in self.attr_dec], dim=1)  # (B, 18)
            return img, att, mu, lv

    def elbo_term(img_r, image, att_r, attrs, mu, lv, mask, lam, beta):
        """One subset term: image pixel-sum BCE + per-attribute scalar BCEs
        over the subset's modalities (celeba19/train.py:26-60)."""
        total = beta * _torch_kld(mu, lv)
        if mask[0]:
            total = total + float(lam[0]) * _torch_bce(
                img_r.flatten(1), image.flatten(1)).sum(1)
        w = torch.from_numpy((mask[1:] * lam[1:]).astype(np.float32))
        total = total + (_torch_bce(att_r, attrs) * w).sum(1)
        return total.mean()

    m = M()
    opt = torch.optim.Adam(m.parameters(), lr=P["lr"])
    B = P["batch_size"]
    n_batches = len(xtr) // B
    rng = np.random.default_rng(TRAIN_SEED)
    # mirror the driver's mask_rng derivation (train/driver.py: seed + 1) so
    # @seedN runs keep the SAME numpy subset sampler on both sides
    subset_rng = np.random.default_rng(TRAIN_SEED + 1)
    xtr_t = np.transpose(xtr, (0, 3, 1, 2)).copy()
    xte_t = np.transpose(xte, (0, 3, 1, 2)).copy()
    t0 = time.time()
    for epoch in range(1, P["epochs"] + 1):
        order = rng.permutation(len(xtr))
        m.train()
        for bi in range(n_batches):
            idx = order[bi * B:(bi + 1) * B]
            image = torch.from_numpy(xtr_t[idx])
            attrs = torch.from_numpy(atr[idx])
            beta = min(1.0, (bi + (epoch - 1) * n_batches + 1)
                       / (P["annealing_epochs"] * n_batches))
            masks, lambdas = celeba19_step_terms(
                subset_rng, P["approx_m"], A,
                P["lambda_image"], P["lambda_attrs"])
            opt.zero_grad()
            loss = 0.0
            for t in range(masks.shape[0]):    # 20 + m eager forwards
                img_r, att_r, mu, lv = m(image, attrs, masks[t])
                loss = loss + elbo_term(img_r, image, att_r, attrs, mu, lv,
                                        masks[t], lambdas[t], beta)
            loss.backward()
            opt.step()
        print(f"[torch celeba19] epoch {epoch} loss {float(loss):.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    m.eval()
    joint = np.ones(1 + A, np.float32)
    ones = np.ones(1 + A, np.float32)
    with torch.no_grad():
        # eval: JOINT term only at default lambdas (train.py:332-334)
        tot, n = 0.0, 0
        for lo in range(0, len(xte) - len(xte) % B, B):
            image = torch.from_numpy(xte_t[lo:lo + B])
            attrs = torch.from_numpy(ate[lo:lo + B])
            img_r, att_r, mu, lv = m(image, attrs, joint, train=False)
            t = elbo_term(img_r, image, att_r, attrs, mu, lv,
                          joint, ones, 1.0)
            tot += float(t) * B
            n += B
        test_elbo = tot / n

        def iwae(k):
            torch.manual_seed(1)
            vals = []
            for lo in range(0, P["iwae_examples"], P["iwae_batch"]):
                image = torch.from_numpy(xte_t[lo:lo + P["iwae_batch"]])
                attrs = torch.from_numpy(ate[lo:lo + P["iwae_batch"]])
                q_mu, q_lv = m.infer(image, attrs, joint)
                lws = []
                for _ in range(k):
                    z = q_mu + torch.randn_like(q_mu) * (0.5 * q_lv).exp()
                    i_r = m.dec(m.dec_up(z).view(-1, 256, 5, 5))
                    lpxz = -_torch_bce(i_r.flatten(1),
                                       image.flatten(1)).sum(1)
                    lws.append(lpxz
                               + _torch_logn(z, torch.zeros_like(z),
                                             torch.zeros_like(z))
                               - _torch_logn(z, q_mu, q_lv))
                lw = torch.stack(lws)
                vals.append(torch.logsumexp(lw, 0) - np.log(k))
            return float(torch.cat(vals).mean())

        return {"test_elbo": test_elbo, "iwae_100": iwae(100),
                "iwae_500": iwae(500),
                "train_seconds": round(time.time() - t0, 1)}


def run_ours_celeba19(xtr, atr, xte, ate):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.models.celeba19 import Celeba19MVAE, N_ATTRS
    from mvae_tpu.core.subsets import (
        celeba19_step_terms, celeba19_static_terms, celeba19_recon_support)
    from mvae_tpu.train.driver import run_training
    from mvae_tpu.train.loop import make_eval_step
    from mvae_tpu.core.loglike import iwae_log_marginal

    P = CELEBA19_PROTOCOL
    train_ds = ArrayDataset({"image": xtr, "attrs": atr})
    test_ds = ArrayDataset({"image": xte, "attrs": ate})
    args = SimpleNamespace(batch_size=P["batch_size"], lr=P["lr"],
                           epochs=P["epochs"],
                           annealing_epochs=P["annealing_epochs"],
                           log_interval=20, seed=TRAIN_SEED, resume=None)
    model = Celeba19MVAE(P["n_latents"], compute_dtype=compute_dtype())
    static_m, static_l = celeba19_static_terms(
        N_ATTRS, P["lambda_image"], P["lambda_attrs"])

    def make_masks(np_rng):
        return celeba19_step_terms(np_rng, P["approx_m"], N_ATTRS,
                                   P["lambda_image"], P["lambda_attrs"])

    eval_masks = np.ones((1, 1 + N_ATTRS), np.float32)
    eval_lambdas = np.ones((1, 1 + N_ATTRS), np.float32)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "trained_models",
                           "parity_celeba19")
    t0 = time.time()
    params, state = run_training(
        model, train_ds, test_ds, args, static_m, static_l, out_dir=out_dir,
        meta={"model": "celeba19", "n_latents": P["n_latents"]},
        make_masks=make_masks,
        eval_term_masks=eval_masks, eval_term_lambdas=eval_lambdas,
        recon_support=celeba19_recon_support(P["approx_m"], N_ATTRS),
        fast_skip_decode=FAST)
    train_seconds = round(time.time() - t0, 1)

    ev = make_eval_step(model, eval_masks, eval_lambdas)
    B = P["batch_size"]
    tot, n = 0.0, 0
    for lo in range(0, len(xte) - len(xte) % B, B):
        batch = {"image": jnp.asarray(xte[lo:lo + B]),
                 "attrs": jnp.asarray(ate[lo:lo + B])}
        loss, _ = ev(params, state, batch)
        tot += float(loss) * B
        n += B
    test_elbo = tot / n

    def iwae(k):
        vals = []
        fn = jax.jit(lambda b, r: iwae_log_marginal(
            model, params, state, b, jnp.ones(1 + N_ATTRS), ("image",), r, k))
        for i, lo in enumerate(range(0, P["iwae_examples"], P["iwae_batch"])):
            batch = {"image": jnp.asarray(xte[lo:lo + P["iwae_batch"]]),
                     "attrs": jnp.asarray(ate[lo:lo + P["iwae_batch"]])}
            vals.append(np.asarray(fn(batch, jax.random.key(500 + i))))
        return float(np.concatenate(vals).mean())

    return {"test_elbo": test_elbo, "iwae_100": iwae(100),
            "iwae_500": iwae(500), "train_seconds": train_seconds}


# ---------------------------------------------------------------------------
# vision (6 image modalities, 7 terms, BCE/6, every term reconstructs all
# six; eval joint-only)
# ---------------------------------------------------------------------------

VISION_PROTOCOL = dict(n_latents=100, batch_size=50, lr=1e-4, epochs=6,
                       annealing_epochs=2, n_train=1000, n_test=250,
                       iwae_examples=100, iwae_batch=50)

VISION_MODALITIES = ("image", "gray", "edge", "mask", "obscured", "watermark")
VISION_CHANNELS = (3, 1, 1, 1, 3, 3)


def _vision_data():
    def build():
        from mvae_tpu.data.celeba import synthetic_celeba
        from mvae_tpu.data.vision import derive_modalities
        P = VISION_PROTOCOL
        flat = []
        for n, seed in ((P["n_train"], 0), (P["n_test"], 1)):
            rgb = synthetic_celeba(n, seed=seed).arrays["image"]
            mods = derive_modalities(rgb, seed=seed)
            flat.extend(_q8(mods[k]) for k in VISION_MODALITIES)
        return tuple(flat)
    n = len(VISION_MODALITIES)
    P = VISION_PROTOCOL
    flat = _cached("vision", build,
                   counts=(P["n_train"],) * n + (P["n_test"],) * n)
    return (dict(zip(VISION_MODALITIES, flat[:n])),
            dict(zip(VISION_MODALITIES, flat[n:])))


def run_torch_vision(tr, te):
    import torch
    P = VISION_PROTOCOL
    L = P["n_latents"]
    torch.manual_seed(TRAIN_SEED)

    def enc(c):
        return torch.nn.Sequential(
            torch.nn.Conv2d(c, 32, 4, 2, 1, bias=False), torch.nn.SiLU(),
            torch.nn.Conv2d(32, 64, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(64), torch.nn.SiLU(),
            torch.nn.Conv2d(64, 128, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(128), torch.nn.SiLU(),
            torch.nn.Conv2d(128, 256, 4, 1, 0, bias=False),
            torch.nn.BatchNorm2d(256), torch.nn.SiLU())

    def dec(c):
        return torch.nn.Sequential(
            torch.nn.ConvTranspose2d(256, 128, 4, 1, 0, bias=False),
            torch.nn.BatchNorm2d(128), torch.nn.SiLU(),
            torch.nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(64), torch.nn.SiLU(),
            torch.nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(32), torch.nn.SiLU(),
            torch.nn.ConvTranspose2d(32, c, 4, 2, 1, bias=False))

    class M(torch.nn.Module):
        """Reference vision MVAE intent (vision/model.py:12-100): six
        instances of the parameterized celeba DCGAN pair."""

        def __init__(self):
            super().__init__()
            self.encs = torch.nn.ModuleList(
                [enc(c) for c in VISION_CHANNELS])
            self.enc_heads = torch.nn.ModuleList([
                torch.nn.Sequential(
                    torch.nn.Linear(256 * 5 * 5, 512), torch.nn.SiLU(),
                    torch.nn.Dropout(0.1), torch.nn.Linear(512, 2 * L))
                for _ in VISION_CHANNELS])
            self.dec_ups = torch.nn.ModuleList([
                torch.nn.Sequential(torch.nn.Linear(L, 256 * 5 * 5),
                                    torch.nn.SiLU())
                for _ in VISION_CHANNELS])
            self.decs = torch.nn.ModuleList(
                [dec(c) for c in VISION_CHANNELS])

        def infer(self, mods, mask):
            B = mods[0].shape[0]
            mus, lvs = [torch.zeros(B, L)], [torch.zeros(B, L)]
            for i in range(6):
                if mask[i]:
                    h = self.enc_heads[i](self.encs[i](mods[i]).flatten(1))
                    mus.append(h[:, :L]); lvs.append(h[:, L:])
            return _torch_poe(mus, lvs)

        def forward(self, mods, mask, train=True):
            mu, lv = self.infer(mods, mask)
            z = mu + torch.randn_like(mu) * (0.5 * lv).exp() if train else mu
            recons = [self.decs[i](self.dec_ups[i](z).view(-1, 256, 5, 5))
                      for i in range(6)]
            return recons, mu, lv

    def elbo_term(recons, mods, mu, lv, beta):
        """Every term reconstructs ALL six modalities, each BCE weighted
        1/6 (vision/train.py:57,227-283)."""
        total = beta * _torch_kld(mu, lv)
        for r, x in zip(recons, mods):
            total = total + _torch_bce(r.flatten(1),
                                       x.flatten(1)).sum(1) / 6.0
        return total.mean()

    m = M()
    opt = torch.optim.Adam(m.parameters(), lr=P["lr"])
    B = P["batch_size"]
    n = len(tr["image"])
    n_batches = n // B
    rng = np.random.default_rng(TRAIN_SEED)
    tr_t = [np.transpose(tr[k], (0, 3, 1, 2)).copy()
            for k in VISION_MODALITIES]
    te_t = [np.transpose(te[k], (0, 3, 1, 2)).copy()
            for k in VISION_MODALITIES]
    term_masks = np.concatenate([np.ones((1, 6), np.float32),
                                 np.eye(6, dtype=np.float32)])
    t0 = time.time()
    for epoch in range(1, P["epochs"] + 1):
        order = rng.permutation(n)
        m.train()
        for bi in range(n_batches):
            idx = order[bi * B:(bi + 1) * B]
            mods = [torch.from_numpy(x[idx]) for x in tr_t]
            beta = min(1.0, (bi + (epoch - 1) * n_batches + 1)
                       / (P["annealing_epochs"] * n_batches))
            opt.zero_grad()
            loss = 0.0
            for t in range(7):                  # 7 eager forwards
                recons, mu, lv = m(mods, term_masks[t])
                loss = loss + elbo_term(recons, mods, mu, lv, beta)
            loss.backward()
            opt.step()
        print(f"[torch vision] epoch {epoch} loss {float(loss):.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    m.eval()
    joint = np.ones(6, np.float32)
    with torch.no_grad():
        tot, cnt = 0.0, 0    # eval: joint term only (vision/train.py:297-330)
        n_te = len(te["image"])
        for lo in range(0, n_te - n_te % B, B):
            mods = [torch.from_numpy(x[lo:lo + B]) for x in te_t]
            recons, mu, lv = m(mods, joint, train=False)
            tot += float(elbo_term(recons, mods, mu, lv, 1.0)) * B
            cnt += B
        test_elbo = tot / cnt

        def iwae(k):
            torch.manual_seed(1)
            vals = []
            for lo in range(0, P["iwae_examples"], P["iwae_batch"]):
                mods = [torch.from_numpy(x[lo:lo + P["iwae_batch"]])
                        for x in te_t]
                q_mu, q_lv = m.infer(mods, joint)
                lws = []
                for _ in range(k):
                    z = q_mu + torch.randn_like(q_mu) * (0.5 * q_lv).exp()
                    i_r = m.decs[0](m.dec_ups[0](z).view(-1, 256, 5, 5))
                    lpxz = -_torch_bce(i_r.flatten(1),
                                       mods[0].flatten(1)).sum(1)
                    lws.append(lpxz
                               + _torch_logn(z, torch.zeros_like(z),
                                             torch.zeros_like(z))
                               - _torch_logn(z, q_mu, q_lv))
                lw = torch.stack(lws)
                vals.append(torch.logsumexp(lw, 0) - np.log(k))
            return float(torch.cat(vals).mean())

        return {"test_elbo": test_elbo, "iwae_100": iwae(100),
                "iwae_500": iwae(500),
                "train_seconds": round(time.time() - t0, 1)}


def run_ours_vision(tr, te):
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace
    from mvae_tpu.data.pipeline import ArrayDataset
    from mvae_tpu.models.vision import VisionMVAE, N_MODALITIES
    from mvae_tpu.train.driver import run_training
    from mvae_tpu.train.loop import make_eval_step
    from mvae_tpu.core.loglike import iwae_log_marginal

    P = VISION_PROTOCOL
    train_ds = ArrayDataset(dict(tr))
    test_ds = ArrayDataset(dict(te))
    args = SimpleNamespace(batch_size=P["batch_size"], lr=P["lr"],
                           epochs=P["epochs"],
                           annealing_epochs=P["annealing_epochs"],
                           log_interval=20, seed=TRAIN_SEED, resume=None)
    model = VisionMVAE(P["n_latents"], compute_dtype=compute_dtype())
    term_masks = np.concatenate([np.ones((1, 6), np.float32),
                                 np.eye(6, dtype=np.float32)])
    recon_masks = np.ones((7, 6), np.float32)
    term_lambdas = np.full((7, 6), 1.0 / N_MODALITIES, np.float32)
    eval_masks = np.ones((1, 6), np.float32)
    eval_lambdas = np.full((1, 6), 1.0 / N_MODALITIES, np.float32)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "trained_models",
                           "parity_vision")
    t0 = time.time()
    params, state = run_training(
        model, train_ds, test_ds, args, term_masks, term_lambdas,
        out_dir=out_dir, meta={"model": "vision",
                               "n_latents": P["n_latents"]},
        recon_masks=recon_masks,
        eval_term_masks=eval_masks, eval_term_lambdas=eval_lambdas)
    train_seconds = round(time.time() - t0, 1)

    ev = make_eval_step(model, eval_masks, eval_lambdas)
    B = P["batch_size"]
    n_te = len(te["image"])
    tot, cnt = 0.0, 0
    for lo in range(0, n_te - n_te % B, B):
        batch = {k: jnp.asarray(v[lo:lo + B]) for k, v in te.items()}
        loss, _ = ev(params, state, batch)
        tot += float(loss) * B
        cnt += B
    test_elbo = tot / cnt

    def iwae(k):
        vals = []
        fn = jax.jit(lambda b, r: iwae_log_marginal(
            model, params, state, b, jnp.ones(6), ("image",), r, k))
        for i, lo in enumerate(range(0, P["iwae_examples"], P["iwae_batch"])):
            batch = {kk: jnp.asarray(v[lo:lo + P["iwae_batch"]])
                     for kk, v in te.items()}
            vals.append(np.asarray(fn(batch, jax.random.key(600 + i))))
        return float(np.concatenate(vals).mean())

    return {"test_elbo": test_elbo, "iwae_100": iwae(100),
            "iwae_500": iwae(500), "train_seconds": train_seconds}


EXTRA_FAMILIES = {
    "fashionmnist": (FASHION_PROTOCOL, _fashion_data, run_ours_fashion,
                     run_torch_fashion),
    "celeba19": (CELEBA19_PROTOCOL, _celeba19_data, run_ours_celeba19,
                 run_torch_celeba19),
    "vision": (VISION_PROTOCOL, _vision_data, run_ours_vision,
               run_torch_vision),
}
