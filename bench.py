"""Benchmark: CelebA MVAE training throughput (steps/sec) on one TPU chip.

The headline target (BASELINE.md): CelebA MVAE training steps/sec vs a
PyTorch reference implementation of the same workload. The reference repo
publishes no numbers and its code is Python-2-era, so the baseline is a
faithful PyTorch re-measurement run locally (reference flow: THREE separate
eager forwards per step — joint/image-only/attrs-only — each decoding both
modalities; celeba/train.py:186-214-equivalent), cached in
`BASELINE_local.json`.

Ours: ONE jitted XLA step computing all three ELBO terms (encode once,
masked-PoE fuse per term, batched decode).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

BATCH = 100
N_LATENTS = 100
WARMUP = 3
ITERS = 960   # steps fused per dispatch; window sweep (BASELINE.md):
              # 356/486/541 steps/sec at K=30/120/480 on v5e-1 (f32) —
              # each window boundary costs ~34 ms of tunnel
              # dispatch+readback, so longer windows approach the
              # pure-device step. With the bf16(+bf16_logits, one-pass
              # BN) default: 632.8 at K=480 vs 646.1 at K=960 (same
              # session) — K=960 keeps the residual dispatch under 2%
BASELINE_FILE = os.path.join(os.path.dirname(__file__),
                             "BASELINE_local.json")


def measure_ours():
    """Production configuration: device-resident dataset (uint8 in HBM,
    decoded in-step), K training steps fused per dispatch via lax.scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from mvae_tpu.models.celeba import CelebaMVAE, N_ATTRS
    from mvae_tpu.train.loop import make_multi_train_step

    # bfloat16 compute is the celeba train CLI's DEFAULT since round 3
    # (convergence parity at the f32 gap — PARITY_convergence.json
    # celeba@bf16); the benchmark measures the shipped default
    model = CelebaMVAE(N_LATENTS, compute_dtype=jnp.bfloat16)
    params, state = model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    multi = make_multi_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                                  [[10.0, 1.0]] * 3)
    host = np.random.default_rng(0)
    n = 2000
    # device-resident layout: (D, n_loc, ...) with D=1 on a single chip
    data = {
        "image": jax.device_put((host.random((1, n, 64, 64, 3)) * 255
                                 ).astype(np.uint8)),
        "attrs": jax.device_put((host.random((1, n, N_ATTRS)) < 0.3
                                 ).astype(np.float32)),
    }
    K = ITERS
    betas = jnp.full((K,), 0.5, jnp.float32)

    def window(args, seed):
        idxs = jnp.asarray(
            np.random.default_rng(seed).integers(0, n, (K, 1, BATCH)),
            jnp.int32)
        out = multi(*args, data, idxs, betas)
        return out[:4], out[4]

    args = (params, state, opt_state, jax.random.key(2))
    for w in range(2):                      # compile + warm
        args, losses = window(args, w)
    float(losses[-1])

    # FLOPs per optimizer step from XLA's cost analysis of the SINGLE-step
    # graph (cost analysis counts a lax.scan body once, so costing the
    # K-step dispatch under-reports by K)
    flops_per_step = None
    try:
        from mvae_tpu.train.loop import make_train_step
        one = make_train_step(model, tx, [[1., 1.], [1., 0.], [0., 1.]],
                              [[10.0, 1.0]] * 3, device_data=True)
        idx0 = jnp.zeros((BATCH,), jnp.int32)
        p0, s0 = model.init(jax.random.key(9))
        cost = (one.lower(p0, s0, tx.init(p0), jax.random.key(0),
                          ({k: v[0] for k, v in data.items()}, idx0), 0.5)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
    except Exception:
        pass

    # NOTE: fence each window with a host fetch of the final loss —
    # block_until_ready on donated pytrees proved unreliable over this
    # backend (returned before execution finished, inflating steps/sec 20x)
    args, losses = window(args, 3)    # re-warm after the cost-analysis pass
    float(losses[-1])
    rates = []
    for w in range(5):                      # >= 5 windows: mean +- sd
        t0 = time.perf_counter()
        args, losses = window(args, 10 + w)
        float(losses[-1])
        rates.append(K / (time.perf_counter() - t0))
    return rates, flops_per_step


def measure_torch_baseline(iters=8):
    """Reference-equivalent PyTorch workload on this host (eager, three
    forwards per step). Cached — delete BASELINE_local.json to re-measure,
    and only re-measure on a QUIET host: a concurrent CPU load deflates
    the torch side and inflates the ratio (round 1's 0.235 artifact)."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    import torch
    import torch.nn as nn

    class Swish(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    L, A = N_LATENTS, 18

    def enc():
        return nn.Sequential(
            nn.Conv2d(3, 32, 4, 2, 1, bias=False), Swish(),
            nn.Conv2d(32, 64, 4, 2, 1, bias=False), nn.BatchNorm2d(64), Swish(),
            nn.Conv2d(64, 128, 4, 2, 1, bias=False), nn.BatchNorm2d(128), Swish(),
            nn.Conv2d(128, 256, 4, 1, 0, bias=False), nn.BatchNorm2d(256), Swish())

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = enc()
            self.enc_head = nn.Sequential(
                nn.Linear(256 * 5 * 5, 512), Swish(), nn.Dropout(0.1),
                nn.Linear(512, 2 * L))
            self.dec_up = nn.Sequential(nn.Linear(L, 256 * 5 * 5), Swish())
            self.dec = nn.Sequential(
                nn.ConvTranspose2d(256, 128, 4, 1, 0, bias=False),
                nn.BatchNorm2d(128), Swish(),
                nn.ConvTranspose2d(128, 64, 4, 2, 1, bias=False),
                nn.BatchNorm2d(64), Swish(),
                nn.ConvTranspose2d(64, 32, 4, 2, 1, bias=False),
                nn.BatchNorm2d(32), Swish(),
                nn.ConvTranspose2d(32, 3, 4, 2, 1, bias=False))
            self.attr_enc = nn.Sequential(
                nn.Linear(A, 512), nn.BatchNorm1d(512), Swish(),
                nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
                nn.Linear(512, 2 * L))
            self.attr_dec = nn.Sequential(
                nn.Linear(L, 512), nn.BatchNorm1d(512), Swish(),
                nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
                nn.Linear(512, 512), nn.BatchNorm1d(512), Swish(),
                nn.Linear(512, A))

        def infer(self, image=None, attrs=None):
            B = image.shape[0] if image is not None else attrs.shape[0]
            mus, lvs = [torch.zeros(B, L)], [torch.zeros(B, L)]
            if image is not None:
                h = self.enc_head(self.enc(image).flatten(1))
                mus.append(h[:, :L]); lvs.append(h[:, L:])
            if attrs is not None:
                h = self.attr_enc(attrs)
                mus.append(h[:, :L]); lvs.append(h[:, L:])
            mu, lv = torch.stack(mus), torch.stack(lvs)
            t = 1.0 / (lv.exp() + 1e-8)
            pd_mu = (mu * t).sum(0) / t.sum(0)
            pd_lv = torch.log(1.0 / t.sum(0))
            return pd_mu, pd_lv

        def forward(self, image=None, attrs=None):
            mu, lv = self.infer(image, attrs)
            z = mu + torch.randn_like(mu) * (0.5 * lv).exp()
            img = self.dec(self.dec_up(z).view(-1, 256, 5, 5))
            att = self.attr_dec(z)
            return img, att, mu, lv

    def bce(x, t):
        return (x.clamp(min=0) - x * t + torch.log1p((-x.abs()).exp()))

    def elbo(img_r, img, att_r, att, mu, lv, beta=0.5):
        loss = -0.5 * (1 + lv - mu ** 2 - lv.exp()).sum(1) * beta
        if img_r is not None:
            loss = loss + bce(img_r.flatten(1), img.flatten(1)).sum(1)
        if att_r is not None:
            loss = loss + 10.0 * bce(att_r, att).sum(1)
        return loss.mean()

    torch.manual_seed(0)
    m = Model()
    opt = torch.optim.Adam(m.parameters(), lr=1e-4)
    image = torch.rand(BATCH, 3, 64, 64)
    attrs = (torch.rand(BATCH, A) < 0.3).float()
    m.train()
    # warmup
    for _ in range(1):
        opt.zero_grad()
        o = m(image, attrs); elbo(o[0], image, o[1], attrs, o[2], o[3]).backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        a = m(image, attrs)
        b = m(image, None)
        c = m(None, attrs)
        loss = (elbo(a[0], image, a[1], attrs, a[2], a[3])
                + elbo(b[0], image, None, None, b[2], b[3])
                + elbo(None, None, c[1], attrs, c[2], c[3]))
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    result = {"steps_per_sec": iters / dt,
              "device": "cpu-torch-eager-reference-flow",
              "iters": iters}
    with open(BASELINE_FILE, "w") as f:
        json.dump(result, f)
    return result


def wait_for_backend(probe_timeout=180, attempts=None, sleep_s=120):
    """Bounded TPU-reachability gate. The tunneled axon backend can die
    outright (relay process gone — observed mid-round-3); jax backend init
    then blocks forever with no timeout, which would hang this benchmark
    (and the round driver invoking it) indefinitely. Probe in a SUBPROCESS
    (backend init happens at jax import; a hung init can't be cancelled
    in-process) and retry for ~1h by default before failing loudly."""
    import subprocess
    import sys
    if attempts is None:
        # ~1h of patience by default (the driver runs this once at round
        # end; a transient relay outage should not cost the round its
        # benchmark row). MVAE_BENCH_PROBE_ATTEMPTS=1 for interactive use.
        attempts = int(os.environ.get("MVAE_BENCH_PROBE_ATTEMPTS", "12"))
    probe = ("import jax, jax.numpy as jnp\n"
             "x = jnp.ones((128, 128))\n"
             "print(float((x @ x).sum()))\n")
    for attempt in range(attempts):
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           timeout=probe_timeout, stdout=subprocess.DEVNULL,
                           stderr=subprocess.PIPE)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            last = attempt + 1 == attempts
            # a nonzero exit carries a real traceback (broken env OR a
            # transient tunnel error raised in-process) — surface its tail
            # so an hour of retries never hides the actual failure
            tail = b"" if e.stderr is None else e.stderr[-500:]
            print(f"backend probe {attempt + 1}/{attempts} failed "
                  f"({type(e).__name__})"
                  + (f": ...{tail.decode(errors='replace')}" if tail else "")
                  + ("" if last else f"; retrying in {sleep_s}s"),
                  file=sys.stderr, flush=True)
            if not last:
                time.sleep(sleep_s)
    raise SystemExit(
        "TPU backend unreachable: every reachability probe timed out or "
        "died. No measurement is possible (refusing to hang or to print a "
        "stale number); restore the tunnel and re-run bench.py.")


def main():
    wait_for_backend()
    baseline = measure_torch_baseline()
    # the tunneled backend occasionally drops a dispatch with a transient
    # FAILED_PRECONDITION (BASELINE.md); retry the whole measurement
    for attempt in range(3):
        try:
            rates, flops_per_step = measure_ours()
            break
        except Exception as e:
            import sys
            import traceback
            print(f"measure_ours attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            if attempt == 2:
                raise
            traceback.print_exc(file=sys.stderr)
            time.sleep(30)
    mean = sum(rates) / len(rates)
    sd = (sum((r - mean) ** 2 for r in rates) / len(rates)) ** 0.5
    out = {
        "metric": "celeba_train_steps_per_sec",
        "value": round(mean, 3),
        "unit": "steps/sec (batch=100, 3 ELBO terms, bf16 default)",
        "vs_baseline": round(mean / baseline["steps_per_sec"], 2),
        "sd": round(sd, 3),
        "windows": [round(r, 1) for r in rates],
        "baseline_steps_per_sec": round(baseline["steps_per_sec"], 4),
    }
    if flops_per_step:
        out["tflops_sustained"] = round(flops_per_step * mean / 1e12, 2)
        out["flops_per_step"] = flops_per_step
    print(json.dumps(out))


if __name__ == "__main__":
    main()
