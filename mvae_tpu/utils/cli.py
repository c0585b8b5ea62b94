"""Shared argparse construction — keeps the reference's exact per-experiment
flag surfaces (SURVEY.md §5) without six copies of the parser."""

import argparse


def train_parser(*, n_latents, epochs, annealing_epochs, lr, batch_size=100,
                 lambda_flags=(("lambda-image", 1.0), ("lambda-text", 10.0)),
                 bf16_default=False):
    p = argparse.ArgumentParser()
    p.add_argument('--n-latents', type=int, default=n_latents,
                   help=f'size of the latent embedding [default: {n_latents}]')
    p.add_argument('--batch-size', type=int, default=batch_size, metavar='N')
    p.add_argument('--epochs', type=int, default=epochs, metavar='N')
    p.add_argument('--annealing-epochs', type=int, default=annealing_epochs,
                   metavar='N')
    p.add_argument('--lr', type=float, default=lr, metavar='LR')
    p.add_argument('--log-interval', type=int, default=10, metavar='N')
    for name, default in lambda_flags:
        p.add_argument(f'--{name}', type=float, default=default)
    p.add_argument('--cuda', action='store_true', default=False,
                   help='kept for CLI parity; devices are auto-selected')
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--out-dir', type=str, default='./trained_models')
    p.add_argument('--resume', type=str, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--profile-dir', type=str, default=None,
                   help='write a jax.profiler trace of a few early steps')
    p.add_argument('--no-device-data', action='store_true', default=False,
                   help='disable the device-resident input pipeline '
                        '(stream batches from host instead)')
    p.add_argument('--bf16', action='store_true', default=bf16_default,
                   help='bfloat16 compute for the conv/expert stacks '
                        '(params, BN stats and losses stay f32); measured '
                        'wins on every family at production shapes '
                        '(BASELINE.md)'
                        + (' [DEFAULT for this experiment: convergence '
                           'parity measured at the f32 gap, '
                           'PARITY_convergence.json @bf16]'
                           if bf16_default else ''))
    p.add_argument('--f32', dest='bf16', action='store_false',
                   help='force float32 compute (exact reference numerics)')
    p.add_argument('--exact-decode', action='store_true', default=False,
                   help='force the PIL-exact image decode path for real '
                        'CelebA ingest (reference pixel semantics) instead '
                        'of the faster native libjpeg path')
    p.add_argument('--download', action='store_true', default=False,
                   help='fetch the dataset archives (reference URL tables, '
                        'MD5-verified) into --data-dir if missing; degrades '
                        'with a clear message when the environment has no '
                        'egress (data/download.py)')
    # multi-process (multi-host) bootstrap — parallel/distributed.py. On a
    # real multi-host TPU slice a bare --distributed suffices (coordinator/
    # process id inferred from the TPU runtime); elsewhere pin the triple.
    p.add_argument('--distributed', action='store_true', default=False,
                   help='jax.distributed.initialize() with TPU-inferred '
                        'coordinator/process id (multi-host slices)')
    p.add_argument('--coordinator', type=str, default=None,
                   help='coordinator host:port for explicit multi-process '
                        'bootstrap (implies --distributed)')
    p.add_argument('--process-id', type=int, default=None,
                   help='this process\'s index [with --coordinator]')
    p.add_argument('--n-processes', type=int, default=None,
                   help='total process count [with --coordinator]')
    return p


def sample_parser(**extra_flags):
    p = argparse.ArgumentParser()
    p.add_argument('model_path', type=str, help='path to trained model file')
    p.add_argument('--n-samples', type=int, default=64)
    p.add_argument('--cuda', action='store_true', default=False)
    p.add_argument('--data-dir', type=str, default='./data')
    p.add_argument('--out-dir', type=str, default='.')
    p.add_argument('--seed', type=int, default=0)
    for name, kw in extra_flags.items():
        p.add_argument(f'--{name.replace("_", "-")}', **kw)
    return p
