"""KL annealing schedule.

Linear warmup 0->1 over `annealing_epochs`, indexed by the GLOBAL batch
counter, then held at 1.0 (/root/reference/mnist/train.py:180-186):

    beta = (batch_idx + (epoch-1) * N_batches + 1) / (annealing_epochs * N_batches)

(fashionmnist/train.py:182 has an off-by-one `epoch` instead of `epoch-1`;
SURVEY.md §2.6 says to standardize on the mnist form, which we do.)
"""


def annealing_factor(epoch: int, batch_idx: int, n_batches: int,
                     annealing_epochs: int) -> float:
    if annealing_epochs <= 0 or epoch >= annealing_epochs:
        return 1.0
    return float(batch_idx + (epoch - 1) * n_batches + 1) / \
        float(annealing_epochs * n_batches)


def annealing_factor_from_step(global_step, n_batches, annealing_epochs):
    """Traced-friendly form: global_step = batch_idx + (epoch-1)*n_batches.

    Replicates the reference's epoch-threshold exactly: beta snaps to 1.0 at
    the FIRST batch of epoch `annealing_epochs` (the linear ramp tops out at
    (ann*N - something)/(ann*N) < 1 during epoch ann-1, then jumps).
    """
    import jax.numpy as jnp
    beta = (global_step + 1.0) / (annealing_epochs * n_batches)
    done = global_step >= (annealing_epochs - 1) * n_batches
    return jnp.where(done, 1.0, beta)
