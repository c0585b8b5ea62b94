from mvae_tpu.train.loop import (
    make_train_step,
    make_eval_step,
    AverageMeter,
)
from mvae_tpu.train.checkpoint import save_checkpoint, load_checkpoint
