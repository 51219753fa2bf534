"""Learning-rate schedules (HF get_scheduler / DeepSpeed WarmupLR analogue —
the reference consumes these via transformers (trainer/trainer.py:841-861)
and ds_config WarmupLR (scripts/ds_config_example.json:19-31))."""

import math


def get_scheduler(name, base_lr, num_warmup_steps=0, num_training_steps=None,
                  min_lr=0.0):
    """Returns step -> lr. Names: constant, constant_with_warmup, linear,
    cosine, warmup (DeepSpeed WarmupLR: log-linear warmup then constant)."""

    def warmup_frac(step):
        if num_warmup_steps <= 0:
            return 1.0
        return min(1.0, (step + 1) / num_warmup_steps)

    if name == "constant":
        return lambda step: base_lr
    if name in ("constant_with_warmup", "warmup"):
        return lambda step: base_lr * warmup_frac(step)
    if name == "linear":
        assert num_training_steps
        def linear(step):
            if step < num_warmup_steps:
                return base_lr * warmup_frac(step)
            frac = max(0.0, (num_training_steps - step) /
                       max(1, num_training_steps - num_warmup_steps))
            return max(min_lr, base_lr * frac)
        return linear
    if name == "cosine":
        assert num_training_steps
        def cosine(step):
            if step < num_warmup_steps:
                return base_lr * warmup_frac(step)
            progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
            return min_lr + (base_lr - min_lr) * 0.5 * (1 + math.cos(math.pi * min(1.0, progress)))
        return cosine
    raise ValueError(f"unknown scheduler: {name}")
