"""Optimizer / LR-schedule factory (optax).

Covers the reference Trainer's optimizer surface (trainer.py:159-208): SGD with
momentum, Adam, AdamW, LAMB; cosine, cosine-with-warmup (the reference's custom
lambda: linear warmup over epochs then half-cosine), step and multistep decay.
Schedules are per-epoch multipliers of the base LR, as in the reference.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import numpy as np
import optax


def lr_multiplier(scheduler: str, epoch: int, epochs: int,
                  scheduler_args: Optional[Dict] = None, base_lr: float = 1.0) -> float:
    """LR multiplier for an epoch index (applied as lr = base_lr * multiplier)."""
    args = scheduler_args or {}
    if scheduler.startswith('cosine-warmup'):
        def parse(arg, default):
            p = scheduler.find(arg)
            if p <= 0:
                return default
            rest = scheduler[p + len(arg):]
            p_end = rest.find('-')
            return float(rest if p_end == -1 else rest[:p_end])

        warmup_steps = int(parse('steps', 5))
        warmup_lr = parse('init_lr', 1e-5) / base_lr
        if epoch < warmup_steps - 1:
            return float(np.linspace(warmup_lr, 1, warmup_steps)[epoch])
        progress = float(epoch - warmup_steps) / float(max(1, epochs - warmup_steps))
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * progress)))
    if scheduler == 'cosine':
        return 0.5 * (1.0 + math.cos(math.pi * epoch / max(1, epochs)))
    if scheduler == 'step':
        step_size = int(args.get('step_size', 30))
        gamma = float(args.get('gamma', 0.1))
        return gamma ** (epoch // step_size)
    if scheduler == 'mstep':
        milestones = sorted(args.get('milestones', [200, 250]))
        gamma = float(args.get('gamma', 0.1))
        return gamma ** int(np.searchsorted(milestones, epoch, side='right'))
    raise NotImplementedError(scheduler)


def make_optimizer(opt: str, lr: float, weight_decay: float = 0.0,
                   momentum: float = 0.9, grad_clip: float = 5.0,
                   betas: Sequence[float] = (0.9, 0.999)) -> optax.GradientTransformation:
    """Build the optax chain. LR enters through `inject_hyperparams` so the
    per-epoch schedule can update it without rebuilding optimizer state."""
    opt = opt.lower()
    if opt == 'sgd':
        base = optax.inject_hyperparams(optax.sgd)(learning_rate=lr, momentum=momentum)
        wd = weight_decay
        # torch SGD couples weight decay into the gradient
        pre = [optax.add_decayed_weights(wd)] if wd else []
        chain = pre + [base]
    elif opt == 'adam':
        chain = [optax.inject_hyperparams(optax.adam)(learning_rate=lr,
                                                      b1=betas[0], b2=betas[1])]
        if weight_decay:
            chain = [optax.add_decayed_weights(weight_decay)] + chain
    elif opt == 'adamw':
        chain = [optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)]
    elif opt == 'lamb':
        chain = [optax.inject_hyperparams(optax.lamb)(
            learning_rate=lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)]
    else:
        raise NotImplementedError(opt)
    if grad_clip and grad_clip > 0:
        chain = [optax.clip_by_global_norm(grad_clip)] + chain
    return optax.chain(*chain)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate inside an optax chain state (called on
    host between epochs; hyperparams live in a mutable dict inside the state)."""
    import jax.numpy as jnp
    states = opt_state if isinstance(opt_state, tuple) else (opt_state,)
    found = False
    for s in states:
        if hasattr(s, 'hyperparams') and 'learning_rate' in s.hyperparams:
            s.hyperparams['learning_rate'] = jnp.asarray(lr, dtype=jnp.float32)
            found = True
    assert found, 'no injected learning_rate found in optimizer state'
    return opt_state


def get_learning_rate(opt_state) -> float:
    states = opt_state if isinstance(opt_state, tuple) else (opt_state,)
    for s in states:
        if hasattr(s, 'hyperparams') and 'learning_rate' in s.hyperparams:
            return float(s.hyperparams['learning_rate'])
    raise ValueError('no injected learning_rate found in optimizer state')
