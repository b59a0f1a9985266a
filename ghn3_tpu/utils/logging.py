"""Logging / metrics utilities (reference ghn3/utils.py:25-96 surface)."""

from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np


def log(*args, **kwargs):
    """Primary-process-gated print (reference rank-0 log)."""
    try:
        import jax
        primary = jax.process_index() == 0
    except Exception:
        primary = True
    if primary:
        kwargs.setdefault('flush', True)
        print(*args, **kwargs)


class AverageMeter:
    def __init__(self):
        self.sum = 0.0
        self.cnt = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.cnt += n
        self.avg = self.sum / max(1, self.cnt)


class Logger:
    """Per-step training log line: metrics, sec/batch, host RAM, device memory."""

    def __init__(self, max_steps: int, start_step: int = 0):
        self.max_steps = max_steps
        self.start_step = start_step
        self.start_time = time.time()

    def __call__(self, step: int, metrics: Dict[str, float]):
        try:
            import psutil
            ram = psutil.Process(os.getpid()).memory_info().rss / 1e9
        except Exception:
            ram = float('nan')
        dev_mem = 'nan'
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            if stats and 'bytes_in_use' in stats:
                dev_mem = '%.2f' % (stats['bytes_in_use'] / 1e9)
        except Exception:
            pass
        log('batch={:04d}/{:04d} \t {} \t {:.4f} (sec/batch), mem ram/dev: {:.2f}/{} (G)'.format(
            step, self.max_steps,
            '\t'.join('{}={:.4f}'.format(m, v) for m, v in metrics.items()),
            (time.time() - self.start_time) / max(1, step + 1 - self.start_step),
            ram, dev_mem))


def print_grads(grads: Dict[str, np.ndarray], params: Dict[str, np.ndarray], verbose=True):
    """Sorted per-parameter grad/param norm table (reference print_grads)."""
    rows = []
    for n, g in grads.items():
        rows.append((float(np.linalg.norm(np.asarray(g).ravel())),
                     float(np.linalg.norm(np.asarray(params[n]).ravel())), n))
    rows.sort()
    if verbose:
        log('\n ======== gradient and param norms (sorted by grads) ========')
        for i, (gn, pn, n) in enumerate(rows):
            log('param #{:03d}: {:40s} grad norm={:.3f} \t param norm={:.3f}'.format(i, n, gn, pn))
    total_g = float(np.linalg.norm([r[0] for r in rows]))
    total_p = float(np.linalg.norm([r[1] for r in rows]))
    log(f'{len(rows)} params with gradients, total grad norm={total_g:.3f}, '
        f'total param norm={total_p:.3f}\n')
