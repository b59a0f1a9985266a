"""Input-pipeline throughput: can the ImageFolder loader feed a batch-128
meta-step without stalling? (VERDICT #8 done-criterion.)

Generates a synthetic JPEG class-folder tree, then measures imgs/sec for the
threaded prefetching loader with RandAugment on vs off, and compares against a
single-threaded baseline. Prints one JSON line.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_tree(root, n_classes=8, per_class=160, size=320):
    from PIL import Image
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = os.path.join(root, 'train', f'class{c:03d}')
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f'{i:04d}.jpg'), quality=85)


def run(root, batch, workers, prefetch, aug, n_batches=8):
    from ghn3_tpu.data.images import ImageFolder
    ds = ImageFolder(root, split='train', imsize=224, aug=aug,
                     workers=workers, prefetch=prefetch)
    it = ds.batches(batch, train=True, seed=0)
    next(it)                      # warm the pools
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches - 1):
        x, y = next(it)
        n += len(y)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--step-ms', type=float, default=920.0,
                    help='meta-step budget to compare against (TPU measured)')
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        make_tree(root)
        single = run(root, args.batch, workers=1, prefetch=0, aug=None)
        multi = run(root, args.batch, workers=args.workers, prefetch=4, aug=None)
        multi_aug = run(root, args.batch, workers=args.workers, prefetch=4,
                        aug='rand-m6-mstd0.5')
        need = args.batch / (args.step_ms / 1000.0)
        cpus = os.cpu_count() or 1
        out = {
            'cpus': cpus,
            'imgs_per_sec_single_thread': round(single, 1),
            'imgs_per_sec_threaded': round(multi, 1),
            'imgs_per_sec_threaded_randaugment': round(multi_aug, 1),
            'thread_speedup': round(multi / single, 2),
            'meta_step_demand_imgs_per_sec': round(need, 1),
            'feeds_batch128_step_this_host': bool(multi_aug >= need),
            # decode/augment is per-image parallel: throughput scales with host
            # cores (TPU-VM hosts have >= 100 vCPUs; this sandbox may have 1)
            'note': 'per-core numbers; real TPU hosts multiply by their vCPUs',
        }
        print(json.dumps(out))
        return out


if __name__ == '__main__':
    main()
