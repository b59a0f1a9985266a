#!/usr/bin/env python
"""Convert a published torch/joblib GHN checkpoint (.pt) to our native .npz.

Example:
  python cli/convert_ckpt.py ghn3tm8.pt ghn3tm8.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('src', help='source checkpoint (.pt / joblib / HF name)')
    p.add_argument('dst', help='destination .npz')
    args = p.parse_args()

    # pure host work: never grab an accelerator (a busy TPU would block here)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from ghn3_tpu import GHN3
    ghn = GHN3.from_pretrained(args.src)
    ghn.save(args.dst)
    print(f'converted {args.src} -> {args.dst}: {ghn.num_params()} params, {ghn.config}')


if __name__ == '__main__':
    main()
