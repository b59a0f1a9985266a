#!/usr/bin/env python
"""Generate a DeepNets-1M-format architecture dataset (published ppuda hdf5 +
metadata layout) with the constructive graph builder — no torch, no downloads.

The reference distributes deepnets1m_*.hdf5 as downloads; this script makes GHN
meta-training self-contained in offline environments:

  python scripts/generate_deepnets1m.py --out ./data -n 10000 --val 500
  python cli/train_ghn.py -d cifar10 -D ./data ...

Records round-trip byte-identically through data/deepnets1m.DeepNets1M
(tests/test_deepnets.py::test_writer_loader_roundtrip).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='./data')
    ap.add_argument('-n', '--num-train', type=int, default=1000)
    ap.add_argument('--val', type=int, default=100)
    # out-of-distribution eval splits (published DeepNets-1M vocabulary,
    # reference eval_ghn.py --split wide/deep/dense/bnfree); 0 = omit
    ap.add_argument('--test', type=int, default=0)
    ap.add_argument('--wide', type=int, default=0)
    ap.add_argument('--deep', type=int, default=0)
    ap.add_argument('--dense', type=int, default=0)
    ap.add_argument('--bnfree', type=int, default=0)
    ap.add_argument('--search', type=int, default=0,
                    help='NAS search split (own hdf5 file, published layout)')
    ap.add_argument('--num-classes', type=int, default=10)
    ap.add_argument('--imagenet', action='store_true',
                    help='imagenet-style stems / large-image geometry')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--ve', type=int, default=50)
    # macro-config sampling pools (comma-separated). Narrowing these bounds the
    # interpreter's compiled-program count (see tools/bucket_stats.py) while the
    # genotype content — op choices, wiring, concat sets — stays fully random.
    ap.add_argument('--cells', type=str, default='2,3,4')
    ap.add_argument('--steps', type=str, default='1,2')
    ap.add_argument('--channels', type=str, default='8,16,32')
    ap.add_argument('--fc-dims', type=str, default='256')
    ap.add_argument('--c-mult', type=str, default='1,2')
    ap.add_argument('--fc-layers', type=str, default='1,2')
    ap.add_argument('--glob-avg-p', type=float, default=0.9)
    ap.add_argument('--norm-free-p', type=float, default=0.0,
                    help='fraction of sampled nets with NO normalization '
                         'layers (norm=None). The published training '
                         'distribution is all-BN (bnfree is OOD); nonzero '
                         'values are for positive-control experiments')
    ap.add_argument('--ops', type=str, default=None,
                    help='comma-separated genotype op pool override, e.g. '
                         '"sep_conv_3x3,conv_3x3,max_pool_3x3,skip_connect,'
                         'dil_conv_3x3,avg_pool_3x3,none,msa,cse" to include '
                         'the ViT/squeeze-excite primitives the published '
                         'dataset samples (default: the conv/pool/skip pool)')
    args = ap.parse_args()

    def ints(s):
        return tuple(int(v) for v in s.split(','))

    from ghn3_tpu.data.deepnets1m_writer import write_dataset
    out = write_dataset(args.out, n_train=args.num_train, n_val=args.val,
                        n_test=args.test, n_wide=args.wide, n_deep=args.deep,
                        n_dense=args.dense, n_bnfree=args.bnfree, n_search=args.search,
                        num_classes=args.num_classes, imagenet=args.imagenet,
                        seed=args.seed, ve_cutoff=args.ve,
                        cells_choices=ints(args.cells), steps_choices=ints(args.steps),
                        c_choices=ints(args.channels), fc_dim_choices=ints(args.fc_dims),
                        c_mult_choices=ints(args.c_mult),
                        fc_layers_choices=ints(args.fc_layers),
                        glob_avg_p=args.glob_avg_p,
                        norm_free_p=args.norm_free_p,
                        ops=tuple(args.ops.split(',')) if args.ops else None,
                        log_every=max(1, args.num_train // 10))
    extra = ', '.join(f'{n} {s}' for s, n in
                      (('test', args.test), ('wide', args.wide),
                       ('deep', args.deep), ('dense', args.dense),
                       ('bnfree', args.bnfree), ('search', args.search)) if n)
    print(f'wrote DeepNets-1M-format dataset ({args.num_train} train / '
          f'{args.val} val{" / " + extra if extra else ""}) to {out}')


if __name__ == '__main__':
    main()
