"""Generates an L1-SVM LP (.mps/.mps.gz) from a LIBSVM file.

Mirrors the reference benchmarking/generate_l1_svm_lp.jl CLI:
    python cli/generate_l1_svm_lp.py --input_filename data/duke.tr \
        --output_filename /tmp/duke.mps.gz --regularizer_weight 1.5

With --synthetic n_samples,n_features a random dataset is generated
instead (zero-egress environments have no LIBSVM downloads).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_filename", default=None)
    p.add_argument("--synthetic", default=None,
                   help="n_samples,n_features for a synthetic dataset")
    p.add_argument("--output_filename", required=True)
    p.add_argument("--regularizer_weight", type=float, required=True)
    p.add_argument("--random_seed", type=int, default=0)
    args = p.parse_args()

    from firstorderlp_tpu.generators import (
        generate_l1_svm_lp,
        load_libsvm_file,
        random_svm_data,
    )
    from firstorderlp_tpu.io.mps_writer import write_mps

    if args.input_filename:
        data = load_libsvm_file(args.input_filename)
    elif args.synthetic:
        n_samples, n_features = map(int, args.synthetic.split(","))
        data = random_svm_data(n_samples, n_features, seed=args.random_seed)
    else:
        raise SystemExit("provide --input_filename or --synthetic")

    problem = generate_l1_svm_lp(data, args.regularizer_weight)
    write_mps(problem, args.output_filename, name="l1_svm")


if __name__ == "__main__":
    main()
