"""Relaxes a MIP .mps into its LP relaxation .mps (drops integrality).

Reference: benchmarking/drop_integrality.jl drives SCIP to read the MIP
and rewrite the continuous relaxation. SCIP isn't available here, but
this repo's MPS reader already parses MARKER INTORG/INTEND sections and
integer BOUNDS types as continuous (io/mps.py), so the relaxation is
read -> write with the native reader/writer.

Usage: python benchmarking/drop_integrality.py in.mps[.gz] out.mps[.gz]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from firstorderlp_tpu.io.standard_form import (  # noqa
    qps_reader_to_standard_form,
)
from firstorderlp_tpu.io.mps_writer import write_mps  # noqa


def main():
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    problem = qps_reader_to_standard_form(src)
    write_mps(problem, dst)
    print(
        f"{os.path.basename(src)}: relaxed -> {dst} "
        f"({problem.num_constraints} rows x {problem.num_variables} cols)"
    )


if __name__ == "__main__":
    main()
