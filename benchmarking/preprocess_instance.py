"""Offline instance preprocessing: read (.mps/.qps(.gz), fixed or free),
apply presolve (empty-row/column removal, reference preprocess.jl:236-271),
and write the reduced instance back out as free-format MPS(.gz).

Replaces the reference's preprocess.sh chain (awk fixed-to-free + SCIP
drop_integrality + PaPILO): fixed-format and integrality are handled by
the reader; set PAPILO_BIN to additionally run PaPILO when available.

Usage: python preprocess_instance.py IN.mps[.gz] OUT.mps[.gz] [--fixed]
"""

import os
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fixed = "--fixed" in sys.argv
    if len(args) != 2:
        raise SystemExit(__doc__)
    src, dst = args

    papilo = os.environ.get("PAPILO_BIN")
    if papilo:
        subprocess.run(
            [papilo, "presolve", "-f", src, "-r", dst,
             "--presolve.detectlindep=0"],
            check=True,
        )
        return

    import firstorderlp_tpu as folp
    from firstorderlp_tpu.io.mps_writer import write_mps

    lp = folp.qps_reader_to_standard_form(src, fixed_format=fixed)
    folp.presolve(lp, verbosity=1, transform_bounds=False)
    write_mps(lp, dst)
    print(
        f"{src} -> {dst}: {lp.num_constraints} rows x "
        f"{lp.num_variables} cols, nnz={lp.constraint_matrix.nnz}"
    )


if __name__ == "__main__":
    main()
