"""Field-exact parity between the native MPS tokenizer and the
pure-Python parser (the semantics source of truth).

Every test builds an MPS text exercising one corner of the format,
parses it through both paths, and asserts every MpsData field is
exactly equal (floats bit-for-bit: both paths parse decimals with
C strtod / Python float(), which agree exactly).
"""

import gzip

import numpy as np
import pytest

from firstorderlp_tpu.io import mps, native

lib = native.load()
pytestmark = pytest.mark.skipif(
    lib is None, reason="native MPS tokenizer unavailable (no g++?)"
)


def _parity(text, tmp_path, fixed_format=False):
    path = tmp_path / "m.mps"
    path.write_text(text)
    d_py = mps._read_mps_python(str(path), fixed_format)
    d_nat = native.parse_bytes(lib, text.encode())
    for f in ("name", "objsense", "nvar", "ncon", "c0"):
        assert getattr(d_nat, f) == getattr(d_py, f), f
    for f in ("c", "lvar", "uvar", "lcon", "ucon", "arows", "acols",
              "avals", "qrows", "qcols", "qvals"):
        a, b = getattr(d_nat, f), getattr(d_py, f)
        assert a.shape == b.shape, f
        assert np.array_equal(a, b, equal_nan=True), f
    assert d_nat.varnames == d_py.varnames
    assert d_nat.connames == d_py.connames
    return d_nat


def _raises_both(text, tmp_path):
    path = tmp_path / "bad.mps"
    path.write_text(text)
    with pytest.raises(mps.MpsParseError):
        mps._read_mps_python(str(path))
    with pytest.raises(mps.MpsParseError):
        native.parse_bytes(lib, text.encode())


BASE = """NAME          test
ROWS
 N  COST
 E  R1
 L  R2
 G  R3
COLUMNS
    X1  COST  1.5  R1  1.0
    X1  R2  2.0
    X2  COST  -2.0  R1  1.0
    X2  R3  3.0
RHS
    RHS1  R1  4.0  R2  10.0
    RHS1  R3  -1.0
BOUNDS
 UP BND X1 5.0
 LO BND X2 -1.0
ENDATA
"""


def test_base_parity(tmp_path):
    d = _parity(BASE, tmp_path)
    assert d.nvar == 2 and d.ncon == 3
    assert d.c.tolist() == [1.5, -2.0]


def test_dispatcher_uses_native(tmp_path):
    path = tmp_path / "m.mps"
    path.write_text(BASE)
    d = mps.read_mps(str(path))
    assert d.nvar == 2  # and identical to the python path per parity above


def test_gz_roundtrip(tmp_path):
    path = tmp_path / "m.mps.gz"
    with gzip.open(path, "wt") as f:
        f.write(BASE)
    d = mps.read_mps(str(path))
    assert d.ncon == 3


def test_ranges_all_row_types(tmp_path):
    text = """NAME r
ROWS
 N  obj
 E  e1
 E  e2
 L  l1
 G  g1
COLUMNS
    x  obj  1.0  e1  1.0
    x  e2  1.0  l1  1.0
    x  g1  1.0
RHS
    r  e1  2.0  e2  2.0
    r  l1  5.0  g1  1.0
RANGES
    rng  e1  3.0  e2  -3.0
    rng  l1  -4.0  g1  -2.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.lcon.tolist() == [2.0, -1.0, 1.0, 1.0]
    assert d.ucon.tolist() == [5.0, 2.0, 5.0, 3.0]


def test_bounds_all_types(tmp_path):
    cols = "\n".join(
        f"    x{i}  obj  1.0  r  1.0" for i in range(9)
    )
    text = f"""NAME b
ROWS
 N  obj
 G  r
COLUMNS
{cols}
RHS
    rhs  r  1.0
BOUNDS
 LO BND x0 -2.0
 UP BND x1 7.0
 FX BND x2 3.0
 FR BND x3
 MI BND x4
 PL BND x5
 BV BND x6
 LI BND x7 1
 UI BND x8 9
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.lvar[2] == d.uvar[2] == 3.0
    assert d.lvar[3] == -np.inf and d.uvar[3] == np.inf
    assert d.lvar[6] == 0.0 and d.uvar[6] == 1.0


def test_negative_upper_bound_rule(tmp_path):
    # UP with negative value and no prior LO implies lvar = -inf;
    # with a prior LO the lower bound is kept.
    text = """NAME n
ROWS
 N  obj
 G  r
COLUMNS
    x  obj  1.0  r  1.0
    y  obj  1.0  r  1.0
RHS
    rhs  r  1.0
BOUNDS
 UP BND x -2.0
 LO BND y -9.0
 UP BND y -2.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.lvar[0] == -np.inf and d.uvar[0] == -2.0
    assert d.lvar[1] == -9.0 and d.uvar[1] == -2.0


def test_quadobj_and_marker(tmp_path):
    text = """* a comment line
NAME q
ROWS
 N  obj
 G  r
COLUMNS
    x  obj  1.0  r  1.0
    M1  'MARKER'  'INTORG'
    y  obj  2.0  r  1.0
    M2  'MARKER'  'INTEND'
RHS
    rhs  r  1.0
    rhs  obj  -2.5
QUADOBJ
    x  x  4.0
    y  x  1.0
    y  y  2.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.c0 == 2.5
    assert len(d.qvals) == 3


def test_qmatrix_keeps_lower_triangle(tmp_path):
    text = """NAME q
ROWS
 N  obj
 G  r
COLUMNS
    x  obj  1.0  r  1.0
    y  obj  2.0  r  1.0
QMATRIX
    x  x  4.0
    x  y  1.0
    y  x  1.0
    y  y  2.0
RHS
    rhs  r  1.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert len(d.qvals) == 3  # upper-triangle (x,y) entry dropped


def test_objsense_next_line_and_extra_free_rows(tmp_path):
    text = """NAME s
OBJSENSE
    MAXIMIZE
ROWS
 N  obj
 N  free2
 G  r
COLUMNS
    x  obj  1.0  r  1.0
RHS
    rhs  r  1.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.objsense == "max"
    assert d.connames == ["r"]


def test_duplicate_objective_entries_accumulate(tmp_path):
    text = """NAME d
ROWS
 N  obj
 G  r
COLUMNS
    x  obj  1.0  r  1.0
    x  obj  2.5
RHS
    rhs  r  1.0
ENDATA
"""
    d = _parity(text, tmp_path)
    assert d.c.tolist() == [3.5]


def test_error_parity(tmp_path):
    _raises_both("GARBAGE SECTION\n", tmp_path)
    _raises_both(
        "NAME x\nROWS\n N obj\n G r\nCOLUMNS\n    x  nosuchrow  1.0\nENDATA\n",
        tmp_path,
    )
    _raises_both(
        "NAME x\nROWS\n N obj\n G r\n G r\nENDATA\n", tmp_path
    )
    _raises_both(
        "NAME x\nROWS\n N obj\n G r\nCOLUMNS\n    x  r  1.0\n"
        "BOUNDS\n UP BND nosuchcol 1.0\nENDATA\n",
        tmp_path,
    )


def test_generated_instance_parity(tmp_path):
    from firstorderlp_tpu.generators import generate_pagerank_lp
    from firstorderlp_tpu.io.mps_writer import write_mps

    p = generate_pagerank_lp(num_nodes=300, seed=3)
    path = tmp_path / "pr.mps.gz"
    write_mps(p, str(path))
    with gzip.open(path, "rt") as f:
        _parity(f.read(), tmp_path)
