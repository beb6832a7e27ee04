"""Code-construction tests: QC expansion, weights, structure invariants.

Checks the construction rules the reference implements in
``Coder::initCheckMatrix`` (``MyLdpc.cpp:52-135``): z = n/24, shift scaling
``p*z//96`` (``p % z`` for rate 2/3A), block (i,j) shift s placing ones at
(i*z+r, j*z+(r+s)%z).
"""
import numpy as np
import pytest

from myldpccppapi_tpu.codes import wimax, wifi
from myldpccppapi_tpu.codes.base_matrices import WIMAX_SEEDS
from myldpccppapi_tpu.codes.gf2 import gf2_inv, gf2_matmul, gf2_rank

ALL_WIMAX_RATES = sorted(WIMAX_SEEDS)


@pytest.mark.parametrize("rate", ALL_WIMAX_RATES)
@pytest.mark.parametrize("n", [576, 1152, 2304])
def test_wimax_construction(rate, n):
    code = wimax(n, rate)
    assert code.n == n
    assert code.z == n // 24
    num, den = rate[0], rate[2]
    assert code.k == n * int(num) // int(den)
    h = code.h_dense()
    assert h.shape == (code.m, code.n)
    # every row/col weight equals its base row/col degree (blocks are permutations)
    assert (h.sum(1).reshape(code.m_b, code.z) == code.row_degrees[:, None]).all()
    assert (h.sum(0).reshape(code.n_b, code.z) == code.col_degrees[:, None]).all()
    # edge count
    assert h.sum() == code.num_edges


def test_wimax_shift_rule_spot_checks():
    # rate 1/2, z=24: seed entry (0,1)=94 -> shift 94*24//96 = 23
    code = wimax(576, "1/2")
    assert code.base[0, 1] == 23
    h = code.h_dense()
    z = 24
    # block (0,1): one at (r, z + (r+23)%z)
    for r in [0, 5, 23]:
        assert h[r, z + (r + 23) % z]
    # rate 2/3A uses p % z
    code_a = wimax(576, "2/3A")
    assert code_a.base[0, 4] == 2 % 24


def test_wimax_block_structure_roundtrip():
    code = wimax(576, "3/4B")
    rows, cols = code.h_coo()
    h = code.h_dense()
    h2 = np.zeros_like(h)
    h2[rows, cols] = True
    assert (h == h2).all()
    # row-major edge order: rows non-decreasing, cols ascending within a row
    assert (np.diff(rows) >= 0).all()
    same_row = np.diff(rows) == 0
    assert (np.diff(cols)[same_row] > 0).all()


def test_wifi_construction():
    code = wifi(1944, "5/6")
    assert (code.n, code.k, code.z) == (1944, 1620, 81)
    code2 = wifi(1944, "1/2")
    assert (code2.n, code2.k) == (1944, 972)
    # parity part of H must be full rank (else the code rate would be wrong)
    for c in (code, code2):
        h = c.h_dense()
        assert gf2_rank(h[:, c.k:]) == c.m


def test_gf2_inverse():
    rng = np.random.default_rng(0)
    for n in [1, 2, 17, 64]:
        while True:
            m = rng.integers(0, 2, size=(n, n)).astype(np.bool_)
            if gf2_rank(m) == n:
                break
        inv = gf2_inv(m)
        assert (gf2_matmul(m, inv) == np.eye(n, dtype=bool)).all()


def test_gf2_singular_raises():
    m = np.zeros((4, 4), dtype=np.bool_)
    with pytest.raises(np.linalg.LinAlgError):
        gf2_inv(m)
