"""Tableau invariants for Tsit5 (consistency of the owned coefficients)."""
import numpy as np

from localregneuralde_tpu.ode.tableaus import Tsit5Tableau as T
from localregneuralde_tpu.ode.tableaus import tsit5_interp_weights


def test_row_sums_match_c():
    assert abs(T.a21 - T.c1) < 1e-12
    assert abs(T.a31 + T.a32 - T.c2) < 1e-12
    assert abs(T.a41 + T.a42 + T.a43 - T.c3) < 1e-9
    assert abs(T.a51 + T.a52 + T.a53 + T.a54 - T.c4) < 1e-9
    assert abs(T.a61 + T.a62 + T.a63 + T.a64 + T.a65 - 1.0) < 1e-8
    assert (
        abs(T.a71 + T.a72 + T.a73 + T.a74 + T.a75 + T.a76 - 1.0) < 1e-9
    )


def test_btilde_sums_to_zero():
    s = (
        T.btilde1 + T.btilde2 + T.btilde3 + T.btilde4 + T.btilde5
        + T.btilde6 + T.btilde7
    )
    assert abs(s) < 1e-12


def test_interpolant_endpoints():
    b0 = np.array(tsit5_interp_weights(0.0))
    assert np.allclose(b0, 0.0, atol=1e-12)
    b1 = np.array(tsit5_interp_weights(1.0))
    b_expected = np.array(
        [T.a71, T.a72, T.a73, T.a74, T.a75, T.a76, 0.0]
    )
    assert np.allclose(b1, b_expected, atol=1e-7)
