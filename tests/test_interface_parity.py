"""Interface-problem parity: the reference's published numbers
(MM_Interface_error.ipynb cell 14/20: 14 V-cycles to 5e-5, q(7,3)=0.662,
deterministic residual history from u=0, f=1) reproduced exactly with the
quirk cycle (finest-only pre-smoothing)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "experiments"))

from interface_error import compute_q, solve_interface

# printed residuals from MM_Interface_error.ipynb cell 14 (after cycles 1..12)
REF_HISTORY = [
    0.04344373568892479, 0.025038596242666245, 0.016153400763869286,
    0.0099326865747571, 0.005999982822686434, 0.0035448919516056776,
    0.002057234989479184, 0.0011781713692471385, 0.000666382780764252,
    0.0003720286185853183, 0.00020798530022148043, 0.00011407280544517562,
]


def test_interface_quirk_parity():
    u, hist = solve_interface(n=64, eps=5e-5, mode="quirk")
    assert len(hist) == 14
    np.testing.assert_allclose(hist[:12], REF_HISTORY, rtol=2e-2)  # f32 accumulation-order noise
    assert abs(compute_q(hist, 7, 3) - 0.662222582902394) < 5e-3


def test_interface_correct_cycle_not_slower():
    _, hist_quirk = solve_interface(n=64, eps=5e-5, mode="quirk")
    _, hist_correct = solve_interface(n=64, eps=5e-5, mode="correct")
    assert len(hist_correct) <= len(hist_quirk)
