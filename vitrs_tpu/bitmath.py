"""Shared f32 transcendentals for the bit-exact parity mode.

Bit-for-bit parity between the scalar NumPy oracle and the jitted XLA path
(BASELINE.md target: 'fp32 bit-parity at tiny scale') requires that BOTH
sides execute the *identical sequence of IEEE-754 f32 operations*.  Library
exp/tanh differ between libm (NumPy) and XLA's codegen, so the bit-exact
mode computes them from a shared implementation built only from f32
add/mul/div/floor/ldexp — each of which is correctly rounded (hence
bit-identical) on both backends.

Every function takes the array namespace `xp` (numpy or jax.numpy) so the
same source drives both sides.  Accuracy is ~1-2 ulp (degree-6 polynomial
after Cody-Waite range reduction) — plenty for parity work; the production
path keeps the fast native transcendentals.
"""

from __future__ import annotations

import numpy as np

F = np.float32
LOG2E = F(1.4426950408889634)
LN2_HI = F(0.693359375)              # 355/512, exact in f32
LN2_LO = F(-2.12194440e-4)           # ln2 - LN2_HI (Cody-Waite split)
# Taylor coefficients of e^r, applied Horner-style (1/720 ... 1)
_EXP_COEFFS = (F(1.0 / 120), F(1.0 / 24), F(1.0 / 6), F(0.5), F(1.0), F(1.0))
_CLAMP = F(80.0)                     # exp argument clamp (saturation guard)


def exp32(x, xp):
    """e^x in f32: Cody-Waite reduction x = k*ln2 + r, degree-6 Horner."""
    x = xp.minimum(xp.maximum(x, -_CLAMP), _CLAMP)
    k = xp.floor(x * LOG2E + F(0.5))
    r = (x - k * LN2_HI) - k * LN2_LO
    p = F(1.0 / 720)
    for c in _EXP_COEFFS:
        p = p * r + c
    return xp.ldexp(p, k.astype(np.int32))


def tanh32(x, xp):
    """tanh via exp32: sign(x) * (e^{2|x|} - 1) / (e^{2|x|} + 1)."""
    a = xp.abs(x)
    e = exp32(a + a, xp)
    t = (e - F(1.0)) / (e + F(1.0))
    return xp.where(x < F(0.0), -t, t)


def cosh32(x, xp):
    """cosh via exp32: (e^{|x|} + 1/e^{|x|}) * 0.5."""
    e = exp32(xp.abs(x), xp)
    return (e + F(1.0) / e) * F(0.5)
