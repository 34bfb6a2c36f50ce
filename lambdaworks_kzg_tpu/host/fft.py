"""Host-exact radix-2 FFTs: Fr NTT and the G1 group-FFT.

The reference declares but never implements this subsystem (`FFTSettings`
at reference src/lib.rs:176-208, commented-out `new_fft_settings` /
`fft_g1` / `bit_reversal_permutation` at src/lib.rs:760-770 and
src/srs.rs:117-124). We implement it because the consensus-spec test
vectors require the evaluation-form pipeline: the trusted-setup G1 powers
are monomial in the file and the protocol needs them in bit-reversed
Lagrange form, i.e. `brp(ifft_g1(monomial_points))`.

The device-tier NTT lives in ops/ntt.py; this module is its oracle.
"""

from ..constants import R, fr_root_of_unity
from . import curve as C
from .field import batch_fr_inv


def bit_reversal_permutation(values):
    """Out-of-place bit-reversal reorder. len(values) must be a power of 2."""
    n = len(values)
    assert n & (n - 1) == 0
    bits = n.bit_length() - 1
    return [values[int(format(i, f"0{bits}b")[::-1], 2)] for i in range(n)]


def fr_roots_of_unity(order: int, inverse: bool = False):
    """[w^0, w^1, ..., w^(order-1)] for the primitive order-th root w."""
    w = fr_root_of_unity(order)
    if inverse:
        w = pow(w, R - 2, R)
    out = [1] * order
    for i in range(1, order):
        out[i] = out[i - 1] * w % R
    return out


def fr_fft(values, inverse: bool = False):
    """In-order radix-2 Cooley-Tukey NTT over Fr (natural in/out order)."""
    n = len(values)
    assert n & (n - 1) == 0
    a = bit_reversal_permutation([v % R for v in values])
    length = 2
    while length <= n:
        w_len = fr_root_of_unity(length)
        if inverse:
            w_len = pow(w_len, R - 2, R)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for j in range(start, start + half):
                u = a[j]
                t = a[j + half] * w % R
                a[j] = (u + t) % R
                a[j + half] = (u - t) % R
                w = w * w_len % R
        length *= 2
    if inverse:
        n_inv = pow(n, R - 2, R)
        a = [x * n_inv % R for x in a]
    return a


def g1_fft(points, inverse: bool = False):
    """Radix-2 FFT over the G1 group (points: Jacobian tuples).

    Butterflies are point additions; twiddle application is scalar
    multiplication. Used once per trusted setup (then cached), so the host
    cost is acceptable; the device-tier equivalent is ops/msm.py-based.
    """
    ops = C.FP_OPS
    n = len(points)
    assert n & (n - 1) == 0
    a = bit_reversal_permutation(list(points))
    length = 2
    while length <= n:
        w_len = fr_root_of_unity(length)
        if inverse:
            w_len = pow(w_len, R - 2, R)
        half = length // 2
        # precompute twiddle scalars for this stage
        tw = [1] * half
        for i in range(1, half):
            tw[i] = tw[i - 1] * w_len % R
        for start in range(0, n, length):
            for j in range(half):
                u = a[start + j]
                t = C.point_scalar_mul(ops, a[start + j + half], tw[j])
                a[start + j] = C.point_add(ops, u, t)
                a[start + j + half] = C.point_add(ops, u, C.point_neg(ops, t))
        length *= 2
    if inverse:
        n_inv = pow(n, R - 2, R)
        a = [C.point_scalar_mul(ops, pt, n_inv) for pt in a]
    return a


def barycentric_evaluate(evals_brp, z: int, order: int) -> int:
    """Evaluate p(z) from evaluations on the bit-reversed roots domain.

    p(z) = (z^N - 1)/N * sum_i e_i * w_i / (z - w_i), with the domain
    points w_i in bit-reversed order matching evals_brp. If z is in the
    domain, returns the stored evaluation directly.
    """
    roots_brp = bit_reversal_permutation(fr_roots_of_unity(order))
    z %= R
    for i, w in enumerate(roots_brp):
        if w == z:
            return evals_brp[i] % R
    denoms = [(z - w) % R for w in roots_brp]
    inv_denoms = batch_fr_inv(denoms)
    total = 0
    for e, w, inv_d in zip(evals_brp, roots_brp, inv_denoms):
        total += e * w % R * inv_d % R
    total %= R
    total = total * ((pow(z, order, R) - 1) % R) % R
    total = total * pow(order, R - 2, R) % R
    return total
