"""Host-exact BLS12-381 group law, serialization and MSM (Python ints).

Replaces the reference's external `lambdaworks-math` elliptic-curve stack and
its in-repo compression layer (reference src/compression.rs:33-139,
src/traits.rs:3-14). Points use Jacobian coordinates (X, Y, Z); infinity is
Z == 0 (canonically (1, 1, 0)).

G1 elements: coordinates are ints.  G2 elements: coordinates are Fp2 tuples.
The generic group law is parameterized by a small field-ops record so G1/G2
share one audited implementation.
"""

from dataclasses import dataclass
from typing import Any, Callable, Optional

from ..constants import (
    B_G1,
    B_G2,
    BLS_X,
    G1_GENERATOR_X,
    G1_GENERATOR_Y,
    G2_GENERATOR_X,
    G2_GENERATOR_Y,
    P,
    R,
)
from . import field as F


@dataclass(frozen=True)
class FieldOps:
    add: Callable
    sub: Callable
    mul: Callable
    sqr: Callable
    neg: Callable
    inv: Callable
    zero: Any
    one: Any
    b: Any  # curve coefficient
    is_zero: Callable
    eq: Callable


FP_OPS = FieldOps(
    add=lambda a, b: (a + b) % P,
    sub=lambda a, b: (a - b) % P,
    mul=lambda a, b: a * b % P,
    sqr=lambda a: a * a % P,
    neg=lambda a: (-a) % P,
    inv=F.fp_inv,
    zero=0,
    one=1,
    b=B_G1,
    is_zero=lambda a: a == 0,
    eq=lambda a, b: a == b,
)

FP2_OPS = FieldOps(
    add=F.fp2_add,
    sub=F.fp2_sub,
    mul=F.fp2_mul,
    sqr=F.fp2_sqr,
    neg=F.fp2_neg,
    inv=F.fp2_inv,
    zero=F.FP2_ZERO,
    one=F.FP2_ONE,
    b=B_G2,
    is_zero=F.fp2_is_zero,
    eq=lambda a, b: a == b,
)

# ---------------------------------------------------------------------------
# Generic Jacobian group law (curve y^2 = x^3 + b, a = 0)
# ---------------------------------------------------------------------------


def infinity(ops: FieldOps):
    return (ops.one, ops.one, ops.zero)


def is_infinity(ops: FieldOps, pt) -> bool:
    return ops.is_zero(pt[2])


def point_neg(ops: FieldOps, pt):
    return (pt[0], ops.neg(pt[1]), pt[2])


def point_double(ops: FieldOps, pt):
    X, Y, Z = pt
    if ops.is_zero(Z) or ops.is_zero(Y):
        return infinity(ops)
    m, s, a = ops.mul, ops.sqr, ops.add
    sub = ops.sub
    XX = s(X)
    YY = s(Y)
    YYYY = s(YY)
    ZZ = s(Z)
    S = sub(sub(s(a(X, YY)), XX), YYYY)
    S = a(S, S)
    M = a(a(XX, XX), XX)
    T = sub(s(M), a(S, S))
    Y8 = a(YYYY, YYYY)
    Y8 = a(Y8, Y8)
    Y8 = a(Y8, Y8)
    Z3 = sub(sub(s(a(Y, Z)), YY), ZZ)
    return (T, sub(m(M, sub(S, T)), Y8), Z3)


def point_add(ops: FieldOps, p1, p2):
    if is_infinity(ops, p1):
        return p2
    if is_infinity(ops, p2):
        return p1
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    m, s = ops.mul, ops.sqr
    a, sub = ops.add, ops.sub
    Z1Z1 = s(Z1)
    Z2Z2 = s(Z2)
    U1 = m(X1, Z2Z2)
    U2 = m(X2, Z1Z1)
    S1 = m(m(Y1, Z2), Z2Z2)
    S2 = m(m(Y2, Z1), Z1Z1)
    if ops.eq(U1, U2):
        if ops.eq(S1, S2):
            return point_double(ops, p1)
        return infinity(ops)
    H = sub(U2, U1)
    I = s(a(H, H))
    J = m(H, I)
    d = sub(S2, S1)
    rr = a(d, d)
    V = m(U1, I)
    X3 = sub(sub(s(rr), J), a(V, V))
    S1J = m(S1, J)
    Y3 = sub(m(rr, sub(V, X3)), a(S1J, S1J))
    Z3 = m(sub(sub(s(a(Z1, Z2)), Z1Z1), Z2Z2), H)
    return (X3, Y3, Z3)


def point_add_mixed(ops: FieldOps, p1, p2_affine):
    """p1 Jacobian + p2 affine (Z2 == 1). p2_affine = (x, y) or None for inf."""
    if p2_affine is None:
        return p1
    if is_infinity(ops, p1):
        return (p2_affine[0], p2_affine[1], ops.one)
    X1, Y1, Z1 = p1
    X2, Y2 = p2_affine
    m, s = ops.mul, ops.sqr
    a, sub = ops.add, ops.sub
    Z1Z1 = s(Z1)
    U2 = m(X2, Z1Z1)
    S2 = m(m(Y2, Z1), Z1Z1)
    if ops.eq(X1, U2):
        if ops.eq(Y1, S2):
            return point_double(ops, p1)
        return infinity(ops)
    H = sub(U2, X1)
    HH = s(H)
    I = a(a(HH, HH), a(HH, HH))
    J = m(H, I)
    d = sub(S2, Y1)
    rr = a(d, d)
    V = m(X1, I)
    X3 = sub(sub(s(rr), J), a(V, V))
    Y1J = m(Y1, J)
    Y3 = sub(m(rr, sub(V, X3)), a(Y1J, Y1J))
    Z3 = sub(sub(s(a(Z1, H)), Z1Z1), HH)
    return (X3, Y3, Z3)


def point_scalar_mul_raw(ops: FieldOps, pt, k: int):
    """Scalar mul WITHOUT reduction mod r (needed for subgroup checks,
    where the point's order may not divide r). k must be >= 0."""
    if k == 0 or is_infinity(ops, pt):
        return infinity(ops)
    result = infinity(ops)
    addend = pt
    while k:
        if k & 1:
            result = point_add(ops, result, addend)
        addend = point_double(ops, addend)
        k >>= 1
    return result


def point_scalar_mul(ops: FieldOps, pt, k: int):
    return point_scalar_mul_raw(ops, pt, k % R)


def to_affine(ops: FieldOps, pt) -> Optional[tuple]:
    """Jacobian -> affine (x, y); None for infinity."""
    if is_infinity(ops, pt):
        return None
    X, Y, Z = pt
    zinv = ops.inv(Z)
    zinv2 = ops.sqr(zinv)
    return (ops.mul(X, zinv2), ops.mul(Y, ops.mul(zinv, zinv2)))


def from_affine(ops: FieldOps, aff):
    if aff is None:
        return infinity(ops)
    return (aff[0], aff[1], ops.one)


def is_on_curve_affine(ops: FieldOps, aff) -> bool:
    if aff is None:
        return True
    x, y = aff
    return ops.eq(ops.sqr(y), ops.add(ops.mul(ops.sqr(x), x), ops.b))


def points_eq(ops: FieldOps, p1, p2) -> bool:
    inf1, inf2 = is_infinity(ops, p1), is_infinity(ops, p2)
    if inf1 or inf2:
        return inf1 == inf2
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    Z1Z1, Z2Z2 = ops.sqr(Z1), ops.sqr(Z2)
    if not ops.eq(ops.mul(X1, Z2Z2), ops.mul(X2, Z1Z1)):
        return False
    return ops.eq(
        ops.mul(ops.mul(Y1, Z2), Z2Z2), ops.mul(ops.mul(Y2, Z1), Z1Z1)
    )


# ---------------------------------------------------------------------------
# G1 / G2 specializations
# ---------------------------------------------------------------------------

G1_GENERATOR = (G1_GENERATOR_X, G1_GENERATOR_Y, 1)
G2_GENERATOR = (G2_GENERATOR_X, G2_GENERATOR_Y, F.FP2_ONE)


def _g1_in_subgroup_py(pt) -> bool:
    """Pure-Python DEFINITIONAL subgroup check: [r]P == O (the oracle
    the fast endomorphism checks are differential-tested against)."""
    if is_infinity(FP_OPS, pt):
        return True
    return is_infinity(FP_OPS, point_scalar_mul_raw(FP_OPS, pt, R))


def _g2_in_subgroup_py(pt) -> bool:
    return is_infinity(FP2_OPS, point_scalar_mul_raw(FP2_OPS, pt, R))


def _g1_in_subgroup_fast(pt) -> bool:
    """Scott's endomorphism subgroup check: sigma(P) == -[x^2]P where
    sigma(X, Y, Z) = (G1_BETA*X, Y, Z) acts as -x^2 on G1 (x = BLS
    parameter). Two 64-bit scalar muls instead of the 255-bit [r]P the
    reference does per point (src/compression.rs:22-27) — ~3x cheaper.

    NOTE the eigenvalue pairing: G1_BETA is the cube root acting as
    -x^2, NOT x^2-1; pairing the other root with -x^2 makes the test
    wrongly reject G1 members (the trap a round-1 comment here fell
    into). Validated vs the definitional oracle on random curve points,
    h-torsion points, and the consensus not_in_G1 vectors.
    """
    if is_infinity(FP_OPS, pt):
        return True
    from ..constants import G1_BETA

    x_abs = -BLS_X
    X, Y, Z = pt
    sig = (X * G1_BETA % P, Y, Z)
    xxP = point_scalar_mul_raw(
        FP_OPS, point_scalar_mul_raw(FP_OPS, pt, x_abs), x_abs
    )
    return points_eq(FP_OPS, sig, point_neg(FP_OPS, xxP))


def _g2_in_subgroup_fast(pt) -> bool:
    """psi(Q) == [x]Q (= -[|x|]Q; x < 0) with psi the untwist-Frobenius-
    twist endomorphism — one 64-bit scalar mul instead of [r]Q."""
    if is_infinity(FP2_OPS, pt):
        return True
    from ..constants import PSI_X, PSI_Y

    x, y = to_affine(FP2_OPS, pt)
    conj = lambda v: (v[0], (P - v[1]) % P)
    psi = from_affine(
        FP2_OPS, (FP2_OPS.mul(PSI_X, conj(x)), FP2_OPS.mul(PSI_Y, conj(y)))
    )
    xQ = point_scalar_mul_raw(FP2_OPS, pt, -BLS_X)
    return points_eq(FP2_OPS, psi, point_neg(FP2_OPS, xQ))


def g1_in_subgroup(pt) -> bool:
    """G1 membership via the fast endomorphism check (native C++ tier
    when built; pure-Python fallback). LWKZG_NATIVE=0 forces Python —
    differential-tested in tests/test_native.py / test_curve.py."""
    if is_infinity(FP_OPS, pt):
        return True
    from .. import native

    if native.available():
        return native.g1_in_subgroup_affine(to_affine(FP_OPS, pt))
    return _g1_in_subgroup_fast(pt)


def g2_in_subgroup(pt) -> bool:
    if is_infinity(FP2_OPS, pt):
        return True
    from .. import native

    if native.available():
        return native.g2_in_subgroup_affine(to_affine(FP2_OPS, pt))
    return _g2_in_subgroup_fast(pt)


# ---------------------------------------------------------------------------
# ZCash/blst compressed serialization
# (behavioral parity with reference src/compression.rs:33-139, but G2 honors
#  the sign bit and performs the subgroup check, matching c-kzg semantics)
# ---------------------------------------------------------------------------

_COMPRESSED_BIT = 0x80
_INFINITY_BIT = 0x40
_SIGN_BIT = 0x20


def _fp_lexicographically_largest(y: int) -> bool:
    return y > (P - 1) // 2


def _fp2_lexicographically_largest(y) -> bool:
    # ZCash rule: y > -y comparing the c1 component first, then c0.
    c0, c1 = y
    if c1 != 0:
        return c1 > (P - 1) // 2
    return c0 > (P - 1) // 2


def compress_g1(pt) -> bytes:
    aff = to_affine(FP_OPS, pt)
    if aff is None:
        return bytes([0xC0]) + bytes(47)
    x, y = aff
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= _COMPRESSED_BIT
    if _fp_lexicographically_largest(y):
        out[0] |= _SIGN_BIT
    return bytes(out)


class DeserializationError(ValueError):
    pass


def decompress_g1(data: bytes, subgroup_check: bool = True):
    """48-byte compressed -> Jacobian point. Raises DeserializationError."""
    if len(data) != 48:
        raise DeserializationError("bad length")
    flags = data[0]
    if not flags & _COMPRESSED_BIT:
        raise DeserializationError("uncompressed bit")
    if flags & _INFINITY_BIT:
        if flags != 0xC0 or any(data[1:]):
            raise DeserializationError("bad infinity encoding")
        return infinity(FP_OPS)
    x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
    if x >= P:
        raise DeserializationError("x >= p")
    y2 = (x * x % P * x + B_G1) % P
    y = F.fp_sqrt(y2)
    if y is None:
        raise DeserializationError("not on curve")
    if _fp_lexicographically_largest(y) != bool(flags & _SIGN_BIT):
        y = (-y) % P
    pt = (x, y, 1)
    if subgroup_check and not g1_in_subgroup(pt):
        raise DeserializationError("not in subgroup")
    return pt


def compress_g2(pt) -> bytes:
    aff = to_affine(FP2_OPS, pt)
    if aff is None:
        return bytes([0xC0]) + bytes(95)
    (x0, x1), y = aff
    out = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    out[0] |= _COMPRESSED_BIT
    if _fp2_lexicographically_largest(y):
        out[0] |= _SIGN_BIT
    return bytes(out)


def decompress_g2(data: bytes, subgroup_check: bool = True):
    """96-byte compressed -> Jacobian G2 point (ZCash layout: x1 || x0)."""
    if len(data) != 96:
        raise DeserializationError("bad length")
    flags = data[0]
    if not flags & _COMPRESSED_BIT:
        raise DeserializationError("uncompressed bit")
    if flags & _INFINITY_BIT:
        if flags != 0xC0 or any(data[1:]):
            raise DeserializationError("bad infinity encoding")
        return infinity(FP2_OPS)
    x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
    x0 = int.from_bytes(data[48:96], "big")
    if x0 >= P or x1 >= P:
        raise DeserializationError("x >= p")
    x = (x0, x1)
    y2 = F.fp2_add(F.fp2_mul(F.fp2_sqr(x), x), B_G2)
    y = F.fp2_sqrt(y2)
    if y is None:
        raise DeserializationError("not on curve")
    if _fp2_lexicographically_largest(y) != bool(flags & _SIGN_BIT):
        y = F.fp2_neg(y)
    pt = (x, y, F.FP2_ONE)
    if subgroup_check and not g2_in_subgroup(pt):
        raise DeserializationError("not in subgroup")
    return pt


# ---------------------------------------------------------------------------
# Host Pippenger MSM (oracle + fallback; the production path is ops/msm.py)
# ---------------------------------------------------------------------------


def g1_msm(scalars, points_affine, window_bits: int = 8):
    """sum_i scalars[i] * P_i over G1. points_affine: list of (x, y) or None."""
    n = len(scalars)
    assert n == len(points_affine)
    if n == 0:
        return infinity(FP_OPS)
    ops = FP_OPS
    num_windows = (255 + window_bits - 1) // window_bits
    mask = (1 << window_bits) - 1
    window_sums = []
    ks = [s % R for s in scalars]
    for w in range(num_windows):
        shift = w * window_bits
        buckets = [None] * (mask + 1)
        for k, pt in zip(ks, points_affine):
            if pt is None:
                continue
            digit = (k >> shift) & mask
            if digit == 0:
                continue
            acc = buckets[digit]
            buckets[digit] = (
                (pt[0], pt[1], 1)
                if acc is None
                else point_add_mixed(ops, acc, pt)
            )
        running = infinity(ops)
        total = infinity(ops)
        for digit in range(mask, 0, -1):
            if buckets[digit] is not None:
                running = point_add(ops, running, buckets[digit])
            total = point_add(ops, total, running)
        window_sums.append(total)
    result = infinity(ops)
    for w in range(num_windows - 1, -1, -1):
        for _ in range(window_bits):
            result = point_double(ops, result)
        result = point_add(ops, result, window_sums[w])
    return result
