"""Host-exact BLS12-381 ate pairing (Python ints).

Replaces the reference's external `BLS12381AtePairing::compute_batch`
(used at reference src/utils.rs:224-236 and inside kzg.verify).

Strategy: correctness-first generic implementation —
  * embed G1 points and untwisted G2 points into E(Fp12),
  * affine Miller loop over |x| with shared squarings per pair,
  * final exponentiation = easy part (p^6-1)(p^2+1) via conjugation +
    Frobenius, then the hard part as a plain integer exponent
    (p^4 - p^2 + 1) // r.

The batched form shares the final exponentiation across pairs, mirroring
`compute_batch` semantics: returns prod_i e(P_i, Q_i).
"""

from ..constants import BLS_X, P, R
from . import field as F
from .curve import FP2_OPS, FP_OPS, is_infinity, to_affine

# ---------------------------------------------------------------------------
# Embedding into Fp12
# ---------------------------------------------------------------------------


def _fp12_from_fp(a: int):
    return (((a, 0), F.FP2_ZERO, F.FP2_ZERO), F.FP6_ZERO)


def _fp12_from_fp2(a):
    return ((a, F.FP2_ZERO, F.FP2_ZERO), F.FP6_ZERO)


# w and its powers: w = (0; 1, 0, 0) i.e. second Fp6 coefficient = 1
_W = (F.FP6_ZERO, F.FP6_ONE)
_W_INV = F.fp12_inv(_W)
_W2_INV = F.fp12_sqr(_W_INV)
_W3_INV = F.fp12_mul(_W2_INV, _W_INV)


def untwist(q_affine):
    """E'(Fp2) affine -> E(Fp12) affine: (x', y') -> (x' w^-2, y' w^-3)."""
    x, y = q_affine
    return (
        F.fp12_mul(_fp12_from_fp2(x), _W2_INV),
        F.fp12_mul(_fp12_from_fp2(y), _W3_INV),
    )


# ---------------------------------------------------------------------------
# Miller loop (affine, generic over Fp12)
# ---------------------------------------------------------------------------


def _line_double(t, p):
    """Line through T, T (tangent) evaluated at P; returns (value, 2T)."""
    xt, yt = t
    xp, yp = p
    # lambda = 3 xt^2 / (2 yt)
    num = F.fp12_mul(_fp12_from_fp(3), F.fp12_sqr(xt))
    den = F.fp12_add(yt, yt)
    lam = F.fp12_mul(num, F.fp12_inv(den))
    x3 = F.fp12_sub(F.fp12_sqr(lam), F.fp12_add(xt, xt))
    y3 = F.fp12_sub(F.fp12_mul(lam, F.fp12_sub(xt, x3)), yt)
    val = F.fp12_sub(
        F.fp12_sub(yp, yt), F.fp12_mul(lam, F.fp12_sub(xp, xt))
    )
    return val, (x3, y3)


def _line_add(t, q, p):
    """Line through T, Q evaluated at P; returns (value, T+Q)."""
    xt, yt = t
    xq, yq = q
    xp, yp = p
    lam = F.fp12_mul(
        F.fp12_sub(yq, yt), F.fp12_inv(F.fp12_sub(xq, xt))
    )
    x3 = F.fp12_sub(F.fp12_sub(F.fp12_sqr(lam), xt), xq)
    y3 = F.fp12_sub(F.fp12_mul(lam, F.fp12_sub(xt, x3)), yt)
    val = F.fp12_sub(
        F.fp12_sub(yp, yt), F.fp12_mul(lam, F.fp12_sub(xp, xt))
    )
    return val, (x3, y3)


_LOOP = abs(BLS_X)
_LOOP_BITS = bin(_LOOP)[3:]  # skip the MSB


def miller_loop_batch(pairs):
    """pairs: list of ((xP, yP) fp12-embedded, (xQ, yQ) fp12-embedded).

    Returns f = prod_i f_{|x|, Q_i}(P_i), conjugated for the negative BLS x.
    """
    f = F.FP12_ONE
    ts = [q for _, q in pairs]
    for bit in _LOOP_BITS:
        f = F.fp12_sqr(f)
        for i, (pp, qq) in enumerate(pairs):
            val, ts[i] = _line_double(ts[i], pp)
            f = F.fp12_mul(f, val)
        if bit == "1":
            for i, (pp, qq) in enumerate(pairs):
                val, ts[i] = _line_add(ts[i], qq, pp)
                f = F.fp12_mul(f, val)
    # BLS_X < 0: f_{-|x|} ~ conj(f_{|x|}) up to factors killed by final exp
    return F.fp12_conj(f)


# ---------------------------------------------------------------------------
# Final exponentiation
# ---------------------------------------------------------------------------

_HARD_EXP = (P**4 - P**2 + 1) // R


def final_exponentiation(f):
    # easy part: f^((p^6-1)(p^2+1))
    t = F.fp12_mul(F.fp12_conj(f), F.fp12_inv(f))  # f^(p^6-1)
    t = F.fp12_mul(F.fp12_frobenius_n(t, 2), t)  # ^(p^2+1)
    # hard part
    return F.fp12_pow(t, _HARD_EXP)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def pairing_batch(pairs_g1_g2):
    """prod_i e(P_i, Q_i) for Jacobian G1/G2 points. Infinity pairs skipped."""
    embedded = []
    for p1, q2 in pairs_g1_g2:
        if is_infinity(FP_OPS, p1) or is_infinity(FP2_OPS, q2):
            continue
        pa = to_affine(FP_OPS, p1)
        qa = to_affine(FP2_OPS, q2)
        p_emb = (_fp12_from_fp(pa[0]), _fp12_from_fp(pa[1]))
        q_emb = untwist(qa)
        embedded.append((p_emb, q_emb))
    if not embedded:
        return F.FP12_ONE
    return final_exponentiation(miller_loop_batch(embedded))


def pairings_verify(a1, a2, b1, b2) -> bool:
    """e(a1, a2) == e(b1, b2), via e(-a1, a2) * e(b1, b2) == 1.

    Behavioral parity with reference src/utils.rs:224-236.
    """
    from .curve import point_neg

    gt = pairing_batch([(point_neg(FP_OPS, a1), a2), (b1, b2)])
    return gt == F.FP12_ONE
