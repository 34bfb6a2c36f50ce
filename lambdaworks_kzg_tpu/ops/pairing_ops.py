"""Batched BLS12-381 ate pairing on device (JAX/XLA).

The device tier of SURVEY.md §2b row 7 (the reference's external
`BLS12381AtePairing::compute_batch`, used by kzg verify at
src/utils.rs:224-236) — the last pairing-shaped component that only ran
on host/native in round 1.

TPU-first design (vs the host oracle's generic affine loop,
host/pairing.py):

* G2 points travel the Miller loop in HOMOGENEOUS PROJECTIVE twist
  coordinates — the doubling/addition steps are inversion-free (a Fermat
  Fp inversion costs ~380 muls on device; the projective step ~12).
* Line values are SPARSE Fp12 elements: scaling a line by any Fp2 factor
  is killed by the final easy exponentiation (c^(p^6-1) = 1 for c in
  Fp2*), so each step emits just 3 Fp2 slots (w^0, w^2, w^3) with
  denominators cleared.
* Both Miller loop and exponentiations run as `lax.scan` over STATIC bit
  schedules of the BLS parameter x = -0xd201000000010000 (compile-time
  constants, one compiled body each; data-independent control flow).
* The hard part of the final exponentiation uses the x-chain identity
      3 (p^4 - p^2 + 1)/r = (x-1)^2 (x+p) (x^2 + p^2 - 1) + 3
  (verified exactly in tests), i.e. it computes FE(f)^3: ~4 exp-by-x
  scans instead of a 1270-bit generic power. gcd(3, r) = 1, so
  FE(f)^3 == 1  <=>  FE(f) == 1 and every pairing CHECK is unchanged;
  differential tests compare against the host oracle's FE cubed.
* Everything is batched over trailing lanes: B pairs run one Miller loop
  in lockstep, their f-values multiply in a log-tree, one final
  exponentiation serves the whole batch (the reference's
  `compute_batch` semantics).

Validated end-to-end against host/pairing.py in tests/test_pairing_device.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BLS_X
from . import fp2_ops as F2
from . import tower_ops as T
from .field_ops import FP
from .fp2_ops import add as fp2_add
from .fp2_ops import mul as fp2_mul
from .fp2_ops import neg as fp2_neg
from .fp2_ops import sqr as fp2_sqr
from .fp2_ops import sub as fp2_sub

L = FP.L


# ---------------------------------------------------------------------------
# small-integer scalar multiples (add chains; an Fp mul costs ~5200
# lane-ops, an add ~100 — never multiply by a small constant)
# ---------------------------------------------------------------------------


def _dbl(a):
    return fp2_add(a, a)


def _smul3(a):
    return fp2_add(_dbl(a), a)


def _smul8(a):
    return _dbl(_dbl(_dbl(a)))


def _smul9(a):
    return fp2_add(_smul8(a), a)


def _smul27(a):
    t9 = _smul9(a)
    return fp2_add(_dbl(t9), t9)


def _smul36(a):
    return _dbl(_dbl(_smul9(a)))


def _smul_fp(a, s):
    """Fp2 [2, L, B] times Fp scalar field element [L, B]."""
    return jnp.stack([FP.mul(a[0], s), FP.mul(a[1], s)])


# ---------------------------------------------------------------------------
# Miller loop steps (projective twist coords, sparse lines)
# ---------------------------------------------------------------------------


def _dbl_step(T_pt, xp, yp):
    """T = (X, Y, Z) homogeneous projective on E'(Fp2); P = (xp, yp) G1
    affine [L, B]. Returns (2T, line (c0, c2, c3)):

      2T:   X3 = 2YZ (9X^4 - 8XY^2Z)
            Y3 = 36 X^3 Y^2 Z - 27 X^6 - 8 Y^4 Z^2
            Z3 = 8 Y^3 Z^3
      line (val * w^3 * 2YZ^2):
            c0 = 3X^3 - 2Y^2Z,  c2 = -3 X^2 Z xp,  c3 = 2 Y Z^2 yp
    """
    X, Y, Z = T_pt
    X2 = fp2_sqr(X)
    X3p = fp2_mul(X2, X)
    Y2 = fp2_sqr(Y)
    YZ = fp2_mul(Y, Z)
    Y2Z = fp2_mul(Y2, Z)
    YZ2 = fp2_mul(YZ, Z)
    Xn = fp2_mul(
        _dbl(YZ), fp2_sub(_smul9(fp2_mul(X3p, X)), _smul8(fp2_mul(X, Y2Z)))
    )
    Yn = fp2_sub(
        fp2_sub(
            _smul36(fp2_mul(fp2_mul(X3p, Y2), Z)), _smul27(fp2_sqr(X3p))
        ),
        _smul8(fp2_sqr(Y2Z)),
    )
    Zn = _smul8(fp2_mul(Y2Z, YZ2))
    c0 = fp2_sub(_smul3(X3p), _dbl(Y2Z))
    c2 = fp2_neg(_smul3(_smul_fp(fp2_mul(X2, Z), xp)))
    c3 = _dbl(_smul_fp(YZ2, yp))
    return (Xn, Yn, Zn), (c0, c2, c3)


def _add_step(T_pt, q_aff, xp, yp):
    """T projective + Q = (xq, yq) affine on E'(Fp2). With
    N = Y - yq Z, D = X - xq Z:

      T+Q:  X3 = D (N^2 Z - D^2 (X + xq Z))
            Y3 = N (2 xq D^2 Z + D^2 X - N^2 Z) - yq D^3 Z
            Z3 = D^3 Z
      line (val * w^3 * D):
            c0 = N xq - yq D,  c2 = -N xp,  c3 = D yp
    """
    X, Y, Z = T_pt
    xq, yq = q_aff
    N = fp2_sub(Y, fp2_mul(yq, Z))
    D = fp2_sub(X, fp2_mul(xq, Z))
    N2 = fp2_sqr(N)
    D2 = fp2_sqr(D)
    D3 = fp2_mul(D2, D)
    D2Z = fp2_mul(D2, Z)
    xqD2Z = fp2_mul(D2Z, xq)
    N2Z = fp2_mul(N2, Z)
    D2X = fp2_mul(D2, X)
    Xn = fp2_mul(fp2_sub(N2Z, fp2_add(D2X, xqD2Z)), D)
    Yn = fp2_sub(
        fp2_mul(N, fp2_sub(fp2_add(_dbl(xqD2Z), D2X), N2Z)),
        fp2_mul(fp2_mul(yq, D3), Z),
    )
    Zn = fp2_mul(D3, Z)
    c0 = fp2_sub(fp2_mul(N, xq), fp2_mul(yq, D))
    c2 = fp2_neg(_smul_fp(N, xp))
    c3 = _smul_fp(D, yp)
    return (Xn, Yn, Zn), (c0, c2, c3)


def _sparse_to_fp12(line, b):
    c0, c2, c3 = line
    zero = jnp.zeros((2, L, b), dtype=jnp.uint32)
    return ((c0, c2, zero), (zero, c3, zero))


_LOOP_BITS = np.array(
    [int(c) for c in bin(abs(BLS_X))[3:]], dtype=np.bool_
)  # MSB skipped


def _select(mask, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(mask, x, y), a, b
    )


def miller_loop(p_aff, q_aff, valid):
    """f = prod-free per-lane Miller values: p_aff = (xp, yp) [L, B],
    q_aff = (xq, yq) [2, L, B], valid bool[B] (invalid lanes -> f = 1).

    Returns fp12 [.., B] (conjugated for the negative BLS x)."""
    b = p_aff[0].shape[-1]
    xp, yp = p_aff
    one = jax.tree_util.tree_map(jnp.asarray, T.fp12_one(b))
    z1 = jnp.asarray(T.fp2_one(b))
    T0 = (q_aff[0], q_aff[1], z1)

    def body(carry, bit):
        f, Tc = carry
        f = T.fp12_sqr(f)
        Tn, line = _dbl_step(Tc, xp, yp)
        f = T.fp12_mul(f, _sparse_to_fp12(line, b))
        Ta, line_a = _add_step(Tn, q_aff, xp, yp)
        f_a = T.fp12_mul(f, _sparse_to_fp12(line_a, b))
        return (_select(bit, f_a, f), _select(bit, Ta, Tn)), None

    (f, _), _ = jax.lax.scan(body, (one, T0), jnp.asarray(_LOOP_BITS))
    # mask invalid lanes to 1 before the lane product
    f = _select(valid[None, :], f, one)
    return T.fp12_conj(f)  # BLS_X < 0


def lane_product(f):
    """Multiply an fp12's B lanes down to 1 (log-tree; pad with ones)."""
    b = jax.tree_util.tree_leaves(f)[0].shape[-1]
    while b > 1:
        if b % 2:
            pad = jax.tree_util.tree_map(jnp.asarray, T.fp12_one(1))
            f = jax.tree_util.tree_map(
                lambda x, p: jnp.concatenate([x, p], axis=-1), f, pad
            )
            b += 1
        lo = jax.tree_util.tree_map(lambda x: x[..., : b // 2], f)
        hi = jax.tree_util.tree_map(lambda x: x[..., b // 2 :], f)
        f = T.fp12_mul(lo, hi)
        b //= 2
    return f


# ---------------------------------------------------------------------------
# final exponentiation (x-chain, cubed)
# ---------------------------------------------------------------------------

_X_BITS = np.array([int(c) for c in bin(abs(BLS_X))[2:]], dtype=np.bool_)
_XM1_BITS = np.array(
    [int(c) for c in bin(abs(BLS_X - 1))[2:]], dtype=np.bool_
)


def _pow_abs(m, bits, b):
    """m^e for cyclotomic m (post-easy-part ONLY): MSB-first square-and
    -multiply with Granger-Scott cyclotomic squarings (~2x cheaper than
    generic fp12_sqr)."""
    one = jax.tree_util.tree_map(jnp.asarray, T.fp12_one(b))

    def body(r, bit):
        r = T.fp12_cyc_sqr(r)
        return _select(bit, T.fp12_mul(r, m), r), None

    r, _ = jax.lax.scan(body, one, jnp.asarray(bits))
    return r


def final_exp_cubed(f):
    """FE(f)^3 via the x-chain (module docstring); one batch-shared call."""
    b = jax.tree_util.tree_leaves(f)[0].shape[-1]
    t = T.fp12_mul(T.fp12_conj(f), T.fp12_inv(f))  # f^(p^6 - 1)
    m = T.fp12_mul(T.fp12_frobenius_n(t, 2), t)  # ^(p^2 + 1): cyclotomic
    # m^((x-1)^2): exp by |x-1| then conj, twice (x - 1 < 0)
    bm = T.fp12_conj(_pow_abs(m, _XM1_BITS, b))
    bm = T.fp12_conj(_pow_abs(bm, _XM1_BITS, b))
    c = T.fp12_mul(
        T.fp12_conj(_pow_abs(bm, _X_BITS, b)), T.fp12_frobenius(bm)
    )  # ^(x + p)
    cx2 = _pow_abs(T.fp12_conj(_pow_abs(c, _X_BITS, b)), _X_BITS, b)
    cx2 = T.fp12_conj(cx2)  # c^(x^2): two sign flips cancel... (see test)
    g = T.fp12_mul(
        T.fp12_mul(cx2, T.fp12_frobenius_n(c, 2)), T.fp12_conj(c)
    )  # ^(x^2 + p^2 - 1)
    return T.fp12_mul(g, T.fp12_mul(T.fp12_cyc_sqr(m), m))  # * m^3


# ---------------------------------------------------------------------------
# affine conversion + the public check
# ---------------------------------------------------------------------------


def g1_to_affine(p_jac):
    """[3, L, B] Jacobian -> ((x, y) affine [L, B], valid bool[B]).
    Infinity lanes are invalid (their x/y are garbage)."""
    X, Y, Z = p_jac[0], p_jac[1], p_jac[2]
    finite = ~FP.is_zero(Z)
    zi = FP.inv(Z)
    zi2 = FP.sqr(zi)
    return (FP.mul(X, zi2), FP.mul(Y, FP.mul(zi2, zi))), finite


def g2_to_affine(q_jac):
    """[3, 2, L, B] Jacobian -> ((x, y) affine [2, L, B], valid bool[B])."""
    X, Y, Z = q_jac[0], q_jac[1], q_jac[2]
    finite = ~F2.is_zero(Z)
    zi = F2.inv(Z)
    zi2 = F2.sqr(zi)
    return (F2.mul(X, zi2), F2.mul(Y, F2.mul(zi2, zi))), finite


def _pairing_check_impl(ps_jac, qs_jac):
    p_aff, p_fin = g1_to_affine(ps_jac)
    q_aff, q_fin = g2_to_affine(qs_jac)
    f = miller_loop(p_aff, q_aff, p_fin & q_fin)
    return T.fp12_eq_one(final_exp_cubed(lane_product(f)))


_pairing_check_jit = jax.jit(_pairing_check_impl)


def pairing_check(ps_jac, qs_jac):
    """prod_i e(P_i, Q_i) == 1 for G1 Jacobian [3, L, B] and G2 Jacobian
    [3, 2, L, B] (pairs with an infinity member contribute 1, matching
    host/pairing.pairing_batch). Returns bool[1].

    Jitted on TPU (one compiled program per batch shape, warm calls
    reuse it). Eager elsewhere: the whole-pairing XLA-CPU compile (the
    Miller scan plus five final-exp scans in one program) is
    pathologically slow, while the eager scans compile piecewise and
    land in the persistent cache individually."""
    if jax.default_backend() == "tpu":
        return _pairing_check_jit(ps_jac, qs_jac)
    return _pairing_check_impl(ps_jac, qs_jac)


def g1_neg(p_jac):
    return jnp.stack([p_jac[0], FP.neg(p_jac[1]), p_jac[2]])


def pairings_verify(a1_jac, a2_jac, b1_jac, b2_jac):
    """e(a1, a2) == e(b1, b2) via e(-a1, a2) e(b1, b2) == 1, the device
    mirror of host/pairing.pairings_verify (reference src/utils.rs:224).
    Single points: G1 [3, L, 1], G2 [3, 2, L, 1]. Returns bool[1]."""
    ps = jnp.concatenate([g1_neg(a1_jac), b1_jac], axis=-1)
    qs = jnp.concatenate([a2_jac, b2_jac], axis=-1)
    return pairing_check(ps, qs)


def pairings_verify_host_points(a1, a2, b1, b2) -> bool:
    """Host Jacobian int points -> device pairing check.

    The product bridge for LWKZG_DEVICE_PAIRING=1 / KZGConfig
    .device_pairing (models/kzg.KZG.verify*): marshals the four
    protocol points into limb arrays and runs the batched device
    pairing instead of the native C++ tier."""
    from ..host import curve as HC
    from . import g1_batch, g1_ops, g2_ops

    def d1(pts):
        affs = [
            None
            if HC.is_infinity(HC.FP_OPS, p)
            else HC.to_affine(HC.FP_OPS, p)
            for p in pts
        ]
        aff, valid = g1_ops.make_points_host(affs)
        return g1_batch.lift_affine(aff, valid)

    def d2(pts):
        affs = [
            None
            if HC.is_infinity(HC.FP2_OPS, q)
            else HC.to_affine(HC.FP2_OPS, q)
            for q in pts
        ]
        aff, valid = g2_ops.make_points_host(affs)
        return g2_ops.lift_affine(aff, valid)

    out = pairings_verify(d1([a1]), d2([a2]), d1([b1]), d2([b2]))
    return bool(np.asarray(out)[0])
