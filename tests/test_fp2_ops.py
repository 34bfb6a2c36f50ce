"""Device Fp2 tower + G2 group law == host oracle (limb/value exact)."""

import random

import numpy as np
import pytest

from lambdaworks_kzg_tpu.constants import P, R
from lambdaworks_kzg_tpu.host import curve as C
from lambdaworks_kzg_tpu.host import field as F

ops2 = C.FP2_OPS
rng = random.Random(0xF92)


def _rand_fp2():
    return (rng.randrange(P), rng.randrange(P))


def _rand_twist_affine():
    while True:
        x = _rand_fp2()
        rhs = ops2.add(ops2.mul(ops2.sqr(x), x), ops2.b)
        y = F.fp2_sqrt(rhs)
        if y is not None:
            return (x, y)


def test_fp2_field_ops_match_host():
    from lambdaworks_kzg_tpu.ops import fp2_ops as F2

    n = 16
    a_h = [_rand_fp2() for _ in range(n)]
    b_h = [_rand_fp2() for _ in range(n)]
    a_h[0] = (0, 0)  # zero lane
    a = F2.from_host(a_h)
    b = F2.from_host(b_h)
    for name, dev, host in [
        ("add", F2.add(a, b), [ops2.add(x, y) for x, y in zip(a_h, b_h)]),
        ("sub", F2.sub(a, b), [ops2.sub(x, y) for x, y in zip(a_h, b_h)]),
        ("mul", F2.mul(a, b), [ops2.mul(x, y) for x, y in zip(a_h, b_h)]),
        ("sqr", F2.sqr(a), [ops2.sqr(x) for x in a_h]),
        ("neg", F2.neg(a), [ops2.neg(x) for x in a_h]),
        ("conj", F2.conj(a), [(x[0], (P - x[1]) % P) for x in a_h]),
        ("inv", F2.inv(a), [F.fp2_inv(x) if x != (0, 0) else (0, 0) for x in a_h]),
        (
            "nonres",
            F2.mul_by_nonresidue(a),
            [ops2.mul(x, (1, 1)) for x in a_h],
        ),
    ]:
        assert F2.to_host(dev) == host, name
    assert np.asarray(F2.is_zero(a)).tolist() == [x == (0, 0) for x in a_h]


def test_g2_group_law_matches_host():
    from lambdaworks_kzg_tpu.ops import g2_ops as G2

    pts = [_rand_twist_affine() for _ in range(6)] + [None, None]
    qts = [_rand_twist_affine() for _ in range(4)] + [None] + pts[5:8]
    # same-point lane (doubling fixup) and inverse lane (cancellation)
    qts[1] = pts[1]
    qts[2] = (pts[2][0], ops2.neg(pts[2][1]))

    p_aff, p_valid = G2.make_points_host(pts)
    q_aff, q_valid = G2.make_points_host(qts)
    p = G2.lift_affine(p_aff, p_valid)
    q = G2.lift_affine(q_aff, q_valid)

    got_add = G2.points_to_host(G2.add(p, q))
    got_dbl = G2.points_to_host(G2.dbl(p))
    for i in range(len(pts)):
        exp_add = C.point_add(
            ops2, C.from_affine(ops2, pts[i]), C.from_affine(ops2, qts[i])
        )
        assert C.points_eq(ops2, got_add[i], exp_add), f"add lane {i}"
        exp_dbl = C.point_double(ops2, C.from_affine(ops2, pts[i]))
        assert C.points_eq(ops2, got_dbl[i], exp_dbl), f"dbl lane {i}"


def test_g2_scalar_mul_and_subgroup_mask():
    from lambdaworks_kzg_tpu.ops import g2_ops as G2

    in_sub = [
        C.to_affine(
            ops2, C.point_scalar_mul_raw(ops2, C.G2_GENERATOR, rng.randrange(1, R))
        )
        for _ in range(2)
    ]
    out_sub = [_rand_twist_affine() for _ in range(2)]
    pts = in_sub + out_sub + [None]
    aff, valid = G2.make_points_host(pts)
    jac = G2.lift_affine(aff, valid)

    k = rng.randrange(1, R)
    got = G2.points_to_host(G2.scalar_mul_fixed(jac, k))
    for i, pt in enumerate(pts):
        exp = C.point_scalar_mul_raw(ops2, C.from_affine(ops2, pt), k)
        assert C.points_eq(ops2, got[i], exp), f"smul lane {i}"

    fast = np.asarray(G2.subgroup_mask(jac)).tolist()
    defn = np.asarray(G2.subgroup_mask_definitional(jac)).tolist()
    expect = [
        C._g2_in_subgroup_py(C.from_affine(ops2, pt)) for pt in pts
    ]
    assert fast == expect
    assert defn == expect
