"""Fast endomorphism subgroup checks vs the definitional [r]P oracle.

The production paths (host fallback, native C++ tier, batched device
tier) all use Scott's endomorphism checks (constants.py G1_BETA / PSI_X /
PSI_Y); the definitional scalar-mul-by-r checks are retained purely as
oracles. This suite differential-tests every tier on:
  * random G1/G2 members (must accept)
  * random on-curve / on-twist points (overwhelmingly non-members)
  * h-torsion points [r]Q for random curve Q (order divides the cofactor
    — the adversarial class where a mis-paired eigenvalue check breaks)
  * the consensus `not_in_G1` vectors (on-curve, wrong subgroup)
Reference criterion being replaced: src/compression.rs:22-27.
"""

import glob
import random

import pytest

from lambdaworks_kzg_tpu.constants import P, R
from lambdaworks_kzg_tpu.host import curve as C
from lambdaworks_kzg_tpu.host import field as F

ops = C.FP_OPS
ops2 = C.FP2_OPS
rng = random.Random(0xFA57)


def _rand_curve_affine():
    while True:
        x = rng.randrange(P)
        rhs = (pow(x, 3, P) + 4) % P
        y = pow(rhs, (P + 1) // 4, P)
        if y * y % P == rhs:
            return (x, y)


def _rand_twist_affine():
    while True:
        x = (rng.randrange(P), rng.randrange(P))
        rhs = ops2.add(ops2.mul(ops2.sqr(x), x), ops2.b)
        y = F.fp2_sqrt(rhs)
        if y is not None:
            return (x, y)


def _g1_cases(n):
    cases = [C.infinity(ops)]
    for _ in range(n):
        cases.append(C.point_scalar_mul_raw(ops, C.G1_GENERATOR, rng.randrange(1, R)))
        q = C.from_affine(ops, _rand_curve_affine())
        cases.append(q)
        cases.append(C.point_scalar_mul_raw(ops, q, R))  # h-torsion
    return cases


def _not_in_g1_vector_points():
    pts = []
    for f in glob.glob(
        "/root/reference/tests/verify_kzg_proof/small/*not_in_G1*/data.yaml"
    ):
        import yaml

        d = yaml.safe_load(open(f))
        for key in ("commitment", "proof"):
            v = d["input"].get(key)
            if v:
                try:
                    pts.append(C.decompress_g1(bytes.fromhex(v[2:]), subgroup_check=False))
                except C.DeserializationError:
                    pass
    return pts


def test_host_fast_g1_matches_definitional():
    for pt in _g1_cases(8) + _not_in_g1_vector_points():
        assert C._g1_in_subgroup_fast(pt) == C._g1_in_subgroup_py(pt)


def test_host_fast_g2_matches_definitional():
    cases = [C.infinity(ops2)]
    for _ in range(3):
        cases.append(
            C.point_scalar_mul_raw(ops2, C.G2_GENERATOR, rng.randrange(1, R))
        )
        q = C.from_affine(ops2, _rand_twist_affine())
        cases.append(q)
        cases.append(C.point_scalar_mul_raw(ops2, q, R))  # h2-torsion
    for q in cases:
        assert C._g2_in_subgroup_fast(q) == C._g2_in_subgroup_py(q)


def test_native_fast_matches_definitional():
    from lambdaworks_kzg_tpu import native

    if not native.available():
        pytest.skip("native tier unavailable")
    import ctypes

    lib = native._load()
    lib.lw_g1_in_subgroup_naive.restype = ctypes.c_int
    lib.lw_g2_in_subgroup_naive.restype = ctypes.c_int
    for pt in _g1_cases(5) + _not_in_g1_vector_points():
        if C.is_infinity(ops, pt):
            continue  # the C entry takes affine bytes; infinity handled upstream
        b = native._g1_bytes(C.to_affine(ops, pt))
        fast = lib.lw_g1_in_subgroup(b)
        naive = lib.lw_g1_in_subgroup_naive(b)
        assert fast == naive == int(C._g1_in_subgroup_py(pt))
    for _ in range(3):
        qin = C.to_affine(
            ops2, C.point_scalar_mul_raw(ops2, C.G2_GENERATOR, rng.randrange(1, R))
        )
        qout = _rand_twist_affine()
        for q in (qin, qout):
            b = native._g2_bytes(q)
            fast = lib.lw_g2_in_subgroup(b)
            naive = lib.lw_g2_in_subgroup_naive(b)
            assert fast == naive == int(
                C._g2_in_subgroup_py(C.from_affine(ops2, q))
            )


def test_device_fast_mask_matches_definitional():
    import numpy as np

    from lambdaworks_kzg_tpu.ops import g1_batch, g1_ops

    pts, expect = [None], [True]  # infinity lane
    for _ in range(3):
        g = C.to_affine(
            ops, C.point_scalar_mul_raw(ops, C.G1_GENERATOR, rng.randrange(1, R))
        )
        pts.append(g)
        expect.append(True)
        b = _rand_curve_affine()
        pts.append(b)
        expect.append(C._g1_in_subgroup_py(C.from_affine(ops, b)))
    for pt in _not_in_g1_vector_points():
        if not C.is_infinity(ops, pt):
            pts.append(C.to_affine(ops, pt))
            expect.append(C._g1_in_subgroup_py(pt))
    pad = (-len(pts)) % 8
    pts += [pts[1]] * pad
    expect += [expect[1]] * pad
    aff, valid = g1_ops.make_points_host(pts)
    jac = g1_batch.lift_affine(aff, valid)
    fast = np.asarray(g1_batch.subgroup_mask(jac)).tolist()
    defn = np.asarray(g1_batch.subgroup_mask_definitional(jac)).tolist()
    assert fast == expect
    assert defn == expect
